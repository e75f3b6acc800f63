"""`sourmash lca index`: build an LCA database from taxonomy + signatures
(behavior parity: reference `src/sourmash/lca/command_index.py`)."""

from __future__ import annotations

import csv
import os
import sys

from .. import sourmash_args
from ..sourmash_args import load_file_as_signatures, DEFAULT_LOAD_K
from ..logging import notify, error, debug, set_quiet
from . import lca_utils
from .lca_db import LCA_Database


def _spreadsheet_columns(start_column):
    "Expected column layout: identifier, skipped cols, then the rank list."
    return (
        ["identifiers"]
        + ["_skip_"] * (start_column - 2)
        + list(lca_utils.taxlist())
    )


def _check_headers(first_row, row_headers, force):
    "Warn/abort when the spreadsheet headers disagree with expectations."
    n_disagree = 0
    for column, value in zip(row_headers, first_row):
        if column == "_skip_":
            continue
        if column.lower() != value.lower():
            notify(f"** assuming column '{value}' is {column} in spreadsheet")
            n_disagree += 1
            if n_disagree > 2:
                error("whoa, too many assumptions. are the headers right?")
                error("expecting {}", ",".join(row_headers))
                if not force:
                    sys.exit(-1)
                notify("...continue, because --force was specified.")


def _row_to_ident_lineage(row_headers, row, *, split_identifiers, keep_identifier_versions):
    "Parse one spreadsheet row into (ident, trimmed lineage tuple)."
    from ..tax.tax_utils import LineagePair

    cells = [x for x in zip(row_headers, row) if x[0] != "_skip_"]

    ident = cells[0][1]
    if split_identifiers:
        ident = ident.split(" ")[0]
        if not keep_identifier_versions:
            ident = ident.split(".")[0]

    lineage = [
        LineagePair(rank, lca_utils.filter_null(name)) for (rank, name) in cells[1:]
    ]
    while lineage and lineage[-1].name == "unassigned":
        lineage = lineage[:-1]

    return ident, tuple(lineage)


def load_taxonomy_assignments(
    filename,
    *,
    delimiter=",",
    start_column=2,
    use_headers=True,
    force=False,
    split_identifiers=False,
    keep_identifier_versions=False,
):
    """Load a taxonomy assignment spreadsheet into {ident: lineage tuple}."""
    row_headers = _spreadsheet_columns(start_column)

    assignments = {}
    num_rows = 0
    n_species = 0

    with open(filename, newline="") as fp:
        r = csv.reader(fp, delimiter=delimiter)

        if use_headers:
            notify("examining spreadsheet headers...")
            _check_headers(next(iter(r)), row_headers, force)

        for row in r:
            if not (row and row[0].strip()):
                continue
            num_rows += 1

            ident, lineage = _row_to_ident_lineage(
                row_headers,
                row,
                split_identifiers=split_identifiers,
                keep_identifier_versions=keep_identifier_versions,
            )
            if not lineage:
                continue

            if ident in assignments:
                if assignments[ident] != lineage and not force:
                    raise Exception(f"multiple lineages for identifier {ident}")
            else:
                assignments[ident] = lineage
                if lineage[-1].rank in ("species", "strain"):
                    n_species += 1

    # sanity check: taxonomy spreadsheets should mostly resolve to species
    if len(assignments) * 0.2 > n_species and len(assignments) > 50 and not force:
        error("")
        error("ERROR: fewer than 20% of lineages have species-level resolution!?")
        error(
            "({} species assignments found, of {} assignments total)",
            n_species,
            len(assignments),
        )
        error("** If this is intentional, re-run the command with -f.")
        sys.exit(-1)

    return assignments, num_rows


class _BuildLog:
    "Anomaly bookkeeping while inserting signatures into the LCA database."

    def __init__(self, assignments):
        self.duplicates = set()
        self.no_lineage = []
        self.remnants = set(assignments)  # idents with no signature (yet)
        self.used_lineages = set()
        self.used_idents = set()

    def note_inserted(self, ident, lineage):
        if lineage:
            self.remnants.remove(ident)
            self.used_idents.add(ident)
            self.used_lineages.add(lineage)
        else:
            debug("WARNING: no lineage assignment for {}.", ident)
            self.no_lineage.append(ident)


def generate_report(log, unused_lineages, unused_identifiers, filename):
    "Output a report of anomalies from building the index."
    sections = [
        (f"Duplicate signatures: {len(log.duplicates)}", log.duplicates),
        (f"----\nUnused identifiers: {len(unused_identifiers)}", unused_identifiers),
        (
            f"----\nNo lineage provided for these identifiers: {len(log.no_lineage)}",
            log.no_lineage,
        ),
        (
            f"----\nNo signatures found for these identifiers: {len(log.remnants)}",
            log.remnants,
        ),
    ]
    with open(filename, "w") as fp:
        for title, items in sections:
            print(title, file=fp)
            fp.write("\n".join(items))
            fp.write("\n")
        print(f"----\nUnused lineages: {len(unused_lineages)}", file=fp)
        for lineage in unused_lineages:
            fp.write(";".join(lca_utils.zip_lineage(lineage)))
            fp.write("\n")


def _resolve_db_outfile(args):
    "Apply the format-specific filename suffix; refuse overwrites."
    db_outfile = args.lca_db_out
    if args.database_format == "json":
        if not (
            db_outfile.endswith(".lca.json") or db_outfile.endswith(".lca.json.gz")
        ):
            db_outfile += ".lca.json"
    else:
        assert args.database_format == "sql"
        if not db_outfile.endswith(".lca.sql"):
            db_outfile += ".lca.sql"

    if os.path.exists(db_outfile):
        error(f"ERROR: output file {db_outfile} already exists. Not overwriting.")
        sys.exit(-1)
    return db_outfile


def index(args):
    "Main function for building an LCA database."
    if args.start_column < 2:
        error("error, --start-column cannot be less than 2")
        sys.exit(-1)

    set_quiet(args.quiet, args.debug)

    args.scaled = int(args.scaled)

    if args.ksize is None:
        args.ksize = DEFAULT_LOAD_K

    moltype = sourmash_args.calculate_moltype(args, default="DNA")
    picklist = sourmash_args.load_picklist(args)

    db_outfile = _resolve_db_outfile(args)
    notify(f"saving to LCA DB: {format(db_outfile)}")

    notify(
        f"Building LCA database with ksize={args.ksize} scaled={args.scaled} moltype={moltype}."
    )

    assignments, num_rows = load_taxonomy_assignments(
        args.csv,
        delimiter="\t" if args.tabs else ",",
        start_column=args.start_column,
        use_headers=not args.no_headers,
        force=args.force,
        split_identifiers=args.split_identifiers,
        keep_identifier_versions=args.keep_identifier_versions,
    )

    notify(
        f"{len(assignments)} distinct identities in spreadsheet out of {num_rows} rows."
    )
    notify(
        f"{len(set(assignments.values()))} distinct lineages in spreadsheet out of {num_rows} rows."
    )

    db = LCA_Database(args.ksize, args.scaled, moltype)

    inp_files = list(args.signatures)
    if args.from_file:
        inp_files.extend(sourmash_args.load_pathlist_from_file(args.from_file))

    md5_to_name = {}
    log = _BuildLog(assignments)

    n = 0
    total_n = len(inp_files)
    n_skipped = 0
    for filename in inp_files:
        n += 1
        for sig in load_file_as_signatures(
            filename,
            ksize=args.ksize,
            select_moltype=moltype,
            picklist=picklist,
            yield_all_files=args.force,
        ):
            notify("\r\033[K", end="")
            notify(
                f"\r... loading signature {str(sig)[:30]} ({n} of {total_n}); skipped {n_skipped} so far",
                end="",
            )
            debug(filename, sig)

            if sig.md5sum() in md5_to_name:
                debug(
                    "WARNING: in file {}, duplicate md5sum: {}; skipping",
                    filename,
                    sig.md5sum(),
                )
                log.duplicates.add(sig.name)
                continue

            md5_to_name[sig.md5sum()] = str(sig)

            orig_ident = sig.name or sig.filename
            ident = orig_ident
            if args.split_identifiers:
                ident = ident.split(" ")[0]
                if not args.keep_identifier_versions:
                    ident = ident.split(".")[0]

            lineage = assignments.get(ident)

            if lineage is None and args.require_taxonomy:
                if args.fail_on_missing_taxonomy:
                    notify(f"ERROR: no taxonomy found for identifier '{ident}'")
                    if args.split_identifiers:
                        notify(f"(Identifier extracted from name: '{orig_ident})')")
                    sys.exit(-1)
                debug("(skipping, because --require-taxonomy was specified)")
                n_skipped += 1
                continue

            try:
                db.insert(sig, ident=ident, lineage=lineage)
            except ValueError as e:
                error(
                    "ERROR: cannot insert signature '{}' (md5 {}, loaded from '{}') into database.",
                    sig,
                    sig.md5sum()[:8],
                    filename,
                )
                error("ERROR: {}", str(e))
                sys.exit(-1)

            log.note_inserted(ident, lineage)

    if n_skipped:
        notify(
            f"... loaded {total_n} signatures; skipped {n_skipped} because of --require-taxonomy."
        )
    else:
        notify(f"... loaded {total_n} signatures.")

    if n == 0:
        error("ERROR: no signatures found. ??")
        sys.exit(1)

    if not db.hashvals:
        error("ERROR: no hash values found - are there any signatures?")
        sys.exit(1)
    notify(
        f"loaded {len(db.hashvals)} hashes at ksize={args.ksize} scaled={args.scaled}"
    )

    if picklist:
        sourmash_args.report_picklist(args, picklist)

    all_lineages = set(assignments.values())
    notify(
        f"{len(log.used_lineages)} assigned lineages out of {len(all_lineages)} distinct lineages in spreadsheet."
    )
    unused_lineages = all_lineages - log.used_lineages

    notify(
        f"{len(log.used_idents)} identifiers used out of {len(set(assignments))} distinct identifiers in spreadsheet."
    )

    assert log.used_idents.issubset(set(assignments))
    unused_identifiers = set(assignments) - log.used_idents

    db.save(db_outfile, format=args.database_format)

    if log.duplicates or log.no_lineage or log.remnants or unused_lineages:
        if log.duplicates:
            notify(f"WARNING: {len(log.duplicates)} duplicate signatures.")
        if log.no_lineage:
            notify(f"WARNING: no lineage provided for {len(log.no_lineage)} signatures.")
        if log.remnants:
            notify(f"WARNING: no signatures for {len(log.remnants)} spreadsheet rows.")
        if unused_lineages:
            notify(f"WARNING: {len(unused_lineages)} unused lineages.")

        if unused_identifiers:
            notify(f"WARNING: {len(unused_identifiers)} unused identifiers.")

        if args.report:
            notify(f"generating a report and saving in '{args.report}'")
            generate_report(log, unused_lineages, unused_identifiers, args.report)
        else:
            notify("(You can use --report to generate a detailed report.)")
