"""`sourmash lca summarize`: taxonomic content summary of signatures
(behavior parity: reference `src/sourmash/lca/command_summarize.py`)."""

from __future__ import annotations

import csv
import sys
from collections import defaultdict

from .. import sourmash_args
from ..logging import notify, error, print_results, set_quiet, debug
from . import lca_utils
from .lca_utils import check_files_exist

DEFAULT_THRESHOLD = 5


def summarize(hashvals, dblist, threshold, ignore_abundance):
    """Classify hashvals against the databases; returns aggregated counts
    {lineage: count} climbing each LCA to the root."""
    assignments = lca_utils.gather_assignments(hashvals, dblist)

    if not ignore_abundance:
        counts = lca_utils.count_lca_for_assignments(assignments, hashvals)
    else:
        counts = lca_utils.count_lca_for_assignments(assignments, None)
    debug(counts.most_common())

    aggregated_counts = defaultdict(int)
    for lca, count in counts.most_common():
        if count < threshold:
            break

        if not lca:
            aggregated_counts[lca] += count

        while lca:
            aggregated_counts[lca] += count
            lca = lca[:-1]

    debug(aggregated_counts)
    return aggregated_counts


def load_singletons_and_count(filenames, ksize, scaled, ignore_abundance):
    "Load signatures one by one and count hashvals individually."
    total_count = 0
    n = 0

    total_n = len(filenames)
    for filename in filenames:
        n += 1
        idx = sourmash_args.load_file_as_index(filename)
        idx = idx.select(ksize=ksize)

        for query_sig, query_filename in idx.signatures_with_location():
            notify("\r\033[K", end="")
            notify(
                f"... loading {query_sig} (file {n} of {total_n})", total_n, end="\r"
            )
            total_count += 1

            if ignore_abundance and query_sig.minhash.track_abundance:
                notify("NOTE: discarding abundances in query, since --ignore-abundance")

            hashvals = defaultdict(int)
            count_signature(query_sig, scaled, hashvals)
            yield query_filename, query_sig, hashvals

    notify("\r\033[K", end="")
    notify(f"loaded {total_count} signatures from {n} files total.")


def count_signature(sig, scaled, hashvals):
    "Downsample sig to given scaled, count hash values (with abundance)."
    mh = sig.minhash.downsample(scaled=scaled)

    if mh.track_abundance:
        for hashval, count in mh.hashes.items():
            hashvals[hashval] += count
    else:
        for hashval in mh.hashes:
            hashvals[hashval] += 1


def output_results(lineage_counts, total_counts, filename=None, sig=None):
    "Output results in ~human-readable format."
    for lineage, count in lineage_counts.items():
        if lineage:
            lineage = lca_utils.zip_lineage(lineage, truncate_empty=True)
            lineage = ";".join(lineage)
        else:
            lineage = "(root)"

        p = count / total_counts * 100.0
        p = f"{p:.1f}%"

        print_results(
            f"{p:5} {count:>5}   {lineage}   {filename}:{sig.md5sum()[:8]} {sig}"
        )


def output_csv(lineage_counts, total_counts, csv_fp, filename, sig, write_header=True):
    "Output results in CSV."
    w = csv.writer(csv_fp)
    if write_header:
        headers = ["count"] + list(lca_utils.taxlist())
        headers += ["filename", "sig_name", "sig_md5", "total_counts"]
        w.writerow(headers)

    for lineage, count in lineage_counts.items():
        debug("lineage:", lineage)
        row = [count] + lca_utils.zip_lineage(lineage, truncate_empty=False)
        row += [filename, sig.name, sig.md5sum(), total_counts]
        w.writerow(row)


def summarize_main(args):
    "Main summarization function."
    if not args.db:
        error("Error! must specify at least one LCA database with --db")
        sys.exit(-1)

    set_quiet(args.quiet, args.debug)

    if args.scaled:
        args.scaled = int(args.scaled)

    ignore_abundance = args.ignore_abundance

    args.db = [item for sublist in args.db for item in sublist]
    args.query = [item for sublist in args.query for item in sublist]

    if not check_files_exist(*args.db):
        sys.exit(-1)

    dblist, ksize, scaled = lca_utils.load_databases(args.db, args.scaled)
    if ignore_abundance:
        notify(
            "Ignoring any k-mer abundances in query, since --ignore-abundance given."
        )

    notify("finding query signatures...")
    inp_files = args.query

    if args.query_from_file:
        inp_files.extend(sourmash_args.load_pathlist_from_file(args.query_from_file))

    if not inp_files:
        error("Error! must specify at least one query signature with --query")
        sys.exit(-1)

    if not check_files_exist(*inp_files):
        sys.exit(-1)

    csv_fp = None
    write_header = True
    if args.output:
        csv_fp = open(args.output, "w", newline="")

    try:
        for filename, sig, hashvals in load_singletons_and_count(
            inp_files, ksize, scaled, ignore_abundance
        ):
            lineage_counts = summarize(
                hashvals, dblist, args.threshold, ignore_abundance
            )
            if not ignore_abundance:
                total = float(sum(hashvals.values()))
            else:
                total = float(len(hashvals))

            output_results(lineage_counts, total, filename=filename, sig=sig)

            if csv_fp:
                output_csv(
                    lineage_counts,
                    total,
                    csv_fp,
                    filename,
                    sig,
                    write_header=write_header,
                )
                write_header = False
    finally:
        if csv_fp:
            csv_fp.close()
