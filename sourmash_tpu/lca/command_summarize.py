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

    weights = None if ignore_abundance else hashvals
    counts = lca_utils.count_lca_for_assignments(assignments, weights)
    debug(counts.most_common())

    # propagate each above-threshold LCA's count up to the root
    aggregated_counts = defaultdict(int)
    for lca, count in counts.most_common():
        if count < threshold:
            break

        if not lca:
            aggregated_counts[lca] += count

        prefix = lca
        while prefix:
            aggregated_counts[prefix] += count
            prefix = prefix[:-1]

    debug(aggregated_counts)
    return aggregated_counts


def _hashval_weights(sig, scaled):
    "Hash → multiplicity for one sketch (abundances kept when tracked)."
    mh = sig.minhash.downsample(scaled=scaled)
    weights = defaultdict(int)
    if mh.track_abundance:
        for hashval, count in mh.hashes.items():
            weights[hashval] += count
    else:
        for hashval in mh.hashes:
            weights[hashval] += 1
    return weights


# kept under the reference's name for API familiarity
def count_signature(sig, scaled, hashvals):
    "Downsample sig to given scaled, count hash values (with abundance)."
    for hashval, count in _hashval_weights(sig, scaled).items():
        hashvals[hashval] += count


def load_singletons_and_count(filenames, ksize, scaled, ignore_abundance):
    "Load signatures one by one and count hashvals individually."
    total_count = 0
    n = 0

    total_n = len(filenames)
    for filename in filenames:
        n += 1
        idx = sourmash_args.load_file_as_index(filename).select(ksize=ksize)

        for query_sig, query_filename in idx.signatures_with_location():
            notify("\r\033[K", end="")
            notify(
                f"... loading {query_sig} (file {n} of {total_n})", total_n, end="\r"
            )
            total_count += 1

            if ignore_abundance and query_sig.minhash.track_abundance:
                notify("NOTE: discarding abundances in query, since --ignore-abundance")

            yield query_filename, query_sig, _hashval_weights(query_sig, scaled)

    notify("\r\033[K", end="")
    notify(f"loaded {total_count} signatures from {n} files total.")


class _SummaryReporter:
    "Console + optional-CSV emission of per-signature lineage counts."

    csv_columns = (
        ["count"]
        + list(lca_utils.taxlist())
        + ["filename", "sig_name", "sig_md5", "total_counts"]
    )

    def __init__(self, csv_fp):
        self.csv_fp = csv_fp
        self._wrote_header = False

    @staticmethod
    def _label(lineage):
        if not lineage:
            return "(root)"
        return ";".join(lca_utils.zip_lineage(lineage, truncate_empty=True))

    def emit(self, lineage_counts, total, filename, sig):
        for lineage, count in lineage_counts.items():
            p = f"{count / total * 100.0:.1f}%"
            print_results(
                f"{p:5} {count:>5}   {self._label(lineage)}   {filename}:{sig.md5sum()[:8]} {sig}"
            )

        if self.csv_fp is None:
            return
        w = csv.writer(self.csv_fp)
        if not self._wrote_header:
            w.writerow(self.csv_columns)
            self._wrote_header = True
        for lineage, count in lineage_counts.items():
            debug("lineage:", lineage)
            row = [count] + lca_utils.zip_lineage(lineage, truncate_empty=False)
            row += [filename, sig.name, sig.md5sum(), total]
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

    csv_fp = open(args.output, "w", newline="") if args.output else None
    reporter = _SummaryReporter(csv_fp)

    try:
        for filename, sig, hashvals in load_singletons_and_count(
            inp_files, ksize, scaled, ignore_abundance
        ):
            lineage_counts = summarize(
                hashvals, dblist, args.threshold, ignore_abundance
            )
            if ignore_abundance:
                total = float(len(hashvals))
            else:
                total = float(sum(hashvals.values()))

            reporter.emit(lineage_counts, total, filename, sig)
    finally:
        if csv_fp:
            csv_fp.close()
