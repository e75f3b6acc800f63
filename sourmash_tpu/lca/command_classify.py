"""`sourmash lca classify`: classify signatures to deepest taxonomic node
(behavior parity: reference `src/sourmash/lca/command_classify.py`)."""

from __future__ import annotations

import csv
import sys

from .. import sourmash_args
from ..sourmash_args import load_file_as_signatures
from ..logging import notify, error, debug, set_quiet
from . import lca_utils
from .lca_utils import check_files_exist

DEFAULT_THRESHOLD = 5


def classify_signature(query_sig, dblist, threshold, majority):
    """Classify query_sig against the databases; returns (lineage, status)
    with status in {'nomatch', 'found', 'disagree'}."""
    assignments = lca_utils.gather_assignments(query_sig.minhash.hashes, dblist)

    counts = lca_utils.count_lca_for_assignments(assignments)
    debug(counts.most_common())

    # gather the above-threshold LCAs into one tree: all of them by
    # default, or just the top vote with --majority
    tree = {}
    if counts and majority:
        majority_vote, count = counts.most_common()[0]
        if count > threshold:
            lca_utils.build_tree([majority_vote], tree)
    else:
        for lca, count in counts.most_common():
            if count < threshold:
                break
            lca_utils.build_tree([lca], tree)

    if not tree:
        return [], "nomatch"

    lca, n_children = lca_utils.find_lca(tree)
    if n_children == 0:
        debug("END", lca)
        status = "found"
    else:
        debug("MULTI", lca)
        status = "disagree"

    debug("lineage is:", lca)
    return lca, status


def _collect_query_files(args):
    "Positional queries + --query-from-file, existence-checked."
    notify("finding query signatures...")
    inp_files = list(args.query)
    if args.query_from_file:
        inp_files.extend(sourmash_args.load_pathlist_from_file(args.query_from_file))

    if not check_files_exist(*inp_files):
        sys.exit(-1)

    if not inp_files:
        error(
            "Error! must specify at least one query signature with --query or --query-from-file"
        )
        sys.exit(-1)
    return inp_files


def classify(args):
    "Main single-genome classification function."
    if not args.db:
        error("Error! must specify at least one LCA database with --db")
        sys.exit(-1)

    set_quiet(args.quiet, args.debug)

    args.db = [item for sublist in args.db for item in sublist]
    args.query = [item for sublist in args.query for item in sublist]

    if not check_files_exist(*args.db):
        sys.exit(-1)

    dblist, ksize, scaled = lca_utils.load_databases(args.db, args.scaled)

    inp_files = _collect_query_files(args)

    notify(f"outputting classifications to {args.output}")
    with sourmash_args.FileOutputCSV(args.output) as outfp:
        csvfp = csv.writer(outfp)

        csvfp.writerow(["ID", "status"] + list(lca_utils.taxlist()))

        total_count = 0
        total_n = len(inp_files)
        for n, query_filename in enumerate(inp_files, 1):
            for query_sig in load_file_as_signatures(query_filename, ksize=ksize):
                notify("\r\033[K", end="")
                notify(f"... classifying {query_sig} (file {n} of {total_n})", end="\r")
                debug("classifying", query_sig)
                total_count += 1

                if query_sig.minhash.scaled != scaled:
                    with query_sig.update() as query_sig:
                        query_sig.minhash = query_sig.minhash.downsample(scaled=scaled)

                lineage, status = classify_signature(
                    query_sig, dblist, args.threshold, args.majority
                )
                debug(lineage)

                if not args.output:
                    notify("\r\033[K", end="")
                csvfp.writerow([str(query_sig), status] + lca_utils.zip_lineage(lineage))

        notify("\r\033[K", end="")
        notify(f"classified {total_count} signatures total")
