"""`sourmash lca rankinfo`: rank-specific LCA summary across databases
(behavior parity: reference `src/sourmash/lca/command_rankinfo.py`)."""

from __future__ import annotations

import sys
from collections import defaultdict

from ..logging import error, debug, set_quiet, notify
from . import lca_utils


def make_lca_counts(dblist, min_num=0):
    "Collect counts of all LCAs in the list of databases."
    assignments = defaultdict(set)
    for lca_db in dblist:
        for hashval in lca_db.hashvals:
            lineages = lca_db.get_lineage_assignments(hashval, min_num=min_num)
            if lineages:
                assignments[hashval].update(lineages)

    counts = defaultdict(int)
    for hashval, lineages in assignments.items():
        debug(lineages)
        tree = lca_utils.build_tree(lineages)
        lca, reason = lca_utils.find_lca(tree)
        counts[lca] += 1

    return counts


def rankinfo_main(args):
    "rankinfo!"
    if not args.db:
        error("Error! must specify at least one LCA database with --db")
        sys.exit(-1)

    set_quiet(args.quiet, args.debug)

    if args.scaled:
        args.scaled = int(args.scaled)

    dblist, ksize, scaled = lca_utils.load_databases(args.db, args.scaled)

    counts = make_lca_counts(dblist, args.minimum_num)

    counts_by_rank = defaultdict(int)
    for lineage, count in counts.items():
        if lineage:
            lineage_tup = lineage[-1]
            counts_by_rank[lineage_tup.rank] += count

    total = float(sum(counts_by_rank.values()))
    if total == 0:
        notify("(no hashvals with lineages found)")
    else:
        for rank in lca_utils.taxlist():
            count = counts_by_rank.get(rank, 0)
            print(f"{rank}: {count} ({count / total * 100.0:.1f}%)")
