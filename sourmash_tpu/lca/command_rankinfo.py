"""`sourmash lca rankinfo`: rank-specific LCA summary across databases
(behavior parity: reference `src/sourmash/lca/command_rankinfo.py`)."""

from __future__ import annotations

import sys
from collections import defaultdict

from ..logging import error, debug, set_quiet, notify
from . import lca_utils


def make_lca_counts(dblist, min_num=0):
    "Collect counts of all LCAs in the list of databases."
    # union the lineage assignments of every hashval across databases
    assignments = defaultdict(set)
    for lca_db in dblist:
        for hashval in lca_db.hashvals:
            lineages = lca_db.get_lineage_assignments(hashval, min_num=min_num)
            if lineages:
                assignments[hashval].update(lineages)

    # resolve each hashval's assignment set to its LCA
    counts = defaultdict(int)
    for lineages in assignments.values():
        debug(lineages)
        lca, _ = lca_utils.find_lca(lca_utils.build_tree(lineages))
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

    # fold LCA counts by the rank they resolved to
    counts_by_rank = defaultdict(int)
    for lineage, count in counts.items():
        if lineage:
            counts_by_rank[lineage[-1].rank] += count

    total = float(sum(counts_by_rank.values()))
    if total == 0:
        notify("(no hashvals with lineages found)")
        return

    for rank in lca_utils.taxlist():
        count = counts_by_rank.get(rank, 0)
        print(f"{rank}: {count} ({count / total * 100.0:.1f}%)")
