"""Utility functions for lowest-common-ancestor analysis
(parity: reference `src/sourmash/lca/lca_utils.py`)."""

from __future__ import annotations

from collections import namedtuple, defaultdict, Counter
from itertools import zip_longest
from os.path import exists

from ..logging import error

from .lca_db import LCA_Database, load_single_database, load_databases  # noqa: F401

__all__ = [
    "taxlist",
    "zip_lineage",
    "build_tree",
    "find_lca",
    "load_single_database",
    "load_databases",
    "gather_assignments",
    "count_lca_for_assignments",
    "LineagePair",
    "display_lineage",
    "make_lineage",
    "pop_to_rank",
    "is_lineage_match",
]

# element of a taxonomic lineage
LineagePair = namedtuple("LineagePair", ["rank", "name"])

# placeholder cell values meaning "no assignment"
null_names = set(["[Blank]", "na", "null"])


def check_files_exist(*files):
    not_found = [f for f in files if not exists(f)]
    if not_found:
        error(
            "Error! Could not find the following files."
            " Make sure the file paths are specified correctly.\n{}".format(
                "\n".join(not_found)
            )
        )
    return not not_found


def taxlist(include_strain=True):
    "Provide an ordered list of taxonomic ranks."
    yield from [
        "superkingdom",
        "phylum",
        "class",
        "order",
        "family",
        "genus",
        "species",
    ]
    if include_strain:
        yield "strain"


def zip_lineage(lineage, include_strain=True, truncate_empty=False):
    """Given an iterable of LineagePair objects, return list of lineage names.

    >>> x = [ LineagePair('superkingdom', 'a'), LineagePair('phylum', 'b') ]
    >>> zip_lineage(x)
    ['a', 'b', '', '', '', '', '', '']
    """
    empty = LineagePair(None, "")

    pairs = list(
        zip_longest(taxlist(include_strain=include_strain), lineage, fillvalue=empty)
    )

    if truncate_empty:
        while pairs and pairs[-1][1] == empty:
            pairs.pop(-1)

    row = []
    for taxrank, lineage_tup in pairs:
        if lineage_tup != empty and lineage_tup.rank != taxrank:
            raise ValueError(
                f"incomplete lineage at {taxrank} - is {lineage_tup.rank} instead"
            )
        row.append(lineage_tup.name)
    return row


def display_lineage(lineage, include_strain=True, truncate_empty=True):
    return ";".join(
        zip_lineage(
            lineage, include_strain=include_strain, truncate_empty=truncate_empty
        )
    )


def filter_null(x):
    if x is None or x.strip() in ("[Blank]", "na", "null", ""):
        return "unassigned"
    return x


def build_tree(assignments, initial=None):
    """Build a nested-dict tree from lists of LineagePair tuples, for
    finding lowest-common-ancestor agreements/confusion."""
    tree = {} if initial is None else initial

    if not assignments:
        raise ValueError("empty assignment passed to build_tree")

    for assignment in assignments:
        node = tree
        for lineage_tup in assignment:
            if lineage_tup.name:
                node = node.setdefault(lineage_tup, {})
    return tree


def find_lca(tree):
    """Find the first node with multiple children (or the only leaf).
    Returns (lineage_tuple, number_of_children_at_stop)."""
    node = tree
    lineage = []
    while len(node) == 1:
        lineage_tup = next(iter(node))
        lineage.append(lineage_tup)
        node = node[lineage_tup]
    return tuple(lineage), len(node)


def gather_assignments(hashvals, dblist):
    "Collect lineage assignments across all databases for all hashvals."
    assignments = defaultdict(set)
    for hashval in hashvals:
        for lca_db in dblist:
            lineages = lca_db.get_lineage_assignments(hashval)
            if lineages:
                assignments[hashval].update(lineages)
    return assignments


def count_lca_for_assignments(assignments, hashval_counts=None):
    "Count the LCA across each hashval's assignments (optionally weighted)."
    counts = Counter()
    for hashval, lineages in assignments.items():
        lca, _ = find_lca(build_tree(lineages))
        counts[lca] += hashval_counts[hashval] if hashval_counts else 1
    return counts


def is_lineage_match(lin_a, lin_b, rank):
    "Check whether two lineages match down to the given rank."
    for a, b in zip(lin_a, lin_b):
        assert a.rank == b.rank
        if a.rank == rank and a == b:
            return 1
        if a != b:
            return 0
    return 0


def pop_to_rank(lin, rank):
    "Remove lineage tuples from `lin` until `rank` is reached."
    lin = list(lin)

    # ranks strictly above the target
    before_rank = []
    for txl_rank in taxlist():
        if txl_rank == rank:
            break
        before_rank.append(txl_rank)

    # short-circuit: lineage already stops above the target rank
    if lin and lin[-1].rank in before_rank:
        return tuple(lin)

    while lin and lin[-1].rank != rank:
        lin.pop()

    return tuple(lin)


def make_lineage(lineage):
    "Turn a ';'/','-separated lineage string into a tuple of LineagePairs."
    from ..tax.tax_utils import LineagePair

    lin = lineage.split(";")
    if len(lin) == 1:
        lin = lineage.split(",")
    return tuple(LineagePair(rank, n) for (rank, n) in zip(taxlist(), lin))
