"""`sourmash lca compare_csv`: compare two taxonomy spreadsheets
(behavior parity: reference `src/sourmash/lca/command_compare_csv.py`)."""

from __future__ import annotations

import sys
from collections import defaultdict

from ..logging import notify, error, print_results, set_quiet
from . import lca_utils
from .lca_utils import zip_lineage
from .command_index import load_taxonomy_assignments


def _load_and_report(label, **load_kwargs):
    "Load one taxonomy spreadsheet, reporting its lineage/row counts."
    notify(f"loading {label}")
    assignments, num_rows = load_taxonomy_assignments(**load_kwargs)
    notify(
        f"loaded {len(set(assignments.values()))} distinct lineages, {num_rows} rows"
    )
    return assignments


def _report_missing(assignments0, assignments):
    "Note identifiers present in only one of the two spreadsheets."
    only_in_classify = set(assignments0) - set(assignments)
    only_in_custom = set(assignments) - set(assignments0)
    if only_in_custom:
        notify(f"missing {len(only_in_custom)} assignments in classify spreadsheet.")
    if only_in_classify:
        notify(f"missing {len(only_in_classify)} assignments in custom spreadsheet.")
    if only_in_classify or only_in_custom:
        notify("(these will not be evaluated any further)")
    else:
        notify("note: all IDs are in both spreadsheets!")


def compare_csv(args):
    if args.start_column < 2:
        error("error, --start-column cannot be less than 2")
        sys.exit(-1)

    set_quiet(args.quiet, args.debug)

    assignments0 = _load_and_report(
        f"classify output from: {args.csv1}",
        filename=args.csv1,
        start_column=3,
        force=args.force,
    )
    notify("----")

    assignments = _load_and_report(
        f"custom spreadsheet from: {args.csv2}",
        filename=args.csv2,
        delimiter="\t" if args.tabs else ",",
        start_column=args.start_column,
        use_headers=not args.no_headers,
        force=args.force,
    )

    _report_missing(assignments0, assignments)

    common = set(assignments0.keys())
    common.intersection_update(assignments.keys())

    # for each shared identifier, decide whether the two lineages agree,
    # nest (compatible), or genuinely conflict (incompatible)
    n_total = 0
    n_different = 0
    n_compat = 0
    n_incompat = 0
    incompat_rank = defaultdict(int)
    for ident in common:
        n_total += 1
        lin_classify = assignments0[ident]
        lin_custom = assignments[ident]
        if lin_classify == lin_custom:
            continue
        n_different += 1

        tree = lca_utils.build_tree([lin_classify])
        lca_utils.build_tree([lin_custom], tree)
        lca, n_children = lca_utils.find_lca(tree)

        if n_children == 0:
            n_compat += 1
            print_results("{},compatible,{}", ident, ";".join(zip_lineage(lca)))
        else:
            n_incompat += 1
            print_results("{},incompatible,{}", ident, ";".join(zip_lineage(lca)))
            rank = lca[-1].rank if lca else next(iter(lca_utils.taxlist()))
            incompat_rank[rank] += 1

    notify(f"{n_total} total assignments, {n_different} differ between spreadsheets.")
    notify(f"{n_compat} are compatible (one lineage is ancestor of another.")
    notify(f"{n_incompat} are incompatible (there is a disagreement in the trees).")

    if n_incompat:
        for rank in lca_utils.taxlist():
            notify(f"{incompat_rank[rank]} incompatible at rank {rank}")
