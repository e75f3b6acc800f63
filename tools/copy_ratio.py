#!/usr/bin/env python3
"""Measure similarity of repo files against their reference counterparts.

For each repo file with a known reference counterpart, prints:
  ratio     difflib.SequenceMatcher quick ratio on full text
  ident     count of identical non-blank stripped lines / repo non-blank lines

Usage: python tools/copy_ratio.py [file ...]
With no args, checks the full watch-list from round-1's VERDICT.
"""

import difflib
import sys
from pathlib import Path

REPO = Path("/root/repo")
REF = Path("/root/reference/src/sourmash")

# repo-relative -> reference-relative (under src/sourmash)
PAIRS = {
    "sourmash_tpu/commands.py": "commands.py",
    "sourmash_tpu/tax/tax_utils.py": "tax/tax_utils.py",
    "sourmash_tpu/tax/__main__.py": "tax/__main__.py",
    "sourmash_tpu/sig/__main__.py": "sig/__main__.py",
    "sourmash_tpu/search.py": "search.py",
    "sourmash_tpu/sbt.py": "sbt.py",
    "sourmash_tpu/index/sqlite_index.py": "index/sqlite_index.py",
    "sourmash_tpu/sourmash_args.py": "sourmash_args.py",
    "sourmash_tpu/lca/lca_db.py": "lca/lca_db.py",
    "sourmash_tpu/lca/lca_utils.py": "lca/lca_utils.py",
    "sourmash_tpu/lca/command_index.py": "lca/command_index.py",
    "sourmash_tpu/lca/command_classify.py": "lca/command_classify.py",
    "sourmash_tpu/lca/command_summarize.py": "lca/command_summarize.py",
    "sourmash_tpu/lca/command_rankinfo.py": "lca/command_rankinfo.py",
    "sourmash_tpu/lca/command_compare_csv.py": "lca/command_compare_csv.py",
    "sourmash_tpu/sketchcomparison.py": "sketchcomparison.py",
    "sourmash_tpu/sbtmh.py": "sbtmh.py",
    "sourmash_tpu/sqlite_utils.py": "sqlite_utils.py",
    "sourmash_tpu/fig.py": "fig.py",
    "sourmash_tpu/manifest.py": "manifest.py",
    "sourmash_tpu/plugins.py": "plugins.py",
    "sourmash_tpu/save_load.py": "save_load.py",
    "sourmash_tpu/distance_utils.py": "distance_utils.py",
    "sourmash_tpu/index/__init__.py": "index/__init__.py",
    "sourmash_tpu/np_utils.py": "np_utils.py",
    "sourmash_tpu/picklist.py": "picklist.py",
    "sourmash_tpu/command_sketch.py": "command_sketch.py",
    "sourmash_tpu/command_compute.py": "command_compute.py",
    "sourmash_tpu/cli/utils.py": "cli/utils.py",
    "sourmash_tpu/minhash.py": "minhash.py",
    "sourmash_tpu/signature.py": "signature.py",
    "sourmash_tpu/compare.py": "compare.py",
    "sourmash_tpu/sbt_storage.py": "sbt_storage.py",
    "sourmash_tpu/nodegraph.py": "nodegraph.py",
    "sourmash_tpu/hll.py": "hll.py",
    "sourmash_tpu/exceptions.py": "exceptions.py",
    "sourmash_tpu/logging.py": "logging.py",
}


def check(rel):
    ref_rel = PAIRS[rel]
    rp = REPO / rel
    fp = REF / ref_rel
    if not rp.exists() or not fp.exists():
        return None
    a = rp.read_text()
    b = fp.read_text()
    a_lines = a.splitlines()
    b_lines = b.splitlines()
    ratio = difflib.SequenceMatcher(None, a_lines, b_lines, autojunk=False).ratio()
    al = [l.strip() for l in a_lines if l.strip()]
    bl = set(l.strip() for l in b_lines if l.strip())
    ident = sum(1 for l in al if l in bl)
    return ratio, ident, len(al)


def main():
    targets = sys.argv[1:] or sorted(PAIRS)
    bad = 0
    for rel in targets:
        rel = rel.lstrip("./")
        if rel not in PAIRS:
            print(f"{rel}: no reference counterpart registered")
            continue
        res = check(rel)
        if res is None:
            print(f"{rel}: MISSING")
            continue
        ratio, ident, total = res
        flag = " <-- HIGH" if ratio >= 0.35 else ""
        print(f"{ratio:.2f}  ident {ident:4d}/{total:4d}  {rel}{flag}")
        if ratio >= 0.35:
            bad += 1
    if bad:
        print(f"\n{bad} file(s) above the 0.35 threshold")
        sys.exit(1)


if __name__ == "__main__":
    main()
