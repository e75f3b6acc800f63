#!/usr/bin/env python3
"""Show the longest identical comment-stripped block between a repo function
and its best-matching reference function. Usage:
  python tools/show_func_copy.py sourmash_tpu/tax/tax_utils.py:add_taxresult
"""

import difflib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from copy_ratio import REPO, REF, _function_bodies, _TRIVIAL  # noqa: E402


def main():
    target = sys.argv[1]
    rel, _, fname = target.rpartition(":")
    repo_lines = None
    for name, lines in _function_bodies(REPO / rel):
        if name == fname and (repo_lines is None or len(lines) > len(repo_lines)):
            repo_lines = lines
    if repo_lines is None:
        sys.exit(f"{target}: not found")

    best = (0, None, None)
    for fp in sorted(REF.rglob("*.py")):
        for name, lines in _function_bodies(fp):
            sm = difflib.SequenceMatcher(None, repo_lines, lines, autojunk=False)
            m = sm.find_longest_match(0, len(repo_lines), 0, len(lines))
            if m.size > best[0]:
                best = (m.size, f"{fp.relative_to(REF)}:{name}", m)
    n, ref_label, m = best
    print(f"{target} ~ {ref_label}: {n} identical lines\n")
    for l in repo_lines[m.a : m.a + m.size]:
        print("  " + l)


if __name__ == "__main__":
    main()
