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


def _function_bodies(path):
    """Yield (qualname, [normalized body lines]) for every function in a file.

    Lines are comment-stripped (tokenize), docstring-dropped, whitespace-
    normalized, blank-dropped — the unit the function-level detector
    compares corpus-wide.
    """
    import ast
    import io
    import tokenize

    try:
        src = path.read_text()
        tree = ast.parse(src)
    except (SyntaxError, UnicodeDecodeError, OSError):
        return
    lines = src.splitlines()
    # blank out comments without disturbing line numbering
    try:
        for tok in tokenize.generate_tokens(io.StringIO(src).readline):
            if tok.type == tokenize.COMMENT:
                row = tok.start[0] - 1
                col = tok.start[1]
                lines[row] = lines[row][:col]
    except tokenize.TokenError:
        pass

    for node in ast.walk(tree):
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        body = node.body
        if (
            body
            and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)
            and isinstance(body[0].value.value, str)
        ):
            body = body[1:]
        if not body:
            continue
        start = body[0].lineno - 1
        end = max(getattr(st, "end_lineno", st.lineno) for st in body)
        norm = [l.strip() for l in lines[start:end]]
        yield node.name, [l for l in norm if l]


# lines too generic to seed a candidate-pair (they appear everywhere)
_TRIVIAL = {
    "return", "continue", "break", "pass", "else:", "try:", "raise",
    "return None", "return True", "return False", "return result",
}


def function_scan(min_block=10, verbose=True):
    """Corpus-wide function-body detector: flags any repo function whose
    comment-stripped body shares a >= min_block-line contiguous identical
    run with ANY reference function (not just the same-named file).

    Returns the list of flagged (repo_func, ref_func, block_len) tuples.
    """
    ref_funcs = []  # (label, lines)
    line_index = {}  # normalized line -> set of ref_funcs indices
    for fp in sorted(REF.rglob("*.py")):
        rel = fp.relative_to(REF)
        for name, lines in _function_bodies(fp) or ():
            idx = len(ref_funcs)
            ref_funcs.append((f"{rel}:{name}", lines))
            for l in set(lines):
                if len(l) >= 8 and l not in _TRIVIAL:
                    line_index.setdefault(l, set()).add(idx)

    flagged = []
    for rp in sorted((REPO / "sourmash_tpu").rglob("*.py")):
        rel = rp.relative_to(REPO)
        for name, lines in _function_bodies(rp) or ():
            if len(lines) < min_block:
                continue
            # candidate ref functions sharing several substantive lines
            hits = {}
            for l in set(lines):
                for idx in line_index.get(l, ()):
                    hits[idx] = hits.get(idx, 0) + 1
            cands = [i for i, c in hits.items() if c >= min(5, min_block // 2)]
            best = (0, None)
            for i in cands:
                sm = difflib.SequenceMatcher(None, lines, ref_funcs[i][1], autojunk=False)
                m = sm.find_longest_match(0, len(lines), 0, len(ref_funcs[i][1]))
                if m.size > best[0]:
                    best = (m.size, ref_funcs[i][0])
            if best[0] >= min_block:
                flagged.append((f"{rel}:{name}", best[1], best[0]))

    if verbose:
        if flagged:
            for repo_f, ref_f, n in sorted(flagged, key=lambda t: -t[2]):
                print(f"FUNC-COPY {n:3d} identical lines: {repo_f}  ~  {ref_f}")
        else:
            print(
                f"function scan: no >= {min_block}-line identical function "
                "bodies corpus-wide"
            )
    return flagged


def main():
    args = sys.argv[1:]
    if args and args[0] == "--functions":
        flagged = function_scan()
        sys.exit(1 if flagged else 0)
    targets = args or sorted(PAIRS)
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
    if not args:
        flagged = function_scan()
        if flagged:
            sys.exit(1)


if __name__ == "__main__":
    main()
