"""Entry point: `python -m sourmash_tpu <command> ...`
(parity: reference `src/sourmash/__main__.py`)."""

from __future__ import annotations

import sys


def main(arglist=None):
    import os

    trace_dir = os.environ.get("SOURMASH_TPU_PROFILE")
    if trace_dir:
        # observability hook (SURVEY §5): wrap the whole command in a JAX
        # profiler trace — kernel timelines, HBM stats, XLA fusions —
        # viewable with xprof/tensorboard. The reference has no runtime
        # tracing; this is the TPU-native equivalent.
        import jax

        with jax.profiler.trace(trace_dir):
            return _dispatch(arglist)
    return _dispatch(arglist)


def _dispatch(arglist=None):
    from . import cli

    args = cli.parse_args(arglist)

    if not getattr(args, "cmd", None):
        cli.get_parser().print_help()
        return 1

    cmd = args.cmd

    if cmd == "compare":
        from . import commands

        return commands.compare(args)
    elif cmd == "plot":
        from . import commands

        return commands.plot(args)
    elif cmd == "search":
        from . import commands

        return commands.search(args)
    elif cmd == "gather":
        from . import commands

        return commands.gather(args)
    elif cmd == "prefetch":
        from . import commands

        return commands.prefetch(args)
    elif cmd == "categorize":
        from . import commands

        return commands.categorize(args)
    elif cmd == "sketch":
        from . import command_sketch

        subcmd = getattr(args, "subcmd", None)
        if subcmd in ("dna", "rna", "nucleotide", "nt"):
            return command_sketch.dna(args)
        elif subcmd in ("protein", "aa", "prot"):
            return command_sketch.protein(args)
        elif subcmd == "translate":
            return command_sketch.translate(args)
        elif subcmd == "fromfile":
            return command_sketch.fromfile(args)
        else:
            cli.get_parser().print_help()
            return 1
    elif cmd == "sig":
        from .sig import __main__ as sig_main

        subcmd = getattr(args, "subfunc", None)
        if subcmd is None:
            cli.get_parser().print_help()
            return 1
        return getattr(sig_main, subcmd)(args)
    elif cmd in (
        "index",
        "info",
        "import_csv",
        "sbt_combine",
        "migrate",
        "watch",
        "multigather",
    ):
        from . import commands

        return getattr(commands, cmd)(args)
    elif cmd == "compute":
        from .command_compute import compute

        return compute(args)
    elif cmd in ("scripts", "ext"):
        from .cli import _scripts_extension_dict

        subcmd = getattr(args, "subcmd", None)
        obj = _scripts_extension_dict.get(subcmd)
        if obj is None:
            from . import cli as _cli

            _cli.get_parser().parse_args([cmd, "--help"])
            return 1
        return obj.main(args)
    elif cmd == "storage":
        from .sbt import convert_cmd

        return convert_cmd(args.sbt, args.backend)
    elif cmd == "tax":
        subcmd = getattr(args, "subfunc", None)
        if subcmd is None:
            cli.get_parser().print_help()
            return 1
        from .tax import __main__ as tax_main

        fn_name = subcmd[len("tax_"):]
        return getattr(tax_main, fn_name)(args)
    elif cmd == "lca":
        subcmd = getattr(args, "subfunc", None)
        if subcmd is None:
            cli.get_parser().print_help()
            return 1
        if subcmd == "lca_index":
            from .lca.command_index import index as fn
        elif subcmd == "lca_classify":
            from .lca.command_classify import classify as fn
        elif subcmd == "lca_summarize":
            from .lca.command_summarize import summarize_main as fn
        elif subcmd == "lca_rankinfo":
            from .lca.command_rankinfo import rankinfo_main as fn
        elif subcmd == "lca_compare_csv":
            from .lca.command_compare_csv import compare_csv as fn
        else:
            cli.get_parser().print_help()
            return 1
        return fn(args)
    else:
        cli.get_parser().print_help()
        return 1


if __name__ == "__main__":
    sys.exit(main() or 0)
