"""Entry-point plugin support (API parity: reference
`src/sourmash/plugins.py` — groups 'sourmash.load_from', 'sourmash.save_to',
'sourmash.cli_script'). Plugin group names are kept identical so existing
sourmash plugins can register against this framework."""

from __future__ import annotations

import itertools

from .logging import debug_literal, error

try:
    from importlib.metadata import entry_points
except ImportError:  # pragma: no cover
    entry_points = None

DEFAULT_LOAD_FROM_PRIORITY = 99
DEFAULT_SAVE_TO_PRIORITY = 99


def _get_entry_points(group):
    if entry_points is None:
        return []
    try:
        return list(entry_points(group=group))
    except TypeError:  # pragma: no cover - old API
        return list(entry_points().get(group, []))


def get_load_from_functions():
    "Load the 'load_from' plugins and yield tuples (priority, name, fn)."
    for ep in _get_entry_points("sourmash.load_from"):
        try:
            load_from_fn = ep.load()
        except (ModuleNotFoundError, AttributeError) as e:
            debug_literal(f"plugins.load_from_functions: got error loading {ep.name}: {str(e)}")
            continue
        priority = getattr(load_from_fn, "priority", DEFAULT_LOAD_FROM_PRIORITY)
        yield priority, ep.name, load_from_fn


def get_save_to_functions():
    "Load the 'save_to' plugins and yield tuples (priority, class)."
    for ep in _get_entry_points("sourmash.save_to"):
        try:
            save_cls = ep.load()
        except (ModuleNotFoundError, AttributeError) as e:
            debug_literal(f"plugins.save_to_functions: got error loading {ep.name}: {str(e)}")
            continue
        priority = getattr(save_cls, "priority", DEFAULT_SAVE_TO_PRIORITY)
        yield priority, save_cls


class CommandLinePlugin:
    "Base class for CLI plugins (subcommands under 'sourmash scripts')."

    command = None
    description = None

    def __init__(self, parser):
        subparser = parser.add_parser(self.command, usage=self.description)
        subparser.add_argument(
            "-q", "--quiet", action="store_true", help="suppress non-error output"
        )
        subparser.add_argument(
            "-d", "--debug", action="store_true", help="provide debugging output"
        )

    def main(self, args):
        from .logging import set_quiet

        set_quiet(args.quiet, args.debug)


def get_cli_script_plugins():
    "Yield CLI script plugin entry points."
    yield from _get_entry_points("sourmash.cli_script")


def get_cli_scripts_descriptions():
    "Yield descriptions of CLI script plugins."
    for ep in get_cli_script_plugins():
        try:
            script_cls = ep.load()
        except (ModuleNotFoundError, AttributeError):
            error(f"ERROR: cannot load plugin '{ep.name}'")
            continue
        command = getattr(script_cls, "command", None)
        description = getattr(script_cls, "description", "")
        if command:
            yield f"sourmash scripts {command:16s} - {description}"


def add_cli_scripts(parser):
    "Register CLI script plugins on the given subparser."
    d = {}
    for ep in get_cli_script_plugins():
        try:
            script_cls = ep.load()
        except (ModuleNotFoundError, AttributeError):
            error(f"ERROR: cannot load plugin '{ep.name}'")
            continue
        obj = script_cls(parser)
        d[obj.command] = obj
    return d


def list_all_plugins():
    "Print a table of installed plugins (reference plugins.py:188-209)."
    from .logging import notify

    plugins = list(
        itertools.chain(
            _get_entry_points("sourmash.load_from"),
            _get_entry_points("sourmash.save_to"),
            _get_entry_points("sourmash.cli_script"),
        )
    )

    if not plugins:
        notify("\n(no plugins detected)\n")

    notify("")
    notify("the following plugins are installed:")
    notify("")
    notify(
        f"{'plugin type':<20s} {'from python module':<30s} {'v':<5s} {'entry point name':<20s}"
    )
    notify(f"{'-' * 20} {'-' * 30} {'-' * 5} {'-' * 20}")

    for plugin in plugins:
        name = plugin.name
        mod = plugin.module
        try:
            version = plugin.dist.version
        except Exception:
            version = "?"
        group = plugin.group
        notify(f"{group:<20s} {mod:<30s} {version:<5s} {name:<20s}")
