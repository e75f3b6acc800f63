"""Drop-in import compatibility: `import sourmash` resolves to this
framework.

Every public module of the reference package is aliased to its
`sourmash_tpu` implementation (`sourmash.minhash` -> `sourmash_tpu.minhash`
and so on, recursively), so code written against the reference API —
including the reference's own test suite — imports unchanged.
"""

import importlib
import pkgutil
import sys

import sourmash_tpu as _impl
from sourmash_tpu import *  # noqa: F401,F403

# top-level re-exports that aren't in __all__
from sourmash_tpu import (  # noqa: F401
    VERSION,
    MinHash,
    SourmashSignature,
    load_file_as_index,
    load_file_as_signatures,
)


def _alias_submodules():
    prefix = _impl.__name__ + "."
    for modinfo in pkgutil.walk_packages(_impl.__path__, prefix):
        short = modinfo.name[len(prefix):]
        alias = f"{__name__}.{short}"
        if alias in sys.modules:
            continue
        try:
            mod = importlib.import_module(modinfo.name)
        except Exception:
            continue
        sys.modules[alias] = mod
        # bind attribute chains so `sourmash.index.sqlite_index` resolves
        parts = short.split(".")
        parent = sys.modules[__name__]
        for depth in range(1, len(parts)):
            parent = sys.modules.get(
                f"{__name__}." + ".".join(parts[:depth]), parent
            )
        setattr(parent, parts[-1], mod)


_alias_submodules()


def __getattr__(name):
    return getattr(_impl, name)
