"""sourmash_tpu: a TPU-native FracMinHash k-mer analysis framework.

Built from scratch in JAX/Pallas with API and output parity to sourmash
(https://github.com/sourmash-bio/sourmash): sketch DNA/RNA/protein sequences
into FracMinHash signatures, compare them (Jaccard / containment / ANI),
search collections, and decompose metagenomes with `gather`.

Unlike the reference (Rust core + Python wrappers over a C ABI), the compute
path here is tensor-first: batched canonical-k-mer hashing, sorted-merge set
operations and index queries run as XLA/Pallas programs on TPU; the host
layer holds sketches as sorted numpy uint64 arrays.
"""

# JAX config must happen before any jax.numpy usage: we need 64-bit ints
# for the murmur64 hash space.
import os as _os

import jax

jax.config.update("jax_enable_x64", True)

# persistent compilation cache: CLI runs are separate processes, and XLA
# compiles of the batched kernels (especially over the TPU tunnel) dominate
# cold-start time otherwise.
_cache_dir = _os.environ.get(
    "SOURMASH_TPU_JAX_CACHE", _os.path.expanduser("~/.cache/sourmash_tpu_jax")
)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - older jax
    pass

# explicit platform override (the environment's sitecustomize may force a
# TPU plugin platform regardless of env vars; a config.update after import
# takes precedence). Honoring JAX_PLATFORMS here means `JAX_PLATFORMS=cpu`
# alone reliably keeps library use off the accelerator.
_platform = _os.environ.get("SOURMASH_PLATFORM") or _os.environ.get(
    "JAX_PLATFORMS"
)
if _platform:
    jax.config.update("jax_platforms", _platform)

VERSION = "0.1.0"
__version__ = VERSION

from .minhash import (  # noqa: E402
    MinHash,
    FrozenMinHash,
    hash_murmur,
    get_minhash_default_seed,
    get_minhash_max_hash,
)
from .signature import (  # noqa: E402
    SourmashSignature,
    FrozenSourmashSignature,
    load_signatures_from_json,
    load_one_signature_from_json,
    load_signatures_from_json,
    save_signatures_to_json,
    save_signatures_to_json,
)

__all__ = [
    "MinHash",
    "FrozenMinHash",
    "SourmashSignature",
    "FrozenSourmashSignature",
    "load_signatures_from_json",
    "load_one_signature_from_json",
    "save_signatures_to_json",
    "hash_murmur",
    "load_file_as_index",
    "load_file_as_signatures",
]

DEFAULT_LOAD_K = 31


def load_file_as_index(filename, *, yield_all_files=False):
    "Load a filename as a signature collection/index (loader chain)."
    from .save_load import load_file_as_index as _impl

    return _impl(filename, yield_all_files=yield_all_files)


def load_file_as_signatures(
    filename,
    *,
    select_moltype=None,
    ksize=None,
    picklist=None,
    yield_all_files=False,
    progress=None,
    pattern=None,
):
    "Load a filename and return an iterator over signatures."
    from .sourmash_args import load_file_as_signatures as _impl

    return _impl(
        filename,
        select_moltype=select_moltype,
        ksize=ksize,
        picklist=picklist,
        yield_all_files=yield_all_files,
        progress=progress,
        pattern=pattern,
    )


# -- deprecated aliases (reference __init__.py:31-75; remove in 5.0) ------


def load_one_signature(*args, **kwargs):
    "Deprecated: use load_one_signature_from_json / load_file_as_signatures."
    import warnings

    warnings.warn(
        "load_one_signature is deprecated; use load_one_signature_from_json",
        DeprecationWarning,
        stacklevel=2,
    )
    return load_one_signature_from_json(*args, **kwargs)


def load_signatures(*args, **kwargs):
    "Deprecated: use load_signatures_from_json."
    import warnings

    warnings.warn(
        "load_signatures is deprecated; use load_signatures_from_json",
        DeprecationWarning,
        stacklevel=2,
    )
    return load_signatures_from_json(*args, **kwargs)


def save_signatures(*args, **kwargs):
    "Deprecated: use save_signatures_to_json."
    import warnings

    warnings.warn(
        "save_signatures is deprecated; use save_signatures_to_json",
        DeprecationWarning,
        stacklevel=2,
    )
    return save_signatures_to_json(*args, **kwargs)


DEFAULT_SEED = get_minhash_default_seed()
MAX_HASH = get_minhash_max_hash()


def create_sbt_index(*args, **kwargs):
    "Create an empty SBT index (reference __init__.py:143)."
    from .sbtmh import create_sbt_index as _impl

    return _impl(*args, **kwargs)


def load_sbt_index(*args, **kwargs):
    "Deprecated: use load_file_as_index (reference __init__.py:106-118)."
    import warnings

    warnings.warn(
        "load_sbt_index is deprecated; use load_file_as_index",
        DeprecationWarning,
        stacklevel=2,
    )
    from .sbtmh import load_sbt_index as _impl

    return _impl(*args, **kwargs)


def search_sbt_index(*args, **kwargs):
    "Deprecated: use Index.search (reference __init__.py:121-140)."
    import warnings

    warnings.warn(
        "search_sbt_index is deprecated; use index.search(...)",
        DeprecationWarning,
        stacklevel=2,
    )
    from .sbtmh import search_sbt_index as _impl

    return _impl(*args, **kwargs)
