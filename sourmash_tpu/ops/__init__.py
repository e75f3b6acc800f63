"""Device compute ops: vectorized hashing, sketching, and set operations.

These are the TPU-native replacements for the reference Rust core's hot
loops. Host code should go through the wrappers in `minhash.py` / `compare.py`
rather than calling these directly.
"""


def default_backend():
    """`jax.default_backend()`, degraded to "cpu" when no backend can
    initialize (e.g. a plugin platform named in JAX_PLATFORMS that is not
    importable in this process — seen with clobbered PYTHONPATH, or in
    forked workers whose parent held the device). Host numpy paths remain
    fully functional in that state."""
    import jax

    try:
        return jax.default_backend()
    except RuntimeError:
        return "cpu"
