"""Small shared utilities.

The reference's `utils.py` holds the Rust-FFI object plumbing
(`RustObject`/`rustcall`, reference `utils.py:9-78`); this framework has
no FFI handles — sketches are plain Python + numpy/jax objects — so only
the generic helpers live here."""

from __future__ import annotations


def decode_str(s):
    "Identity passthrough (reference decodes Rust-owned strings here)."
    if isinstance(s, bytes):
        return s.decode("utf-8")
    return s


def encode_str(s):
    if isinstance(s, str):
        return s.encode("utf-8")
    return s
