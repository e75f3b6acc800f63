"""Device compute ops: vectorized hashing, sketching, and set operations.

These are the TPU-native replacements for the reference Rust core's hot
loops. Host code should go through the wrappers in `minhash.py` / `compare.py`
rather than calling these directly.
"""
