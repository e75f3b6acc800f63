"""Memory-mapped numpy helpers (parity: reference `np_utils.py:1-23`).

Used by the parallel compare path to share the similarity matrix between
worker processes without copying."""

import tempfile


def to_memmap(array):
    """Write `array` to a memory-mapped binary file on disk.

    Returns (memmapped array, filename)."""
    import numpy as np

    filename = tempfile.NamedTemporaryFile(
        prefix="array", suffix=".mmap", delete=False
    ).name
    shape = array.shape
    f = np.memmap(filename, mode="w+", shape=shape, dtype=array.dtype)
    f[:] = array[:]
    del f
    large_memmap = np.memmap(filename, dtype=array.dtype, shape=shape)
    return large_memmap, filename
