"""ctypes binding for the native C++ FASTA/FASTQ batch parser.

The shared library is compiled on first use with the system g++ and cached
under ~/.cache/sourmash_tpu_native keyed by a hash of the source, so repo
checkouts stay source-only. If no compiler/zlib is available the caller
falls back to the pure-Python reader in `sequence_io`.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "fastx.cpp")
_SKETCH_SRC = os.path.join(os.path.dirname(__file__), "sketch.cpp")
_lib = None
_build_failed = False


def _build_lib():
    "Compile (if needed) and load the shared library; None on failure."
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
        with open(_SKETCH_SRC, "rb") as f:
            src += f.read()
        tag = hashlib.sha256(src).hexdigest()[:16]
        cache_dir = os.environ.get(
            "SOURMASH_NATIVE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "sourmash_tpu_native"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        sopath = os.path.join(cache_dir, f"libfastx_{tag}.so")
        if not os.path.exists(sopath):
            tmp = sopath + f".tmp{os.getpid()}"
            subprocess.run(
                [
                    "g++", "-O3", "-shared", "-fPIC", "-pthread",
                    _SRC, _SKETCH_SRC, "-o", tmp, "-lz",
                ],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, sopath)
        lib = ctypes.CDLL(sopath)
        lib.fastx_open.argtypes = [ctypes.c_char_p]
        lib.fastx_open.restype = ctypes.c_void_p
        lib.fastx_close.argtypes = [ctypes.c_void_p]
        lib.fastx_read_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.fastx_read_batch.restype = ctypes.c_int64
        lib.sketch_hashes.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_uint32,
            ctypes.c_uint64,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_int32,
        ]
        lib.sketch_hashes.restype = ctypes.c_int64
        lib.hash_windows.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_uint32,
            ctypes.c_void_p,
            ctypes.c_int32,
        ]
        lib.hash_windows.restype = ctypes.c_int64
        _lib = lib
        return lib
    except Exception:
        _build_failed = True
        return None


def available():
    return _build_lib() is not None


def iter_batches(path, target_bytes=8 << 20, max_records=65536):
    """Yield (names:list[str], seq_blob:bytes, seq_offsets:np.int64[n+1])
    batches from a plain or gzip FASTA/FASTQ file.

    Raises ValueError on malformed input; OSError if the file can't be
    opened; RuntimeError if the native library is unavailable.
    """
    lib = _build_lib()
    if lib is None:
        raise RuntimeError("native fastx parser unavailable")

    handle = lib.fastx_open(os.fsencode(path))
    if not handle:
        raise OSError(f"cannot open '{path}'")

    seq_cap = int(target_bytes)
    name_cap = 1 << 20
    try:
        while True:
            seq_buf = np.empty(seq_cap, dtype=np.uint8)
            name_buf = np.empty(name_cap, dtype=np.uint8)
            seq_off = np.empty(max_records + 1, dtype=np.int64)
            name_off = np.empty(max_records + 1, dtype=np.int64)
            n = lib.fastx_read_batch(
                handle,
                seq_buf.ctypes.data_as(ctypes.c_void_p),
                seq_cap,
                seq_off.ctypes.data_as(ctypes.c_void_p),
                name_buf.ctypes.data_as(ctypes.c_void_p),
                name_cap,
                name_off.ctypes.data_as(ctypes.c_void_p),
                max_records,
            )
            if n == 0:
                return
            if n == -1:
                raise ValueError(
                    "invalid sequence file: does not start with '>' or '@'"
                )
            if n == -2:  # a single record larger than the buffers: grow, retry
                seq_cap *= 4
                name_cap *= 4
                continue
            n = int(n)
            blob = seq_buf[: seq_off[n]].tobytes()
            nb = name_buf[: name_off[n]].tobytes()
            names = [
                nb[name_off[i] : name_off[i + 1]].decode("utf-8", "replace")
                for i in range(n)
            ]
            yield names, blob, seq_off[: n + 1].copy()
    finally:
        lib.fastx_close(handle)


def iter_records_bytes(path):
    "Yield (name, seq_bytes) via the native parser."
    for names, blob, off in iter_batches(path):
        for i, name in enumerate(names):
            yield name, blob[off[i] : off[i + 1]]


def sketch_hashes(seq: "np.ndarray", ksize: int, seed: int, max_hash: int, n_threads: int = 0):
    """Native canonical-kmer murmur + threshold hot loop.

    seq: uppercased uint8 array. Returns (survivors uint64 array in window
    order with multiplicity, first_bad byte index or -1), or None if the
    native library is unavailable. Thread-chunked above 2^18 windows.
    """
    lib = _build_lib()
    if lib is None:
        return None
    seq = np.ascontiguousarray(seq, dtype=np.uint8)
    n = seq.shape[0]
    nwin = n - ksize + 1
    if nwin <= 0:
        return np.zeros(0, dtype=np.uint64), -1
    # expected survivors ~ nwin * scaled-fraction; headroom then retry
    frac = (int(max_hash) + 1) / float(1 << 64)
    cap = int(nwin * frac * 2) + 1024
    first_bad = ctypes.c_int64(-1)
    while True:
        out = np.empty(cap, dtype=np.uint64)
        got = lib.sketch_hashes(
            seq.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(n),
            ctypes.c_int32(ksize),
            ctypes.c_uint32(seed),
            ctypes.c_uint64(int(max_hash)),
            out.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(cap),
            ctypes.byref(first_bad),
            ctypes.c_int32(n_threads),
        )
        if got >= 0:
            return out[:got], int(first_bad.value)
        cap = int(-got) + 16


def hash_windows(seq: "np.ndarray", ksize: int, seed: int, n_threads: int = 0):
    """murmur64 of every k-byte window (no canonicalization/validity) —
    the protein-family hot loop. Returns uint64[n-k+1] in window order, or
    None if the native library is unavailable."""
    lib = _build_lib()
    if lib is None:
        return None
    seq = np.ascontiguousarray(seq, dtype=np.uint8)
    n = seq.shape[0]
    nwin = n - ksize + 1
    if nwin <= 0:
        return np.zeros(0, dtype=np.uint64)
    out = np.empty(nwin, dtype=np.uint64)
    got = lib.hash_windows(
        seq.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(n),
        ctypes.c_int32(ksize),
        ctypes.c_uint32(seed),
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int32(n_threads),
    )
    return out[: int(got)]
