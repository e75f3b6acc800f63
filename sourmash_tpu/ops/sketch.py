"""Batched DNA k-mer sketching ops (Kernel A of the TPU design).

Replaces the reference per-k-mer hot loop (`SeqToHashes::next`,
`/root/reference/src/core/src/signature.rs:246-306`, plus
`add_hash_with_abundance`, `sketch/minhash.rs:309-383`) with one vectorized
device pass: a sequence byte tensor is expanded into all k-length windows,
canonicalized against the reverse complement, murmur-hashed, masked by
validity (ACGT-only windows) and the scaled threshold, then sorted so that
valid survivors form a prefix.  The host merges per-chunk survivor slices.

Record boundaries are handled by joining records with (k-1) 'N' separator
bytes: windows spanning a boundary contain an invalid byte and are dropped,
which reproduces per-record iteration semantics exactly.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .murmur import murmur3_x64_128_first64

# --- host-side tables ----------------------------------------------------

# complement table: A<->T, C<->G; everything else -> 0 (invalid anyway).
# (reference semantics: encodings.rs:85-101)
COMPLEMENT = np.zeros(256, dtype=np.uint8)
for a, b in [(b"A", b"T"), (b"C", b"G"), (b"G", b"C"), (b"T", b"A"), (b"N", b"N")]:
    COMPLEMENT[a[0]] = b[0]

VALID = np.zeros(256, dtype=bool)
for c in b"ACGT":
    VALID[c] = True

# uppercase mapping for ASCII
UPPER = np.arange(256, dtype=np.uint8)
UPPER[ord("a") : ord("z") + 1] = np.arange(ord("A"), ord("Z") + 1, dtype=np.uint8)

MAX_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _windows(seq, n, ksize):
    """[S] uint8 -> [n, ksize] all k-length windows (static shapes)."""
    cols = [lax.slice(seq, (i,), (i + n,)) for i in range(ksize)]
    return jnp.stack(cols, axis=1)


@functools.partial(jax.jit, static_argnames=("ksize", "seed"))
def _seq_to_sorted_hashes(seq, max_hash, ksize: int, seed: int):
    """Core device op.

    seq: [S] uint8, already uppercased. max_hash: scalar uint64 threshold
    (2^64-1 for num sketches = keep everything).
    Returns (sorted_hashes [S-k+1] uint64 with survivors first, n_valid).
    """
    S = seq.shape[0]
    n = S - ksize + 1

    comp = jnp.asarray(COMPLEMENT)[seq]
    rc_seq = comp[::-1]

    fwd = _windows(seq, n, ksize)
    # window i's revcomp = rc_seq[S-k-i : S-i] -> rows of rc windows, reversed
    rcw = _windows(rc_seq, n, ksize)[::-1]

    # validity: window has no non-ACGT byte
    valid_pos = jnp.asarray(VALID)[seq]
    bad = (~valid_pos).astype(jnp.int32)
    cs = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(bad)])
    window_valid = (cs[ksize:] - cs[:-ksize]) == 0

    # canonical = min(fwd, rc) byte-lexicographically (signature.rs:299)
    diff = fwd != rcw
    any_diff = jnp.any(diff, axis=1)
    first = jnp.argmax(diff, axis=1)
    fb = jnp.take_along_axis(fwd, first[:, None], axis=1)[:, 0]
    rb = jnp.take_along_axis(rcw, first[:, None], axis=1)[:, 0]
    use_fwd = (~any_diff) | (fb < rb)
    canon = jnp.where(use_fwd[:, None], fwd, rcw)

    h = murmur3_x64_128_first64(canon, ksize, seed, xp=jnp)

    keep = window_valid & (h <= max_hash)
    h_masked = jnp.where(keep, h, MAX_U64)
    n_valid = jnp.sum(keep.astype(jnp.int32))
    # sort ascending: survivors form a prefix of length >= n_valid
    # (equal-to-sentinel real hashes are interchangeable with padding)
    h_sorted = jnp.sort(h_masked)
    return h_sorted, n_valid


def seq_chunks_to_hashes(
    seq_bytes: bytes,
    ksize: int,
    max_hash: int,
    seed: int = 42,
    chunk: int = 1 << 21,
    cap: int | None = None,
):
    """Host driver: raw sequence bytes -> np.uint64 array of surviving window
    hashes (with multiplicity, unsorted across chunks).

    `seq_bytes` may be a multi-record buffer pre-joined with (k-1) b'N'
    separators. Uppercasing is applied here. `cap`: per-chunk device->host
    transfer cap; if the survivor count exceeds it, the full chunk slice is
    transferred instead (correctness never depends on cap).
    """
    arr = np.frombuffer(seq_bytes, dtype=np.uint8)
    arr = UPPER[arr]
    S = arr.shape[0]
    if S < ksize:
        return np.zeros(0, dtype=np.uint64)

    if S < (1 << 16):
        # small input: the host numpy twin beats device-dispatch overhead
        from .encodings import dna_hashes

        h, valid = dna_hashes(arr, ksize, seed)
        keep = valid & (h <= np.uint64(max_hash))
        return h[keep]

    out = []
    # chunk boundaries overlap by (k-1) so every window is covered exactly once
    starts = list(range(0, max(S - ksize + 1, 1), chunk))
    mh = np.uint64(max_hash)
    for s in starts:
        e = min(s + chunk + ksize - 1, S)
        piece = arr[s:e]
        if piece.shape[0] < ksize:
            continue
        # pad to the fixed chunk length so jit compiles once
        pad = (chunk + ksize - 1) - piece.shape[0]
        if pad > 0:
            piece = np.concatenate([piece, np.zeros(pad, dtype=np.uint8)])
        h_sorted, n_valid = _seq_to_sorted_hashes(jnp.asarray(piece), mh, ksize, seed)
        nv = int(n_valid)
        if nv == 0:
            continue
        if cap is not None and nv <= cap:
            vals = np.asarray(h_sorted[:cap])[:nv]
        else:
            vals = np.asarray(h_sorted)[:nv]
        out.append(vals)
    if not out:
        return np.zeros(0, dtype=np.uint64)
    return np.concatenate(out)


def hashes_to_mins(hashes: np.ndarray, track_abundance: bool):
    """Survivor hash multiset -> (sorted unique mins, abundances|None)."""
    if hashes.size == 0:
        empty = np.zeros(0, dtype=np.uint64)
        return empty, (np.zeros(0, dtype=np.uint64) if track_abundance else None)
    if track_abundance:
        mins, counts = np.unique(hashes, return_counts=True)
        return mins.astype(np.uint64), counts.astype(np.uint64)
    return np.unique(hashes).astype(np.uint64), None
