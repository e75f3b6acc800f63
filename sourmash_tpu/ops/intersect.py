"""Batched set-intersection ops over padded sketch tensors (Kernel B).

Replaces the reference's per-pair sorted-merge iterator
(`/root/reference/src/core/src/sketch/minhash.rs:915-953,1721-1807`) with one
device program computing the whole intersection-count matrix: sketches are
packed into a `[n, L]` uint64 tensor (rows sorted ascending, padded with
2^64-1), and membership is resolved with vectorized binary search
(searchsorted) — O(n² · L · log L) elementwise work that XLA tiles across the
VPU, instead of n²/2 sequential Python/FFI calls.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

MAX_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def pack_sketches(mins_list) -> tuple[np.ndarray, np.ndarray]:
    """Pack a list of sorted uint64 arrays into ([n, L] padded tensor,
    [n] lengths). L is rounded up to a multiple of 128 (TPU lane width)."""
    n = len(mins_list)
    L = max((len(m) for m in mins_list), default=0)
    L = max(128, -(-L // 128) * 128)
    H = np.full((n, L), MAX_U64, dtype=np.uint64)
    lens = np.zeros(n, dtype=np.int32)
    for i, m in enumerate(mins_list):
        H[i, : len(m)] = m
        lens[i] = len(m)
    return H, lens


@jax.jit
def _pairwise_counts(H, lens):
    """[n, L] sorted padded rows -> [n, n] intersection-count matrix."""
    n, L = H.shape
    col = jnp.arange(L)

    def one_vs_all(a_row, a_len):
        valid_a = col < a_len

        def vs(b_row, b_len):
            idx = jnp.searchsorted(b_row, a_row)
            idxc = jnp.clip(idx, 0, L - 1)
            hit = (idx < b_len) & (b_row[idxc] == a_row) & valid_a
            return jnp.sum(hit.astype(jnp.int32))

        return jax.vmap(vs)(H, lens)

    return jax.vmap(one_vs_all)(H, lens)


@jax.jit
def _query_vs_many_counts(q, q_len, H, lens):
    """[L] query row vs [n, L] rows -> [n] intersection counts."""
    L = H.shape[1]
    col = jnp.arange(L)
    valid_q = col < q_len

    def vs(b_row, b_len):
        idx = jnp.searchsorted(b_row, q)
        idxc = jnp.clip(idx, 0, L - 1)
        hit = (idx < b_len) & (b_row[idxc] == q) & valid_q
        return jnp.sum(hit.astype(jnp.int32))

    return jax.vmap(vs)(H, lens)


@jax.jit
def _query_vs_many_cutoffs(q, q_len, H, lens, cut_q, cut_s):
    """Query vs many with per-pair scaled cutoffs.

    cut_q[i]: cutoff applied to the query for pair i (2^64-1 = none);
    cut_s[i]: cutoff applied to subject i. Returns (shared, q_size, s_size)
    per pair, matching the reference's pairwise downsample semantics.
    """
    L = H.shape[1]
    col = jnp.arange(L)
    valid_q = col < q_len

    def vs(b_row, b_len, cq, cs):
        both = jnp.minimum(cq, cs)
        idx = jnp.searchsorted(b_row, q)
        idxc = jnp.clip(idx, 0, L - 1)
        hit = (idx < b_len) & (b_row[idxc] == q) & valid_q & (q <= both)
        shared = jnp.sum(hit.astype(jnp.int32))
        q_size = jnp.sum((valid_q & (q <= cq)).astype(jnp.int32))
        s_size = jnp.sum(((col < b_len) & (b_row <= cs)).astype(jnp.int32))
        return shared, q_size, s_size

    return jax.vmap(vs)(H, lens, cut_q, cut_s)


def query_vs_many_cutoff_counts(query_mins, mins_list, pair_cutoffs):
    """Host wrapper for per-pair-downsampled query-vs-many scoring.

    pair_cutoffs[i] is the max_hash of the pair's common scaled
    (see `Index._find_batched`). Cutoffs are applied to whichever side has
    hashes above them, reproducing flatten_and_downsample_scaled exactly.
    Returns (shared [n], query_sizes [n], subject_sizes [n]).
    """
    n = len(mins_list)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    H, lens = pack_sketches(list(mins_list) + [query_mins])
    q = H[-1]
    q_len = lens[-1]
    H, lens = H[:-1], lens[:-1]
    cut = np.asarray(pair_cutoffs, dtype=np.uint64)
    shared, qs, ss = _query_vs_many_cutoffs(
        jnp.asarray(q),
        jnp.asarray(q_len),
        jnp.asarray(H),
        jnp.asarray(lens),
        jnp.asarray(cut),
        jnp.asarray(cut),
    )
    return (
        np.asarray(shared).astype(np.int64),
        np.asarray(qs).astype(np.int64),
        np.asarray(ss).astype(np.int64),
    )


def pairwise_intersection_counts(mins_list) -> np.ndarray:
    "Host wrapper: list of sorted uint64 arrays -> [n, n] count matrix."
    if not mins_list:
        return np.zeros((0, 0), dtype=np.int64)
    H, lens = pack_sketches(mins_list)
    return np.asarray(_pairwise_counts(jnp.asarray(H), jnp.asarray(lens))).astype(
        np.int64
    )


def query_intersection_counts(query_mins, mins_list) -> np.ndarray:
    "Host wrapper: one query vs many sketches -> [n] counts."
    if not mins_list:
        return np.zeros(0, dtype=np.int64)
    H, lens = pack_sketches(list(mins_list) + [query_mins])
    q = H[-1]
    q_len = lens[-1]
    H, lens = H[:-1], lens[:-1]
    out = _query_vs_many_counts(
        jnp.asarray(q), jnp.asarray(q_len), jnp.asarray(H), jnp.asarray(lens)
    )
    return np.asarray(out).astype(np.int64)
