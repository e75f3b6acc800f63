"""Batched set-intersection wrappers (Kernel B) with engine dispatch.

Replaces the reference's per-pair sorted-merge iterator
(`/root/reference/src/core/src/sketch/minhash.rs:915-953,1721-1807`) with
batched device programs. Two engines sit behind the public wrappers
(`_use_bucketed` picks per backend):

- **bucketed** (`ops/bucketed.py`) — the TPU path: gather-free dense
  equality compares over low-bit-bucketed u32 planes. u64 binary search
  lowers to a serial-gather while-loop on TPU (~500x slower measured).
- **sorted** (this module's kernels) — padded sorted `[n, L]` uint64 rows
  + vectorized searchsorted: O(L log L) work that vectorizes well on CPU
  hosts, kept as the CPU default.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

MAX_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _next_pow2(x: int) -> int:
    return 1 << max(0, int(x - 1).bit_length())


def pack_sketches(mins_list, pad_rows=False) -> tuple[np.ndarray, np.ndarray]:
    """Pack a list of sorted uint64 arrays into ([n, L] padded tensor,
    [n] lengths). L is bucketed to the next power of two (>=128, the TPU
    lane width) so device kernels compile once per size class rather than
    once per collection. With pad_rows, n is bucketed the same way (>=8);
    padding rows have length 0 and never match."""
    n = len(mins_list)
    L = max((len(m) for m in mins_list), default=0)
    L = _next_pow2(max(128, L))
    rows = _next_pow2(max(8, n)) if pad_rows else n
    H = np.full((rows, L), MAX_U64, dtype=np.uint64)
    lens = np.zeros(rows, dtype=np.int32)
    for i, m in enumerate(mins_list):
        H[i, : len(m)] = m
        lens[i] = len(m)
    return H, lens


def pack_query(q_mins: np.ndarray) -> tuple[np.ndarray, int]:
    "Pad one sorted query row to a power-of-two length (>=128)."
    n = len(q_mins)
    L = _next_pow2(max(128, n))
    q = np.full(L, MAX_U64, dtype=np.uint64)
    q[:n] = q_mins
    return q, n


_ROW_BLOCK = 8  # query rows per device call in the all-pairs matrix


@jax.jit
def _query_block_vs_many_counts(qs, q_lens, H, lens):
    """[B, Lq] query rows vs [n, L] rows -> [B, n] intersection counts.

    The building block for the all-pairs matrix: the host streams query-row
    blocks through this so the hit-mask intermediate stays [B, n, L]
    (bounded) instead of [n, n, L] (OOMs HBM for a few hundred genome-scale
    sketches), and each device program stays small."""
    L = H.shape[1]
    col_q = jnp.arange(qs.shape[1])

    def one(q, q_len):
        valid_q = col_q < q_len

        def vs(b_row, b_len):
            idx = jnp.searchsorted(b_row, q)
            idxc = jnp.clip(idx, 0, L - 1)
            hit = (idx < b_len) & (b_row[idxc] == q) & valid_q
            return jnp.sum(hit.astype(jnp.int32))

        return jax.vmap(vs)(H, lens)

    return jax.vmap(one)(qs, q_lens)


def _pairwise_counts(H, lens):
    """[n, L] sorted padded rows -> [n, n] intersection-count matrix,
    computed in _ROW_BLOCK-row slabs on device, assembled on host."""
    n = H.shape[0]
    out = np.empty((n, n), dtype=np.int32)
    Hj = jnp.asarray(H)
    lj = jnp.asarray(lens)
    for i in range(0, n, _ROW_BLOCK):
        qs = jax.lax.dynamic_slice_in_dim(Hj, i, _ROW_BLOCK, axis=0)
        qlens = jax.lax.dynamic_slice_in_dim(lj, i, _ROW_BLOCK, axis=0)
        out[i : i + _ROW_BLOCK] = np.asarray(
            _query_block_vs_many_counts(qs, qlens, Hj, lj)
        )
    return out


@jax.jit
def _query_vs_many_counts(q, q_len, H, lens):
    """[Lq] query row vs [n, L] rows -> [n] intersection counts.

    Lq is independent of L: the query is binary-searched into each subject
    row, so padding buckets for queries and subjects need not agree."""
    L = H.shape[1]
    valid_q = jnp.arange(q.shape[0]) < q_len

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
    valid_q = jnp.arange(q.shape[0]) < q_len

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


def _use_bucketed() -> bool:
    """Engine selection. The bucketed dense-compare engine (ops/bucketed.py)
    is the TPU path: binary search lowers to serial gathers there (~12 s per
    8x512 genome block measured on v5e), while dense equality compares run
    at full VPU rate. On CPU the searchsorted kernels vectorize fine and do
    O(L log L) work instead of O(B*d*dq), so they stay the default."""
    import os

    mode = os.environ.get("SOURMASH_TPU_ENGINE", "auto")
    if mode == "bucketed":
        return True
    if mode == "sorted":
        return False
    from sourmash_tpu.ops import default_backend

    return default_backend() != "cpu"


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
    query_mins = np.asarray(query_mins, dtype=np.uint64)
    cuts = np.asarray(pair_cutoffs, dtype=np.uint64)
    if _use_bucketed():
        from . import bucketed

        B = bucketed.choose_buckets(max((len(m) for m in mins_list), default=0))
        bank = bucketed.pack_rows_bucketed(list(mins_list), B)
        shared = bucketed.query_cutoff_counts_bucketed(query_mins, bank, cuts)
        # sizes under the cutoff come from host binary search on the
        # (already sorted) mins — O(n log L), no device work needed
        q_sizes = np.searchsorted(query_mins, cuts, side="right").astype(np.int64)
        s_sizes = np.fromiter(
            (
                np.searchsorted(np.asarray(m, dtype=np.uint64), c, side="right")
                for m, c in zip(mins_list, cuts)
            ),
            dtype=np.int64,
            count=n,
        )
        return shared, q_sizes, s_sizes
    H, lens = pack_sketches(list(mins_list), pad_rows=True)
    q, q_len = pack_query(query_mins)
    cut = np.full(len(lens), MAX_U64, dtype=np.uint64)
    cut[:n] = cuts
    shared, qs, ss = _query_vs_many_cutoffs(
        jnp.asarray(q),
        jnp.asarray(q_len),
        jnp.asarray(H),
        jnp.asarray(lens),
        jnp.asarray(cut),
        jnp.asarray(cut),
    )
    return (
        np.asarray(shared)[:n].astype(np.int64),
        np.asarray(qs)[:n].astype(np.int64),
        np.asarray(ss)[:n].astype(np.int64),
    )


# Below this much total merge work, host np.intersect1d beats any device
# dispatch (a tunneled chip costs ~40 ms RTT + compile per new shape).
_HOST_WORK_CUTOFF = 2_000_000


def _host_pairwise_counts(mins_list, n):
    counts = np.zeros((n, n), dtype=np.int64)
    for i in range(n):
        counts[i, i] = len(mins_list[i])
        for j in range(i + 1, n):
            c = len(np.intersect1d(mins_list[i], mins_list[j], assume_unique=True))
            counts[i, j] = counts[j, i] = c
    return counts


def pairwise_intersection_counts(mins_list) -> np.ndarray:
    "Host wrapper: list of sorted uint64 arrays -> [n, n] count matrix."
    n = len(mins_list)
    if not n:
        return np.zeros((0, 0), dtype=np.int64)
    if n * sum(len(m) for m in mins_list) < _HOST_WORK_CUTOFF:
        return _host_pairwise_counts(mins_list, n)
    if _use_bucketed():
        from . import bucketed

        return bucketed.pairwise_counts_bucketed(mins_list)
    H, lens = pack_sketches(mins_list, pad_rows=True)
    out = _pairwise_counts(jnp.asarray(H), jnp.asarray(lens))
    return np.asarray(out)[:n, :n].astype(np.int64)


def query_intersection_counts(query_mins, mins_list) -> np.ndarray:
    "Host wrapper: one query vs many sketches -> [n] counts."
    n = len(mins_list)
    if not n:
        return np.zeros(0, dtype=np.int64)
    total = len(query_mins) * n + sum(len(m) for m in mins_list)
    if total < _HOST_WORK_CUTOFF:
        q = np.asarray(query_mins, dtype=np.uint64)
        return np.array(
            [len(np.intersect1d(q, m, assume_unique=True)) for m in mins_list],
            dtype=np.int64,
        )
    if _use_bucketed():
        from . import bucketed

        B = bucketed.choose_buckets(max((len(m) for m in mins_list), default=0))
        bank = bucketed.pack_rows_bucketed(list(mins_list), B)
        return bucketed.query_counts_bucketed(
            np.asarray(query_mins, dtype=np.uint64), bank
        )
    H, lens = pack_sketches(mins_list, pad_rows=True)
    q, q_len = pack_query(query_mins)
    out = _query_vs_many_counts(
        jnp.asarray(q), jnp.asarray(q_len), jnp.asarray(H), jnp.asarray(lens)
    )
    return np.asarray(out)[:n].astype(np.int64)
