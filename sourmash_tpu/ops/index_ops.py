"""Kernel C: flat inverted-index query ops.

Replaces the reference RocksDB RevIndex query path
(`/root/reference/src/core/src/index/revindex/disk_revindex.rs:278-341`,
posting-list `multi_get` → SigCounter) with a device-resident design: the
whole index is two dense tensors — `H [N] uint64` (sorted (hash, dataset)
pairs' hashes) and `D [N] int32` (dataset ids) — and a counter query is one
fused pass: vectorized binary-search membership of every index hash in the
query, then a segment-sum over dataset ids. O(N log Q) elementwise work,
HBM-bandwidth bound, trivially shardable by splitting the pair arrays.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

MAX_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _membership(q, q_len, H):
    "For each element of H, is it present in sorted query prefix q[:q_len]?"
    idx = jnp.searchsorted(q, H)
    idxc = jnp.clip(idx, 0, q.shape[0] - 1)
    return (idx < q_len) & (q[idxc] == H)


@functools.partial(jax.jit, static_argnames=("n_datasets",))
def counts_for_query(H, D, q, q_len, *, n_datasets: int):
    """Per-dataset overlap counts between the query and the index.

    H: [N] uint64 pair hashes (any order); D: [N] int32 dataset ids
    (padding rows use id = n_datasets); q: [Lq] sorted uint64 with MAX_U64
    padding; q_len: valid prefix length. Returns int32 [n_datasets].
    """
    hit = _membership(q, q_len, H)
    seg = jax.ops.segment_sum(
        hit.astype(jnp.int32), D, num_segments=n_datasets + 1
    )
    return seg[:n_datasets]


def build_pairs(mins_list):
    """Build (H, D) pair tensors from per-dataset sorted hash arrays.

    Pairs are sorted by hash (ties by dataset id, by construction of the
    stable sort). Returns (H [N] uint64, D [N] int32).
    """
    n = len(mins_list)
    if n == 0:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int32)
    H = np.concatenate([np.asarray(m, dtype=np.uint64) for m in mins_list])
    D = np.concatenate(
        [np.full(len(m), i, dtype=np.int32) for i, m in enumerate(mins_list)]
    )
    order = np.argsort(H, kind="stable")
    return H[order], D[order]


def pad_query(q_mins: np.ndarray, bucket: int = 128):
    "Pad a sorted query to a bucketed length with MAX_U64; return (q, len)."
    n = len(q_mins)
    L = max(bucket, -(-n // bucket) * bucket)
    q = np.full(L, MAX_U64, dtype=np.uint64)
    q[:n] = q_mins
    return q, n
