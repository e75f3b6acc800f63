"""Kernel C: flat device-resident index query ops.

Replaces the reference RocksDB RevIndex query path
(`/root/reference/src/core/src/index/revindex/disk_revindex.rs:278-341`,
posting-list `multi_get` -> SigCounter) with a TPU-native design: the
collection's sketches live on device as dense padded row tensors, bucketed
by sketch length into "banks" `H [m, L] uint64` (rows sorted ascending,
MAX_U64 padding) with `lens [m] int32` and a host-side dataset-id map. A
counter query binary-searches the query into every row in one fused
vmapped pass per bank — O(n · Lq · log L) elementwise work that XLA tiles
across the VPU with no gather/scatter over a giant posting array.

(An earlier flat (hash, dataset-id) pair design — the literal analog of the
RocksDB layout — measured ~18,000x slower on a v5e chip at 10k genomes:
searchsorted + segment_sum over a 50M-row array is gather/scatter-bound,
while the row-bank form is a dense batched binary search.)
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .intersect import MAX_U64, _next_pow2, _query_vs_many_counts, pack_query


class Bank:
    """One padded row bucket: rows [m, L] u64 on device, lens [m] i32,
    and the dataset ids [m] (host) the rows belong to."""

    __slots__ = ("H", "lens", "ids")

    def __init__(self, H, lens, ids):
        self.H = H
        self.lens = lens
        self.ids = ids


def build_banks(mins_list, max_rows_waste=0.25) -> list[Bank]:
    """Bucket per-dataset sorted hash arrays by padded length and pack each
    bucket into a device bank.

    Buckets are powers of two >= 128, so HBM waste from padding is < 2x
    even for heavily skewed collections (vs. padding everything to the
    global max). Row counts are bucketed to powers of two as well so the
    counting kernel compiles once per (m, L, Lq) size class.
    """
    buckets: dict[int, list[int]] = {}
    for i, m in enumerate(mins_list):
        L = _next_pow2(max(128, len(m)))
        buckets.setdefault(L, []).append(i)

    banks = []
    for L, idxs in sorted(buckets.items()):
        n = len(idxs)
        rows = _next_pow2(max(8, n))
        H = np.full((rows, L), MAX_U64, dtype=np.uint64)
        lens = np.zeros(rows, dtype=np.int32)
        ids = np.full(rows, -1, dtype=np.int32)
        for r, i in enumerate(idxs):
            m = mins_list[i]
            H[r, : len(m)] = m
            lens[r] = len(m)
            ids[r] = i
        banks.append(Bank(jnp.asarray(H), jnp.asarray(lens), ids))
    return banks


def counts_for_banks(banks, query_mins: np.ndarray, n_datasets: int) -> np.ndarray:
    "Per-dataset overlap counts of the sorted query with every bank row."
    counts = np.zeros(n_datasets, dtype=np.int32)
    if not len(query_mins):
        return counts
    q, q_len = pack_query(np.asarray(query_mins, dtype=np.uint64))
    qj = jnp.asarray(q)
    for bank in banks:
        out = np.asarray(_query_vs_many_counts(qj, q_len, bank.H, bank.lens))
        real = bank.ids >= 0
        counts[bank.ids[real]] = out[real]
    return counts
