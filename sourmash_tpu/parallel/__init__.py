"""Multi-chip distribution: device meshes + sharded index queries.

The reference is a single-node CLI tool (SURVEY §2.3: rayon threads +
multiprocessing only). The TPU-native scaling design replaces that with a
`jax.sharding.Mesh` over pod-slice devices:

- the flat index's (hash, dataset) pair tensors are sharded across the
  'shards' mesh axis (each device holds an equal slice of the postings —
  any partition is valid because per-dataset counts are summed with psum);
- query batches are sharded across the 'data' axis (data parallelism over
  metagenome samples);
- one gather round = a shard_map-ed fused pass: local membership +
  segment-sum, then `psum` over 'shards' — collectives ride ICI.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.index_ops import MAX_U64


def get_mesh(n_data: int = 1, n_shards: int | None = None, devices=None):
    "Build a (data, shards) mesh over the available devices."
    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    if n_shards is None:
        n_shards = n_dev // n_data
    assert n_data * n_shards == n_dev, (n_data, n_shards, n_dev)
    dev_array = np.array(devices).reshape(n_data, n_shards)
    return Mesh(dev_array, axis_names=("data", "shards"))


def shard_pairs(H: np.ndarray, D: np.ndarray, n_shards: int, n_datasets: int):
    """Pad (H, D) pair arrays so they split evenly across n_shards.

    Padding rows use hash MAX_U64 and dataset id n_datasets (an overflow
    bin dropped by the counting kernel)."""
    N = len(H)
    per = -(-N // n_shards)
    per = max(128, -(-per // 128) * 128)
    Np = per * n_shards
    Hp = np.full(Np, MAX_U64, dtype=np.uint64)
    Dp = np.full(Np, n_datasets, dtype=np.int32)
    Hp[:N] = H
    Dp[:N] = D
    return Hp, Dp


def make_sharded_counter(mesh: Mesh, n_datasets: int):
    """Compile a sharded counter query:

    (H [N], D [N], q [B, Lq], q_len [B]) -> counts [B, n_datasets]

    H/D sharded across 'shards'; q/q_len sharded across 'data'; output
    sharded across 'data' and replicated across 'shards'.
    """

    def _local(H, D, q, q_len):
        # q: [b, Lq] local batch; H/D: local pair shard
        def one(qr, ql):
            idx = jnp.searchsorted(qr, H)
            idxc = jnp.clip(idx, 0, qr.shape[0] - 1)
            hit = (idx < ql) & (qr[idxc] == H)
            seg = jax.ops.segment_sum(
                hit.astype(jnp.int32), D, num_segments=n_datasets + 1
            )
            return seg[:n_datasets]

        local = jax.vmap(one)(q, q_len)
        return jax.lax.psum(local, "shards")

    f = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(P("shards"), P("shards"), P("data"), P("data")),
        out_specs=P("data"),
    )
    return jax.jit(f)


def make_sharded_gather_round(mesh: Mesh, n_datasets: int):
    """Compile one full gather round over the mesh:

    (H, D, q [B, Lq], q_len [B], counts [B, n_datasets], thresh [B])
      -> (best [B], best_count [B], new_counts [B, n_datasets],
          new_q [B, Lq], new_q_len [B])

    Per query row: pick the best dataset (argmax, ties to lowest id), mask
    out its hashes from the query (the consume/subtract step), and
    decrement every dataset's counter by its overlap with the removed
    hashes. This is the device-side inner loop of `gather` — the greedy
    outer iteration stays on host.
    """

    def _local(H, D, q, q_len, counts, thresh):
        def one(qr, ql, cnt, th):
            best = jnp.argmax(cnt)
            best_count = cnt[best]
            active = best_count >= jnp.maximum(th, 1)

            # hashes of the best dataset: membership of q in dataset 'best'
            sel = D == best
            Hsel = jnp.where(sel, H, MAX_U64)
            Hsel = jnp.sort(Hsel)
            idx = jnp.searchsorted(Hsel, qr)
            idxc = jnp.clip(idx, 0, Hsel.shape[0] - 1)
            in_best_local = Hsel[idxc] == qr
            col = jnp.arange(qr.shape[0])
            in_best_local = in_best_local & (col < ql)
            # a hash may live on another shard: OR across shards
            in_best = jax.lax.psum(in_best_local.astype(jnp.int32), "shards") > 0

            # decrement counters by overlap of removed hashes w/ each dataset
            qrm = jnp.where(in_best & active, qr, MAX_U64)
            qrm = jnp.sort(qrm)
            n_rm = jnp.sum((in_best & active).astype(jnp.int32))
            idx2 = jnp.searchsorted(qrm, H)
            idx2c = jnp.clip(idx2, 0, qrm.shape[0] - 1)
            hit2 = (idx2 < n_rm) & (qrm[idx2c] == H)
            dec = jax.ops.segment_sum(
                hit2.astype(jnp.int32), D, num_segments=n_datasets + 1
            )[:n_datasets]
            dec = jax.lax.psum(dec, "shards")

            new_cnt = jnp.where(active, jnp.maximum(cnt - dec, 0), cnt)
            # remove found hashes from the query (keep sorted, pad with MAX)
            keep = (~(in_best & active)) & (col < ql)
            new_q = jnp.sort(jnp.where(keep, qr, MAX_U64))
            new_len = jnp.sum(keep.astype(jnp.int32))
            return (
                jnp.where(active, best, -1),
                jnp.where(active, best_count, 0),
                new_cnt,
                new_q,
                new_len,
            )

        return jax.vmap(one)(q, q_len, counts, thresh)

    f = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(
            P("shards"),
            P("shards"),
            P("data"),
            P("data"),
            P("data"),
            P("data"),
        ),
        out_specs=(P("data"), P("data"), P("data"), P("data"), P("data")),
    )
    return jax.jit(f)


def make_sharded_sketch(mesh: Mesh, ksize: int, cap: int, seed: int = 42):
    """Data-parallel sketching: sequence rows shard across 'data'; each
    device runs the fused sketch pipeline on its rows (no collectives —
    sketching is embarrassingly parallel; counting/gather add the psum).

    Returns fn(seqs [B, S] uint8, max_hash scalar) ->
    (survivors [B, cap] uint64, n_valid [B] int32).
    """
    from jax.experimental.shard_map import shard_map

    from ..ops.sketch import _seq_to_compact_hashes

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("data", None), P()),
        out_specs=(P("data", None), P("data")),
    )
    def _sketch(seqs, max_hash):
        def one(seq):
            return _seq_to_compact_hashes(seq, max_hash[0], ksize, seed, cap)

        return jax.vmap(one)(seqs)

    @jax.jit
    def fn(seqs, max_hash):
        return _sketch(seqs, jnp.atleast_1d(max_hash))

    return fn
