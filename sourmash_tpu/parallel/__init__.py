"""Multi-chip distribution: device meshes + sharded index queries.

The reference is a single-node CLI tool (SURVEY §2.3: rayon threads +
multiprocessing only). The TPU-native scaling design replaces that with a
`jax.sharding.Mesh` over pod-slice devices:

- the flat index's padded sketch-row tensor `H [m, L]` is sharded across
  the 'shards' mesh axis on the dataset-row dimension (each device holds a
  contiguous block of datasets — model-parallel analog);
- query batches are sharded across the 'data' axis (data parallelism over
  metagenome samples);
- a counter query = a shard_map-ed fused pass: local batched binary-search
  counts, placed at the shard's row offset and combined with `psum` over
  'shards' (so the result is provably replicated);
- a gather round additionally needs the winning dataset's hash row, which
  lives on exactly one shard: a `psum` OR combines the owner's membership
  mask — collectives ride ICI.
"""

from __future__ import annotations

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


def pack_rows(mins_list, n_shards: int):
    """Pack per-dataset sorted hash arrays into one padded row tensor whose
    row count divides n_shards (shard k owns rows [k*per, (k+1)*per)).

    Returns (H [m, L] uint64, lens [m] int32); padding rows have length 0.
    """
    n = len(mins_list)
    L = max((len(m) for m in mins_list), default=0)
    L = max(128, -(-L // 128) * 128)
    per = max(8, -(-n // n_shards))
    m = per * n_shards
    H = np.full((m, L), MAX_U64, dtype=np.uint64)
    lens = np.zeros(m, dtype=np.int32)
    for i, mm in enumerate(mins_list):
        H[i, : len(mm)] = mm
        lens[i] = len(mm)
    return H, lens


def _membership(b_row, q, q_len):
    "Which valid elements of sorted q are present in sorted padded b_row?"
    L = b_row.shape[0]
    idx = jnp.searchsorted(b_row, q)
    idxc = jnp.clip(idx, 0, L - 1)
    return (b_row[idxc] == q) & (jnp.arange(q.shape[0]) < q_len) & (q < MAX_U64)


def make_sharded_counter(mesh: Mesh, n_datasets: int):
    """Compile a sharded counter query:

    (H [m, L], lens [m], q [B, Lq], q_len [B]) -> counts [B, n_datasets]

    H/lens sharded across 'shards' on the row axis; q/q_len sharded across
    'data'; output sharded across 'data', replicated across 'shards'.
    """

    def _local(H, D_lens, q, q_len):
        per = H.shape[0]
        my0 = jax.lax.axis_index("shards").astype(jnp.int32) * per

        def one(qr, ql):
            def vs(b_row, b_len):
                hit = _membership(b_row, qr, ql)
                return jnp.sum(hit.astype(jnp.int32), dtype=jnp.int32)

            return jax.vmap(vs)(H, D_lens)

        local = jax.vmap(one)(q, q_len)  # [b, per]
        # place the local block at its row offset and psum: the result is
        # replicated across 'shards' (which shard_map can infer), unlike
        # an all_gather
        n_shards = jax.lax.psum(1, "shards")
        full = jnp.zeros((q.shape[0], per * n_shards), jnp.int32)
        full = jax.lax.dynamic_update_slice(full, local, (jnp.int32(0), my0))
        full = jax.lax.psum(full, "shards")
        return full[:, :n_datasets]

    f = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(P("shards", None), P("shards"), P("data", None), P("data")),
        out_specs=P("data", None),
    )
    return jax.jit(f)


def make_sharded_gather_round(mesh: Mesh, n_datasets: int):
    """Compile one full gather round over the mesh:

    (H, lens, q [B, Lq], q_len [B], counts [B, n_datasets], thresh [B])
      -> (best [B], best_count [B], new_counts [B, n_datasets],
          new_q [B, Lq], new_q_len [B])

    Per query row: pick the best dataset (argmax, ties to lowest id), mask
    out its hashes from the query (the consume/subtract step), and
    decrement every dataset's counter by its overlap with the removed
    hashes. The winning row lives on one shard; its membership mask is
    combined with a psum-OR. This is the device-side inner loop of
    `gather` — the greedy outer iteration stays on host.
    """

    def _local(H, D_lens, q, q_len, counts, thresh):
        per = H.shape[0]
        my0 = jax.lax.axis_index("shards").astype(jnp.int32) * per

        def one(qr, ql, cnt, th):
            best = jnp.argmax(cnt).astype(jnp.int32)
            best_count = cnt[best]
            active = best_count >= jnp.maximum(th, 1)

            # the winning dataset's row lives on exactly one shard
            local_ix = jnp.clip(best - my0, 0, per - 1)
            owner = (best >= my0) & (best < my0 + per)
            row = H[local_ix]
            in_best_local = _membership(row, qr, ql) & owner
            in_best = jax.lax.psum(in_best_local.astype(jnp.int32), "shards") > 0

            # removed hashes, re-sorted into a padded prefix
            rm = in_best & active
            qrm = jnp.sort(jnp.where(rm, qr, MAX_U64))
            n_rm = jnp.sum(rm.astype(jnp.int32), dtype=jnp.int32)

            # decrement counters by each dataset's overlap with the removal
            def vs(b_row, b_len):
                hit = _membership(b_row, qrm, n_rm)
                return jnp.sum(hit.astype(jnp.int32), dtype=jnp.int32)

            dec_local = jax.vmap(vs)(H, D_lens)  # [per]
            n_shards = jax.lax.psum(1, "shards")
            dec = jnp.zeros(per * n_shards, jnp.int32)
            dec = jax.lax.dynamic_update_slice(dec, dec_local, (my0,))
            dec = jax.lax.psum(dec, "shards")[:n_datasets]

            new_cnt = jnp.where(active, jnp.maximum(cnt - dec, 0), cnt)
            # remove found hashes from the query (keep sorted, pad with MAX)
            keep = (~rm) & (jnp.arange(qr.shape[0]) < ql)
            new_q = jnp.sort(jnp.where(keep, qr, MAX_U64))
            new_len = jnp.sum(keep.astype(jnp.int32), dtype=jnp.int32)
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
            P("shards", None),
            P("shards"),
            P("data", None),
            P("data"),
            P("data", None),
            P("data"),
        ),
        out_specs=(
            P("data"),
            P("data"),
            P("data", None),
            P("data", None),
            P("data"),
        ),
    )
    return jax.jit(f)


def make_sharded_sketch(mesh: Mesh, ksize: int, cap: int, seed: int = 42):
    """Data-parallel sketching: sequence rows shard across 'data'; each
    device runs the fused sketch pipeline on its rows (no collectives —
    sketching is embarrassingly parallel; counting/gather add the
    collectives).

    Returns fn(seqs [B, S] uint8, max_hash scalar) ->
    (survivors [B, cap] uint64, n_valid [B] int32).
    """
    import functools

    from ..ops.sketch import _seq_to_compact_hashes

    @functools.partial(
        jax.shard_map,
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
