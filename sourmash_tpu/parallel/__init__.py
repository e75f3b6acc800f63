"""Multi-chip distribution: device meshes + sharded bucketed-index queries.

The reference is a single-node CLI tool (SURVEY §2.3: rayon threads +
multiprocessing only). The TPU-native scaling design replaces that with a
`jax.sharding.Mesh` over pod-slice devices:

- the flat index's bucketed hi/lo planes `[m, d, B]` (ops/bucketed.py) are
  sharded across the 'shards' mesh axis on the dataset-row dimension (each
  device holds a contiguous block of datasets — model-parallel analog);
- query batches — bucketed query planes `[bq, dq, B]` plus an `alive`
  slot mask — are sharded across the 'data' axis (data parallelism over
  metagenome samples);
- a counter query = a shard_map-ed gather-free dense-compare pass: local
  per-dataset counts, placed at the shard's row offset and combined with
  `psum` over 'shards' (so the result is provably replicated);
- a gather round = argmax -> the winning row's membership bits (owned by
  one shard, combined with a psum-OR) -> `alive &= ~removed` -> counter
  decrements, all inside one jitted shard_map — collectives ride ICI.

The query's hash values never move between hosts after upload; rounds only
exchange [dq, B] bit masks and [m] count vectors.

Counting is EXACT at any scale: the shard packer sizes the bucket slot
depth to the worst observed bucket load (no Poisson-tail spills) and
carries slot validity in occupancy counts rather than a PAD sentinel (so
the all-ones hash 2**64-1 is a legal value) — matching the exactness of
the reference's posting lists
(`/root/reference/src/core/src/index/revindex/disk_revindex.rs:278-299`).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.bucketed import (
    MAX_U64,
    choose_buckets,
    pack_bits_u32 as _pack_bits_u32,
    pack_query_bucketed,
    pack_rows_bucketed,
    popcount_u32 as _popcount_u32,
)


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


def pack_shard_planes(mins_list, n_shards: int, B: int | None = None):
    """Pack per-dataset sorted hash arrays into bucketed u32 planes whose
    row count divides n_shards (shard k owns rows [k*per, (k+1)*per)).

    EXACT by construction: the slot depth d is sized to the maximum bucket
    load over the whole collection, so nothing spills; slot validity is
    carried in per-row occupancy counts (`cnt`) instead of a PAD sentinel,
    so the all-ones hash value 2**64-1 is representable like any other.

    Returns (hi [m, d, B] u32, lo, cnt [m, B] u8, B) — padding rows have
    occupancy 0 everywhere and can never match."""
    if B is None:
        B = choose_buckets(max((len(m) for m in mins_list), default=0))

    n = len(mins_list)
    lens = np.fromiter((len(m) for m in mins_list), dtype=np.int64, count=n)
    N = int(lens.sum())
    per = -(-max(n, 1) // n_shards)
    m_rows = per * n_shards

    if N:
        vals = np.concatenate([np.asarray(m, dtype=np.uint64) for m in mins_list])
        row = np.repeat(np.arange(n, dtype=np.int64), lens)
        b = (vals & np.uint64(B - 1)).astype(np.int64)
        key = row * B + b
        order = np.argsort(key, kind="stable")  # within (row,bucket): asc hash
        ks, vs = key[order], vals[order]
        pos = np.arange(len(ks), dtype=np.int64)
        is_start = np.empty(len(ks), dtype=bool)
        is_start[0] = True
        np.not_equal(ks[1:], ks[:-1], out=is_start[1:])
        slot = pos - np.maximum.accumulate(np.where(is_start, pos, 0))
        d = max(8, int(slot.max()) + 1)
    else:
        d = 8

    hi = np.zeros((m_rows, d, B), dtype=np.uint32)
    lo = np.zeros((m_rows, d, B), dtype=np.uint32)
    cnt = np.zeros((m_rows, B), dtype=np.uint8)
    if N:
        ro = np.repeat(np.arange(n, dtype=np.int64), lens)[order]
        bo = b[order]
        hi[ro, slot, bo] = (vs >> np.uint64(32)).astype(np.uint32)
        lo[ro, slot, bo] = (vs & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        starts = np.flatnonzero(is_start)
        sizes = np.diff(np.concatenate([starts, [len(ks)]]))
        assert sizes.max() <= 255, "bucket load exceeds u8 occupancy"
        cnt.reshape(-1)[ks[starts]] = sizes.astype(np.uint8)
    return hi, lo, cnt, B


def pack_query_batch(queries, B: int):
    """Pack a batch of sorted u64 queries into shared-shape planes.

    Returns (qhi [bq, dq, B] u32, qlo, alive [bq, dq, B] bool) with dq the
    max bucket load over the batch. Slot validity comes from per-bucket
    occupancy (not a PAD sentinel), so 2**64-1 is a legal query hash;
    `alive` marks occupied slots and is the mutable query state during
    gather rounds."""
    bq = len(queries)
    per_q = []
    dq = 8
    for q in queries:
        q = np.asarray(q, dtype=np.uint64)
        b = (q & np.uint64(B - 1)).astype(np.int64)
        order = np.argsort(b, kind="stable")
        bs = b[order]
        cnt = np.bincount(bs, minlength=B).astype(np.int64)
        slot = np.arange(len(bs)) - np.repeat(
            np.cumsum(np.concatenate([[0], cnt[:-1]])), cnt
        ) if len(bs) else np.zeros(0, np.int64)
        per_q.append((q[order], bs, slot, cnt))
        if len(bs):
            dq = max(dq, int(cnt.max()))

    qhi = np.zeros((bq, dq, B), dtype=np.uint32)
    qlo = np.zeros((bq, dq, B), dtype=np.uint32)
    alive = np.zeros((bq, dq, B), dtype=bool)
    for i, (qs, bs, slot, cnt) in enumerate(per_q):
        qhi[i, slot, bs] = (qs >> np.uint64(32)).astype(np.uint32)
        qlo[i, slot, bs] = (qs & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        alive[i, slot, bs] = True
    return qhi, qlo, alive


def _local_counts(Shi, Slo, Scnt, qh, ql, al):
    """[per, d, B] local subject planes (+ [per, B] occupancy) vs one query
    row ([dq, B] planes + alive mask) -> [per] overlap counts. Gather-free
    dense compares; a compare hits only where BOTH the query slot is alive
    and the subject slot is occupied (k2 < cnt), so every u64 value —
    including 2**64-1 — is compared exactly."""
    d = Shi.shape[1]
    acc = jnp.zeros(Shi.shape[0], jnp.int32)
    for k2 in range(d):
        occupied = Scnt[:, None, :] > k2  # [per, 1, B]
        eq = (Shi[:, k2, None, :] == qh[None]) & (Slo[:, k2, None, :] == ql[None])
        acc = acc + jnp.sum(eq & al[None] & occupied, axis=(1, 2), dtype=jnp.int32)
    return acc


def make_sharded_counter(mesh: Mesh, n_datasets: int):
    """Compile a sharded counter query:

    (Shi [m,d,B], Slo, qhi [bq,dq,B], qlo, alive) -> counts [bq, n_datasets]

    Subject planes sharded across 'shards' on the row axis; query planes
    across 'data'; output sharded across 'data', replicated across
    'shards' via psum placement."""

    def _local(Shi, Slo, Scnt, qhi, qlo, alive):
        per = Shi.shape[0]
        my0 = jax.lax.axis_index("shards").astype(jnp.int32) * per

        def one(qh, ql, al):
            return _local_counts(Shi, Slo, Scnt, qh, ql, al)

        local = jax.vmap(one)(qhi, qlo, alive)  # [bq, per]
        n_shards = jax.lax.psum(1, "shards")
        full = jnp.zeros((qhi.shape[0], per * n_shards), jnp.int32)
        full = jax.lax.dynamic_update_slice(full, local, (jnp.int32(0), my0))
        full = jax.lax.psum(full, "shards")
        return full[:, :n_datasets]

    f = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(
            P("shards", None, None),
            P("shards", None, None),
            P("shards", None),
            P("data", None, None),
            P("data", None, None),
            P("data", None, None),
        ),
        out_specs=P("data", None),
    )
    return jax.jit(f)


def _gather_round_body(Shi, Slo, Scnt, my0, n_shards, n_datasets, qh, ql, al, cnt, th):
    """One greedy round for one query row, inside a shard_map context:
    argmax -> owner shard's membership bits (psum-OR) -> alive &= ~removed
    -> counter decrement (placed + psum). Returns
    (new_alive, new_counts, best_id|-1, best_count|0)."""
    per = Shi.shape[0]
    d = Shi.shape[1]
    best = jnp.argmax(cnt).astype(jnp.int32)
    best_count = cnt[best]
    active = best_count >= jnp.maximum(th, 1)

    # the winning dataset's planes live on exactly one shard
    local_ix = jnp.clip(best - my0, 0, per - 1)
    owner = (best >= my0) & (best < my0 + per)
    m = jnp.zeros(qh.shape, jnp.bool_)
    for k2 in range(d):
        m = m | (
            (Shi[local_ix, k2, None, :] == qh)
            & (Slo[local_ix, k2, None, :] == ql)
            & (Scnt[local_ix, None, :] > k2)
        )
    m = m & owner
    m = jax.lax.psum(m.astype(jnp.int32), "shards") > 0
    rm = m & al & active

    dec_local = _local_counts(Shi, Slo, Scnt, qh, ql, rm)  # [per]
    dec = jnp.zeros(per * n_shards, jnp.int32)
    dec = jax.lax.dynamic_update_slice(dec, dec_local, (my0,))
    dec = jax.lax.psum(dec, "shards")[:n_datasets]

    new_cnt = jnp.where(active, jnp.maximum(cnt - dec, 0), cnt)
    new_al = al & ~rm
    return (
        new_al,
        new_cnt,
        jnp.where(active, best, -1),
        jnp.where(active, best_count, 0),
    )


def make_sharded_gather_round(mesh: Mesh, n_datasets: int):
    """Compile one full gather round over the mesh:

    (Shi, Slo, qhi, qlo, alive, counts [bq, n_datasets], thresh [bq])
      -> (best [bq], best_count [bq], new_counts, new_alive)

    Per query row: pick the best dataset (argmax; ties to lowest id,
    matching Counter.most_common insertion order), compute its membership
    bits over the query slots (the owning shard contributes, psum-OR
    combines), clear those slots from `alive` (the consume/subtract step),
    and decrement every dataset's counter by its overlap with the removed
    slots. This is the device-side inner loop of `gather` — the greedy
    outer iteration stays on host."""

    def _local(Shi, Slo, Scnt, qhi, qlo, alive, counts, thresh):
        per = Shi.shape[0]
        my0 = jax.lax.axis_index("shards").astype(jnp.int32) * per
        n_shards = jax.lax.psum(1, "shards")

        def one(qh, ql, al, cnt, th):
            new_al, new_cnt, best, bc = _gather_round_body(
                Shi, Slo, Scnt, my0, n_shards, n_datasets, qh, ql, al, cnt, th
            )
            return best, bc, new_cnt, new_al

        return jax.vmap(one)(qhi, qlo, alive, counts, thresh)

    f = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(
            P("shards", None, None),
            P("shards", None, None),
            P("shards", None),
            P("data", None, None),
            P("data", None, None),
            P("data", None, None),
            P("data", None),
            P("data"),
        ),
        out_specs=(
            P("data"),
            P("data"),
            P("data", None),
            P("data", None, None),
        ),
    )
    return jax.jit(f)


def make_sharded_membership_builder(mesh: Mesh, n_datasets: int):
    """Phase 1 of the fused gather: one dense pass over the sharded index
    extracts each local dataset's intersection with each query as BITPACKED
    membership rows and the initial counts.

    (Shi, Slo, qhi, qlo, alive) ->
      (M [bq, per*n_shards, dq, B/32] u32 sharded over 'shards' on axis 1,
       counts [bq, n_datasets] replicated over 'shards')

    M is built in 4096-row chunks written into one preallocated buffer, so
    peak memory is the packed matrix plus one chunk's compare intermediates
    — the unpacked bools would OOM at GTDB scale (86k x 128 x 2048 = 22 GB).
    """

    def _local(Shi, Slo, Scnt, qhi, qlo, alive):
        per = Shi.shape[0]
        d = Shi.shape[1]
        my0 = jax.lax.axis_index("shards").astype(jnp.int32) * per
        n_shards = jax.lax.psum(1, "shards")
        bq, dq, B = qhi.shape
        row_chunk = min(per, 4096)

        def build_chunk(Chi, Clo, Ccnt, qh, ql, al):
            M = jnp.zeros((Chi.shape[0], dq, B // 32), jnp.uint32)
            for k2 in range(d):
                eq = (
                    (Chi[:, k2, None, :] == qh[None])
                    & (Clo[:, k2, None, :] == ql[None])
                    & al[None]
                    & (Ccnt[:, None, :] > k2)
                )
                M = M | _pack_bits_u32(eq)
            counts = jnp.sum(
                _popcount_u32(M).astype(jnp.int32), axis=(1, 2),
                dtype=jnp.int32,
            )
            return M, counts

        M = jnp.zeros((bq, per, dq, B // 32), jnp.uint32)
        local_counts = jnp.zeros((bq, per), jnp.int32)
        for c0 in range(0, per, row_chunk):
            c1 = min(c0 + row_chunk, per)
            Chi = jax.lax.slice_in_dim(Shi, c0, c1, axis=0)
            Clo = jax.lax.slice_in_dim(Slo, c0, c1, axis=0)
            Ccnt = jax.lax.slice_in_dim(Scnt, c0, c1, axis=0)
            Mc, cc = jax.vmap(
                lambda qh, ql, al: build_chunk(Chi, Clo, Ccnt, qh, ql, al)
            )(qhi, qlo, alive)
            M = jax.lax.dynamic_update_slice_in_dim(M, Mc, c0, axis=1)
            local_counts = jax.lax.dynamic_update_slice_in_dim(
                local_counts, cc, c0, axis=1
            )

        counts = jnp.zeros((bq, per * n_shards), jnp.int32)
        counts = jax.lax.dynamic_update_slice(
            counts, local_counts, (jnp.int32(0), my0)
        )
        counts = jax.lax.psum(counts, "shards")[:, :n_datasets]
        return M, counts

    f = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(
            P("shards", None, None),
            P("shards", None, None),
            P("shards", None),
            P("data", None, None),
            P("data", None, None),
            P("data", None, None),
        ),
        out_specs=(P("data", "shards", None, None), P("data", None)),
    )
    return jax.jit(f)


def make_sharded_gather_rounds(mesh: Mesh, n_datasets: int, max_rounds: int):
    """Phase 2 of the fused gather: lax.scan over greedy rounds on the
    bitpacked membership matrix — argmax, the owner shard's M[best] & alive
    (psum-OR), alive &= ~removed, AND+popcount decrements. The index planes
    are not an input: rounds cost O(n_datasets * query_slots / 32) u32 ops.

    (M, alive [bq, dq, B] bool, counts [bq, n_datasets], thresh [bq])
      -> (best [bq, max_rounds], best_count [bq, max_rounds])"""

    def _local(M, alive, counts, thresh):
        per = M.shape[1]
        my0 = jax.lax.axis_index("shards").astype(jnp.int32) * per
        n_shards = jax.lax.psum(1, "shards")
        alive_p = _pack_bits_u32(alive)  # [bq, dq, B/32]

        def round_one(q_M, q_alive_p, cnt, th):
            best = jnp.argmax(cnt).astype(jnp.int32)
            best_count = cnt[best]
            active = best_count >= jnp.maximum(th, 1)

            local_ix = jnp.clip(best - my0, 0, per - 1)
            owner = (best >= my0) & (best < my0 + per)
            rm = jnp.where(owner & active, q_M[local_ix], jnp.uint32(0))
            rm = rm & q_alive_p
            rm = jax.lax.psum(rm, "shards").astype(jnp.uint32)

            dec_local = jnp.sum(
                _popcount_u32(q_M & rm[None]).astype(jnp.int32),
                axis=(1, 2),
                dtype=jnp.int32,
            )
            dec = jnp.zeros(per * n_shards, jnp.int32)
            dec = jax.lax.dynamic_update_slice(dec, dec_local, (my0,))
            dec = jax.lax.psum(dec, "shards")[:n_datasets]

            new_cnt = jnp.where(active, jnp.maximum(cnt - dec, 0), cnt)
            new_alive_p = q_alive_p & ~rm
            return (
                new_alive_p,
                new_cnt,
                jnp.where(active, best, -1),
                jnp.where(active, best_count, 0),
            )

        def body(carry, _):
            al_p, cnt = carry
            new_al, new_cnt, best, bc = jax.vmap(round_one)(
                M, al_p, cnt, thresh
            )
            return (new_al, new_cnt), (best, bc)

        (_, _), (bests, bcs) = jax.lax.scan(
            body, (alive_p, counts), None, length=max_rounds
        )
        return bests.T, bcs.T

    f = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(
            P("data", "shards", None, None),
            P("data", None, None),
            P("data", None),
            P("data"),
        ),
        out_specs=(P("data", None), P("data", None)),
    )
    return jax.jit(f)


def make_sharded_gather_program(mesh: Mesh, n_datasets: int, max_rounds: int):
    """The end-to-end gather: membership build + all greedy rounds, two
    device dispatches total (split so the index planes and the round
    intermediates never need peak HBM together).

    (Shi, Slo, Scnt, qhi, qlo, alive, thresh)
      -> (best [bq, max_rounds], best_count [bq, max_rounds])"""
    build = make_sharded_membership_builder(mesh, n_datasets)
    rounds = make_sharded_gather_rounds(mesh, n_datasets, max_rounds)

    def fn(Shi, Slo, Scnt, qhi, qlo, alive, thresh):
        M, counts = build(Shi, Slo, Scnt, qhi, qlo, alive)
        return rounds(M, alive, counts, thresh)

    return fn


def make_sharded_bitset_scan(mesh: Mesh, length: int):
    """Greedy gather rounds over a flat [k, W] u32 bitset membership
    matrix with rows sharded across every device (the PRODUCT multi-device
    gather path: `FlatCounterGather` feeds this when >1 device is present,
    so `sourmash gather` rides the mesh with full GatherResult stat parity
    downstream).

    Bit j of word w in row k = (query hash 32w+j) ∈ dataset k. Per round:
    each shard takes a local argmax, shards agree on the global winner via
    a pmax over lexicographic (count, -global id) keys — identical
    tie-breaking to single-device argmax (lowest id wins) and therefore to
    Counter.most_common insertion order; the owner shard contributes the
    winner's live bits (psum-OR), every shard decrements its local rows by
    AND+popcount. Matches the semantics of the reference's greedy loop over
    RocksDB posting lists
    (`/root/reference/src/core/src/index/revindex/disk_revindex.rs:362-466`).

    Returns jit(fn)(M [k,W] u32 sharded on rows, alive_p [W] u32,
    counts [k] i32 sharded, thresh i32 scalar) ->
    ((alive_p, counts), (best [length] i32, best_count [length] i32))
    — same contract as `index.flat._schedule_scan`, chunk-drivable.
    """

    def _local(M, alive_p, cnt, thresh):
        per = M.shape[0]
        my0 = jax.lax.axis_index("shards").astype(jnp.int32) * per

        def body(c, _):
            al, cn = c
            lb = jnp.argmax(cn).astype(jnp.int32)
            lc = cn[lb]
            gid = my0 + lb
            # lexicographic max on (count, -gid): highest count, lowest id
            key = (lc.astype(jnp.int64) << 32) | (
                jnp.int64(0x7FFFFFFF) - gid.astype(jnp.int64)
            )
            gkey = jax.lax.pmax(key, "shards")
            bc = (gkey >> 32).astype(jnp.int32)
            best = (jnp.int64(0x7FFFFFFF) - (gkey & 0x7FFFFFFF)).astype(
                jnp.int32
            )
            active = bc >= thresh
            owner = (best >= my0) & (best < my0 + per)
            local_ix = jnp.clip(best - my0, 0, per - 1)
            rm = jnp.where(owner & active, M[local_ix], jnp.uint32(0)) & al
            rm = jax.lax.psum(rm, "shards")  # one shard contributes: OR
            dec = jnp.sum(
                _popcount_u32(M & rm[None]).astype(jnp.int32),
                axis=1,
                dtype=jnp.int32,
            )
            new_cn = jnp.where(active, jnp.maximum(cn - dec, 0), cn)
            return (al & ~rm, new_cn), (
                jnp.where(active, best, -1),
                jnp.where(active, bc, 0),
            )

        return jax.lax.scan(body, (alive_p, cnt), None, length=length)

    f = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(P("shards", None), P(), P("shards"), P()),
        out_specs=((P(), P("shards")), (P(), P())),
    )
    return jax.jit(f)


def make_data_parallel_schedule_scan(mesh: Mesh, length: int):
    """Per-query gather round scans with the QUERY axis sharded across a
    'data' mesh (config 5's data parallelism): each device scans its block
    of queries' membership matrices independently — no collectives, since
    queries don't interact. Same contract as
    `index.flat._schedule_scan_batch`:

    (M [Q, k, W] u32, alive_p [Q, W] u32, counts [Q, k] i32, thresh [Q])
      -> ((alive_p, counts), (best [Q, length], best_count [Q, length]))
    """

    def _local(M, alive_p, counts, thresh):
        from ..index.flat import _schedule_scan

        def one(Mq, aq, cq, tq):
            return _schedule_scan(Mq, (aq, cq), tq, length)

        return jax.vmap(one)(M, alive_p, counts, thresh)

    f = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(
            P("data", None, None),
            P("data", None),
            P("data", None),
            P("data"),
        ),
        out_specs=(
            (P("data", None), P("data", None)),
            (P("data", None), P("data", None)),
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
