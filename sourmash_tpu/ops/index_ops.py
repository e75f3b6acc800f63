"""Kernel C: flat device-resident index query ops.

Replaces the reference RocksDB RevIndex query path
(`/root/reference/src/core/src/index/revindex/disk_revindex.rs:278-341`,
posting-list `multi_get` -> SigCounter) with a TPU-native design: the
collection's sketches live on device as bucketed u32 hi/lo planes
(`ops/bucketed.py`), grouped into "banks" by sketch-length class and
split into row chunks. A counter query is one dense gather-free compare
pass per chunk; chunk dispatches are issued async and read back together,
so the device pipeline stays full.

(Two earlier designs measured on a v5e chip: a flat (hash, dataset-id)
pair tensor — the literal RocksDB analog — was gather/scatter-bound and
~18,000x slower than this; sorted padded rows + batched binary search
was ~500x slower, because u64 searchsorted lowers to a serial-gather
while-loop.)
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .bucketed import (
    MAX_U64,
    choose_buckets,
    membership_matrix,
    pack_query_bucketed,
    pack_rows_bucketed,
    query_counts_bucketed,
    query_cutoff_counts_bucketed,
)

_CHUNK_ROWS = 8192  # max rows per packed chunk (bounds compile size classes)

# beyond-HBM streaming: at most this many chunks' planes may be in flight
# (enqueued-but-undrained) at once — each streamed dispatch uploads its
# chunk's planes, and host->device transfers run ahead of compute, so an
# unbounded enqueue would make every chunk device-resident simultaneously
# and defeat the point of streaming.
_STREAM_WINDOW = 4


class Bank:
    """One length-class bank: a list of bucketed row chunks plus the
    dataset ids (host) each chunk's rows belong to."""

    __slots__ = ("chunks", "ids", "B")

    def __init__(self, chunks, ids, B):
        self.chunks = chunks  # list of BucketedRows
        self.ids = ids  # list of int32 arrays, one per chunk
        self.B = B


# Collections whose packed planes exceed this stay host-resident (numpy /
# mmap); each chunk is streamed to the device per query pass instead of
# living in HBM. Override with SOURMASH_TPU_HBM_BUDGET_BYTES.
def _hbm_budget_bytes() -> int:
    import os

    return int(float(os.environ.get("SOURMASH_TPU_HBM_BUDGET_BYTES", 12e9)))


def _planes_nbytes(banks) -> int:
    total = 0
    for bank in banks:
        for chunk in bank.chunks:
            total += chunk.hi.nbytes + chunk.lo.nbytes + chunk.cnt.nbytes
    return total


def _to_device_resident(banks) -> None:
    "Upload every chunk's planes, one chunk at a time (bounds peak host RSS)."
    from .bucketed import BucketedRows

    for bank in banks:
        for i, c in enumerate(bank.chunks):
            bank.chunks[i] = BucketedRows(
                jnp.asarray(c.hi), jnp.asarray(c.lo), jnp.asarray(c.cnt),
                c.spills, c.n, c.d, c.B, c.n_spilled,
            )


def _planned_chunk_bytes(n_rows: int, B: int) -> int:
    "Exact plane bytes of a chunk of n_rows: hi + lo (u32) + cnt (u8)."
    from .bucketed import _D, _pad_rows

    rows = _pad_rows(n_rows)
    return rows * _D * B * 4 * 2 + rows * B


def _length_class_buckets(mins_list) -> dict[int, list[int]]:
    "Dataset indices grouped by power-of-two padded-length class (>=128)."
    buckets: dict[int, list[int]] = {}
    for i, m in enumerate(mins_list):
        L = 1 << max(7, int(max(1, len(m)) - 1).bit_length())
        buckets.setdefault(L, []).append(i)
    return buckets


def _planned_bytes(buckets) -> int:
    "Total plane bytes build_banks would allocate for these length classes."
    planned = 0
    for L, idxs in sorted(buckets.items()):
        B = choose_buckets(L)
        for s in range(0, len(idxs), _CHUNK_ROWS):
            planned += _planned_chunk_bytes(len(idxs[s : s + _CHUNK_ROWS]), B)
    return planned


def planned_banks_resident(mins_list) -> bool:
    "Would build_banks keep this collection's planes device-resident?"
    return _planned_bytes(_length_class_buckets(mins_list)) <= _hbm_budget_bytes()


def _raw_limbs(part_mins, rows):
    """PAD-padded [rows, L] (hi, lo) u32 limb rows for a host-streamed
    chunk (consumed by the fused on-device pack+count), or None without
    the native library."""
    try:
        from .. import native

        if not native.available():
            return None
    except Exception:
        return None
    lens = np.fromiter((len(m) for m in part_mins), dtype=np.int64)
    if not len(lens) or not int(lens.sum()):
        return None
    L = max(128, -(-int(lens.max()) // 128) * 128)
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    vals = (
        np.concatenate([np.asarray(m, dtype=np.uint64) for m in part_mins])
        if len(part_mins) > 1
        else np.asarray(part_mins[0], dtype=np.uint64)
    )
    return native.split_limbs(vals, offs, len(part_mins), rows, L)


def build_banks(mins_list, max_rows_waste=0.25) -> list[Bank]:
    """Bucket per-dataset sorted hash arrays by padded length class and
    pack each class into bucketed-plane chunks.

    Length classes are powers of two >= 128 so HBM waste from bucket
    padding stays bounded for skewed collections; rows are chunked at
    _CHUNK_ROWS so kernels compile once per (B, rows) size class.

    Packing is host-side (thread-parallel native pack). The HBM-budget
    decision is made UP FRONT from the planned plane sizes, so when the
    collection fits, every chunk's async upload is issued as soon as it
    packs — host packing of chunk i+1 overlaps the device transfer of
    chunk i. Beyond the budget, planes stay host-resident and stream per
    query (the multi-pass path for GTDB-scale collections on one chip).
    """
    from .bucketed import BucketedRows

    buckets = _length_class_buckets(mins_list)
    resident = _planned_bytes(buckets) <= _hbm_budget_bytes()

    # Device-resident builds pack into a POOLED pair of host buffer sets
    # per shape class: first-touch page faults on fresh multi-GB plane
    # buffers cost seconds-per-GB on cloud VMs, so the whole build faults
    # only ~2 chunks' worth of host memory instead of the full plane set.
    # Ping-pong depth 2 keeps the overlap: chunk i's async upload runs
    # while chunk i+1 packs; a buffer is reused only after its transfer
    # completed (block_until_ready).
    from collections import deque

    from .bucketed import _D, _pad_rows

    free: dict = {}  # (rows, B) -> [host (hi, lo, cnt) triples]
    inflight: deque = deque()  # (device chunk, key, host triple)

    def _take_buffers(n_rows, B):
        key = (_pad_rows(n_rows), B)
        stack = free.get(key)
        if stack:
            return key, stack.pop()
        rows = key[0]
        return key, (
            np.empty((rows, _D, B), dtype=np.uint32),
            np.empty((rows, _D, B), dtype=np.uint32),
            np.empty((rows, B), dtype=np.uint8),
        )

    def _retire(max_inflight):
        while len(inflight) > max_inflight:
            dev, key, bufs = inflight.popleft()
            dev.hi.block_until_ready()
            dev.lo.block_until_ready()
            dev.cnt.block_until_ready()
            free.setdefault(key, []).append(bufs)

    from .bucketed import pack_rows_device

    banks = []
    for L, idxs in sorted(buckets.items()):
        B = choose_buckets(L)
        chunks = []
        ids = []
        for s in range(0, len(idxs), _CHUNK_ROWS):
            part = idxs[s : s + _CHUNK_ROWS]
            c = None
            if resident:
                # raw-sized upload + on-device pack: the host->device link
                # carries the hashes (~4x smaller than the planes), the
                # chip builds the planes (value-identical, tested)
                c = pack_rows_device([mins_list[i] for i in part], B)
            if c is None and resident:
                key, bufs = _take_buffers(len(part), B)
                c = pack_rows_bucketed(
                    [mins_list[i] for i in part], B, device=False,
                    out_buffers=bufs,
                )
                c = BucketedRows(
                    jnp.asarray(c.hi), jnp.asarray(c.lo), jnp.asarray(c.cnt),
                    c.spills, c.n, c.d, c.B, c.n_spilled,
                )
                inflight.append((c, key, bufs))
                _retire(1)
            elif c is None:
                part_mins = [mins_list[i] for i in part]
                c = pack_rows_bucketed(part_mins, B, device=False)
                c.raw = _raw_limbs(part_mins, c.hi.shape[0])
            chunks.append(c)
            ids.append(np.asarray(part, dtype=np.int32))
        banks.append(Bank(chunks, ids, B))
    _retire(0)
    return banks


def save_banks(banks, dirpath) -> None:
    """Persist packed banks: per-chunk hi/lo/cnt planes as .npy plus a
    banks.json manifest (B, dataset ids, spills). Loading these skips the
    host-side re-pack entirely — the pack is done once at index build,
    the same discipline as the reference's RocksDB revindex construction
    (reference disk_revindex.rs:240-274)."""
    import json
    import os

    os.makedirs(dirpath, exist_ok=True)
    meta = {"banks": []}
    for bi, bank in enumerate(banks):
        bmeta = {"B": bank.B, "chunks": []}
        for ci, (chunk, ids) in enumerate(zip(bank.chunks, bank.ids)):
            tag = f"b{bi}c{ci}"
            np.save(os.path.join(dirpath, f"{tag}_hi.npy"), np.asarray(chunk.hi))
            np.save(os.path.join(dirpath, f"{tag}_lo.npy"), np.asarray(chunk.lo))
            np.save(os.path.join(dirpath, f"{tag}_cnt.npy"), np.asarray(chunk.cnt))
            spill_rows = [i for i, sp in enumerate(chunk.spills) if len(sp)]
            if spill_rows:
                np.savez(
                    os.path.join(dirpath, f"{tag}_spills.npz"),
                    rows=np.asarray(spill_rows, dtype=np.int64),
                    lens=np.asarray(
                        [len(chunk.spills[i]) for i in spill_rows], dtype=np.int64
                    ),
                    vals=np.concatenate([chunk.spills[i] for i in spill_rows]),
                )
            bmeta["chunks"].append(
                {
                    "tag": tag,
                    "n": chunk.n,
                    "d": chunk.d,
                    "ids": [int(i) for i in ids],
                    "spilled": bool(spill_rows),
                }
            )
        meta["banks"].append(bmeta)
    with open(os.path.join(dirpath, "banks.json"), "w") as fp:
        json.dump(meta, fp)


def load_banks(dirpath) -> list[Bank]:
    """Load banks saved by save_banks.

    Planes are uploaded to the device once when the collection fits the
    HBM budget; above it they stay mmap-backed on host and stream to the
    device per query pass."""
    import json
    import os

    with open(os.path.join(dirpath, "banks.json")) as fp:
        meta = json.load(fp)
    from .bucketed import BucketedRows

    banks = []
    for bmeta in meta["banks"]:
        chunks, ids = [], []
        for cm in bmeta["chunks"]:
            tag = cm["tag"]
            hi = np.load(os.path.join(dirpath, f"{tag}_hi.npy"), mmap_mode="r")
            lo = np.load(os.path.join(dirpath, f"{tag}_lo.npy"), mmap_mode="r")
            cnt = np.load(os.path.join(dirpath, f"{tag}_cnt.npy"), mmap_mode="r")
            rows = hi.shape[0]
            empty = np.zeros(0, dtype=np.uint64)
            spills = [empty] * rows
            n_spilled = 0
            if cm.get("spilled"):
                z = np.load(os.path.join(dirpath, f"{tag}_spills.npz"))
                off = 0
                for r, ln in zip(z["rows"], z["lens"]):
                    spills[int(r)] = z["vals"][off : off + int(ln)]
                    off += int(ln)
                    n_spilled += int(ln)
            chunks.append(
                BucketedRows(
                    hi, lo, cnt, spills,
                    cm["n"], cm["d"], bmeta["B"], n_spilled,
                )
            )
            ids.append(np.asarray(cm["ids"], dtype=np.int32))
        banks.append(Bank(chunks, ids, bmeta["B"]))

    if _planes_nbytes(banks) <= _hbm_budget_bytes():
        _to_device_resident(banks)
    return banks


def _bank_device_resident(bank) -> bool:
    import jax

    return all(isinstance(c.hi, jax.Array) for c in bank.chunks)


def _drain_chunk_counts(segs, q, counts, spill_cutoffs=None):
    """Read every segment's device counts back in ONE transfer (device-side
    concatenation), then apply the exact host-side spill corrections.
    segs: [(device counts, [(chunk, ids), ...])] — a segment holds the
    fused counts of one or more chunks back to back. Over a tunneled chip
    every blocking readback costs a full RTT and every DISPATCH ~25 ms of
    issue latency; fusing + one transfer is what keeps warm single-query
    latency near the RTT floor."""
    import jax.numpy as jnp

    from .bucketed import _spill_counts_qvm

    if not segs:
        return
    if len(segs) == 1:
        host = np.asarray(segs[0][0])
        offs = [0]
    else:
        host = np.asarray(jnp.concatenate([s[0] for s in segs]))
        offs = np.cumsum([0] + [int(s[0].shape[0]) for s in segs[:-1]])
    for (out, chunk_ids), off in zip(segs, offs):
        for chunk, ids in chunk_ids:
            c = host[off : off + len(ids)].astype(np.int64)
            cuts = None if spill_cutoffs is None else spill_cutoffs[ids]
            _spill_counts_qvm(q, chunk, c, cutoffs=cuts)
            counts[ids] = c
            off += chunk.hi.shape[0]  # chunks are padded to their row count


def counts_for_banks(banks, query_mins: np.ndarray, n_datasets: int) -> np.ndarray:
    "Per-dataset overlap counts of the sorted query with every bank row."
    counts = np.zeros(n_datasets, dtype=np.int64)
    if not len(query_mins):
        return counts
    q = np.asarray(query_mins, dtype=np.uint64)
    from .bucketed import (
        _counts_bank_fused,
        _counts_multi_bank_fused,
        query_counts_device,
    )

    if len(banks) > 1 and all(_bank_device_resident(b) for b in banks):
        # whole index, one dispatch + one readback (multi-bank fusion)
        bank_args = tuple(
            (qp[0], qp[1], qp[2],
             tuple(p for c in bank.chunks for p in (c.hi, c.lo, c.cnt)))
            for bank, qp in
            ((bank, _cached_query_pack(q, bank.B)) for bank in banks)
        )
        fused = _counts_multi_bank_fused(bank_args)
        chunk_ids = [
            (c, ids) for bank in banks
            for c, ids in zip(bank.chunks, bank.ids)
        ]
        _drain_chunk_counts([(fused, chunk_ids)], q, counts)
        return counts

    segs = []
    for bank in banks:
        q_packed = _cached_query_pack(q, bank.B)
        if _bank_device_resident(bank):
            # all chunks in ONE dispatch
            planes = [p for c in bank.chunks for p in (c.hi, c.lo, c.cnt)]
            fused = _counts_bank_fused(
                q_packed[0], q_packed[1], q_packed[2], *planes
            )
            segs.append((fused, list(zip(bank.chunks, bank.ids))))
        else:
            # beyond-HBM streaming: drain every _STREAM_WINDOW chunks so at
            # most that many chunks' uploaded planes are device-resident
            for chunk, ids in zip(bank.chunks, bank.ids):
                segs.append(
                    (query_counts_device(chunk, q_packed), [(chunk, ids)])
                )
                if len(segs) >= _STREAM_WINDOW:
                    _drain_chunk_counts(segs, q, counts)
                    segs = []
    _drain_chunk_counts(segs, q, counts)
    return counts


def counts_for_banks_batch(banks, queries, n_datasets: int, block: int = 8):
    """Overlap counts of MANY queries with every bank row in batched device
    passes: [len(queries), n_datasets]. One `_counts_block` dispatch per
    (bank chunk, query block) — the bank planes stream from HBM once per
    `block` queries instead of once per query (the win that matters for
    beyond-HBM host-streamed collections)."""
    import jax.numpy as jnp

    from .bucketed import (
        counts_block_dispatch,
        _spill_counts_qvm,
        pack_query_block,
    )

    from .bucketed import pack_query_block_device

    qs = [np.asarray(q, dtype=np.uint64) for q in queries]
    out = np.zeros((len(qs), n_datasets), dtype=np.int64)
    for b0 in range(0, len(qs), block):
        sub = qs[b0 : b0 + block]
        # ONE raw-limb upload per block, packed on device per bank B —
        # host-packing per bank re-uploaded [bq, dq, B] planes for every
        # bank's bucket count (~10-30x the raw query bytes)
        raw = None
        for bank in banks:
            Qhi, Qlo, Qcnt, _dq, raw = pack_query_block_device(
                sub, bank.B, raw
            )
            # device-resident banks dispatch all chunks at once; streamed
            # (beyond-HBM) banks drain every _STREAM_WINDOW chunks so only
            # that many uploaded planes are in flight
            pairs = list(zip(bank.chunks, bank.ids))
            window = len(pairs) if _bank_device_resident(bank) else _STREAM_WINDOW
            for g0 in range(0, len(pairs), max(window, 1)):
                parts = [
                    (counts_block_dispatch(Qhi, Qlo, Qcnt, chunk), chunk, ids)
                    for chunk, ids in pairs[g0 : g0 + max(window, 1)]
                ]
                host = (
                    np.asarray(jnp.concatenate([p[0] for p in parts], axis=1))
                    if len(parts) > 1
                    else np.asarray(parts[0][0])
                )
                off = 0
                for dev, chunk, ids in parts:
                    width = int(dev.shape[1])
                    for qi, q in enumerate(sub):
                        c = host[qi, off : off + len(ids)].astype(np.int64)
                        _spill_counts_qvm(q, chunk, c)
                        out[b0 + qi, ids] = c
                    off += width
    return out


# tiny LRU of packed+uploaded query planes: prefetch -> counter build ->
# scheduled gather all pack the SAME query; re-packing + re-uploading costs
# several ms + a tunnel round-trip each time
_QPACK_CACHE: dict = {}
_QRAW_CACHE: dict = {}  # md5(q) -> device raw limb rows, shared across Bs


def _cached_query_pack(q: np.ndarray, B: int):
    import hashlib

    key = (hashlib.md5(q.tobytes()).hexdigest(), B)
    hit = _QPACK_CACHE.get(key)
    if hit is not None:
        return hit
    packed = None
    if len(q) >= (1 << 14):
        # large (metagenome) queries: upload the raw limbs ONCE and pack on
        # device per bank B — host-packed planes re-upload 10-30x the raw
        # query bytes for every distinct bucket count
        try:
            from .bucketed import MAX_U64, pack_query_block_device

            raw = _QRAW_CACHE.get(key[0])
            Qhi, Qlo, Qcnt, dq, raw = pack_query_block_device([q], B, raw)
            if len(_QRAW_CACHE) >= 4 and key[0] not in _QRAW_CACHE:
                _QRAW_CACHE.pop(next(iter(_QRAW_CACHE)))
            _QRAW_CACHE[key[0]] = raw
            tail = MAX_U64 if len(q) and q[-1] == MAX_U64 else None
            packed = (Qhi[0], Qlo[0], Qcnt[0], dq, tail)
        except Exception:
            packed = None
    if packed is None:
        packed = pack_query_bucketed(q, B)
    if len(_QPACK_CACHE) >= 8:
        _QPACK_CACHE.pop(next(iter(_QPACK_CACHE)))
    _QPACK_CACHE[key] = packed
    return packed


def cutoff_counts_for_banks(
    banks, query_mins: np.ndarray, cutoffs: np.ndarray, n_datasets: int
) -> np.ndarray:
    """Per-dataset overlap counts with per-dataset u64 value cutoffs
    (pairwise-downsample semantics: hit iff equal and value <= cut[i])."""
    counts = np.zeros(n_datasets, dtype=np.int64)
    if not len(query_mins):
        return counts
    q = np.asarray(query_mins, dtype=np.uint64)
    from .bucketed import (
        _cut_planes,
        _cutoff_counts_bank_fused,
        _cutoff_counts_multi_bank_fused,
        query_cutoff_counts_device,
    )

    if len(banks) > 1 and all(_bank_device_resident(b) for b in banks):
        # whole index, one dispatch + one readback (multi-bank fusion)
        bank_args = []
        chunk_ids = []
        for bank in banks:
            qp = _cached_query_pack(q, bank.B)
            planes = []
            for chunk, ids in zip(bank.chunks, bank.ids):
                hi_c, lo_c = _cut_planes(chunk, cutoffs[ids])
                planes.extend([chunk.hi, chunk.lo, chunk.cnt, hi_c, lo_c])
                chunk_ids.append((chunk, ids))
            bank_args.append((qp[0], qp[1], qp[2], tuple(planes)))
        fused = _cutoff_counts_multi_bank_fused(tuple(bank_args))
        _drain_chunk_counts(
            [(fused, chunk_ids)], q, counts, spill_cutoffs=cutoffs
        )
        return counts

    segs = []
    for bank in banks:
        q_packed = _cached_query_pack(q, bank.B)
        if _bank_device_resident(bank):
            planes = []
            for chunk, ids in zip(bank.chunks, bank.ids):
                hi_c, lo_c = _cut_planes(chunk, cutoffs[ids])
                planes.extend([chunk.hi, chunk.lo, chunk.cnt, hi_c, lo_c])
            fused = _cutoff_counts_bank_fused(
                q_packed[0], q_packed[1], q_packed[2], *planes
            )
            segs.append((fused, list(zip(bank.chunks, bank.ids))))
        else:
            # beyond-HBM streaming: bounded in-flight window (see
            # _STREAM_WINDOW)
            for chunk, ids in zip(bank.chunks, bank.ids):
                segs.append(
                    (query_cutoff_counts_device(chunk, cutoffs[ids], q_packed),
                     [(chunk, ids)])
                )
                if len(segs) >= _STREAM_WINDOW:
                    _drain_chunk_counts(segs, q, counts, spill_cutoffs=cutoffs)
                    segs = []
    _drain_chunk_counts(segs, q, counts, spill_cutoffs=cutoffs)
    return counts


def membership_for_banks(banks, query_mins: np.ndarray, dataset_ids):
    """Bitmask membership of the query's bucketed slots in the given
    datasets, per bank (datasets may span banks with different B).

    Returns a list of (bank, q_packed_host, sel_ids [k], M [k, dq, B]
    device bool) tuples covering every requested dataset id. q_packed is
    kept as host numpy so callers can build hash<->slot maps without a
    device readback.
    """
    q = np.asarray(query_mins, dtype=np.uint64)
    want = set(int(i) for i in dataset_ids)
    out = []
    for bank in banks:
        q_packed = None
        for chunk, ids in zip(bank.chunks, bank.ids):
            sel = [r for r, i in enumerate(ids) if int(i) in want]
            if not sel:
                continue
            if q_packed is None:
                q_packed = pack_query_bucketed(q, bank.B, device=False)
            k = len(sel)
            # pad the row count to a power of two so the membership and
            # per-round decrement kernels compile once per size class, not
            # once per distinct match count
            kp = 1 << max(0, (k - 1).bit_length())
            sel_p = sel + [sel[-1]] * (kp - k)
            M, _ = membership_matrix(q, chunk, sel_p, q_packed=q_packed)
            out.append((bank, q_packed, ids[np.asarray(sel)], M))
    return out
