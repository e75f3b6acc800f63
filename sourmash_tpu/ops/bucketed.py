"""Bucketed dense-compare engine for set intersection on TPU.

The sorted-row `searchsorted` kernels in `ops/intersect.py` are the right
*algorithm* (O(L log L)) but the wrong *hardware mapping*: a u64 binary
search lowers to a 13-step while-loop of dynamic gathers, and TPU gathers
run near one element per cycle — measured ~12 s for one 8-query block
against 512 genome-scale rows on a v5e chip.

This module replaces them with a gather-free layout. MurmurHash values are
uniform, so bucketing by the low `log2(B)` bits spreads a sketch of
`l` hashes over `B = next_pow2(l_max * 0.4)` buckets with Poisson(<=2.5)
occupancy. A sketch becomes two u32 planes `hi/lo [d, B]` (d=8 slots per
bucket, lane dimension last), and intersection counting becomes a pure
dense equality compare between planes — exactly the elementwise work the
VPU tiles at full rate, with zero gathers or scatters.

Exactness is preserved by construction:

- slots beyond a bucket's occupancy hold PAD = 2**64-1 in both planes.
  PAD==PAD hits are counted by the kernel but subtracted exactly via a
  pad-count correction: `corr[q, s] = sum_b npad_q[b] * npad_s[b]`, one
  matmul on the MXU with the query side in f32 (npad_q can reach the
  query's dq — hundreds-plus for a metagenome vs a small-B bank, past
  bf16's 256-integer exactness; all products and sums stay < 2^24, so
  f32 is exact).
- a real hash equal to PAD (only possible at scaled=1) is routed to a
  host-side *spill* list at pack time, as is any element past the d-th
  slot of an over-full bucket (Poisson tail, ~1 element per few thousand
  hashes). Spills are joined exactly on host with numpy searchsorted.
- queries are packed with `dq = next_pow2(max bucket load)`, so the query
  side never spills.

Replaces the hot loops of the reference's sorted-merge intersection
(`/root/reference/src/core/src/sketch/minhash.rs:915-953,1721-1807`) and
RevIndex posting-list counting
(`/root/reference/src/core/src/index/revindex/disk_revindex.rs:278-341`).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

MAX_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_D = 8  # subject slots per bucket


def _next_pow2(x: int) -> int:
    return 1 << max(0, int(x - 1).bit_length())


def choose_buckets(max_len: int) -> int:
    """Bucket count (power of two) for rows up to max_len hashes: max mean
    load <= 2.5, putting Poisson spill past d=8 at ~1e-3 per bucket (a few
    spilled elements per genome-scale row, joined exactly on host)."""
    return _next_pow2(max(128, -(-max_len * 2 // 5)))


def _pad_rows(n: int) -> int:
    "Row padding: powers of two up to 2048, then multiples of 2048."
    if n <= 2048:
        return _next_pow2(max(8, n))
    return -(-n // 2048) * 2048


class BucketedRows:
    """A packed bank: hi/lo [n, d, B] u32 planes (lane dim last), per-row
    per-bucket occupancy counts [n, B] u8, and host-side exact spill lists
    (sorted u64 per row; almost always empty)."""

    __slots__ = (
        "hi", "lo", "cnt", "spills", "n", "d", "B", "n_spilled", "raw",
    )

    def __init__(self, hi, lo, cnt, spills, n, d, B, n_spilled, raw=None):
        self.hi = hi
        self.lo = lo
        self.cnt = cnt
        self.spills = spills
        self.n = n
        self.d = d
        self.B = B
        self.n_spilled = n_spilled
        # host-streamed (beyond-HBM) chunks optionally keep the raw padded
        # limb rows (Hi, Lo [rows, L] u32): a streamed counting pass then
        # uploads the raw rows (~6x fewer bytes than the planes) and packs
        # on device before counting
        self.raw = raw


def _bucketize(m: np.ndarray, B: int):
    """Split one sorted distinct u64 array into (bucket ids, within-bucket
    slots, stable order). Low-bits bucketing; within a bucket, slots are in
    ascending hash order."""
    b = (m & np.uint64(B - 1)).astype(np.int64)
    order = np.argsort(b, kind="stable")
    bs = b[order]
    # within-bucket rank
    if len(bs):
        change = np.flatnonzero(np.diff(bs)) + 1
        starts = np.concatenate([[0], change])
        sizes = np.diff(np.concatenate([starts, [len(bs)]]))
        slot = np.arange(len(bs)) - np.repeat(starts, sizes)
    else:
        slot = np.zeros(0, dtype=np.int64)
    return b, bs, slot, order


def _pack_rows_native(mins_list, n, rows, B, d, device, out_buffers=None):
    """Thread-parallel C++ pack (native/pack.cpp): rows are independent and
    per-row input is sorted, so the pack is one O(N) pass per row across a
    thread pool — no global argsort. Value-identical to the numpy path
    (asserted by tests); returns None when the native lib is unavailable."""
    try:
        from .. import native

        if not native.available():
            return None
        lens = np.fromiter(
            (len(m) for m in mins_list), dtype=np.int64, count=n
        )
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        if offs[-1] == 0:
            return None  # trivial: let the numpy path handle empties
        vals = (
            np.concatenate([np.asarray(m, dtype=np.uint64) for m in mins_list])
            if n > 1
            else np.asarray(mins_list[0], dtype=np.uint64)
        )
        out = native.pack_rows(vals, offs, n, rows, B, d, out=out_buffers)
        if out is None:
            return None
    except Exception:
        return None
    hi, lo, cnt, spill_rows, spill_vals = out
    empty = np.zeros(0, dtype=np.uint64)
    spill_list = [empty] * rows
    n_spilled = int(len(spill_vals))
    if n_spilled:
        # contiguous runs per row, already ascending by (row, value)
        starts = np.concatenate(
            [[0], np.flatnonzero(np.diff(spill_rows)) + 1, [n_spilled]]
        )
        for a, b in zip(starts[:-1], starts[1:]):
            spill_list[int(spill_rows[a])] = spill_vals[a:b].copy()
    if device:
        hi, lo, cnt = jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(cnt)
    return BucketedRows(hi, lo, cnt, spill_list, n, d, B, n_spilled)


def pack_rows_bucketed(
    mins_list, B: int, d: int = _D, device=True, out_buffers=None
) -> BucketedRows:
    """Pack sorted distinct u64 hash arrays into bucketed u32 planes.

    Preferred path: the thread-parallel native pack (see
    _pack_rows_native); `out_buffers` optionally supplies pooled
    (hi, lo, cnt) host arrays to pack into. Fallback is vectorized numpy:
    one stable argsort of (row, bucket) keys over the concatenated
    hashes, then three fancy-index stores.

    Rows are padded to a power-of-two count (>=8) so kernels compile once
    per size class; padding rows are all-PAD (occupancy 0)."""
    n = len(mins_list)
    rows = _pad_rows(n)
    if n:
        packed = _pack_rows_native(
            mins_list, n, rows, B, d, device, out_buffers=out_buffers
        )
        if packed is not None:
            return packed
    hi = np.full((rows, d, B), 0xFFFFFFFF, dtype=np.uint32)
    lo = np.full((rows, d, B), 0xFFFFFFFF, dtype=np.uint32)
    cnt = np.zeros((rows, B), dtype=np.uint8)
    spills = {}
    n_spilled = 0
    lens = np.fromiter((len(m) for m in mins_list), dtype=np.int64, count=n)
    N = int(lens.sum())
    if N:
        vals = (
            np.concatenate([np.asarray(m, dtype=np.uint64) for m in mins_list])
            if n > 1
            else np.asarray(mins_list[0], dtype=np.uint64)
        )
        row = np.repeat(np.arange(n, dtype=np.int64), lens)
        # PAD collision guard: 2**64-1 can be a real hash only at scaled=1
        ismax = vals == MAX_U64
        if ismax.any():
            for i in np.unique(row[ismax]):
                spills[int(i)] = np.array([MAX_U64], dtype=np.uint64)
                n_spilled += 1
            keepmask = ~ismax
            vals, row = vals[keepmask], row[keepmask]
        b = (vals & np.uint64(B - 1)).astype(np.int64)
        key = row * B + b
        order = np.argsort(key, kind="stable")  # within (row,bucket): asc hash
        ks = key[order]
        vs = vals[order]
        ro = row[order]
        bo = b[order]
        N2 = len(ks)
        if N2 == 0:
            # every hash was the PAD sentinel and spilled — planes stay empty
            empty = np.zeros(0, dtype=np.uint64)
            spill_list = [spills.get(i, empty) for i in range(rows)]
            if device:
                hi, lo, cnt = jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(cnt)
            return BucketedRows(hi, lo, cnt, spill_list, n, d, B, n_spilled)
        pos = np.arange(N2, dtype=np.int64)
        is_start = np.empty(N2, dtype=bool)
        is_start[0] = True
        np.not_equal(ks[1:], ks[:-1], out=is_start[1:])
        starts = np.flatnonzero(is_start)
        # slot = position - start of its run, via a running maximum
        # (cheaper than np.repeat(starts, sizes) at 50M+ elements)
        slot = pos - np.maximum.accumulate(np.where(is_start, pos, 0))
        keep = slot < d
        hi[ro[keep], slot[keep], bo[keep]] = (vs[keep] >> np.uint64(32)).astype(
            np.uint32
        )
        lo[ro[keep], slot[keep], bo[keep]] = (
            vs[keep] & np.uint64(0xFFFFFFFF)
        ).astype(np.uint32)
        # per-(row, bucket) stored counts: one store per run
        sizes = np.diff(np.concatenate([starts, [N2]]))
        cnt.reshape(-1)[ks[starts]] = np.minimum(sizes, d).astype(np.uint8)
        if not keep.all():
            sp_vals, sp_rows = vs[~keep], ro[~keep]
            n_spilled += len(sp_vals)
            for i in np.unique(sp_rows):
                both = sp_vals[sp_rows == i]
                prev = spills.get(int(i))
                if prev is not None:
                    both = np.concatenate([both, prev])
                spills[int(i)] = np.sort(both)
    empty = np.zeros(0, dtype=np.uint64)
    spill_list = [spills.get(i, empty) for i in range(rows)]
    if device:
        hi, lo, cnt = jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(cnt)
    return BucketedRows(hi, lo, cnt, spill_list, n, d, B, n_spilled)


@functools.partial(jax.jit, static_argnames=("B", "d"))
def _device_pack_kernel(Hi, Lo, B, d):
    """Pack [rows, L] u32 hash-limb rows (each row sorted ascending, PAD
    = 0xFFFFFFFF/0xFFFFFFFF past its true length) into bucketed planes
    [rows, d, B] + cnt [rows, B] ON DEVICE.

    Value-identical to the host pack: a stable per-row sort by bucket id
    keeps ascending-hash slot order, slot = position − bucket start,
    overflow (slot >= d) lands in a dump slot that is sliced off (those
    elements live in the host spill lists). Raw limb rows are ~4x smaller
    than the planes, so uploading raw + packing on device is decisive
    when the host->device link is the bottleneck."""
    rows, L = Hi.shape
    pad = jnp.uint32(0xFFFFFFFF)
    valid = ~((Hi == pad) & (Lo == pad))
    b = jnp.where(valid, (Lo & jnp.uint32(B - 1)).astype(jnp.int32), B)
    b_s, hi_s, lo_s = jax.lax.sort(
        (b, Hi, Lo), dimension=1, num_keys=1, is_stable=True
    )
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    starts = jax.vmap(
        lambda bs: jnp.searchsorted(bs, jnp.arange(B + 1, dtype=jnp.int32))
    )(b_s)  # [rows, B+1]
    slot = pos - jnp.take_along_axis(starts, jnp.clip(b_s, 0, B), axis=1)
    cnt = jnp.minimum(starts[:, 1:] - starts[:, :-1], d).astype(jnp.uint8)
    ok = (b_s < B) & (slot < d)
    flat = jnp.where(ok, slot * B + b_s, d * B)  # overflow -> dump slot
    ridx = jnp.arange(rows, dtype=jnp.int32)[:, None]
    Phi = jnp.full((rows, d * B + 1), pad, jnp.uint32).at[ridx, flat].set(
        hi_s, mode="drop"
    )
    Plo = jnp.full((rows, d * B + 1), pad, jnp.uint32).at[ridx, flat].set(
        lo_s, mode="drop"
    )
    return (
        Phi[:, : d * B].reshape(rows, d, B),
        Plo[:, : d * B].reshape(rows, d, B),
        cnt,
    )


def query_raw_limbs(qs):
    """PAD-padded [bq, L] (hi, lo) u32 limb rows for a query block — the
    ONE upload shared by every per-bank device pack. 2^64-1 tails become
    PAD (excluded from planes, exactly like the host query pack)."""
    # pow2 length class: per-block exact lengths would recompile the
    # pack kernel for every wave of queries
    L = _next_pow2(max(128, max((len(q) for q in qs), default=1)))
    Hi = np.full((len(qs), L), 0xFFFFFFFF, dtype=np.uint32)
    Lo = np.full((len(qs), L), 0xFFFFFFFF, dtype=np.uint32)
    for i, q in enumerate(qs):
        q = np.asarray(q, dtype=np.uint64)
        if len(q) and q[-1] == MAX_U64:
            q = q[:-1]
        Hi[i, : len(q)] = (q >> np.uint64(32)).astype(np.uint32)
        Lo[i, : len(q)] = (q & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return jnp.asarray(Hi), jnp.asarray(Lo)


@functools.partial(jax.jit, static_argnames=("B", "d"))
def _query_pack_kernel_i32(Hi, Lo, B: int, d: int):
    """Query-block flavor of _device_pack_kernel: same stable
    sort-by-bucket pack, but int32 occupancy (metagenome bucket loads
    exceed u8) and depth d sized to the block's max load (no spills)."""
    rows, L = Hi.shape
    pad = jnp.uint32(0xFFFFFFFF)
    valid = ~((Hi == pad) & (Lo == pad))
    b = jnp.where(valid, (Lo & jnp.uint32(B - 1)).astype(jnp.int32), B)
    b_s, hi_s, lo_s = jax.lax.sort(
        (b, Hi, Lo), dimension=1, num_keys=1, is_stable=True
    )
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    starts = jax.vmap(
        lambda bs: jnp.searchsorted(bs, jnp.arange(B + 1, dtype=jnp.int32))
    )(b_s)
    slot = pos - jnp.take_along_axis(starts, jnp.clip(b_s, 0, B), axis=1)
    cnt = jnp.minimum(starts[:, 1:] - starts[:, :-1], d).astype(jnp.int32)
    ok = (b_s < B) & (slot < d)
    flat = jnp.where(ok, slot * B + b_s, d * B)
    ridx = jnp.arange(rows, dtype=jnp.int32)[:, None]
    Phi = jnp.full((rows, d * B + 1), pad, jnp.uint32).at[ridx, flat].set(
        hi_s, mode="drop"
    )
    Plo = jnp.full((rows, d * B + 1), pad, jnp.uint32).at[ridx, flat].set(
        lo_s, mode="drop"
    )
    return (
        Phi[:, : d * B].reshape(rows, d, B),
        Plo[:, : d * B].reshape(rows, d, B),
        cnt,
    )


def pack_query_block_device(qs, B: int, raw=None):
    """Pack a query block into [bq, dq, B] planes ON DEVICE from shared
    raw limb rows (uploaded once, reused across every bank's B). Returns
    (Qhi, Qlo, Qcnt [bq, B] i32, dq, raw)."""
    if raw is None:
        raw = query_raw_limbs(qs)
    Hi, Lo = raw
    max_load = 8
    for q in qs:
        q = np.asarray(q, dtype=np.uint64)
        if len(q) and q[-1] == MAX_U64:
            q = q[:-1]
        if len(q):
            loads = np.bincount(
                (q & np.uint64(B - 1)).astype(np.int64), minlength=B
            )
            max_load = max(max_load, int(loads.max()))
    # multiple-of-8 depth (not pow2): dq is the dominant factor of the
    # counts pass (ops ~ B*d*dq), and pow2 rounding wasted up to ~2x on
    # metagenome queries (e.g. max load 17 -> 32)
    dq = max(8, -(-max_load // 8) * 8)
    Qhi, Qlo, Qcnt = _query_pack_kernel_i32(Hi, Lo, B, dq)
    return Qhi, Qlo, Qcnt, dq, raw


def pack_rows_device(mins_list, B: int, d: int = _D) -> BucketedRows | None:
    """BucketedRows with device-resident planes packed ON DEVICE (see
    _device_pack_kernel); spill state comes from the native spills-only
    pass. None when the native library is unavailable or the rows are
    empty — callers fall back to the host pack."""
    try:
        from .. import native

        if not native.available():
            return None
    except Exception:
        return None
    n = len(mins_list)
    if not n:
        return None
    rows = _pad_rows(n)
    lens = np.fromiter((len(m) for m in mins_list), dtype=np.int64, count=n)
    N = int(lens.sum())
    if not N:
        return None
    L = max(128, -(-int(lens.max()) // 128) * 128)
    vals = (
        np.concatenate([np.asarray(m, dtype=np.uint64) for m in mins_list])
        if n > 1
        else np.asarray(mins_list[0], dtype=np.uint64)
    )
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    sp = native.pack_spills(vals, offs, n, rows, B, d)
    if sp is None:
        return None
    _cnt_host, sp_rows, sp_vals = sp

    split = native.split_limbs(vals, offs, n, rows, L)
    if split is not None:
        Hi, Lo = split
    else:
        Hi = np.full((rows, L), 0xFFFFFFFF, dtype=np.uint32)
        Lo = np.full((rows, L), 0xFFFFFFFF, dtype=np.uint32)
        # per-row slice copies beat a fancy-indexed scatter: building the
        # np.repeat index vectors costs more than the copies themselves
        hi_all = (vals >> np.uint64(32)).astype(np.uint32)
        lo_all = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        for i in range(n):
            a, b = offs[i], offs[i + 1]
            Hi[i, : b - a] = hi_all[a:b]
            Lo[i, : b - a] = lo_all[a:b]

    phi, plo, pcnt = _device_pack_kernel(jnp.asarray(Hi), jnp.asarray(Lo), B, d)

    empty = np.zeros(0, dtype=np.uint64)
    spill_list = [empty] * rows
    n_spilled = int(len(sp_vals))
    if n_spilled:
        starts = np.concatenate(
            [[0], np.flatnonzero(np.diff(sp_rows)) + 1, [n_spilled]]
        )
        for a, bnd in zip(starts[:-1], starts[1:]):
            spill_list[int(sp_rows[a])] = sp_vals[a:bnd].copy()
    return BucketedRows(phi, plo, pcnt, spill_list, n, d, B, n_spilled)


def pack_query_bucketed(q: np.ndarray, B: int, device=True):
    """Pack one sorted distinct u64 query into [dq, B] planes with
    dq = next_pow2(max bucket load) — no query-side spills. Returns
    (hi, lo, cnt [B] u8, dq, tail) where tail is the (rare) hash equal to
    PAD, excluded from the planes."""
    q = np.asarray(q, dtype=np.uint64)
    tail = None
    if len(q) and q[-1] == MAX_U64:
        tail = MAX_U64
        q = q[:-1]
    if len(q):
        b, bs, slot, order = _bucketize(q, B)
        dq = _next_pow2(max(8, int(slot.max()) + 1))
    else:
        dq = 8
    hi = np.full((dq, B), 0xFFFFFFFF, dtype=np.uint32)
    lo = np.full((dq, B), 0xFFFFFFFF, dtype=np.uint32)
    # int32: a metagenome query against a small-B bank loads hundreds of
    # hashes per bucket — uint8 silently wrapped and corrupted the
    # pad-count correction
    cnt = np.zeros(B, dtype=np.int32)
    if len(q):
        qs = q[order]
        hi[slot, bs] = (qs >> np.uint64(32)).astype(np.uint32)
        lo[slot, bs] = (qs & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        np.add.at(cnt, bs.astype(np.int64), 1)
    if device:
        hi, lo, cnt = jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(cnt)
    return hi, lo, cnt, dq, tail


def pack_query_block(qs, B: int):
    """Pack several sorted distinct u64 queries into one shared-shape block
    (Qhi [bq, dq, B], Qlo, Qcnt [bq, B]) with dq the max bucket load over
    the block; unused slots hold PAD (counted out via Qcnt exactly like the
    single-query planes). 2**64-1 tails are excluded at pack time — the
    subject-spill join covers them (it can only match a subject spill)."""
    packs = [pack_query_bucketed(q, B, device=False) for q in qs]
    dq = max(p[3] for p in packs)
    bq = len(qs)
    Qhi = np.full((bq, dq, B), 0xFFFFFFFF, dtype=np.uint32)
    Qlo = np.full((bq, dq, B), 0xFFFFFFFF, dtype=np.uint32)
    Qcnt = np.zeros((bq, B), dtype=np.int32)  # bucket loads can exceed 255
    for i, (hi, lo, cnt, dqi, _tail) in enumerate(packs):
        Qhi[i, :dqi] = hi
        Qlo[i, :dqi] = lo
        Qcnt[i] = cnt
    return Qhi, Qlo, Qcnt


def popcount_u32(x):
    "SWAR population count per u32 lane."
    x = x - ((x >> jnp.uint32(1)) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + (
        (x >> jnp.uint32(2)) & jnp.uint32(0x33333333)
    )
    x = (x + (x >> jnp.uint32(4))) & jnp.uint32(0x0F0F0F0F)
    return (x * jnp.uint32(0x01010101)) >> jnp.uint32(24)


def pack_bits_u32(bits):
    "[..., B] bool -> [..., B/32] u32 bitmask (bit j = lane 32*w + j)."
    shape = bits.shape
    B = shape[-1]
    w = bits.reshape(shape[:-1] + (B // 32, 32)).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)).reshape(
        (1,) * len(shape) + (32,)
    )
    return jnp.sum(w * weights, axis=-1, dtype=jnp.uint32)


# -- kernels ---------------------------------------------------------------


def _counts_qvm_impl(qhi, qlo, qcnt, Shi, Slo, Scnt):
    """[dq, B] query planes vs [ns, d, B] subject planes -> [ns] i32 exact
    stored-element intersection counts (pad-pad hits removed via the
    bf16 pad-count matmul).

    Loop order matters: the static loop runs over the d=8 *subject* slots
    with the query planes broadcast inside, so the large subject planes
    stream from HBM once; a loop over query slots would re-stream them
    dq times (measured 10x slower for metagenome-sized queries)."""
    d = Shi.shape[1]
    acc = jnp.zeros(Shi.shape[0], jnp.int32)
    qh = qhi[None, :, :]  # [1, dq, B]
    ql = qlo[None, :, :]
    for k2 in range(d):
        eq = (Shi[:, k2, None, :] == qh) & (Slo[:, k2, None, :] == ql)
        acc = acc + jnp.sum(eq, axis=(1, 2), dtype=jnp.int32)
    dq = qhi.shape[0]
    # npad_q can reach dq (a metagenome query against a small-B bank packs
    # with dq in the hundreds-to-thousands) — bf16 is only exact to 256,
    # so the query side must be f32 (exact to 2^24; npad_s <= d=8 stays
    # bf16-exact, and every product/sum here is < 2^24)
    npad_q = (dq - qcnt).astype(jnp.float32)  # [B]
    npad_s = (d - Scnt).astype(jnp.float32)  # [ns, B]
    corr = jnp.dot(npad_s, npad_q, preferred_element_type=jnp.float32)
    return acc - corr.astype(jnp.int32)


_counts_qvm = jax.jit(_counts_qvm_impl)


@jax.jit
def _counts_bank_fused(qhi, qlo, qcnt, *planes):
    """All of one bank's chunks vs one query in a SINGLE dispatch — on a
    tunneled chip each extra dispatch costs ~25 ms of issue latency, which
    dominated warm search/prefetch. planes = (hi, lo, cnt) per chunk;
    returns the concatenated per-row counts."""
    outs = [
        _counts_qvm_impl(qhi, qlo, qcnt, planes[i], planes[i + 1],
                         planes[i + 2])
        for i in range(0, len(planes), 3)
    ]
    return jnp.concatenate(outs) if len(outs) > 1 else outs[0]


@jax.jit
def _counts_multi_bank_fused(bank_args):
    """The WHOLE index (every bank, every chunk) vs one query in a single
    dispatch returning one concatenated counts vector — a warm query is
    then one dispatch + one readback regardless of how many length-class
    banks the collection packed into. bank_args: tuple of
    (qhi, qlo, qcnt, (hi, lo, cnt) * chunks) per bank."""
    outs = []
    for qhi, qlo, qcnt, planes in bank_args:
        for i in range(0, len(planes), 3):
            outs.append(
                _counts_qvm_impl(qhi, qlo, qcnt, planes[i], planes[i + 1],
                                 planes[i + 2])
            )
    return jnp.concatenate(outs) if len(outs) > 1 else outs[0]


@jax.jit
def _cutoff_counts_multi_bank_fused(bank_args):
    "Single-dispatch whole-index form of the per-chunk cutoff counts."
    outs = []
    for qhi, qlo, qcnt, planes in bank_args:
        for i in range(0, len(planes), 5):
            outs.append(
                _counts_qvm_cutoff_impl(
                    qhi, qlo, qcnt, planes[i], planes[i + 1], planes[i + 2],
                    planes[i + 3], planes[i + 4],
                )
            )
    return jnp.concatenate(outs) if len(outs) > 1 else outs[0]


def _counts_qvm_cutoff_impl(qhi, qlo, qcnt, Shi, Slo, Scnt, cut_hi, cut_lo):
    """Query-vs-many with a per-subject u64 cutoff applied to the matched
    value: hit iff equal and value <= cut[s]. Pad-pad hits pass the cutoff
    only when cut == 2**64-1; the correction is masked accordingly."""
    d = Shi.shape[1]
    dq = qhi.shape[0]
    chi = cut_hi[:, None, None]  # [ns, 1, 1]
    clo = cut_lo[:, None, None]
    qh = qhi[None, :, :]  # [1, dq, B]
    ql = qlo[None, :, :]
    acc = jnp.zeros(Shi.shape[0], jnp.int32)
    for k2 in range(d):
        eq = (Shi[:, k2, None, :] == qh) & (Slo[:, k2, None, :] == ql)
        # recomputed per k2 so the [ns, dq, B] mask fuses into the reduce
        # instead of materializing (1.3 GB for a metagenome query vs 10k)
        le = (qh < chi) | ((qh == chi) & (ql <= clo))
        acc = acc + jnp.sum(eq & le, axis=(1, 2), dtype=jnp.int32)
    # f32 pad counts: exact for dq up to 2^24 (bf16 broke past 256)
    npad_q = (dq - qcnt).astype(jnp.float32)
    npad_s = (d - Scnt).astype(jnp.float32)
    corr = jnp.dot(npad_s, npad_q, preferred_element_type=jnp.float32)
    pad_passes = (cut_hi == 0xFFFFFFFF) & (cut_lo == 0xFFFFFFFF)
    return acc - jnp.where(pad_passes, corr.astype(jnp.int32), 0)


_counts_qvm_cutoff = jax.jit(_counts_qvm_cutoff_impl)


@jax.jit
def _cutoff_counts_bank_fused(qhi, qlo, qcnt, *planes):
    "Single-dispatch form of the per-chunk cutoff counts (5-tuple planes)."
    outs = [
        _counts_qvm_cutoff_impl(
            qhi, qlo, qcnt, planes[i], planes[i + 1], planes[i + 2],
            planes[i + 3], planes[i + 4],
        )
        for i in range(0, len(planes), 5)
    ]
    return jnp.concatenate(outs) if len(outs) > 1 else outs[0]


def _counts_block_impl(Qhi, Qlo, Qcnt, Shi, Slo, Scnt):
    """[bq, d, B] query rows vs [ns, d, B] subjects -> [bq, ns] i32 counts.

    Static loop over the subjects' d slots; the query block broadcasts
    inside so the subject planes stream from HBM once per block."""
    d = Shi.shape[1]
    bq = Qhi.shape[0]
    dq = Qhi.shape[1]
    acc = jnp.zeros((bq, Shi.shape[0]), jnp.int32)
    qh = Qhi[:, None, :, :]  # [bq, 1, dq, B]
    ql = Qlo[:, None, :, :]
    for k2 in range(d):
        eq = (Shi[None, :, k2, None, :] == qh) & (Slo[None, :, k2, None, :] == ql)
        acc = acc + jnp.sum(eq, axis=(2, 3), dtype=jnp.int32)  # [bq, ns]
    # f32 pad counts: exact for dq up to 2^24 (bf16 broke past 256)
    npad_q = (dq - Qcnt).astype(jnp.float32)  # [bq, B]
    npad_s = (d - Scnt).astype(jnp.float32)  # [ns, B]
    corr = jnp.dot(npad_q, npad_s.T, preferred_element_type=jnp.float32)
    return acc - corr.astype(jnp.int32)


_counts_block = jax.jit(_counts_block_impl)


@functools.partial(jax.jit, static_argnames=("B", "d"))
def _counts_block_from_raw(Qhi, Qlo, Qcnt, Hi, Lo, B, d):
    "Block counts against a host-streamed chunk via raw upload + device pack."
    Shi, Slo, Scnt = _device_pack_kernel(Hi, Lo, B, d)
    return _counts_block_impl(Qhi, Qlo, Qcnt, Shi, Slo, Scnt)


def counts_block_dispatch(Qhi, Qlo, Qcnt, chunk):
    """One query-block-vs-chunk dispatch, choosing the raw-upload fused
    pack+count for host-streamed chunks that kept their limb rows."""
    if chunk.raw is not None and not isinstance(chunk.hi, jax.Array):
        return _counts_block_from_raw(
            Qhi, Qlo, Qcnt, chunk.raw[0], chunk.raw[1], chunk.B, chunk.d
        )
    return _counts_block(Qhi, Qlo, Qcnt, chunk.hi, chunk.lo, chunk.cnt)


# (measured on the v5e: a lax.map over query blocks serializes the HBM
# streaming of the subject planes — 10 s vs 0.55 s for the async host
# loop of per-block dispatches below, which the scheduler pipelines)


@jax.jit
def _membership_rows(qhi, qlo, Shi, Slo, Scnt):
    """Which query slots are present in each subject row?

    [dq, B] query planes vs [nm, d, B] subjects -> [nm, dq, B] bool. Subject
    pad slots are masked by occupancy (a query PAD slot equals a subject PAD
    slot, and here we need bits, not counts). Rolled lax.fori_loop over the
    subject depth: an unrolled python loop left XLA holding every
    iteration's [nm, dq, B] broadcast temps live at once (OOM at scale)."""
    d = Shi.shape[1]
    qh = qhi[None, :, :]  # [1, dq, B]
    ql = qlo[None, :, :]

    def body(k2, m):
        valid = Scnt[:, None, :] > k2  # [nm, 1, B]
        sh = jax.lax.dynamic_index_in_dim(Shi, k2, 1, keepdims=True)
        sl = jax.lax.dynamic_index_in_dim(Slo, k2, 1, keepdims=True)
        return m | ((sh == qh) & (sl == ql) & valid)

    m0 = jnp.zeros((Shi.shape[0], qhi.shape[0], qhi.shape[1]), jnp.bool_)
    return jax.lax.fori_loop(0, d, body, m0)


# -- host wrappers with exact spill handling --------------------------------


def _sorted_isect_size(a: np.ndarray, b: np.ndarray) -> int:
    "|a ∩ b| for sorted distinct u64 arrays."
    if not len(a) or not len(b):
        return 0
    idx = np.searchsorted(b, a)
    idx = np.clip(idx, 0, len(b) - 1)
    return int(np.sum(b[idx] == a))


def _spill_counts_qvm(q_full: np.ndarray, bank: BucketedRows, counts, cutoffs=None):
    """Add the exact contribution of subject-side spilled hashes:
    counts[i] += |spill_i ∩ q| (optionally filtered by cutoff[i]). The
    query's own 2**64-1 tail (never in the planes) is covered here too,
    since it can only match a subject spill. One vectorized join over the
    concatenated spills, not a per-row loop."""
    if not bank.n_spilled or not len(q_full):
        return
    rows = [i for i in range(bank.n) if len(bank.spills[i])]
    sp_vals = np.concatenate([bank.spills[i] for i in rows])
    sp_rows = np.repeat(
        np.asarray(rows, dtype=np.int64),
        [len(bank.spills[i]) for i in rows],
    )
    idx = np.searchsorted(q_full, sp_vals)
    idx_c = np.minimum(idx, len(q_full) - 1)
    hit = q_full[idx_c] == sp_vals
    if cutoffs is not None:
        hit &= sp_vals <= np.asarray(cutoffs, dtype=np.uint64)[sp_rows]
    np.add.at(counts, sp_rows[hit], 1)


@functools.partial(jax.jit, static_argnames=("B", "d"))
def _counts_from_raw(qhi, qlo, qcnt, Hi, Lo, B, d):
    """Fused upload-side form of _counts_qvm for host-streamed chunks:
    pack the raw [rows, L] limb rows into planes ON DEVICE, count, and
    free the planes with the dispatch — the link carries ~6x fewer bytes
    than uploading the planes."""
    Shi, Slo, Scnt = _device_pack_kernel(Hi, Lo, B, d)
    return _counts_qvm_impl(qhi, qlo, qcnt, Shi, Slo, Scnt)


def query_counts_device(bank: BucketedRows, q_packed):
    """Async form of query_counts_bucketed: dispatch only, returning the
    [padded rows] device counts (no spill correction, no readback) so
    callers can fan out many chunks and sync once. Host-streamed chunks
    that kept their raw limb rows upload those and pack on device."""
    qhi, qlo, qcnt, dq, tail = q_packed
    if bank.raw is not None and not isinstance(bank.hi, jax.Array):
        return _counts_from_raw(
            qhi, qlo, qcnt, bank.raw[0], bank.raw[1], bank.B, bank.d
        )
    return _counts_qvm(qhi, qlo, qcnt, bank.hi, bank.lo, bank.cnt)


_CUT_PLANES_CACHE: dict = {}


def _cut_planes(bank: BucketedRows, cutoffs):
    """Device (hi, lo) planes for per-row u64 cutoffs, cached per (chunk,
    cutoff set) — repeated warm searches at the same query scaled re-upload
    identical cutoff vectors otherwise (a host->device transfer per chunk
    per call)."""
    import hashlib

    cut = np.zeros(len(bank.cnt), dtype=np.uint64)
    cut[: bank.n] = cutoffs
    key = (id(bank), hashlib.md5(cut.tobytes()).digest())
    hit = _CUT_PLANES_CACHE.get(key)
    if hit is not None:
        return hit
    planes = (
        jnp.asarray((cut >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((cut & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
    )
    if len(_CUT_PLANES_CACHE) >= 64:
        _CUT_PLANES_CACHE.pop(next(iter(_CUT_PLANES_CACHE)))
    _CUT_PLANES_CACHE[key] = planes
    return planes


def query_cutoff_counts_device(bank: BucketedRows, cutoffs, q_packed):
    "Async form of query_cutoff_counts_bucketed (stored-element counts only)."
    qhi, qlo, qcnt, dq, tail = q_packed
    cut_hi, cut_lo = _cut_planes(bank, cutoffs)
    return _counts_qvm_cutoff(
        qhi, qlo, qcnt, bank.hi, bank.lo, bank.cnt, cut_hi, cut_lo
    )


def query_counts_bucketed(q_full: np.ndarray, bank: BucketedRows, q_packed=None):
    """Sorted query u64 array vs a packed bank -> [n] exact counts.

    q_packed: optional reuse of pack_query_bucketed(q_full, bank.B)."""
    if q_packed is None:
        q_packed = pack_query_bucketed(q_full, bank.B)
    qhi, qlo, qcnt, dq, tail = q_packed
    out = np.asarray(_counts_qvm(qhi, qlo, qcnt, bank.hi, bank.lo, bank.cnt))
    counts = out[: bank.n].astype(np.int64)
    _spill_counts_qvm(q_full, bank, counts)
    return counts


def query_cutoff_counts_bucketed(
    q_full: np.ndarray, bank: BucketedRows, cutoffs, q_packed=None
):
    """Query vs bank with per-subject u64 value cutoffs (pairwise
    downsample). Returns [n] exact shared counts of {h : h <= cut[i]}."""
    cut = np.zeros(len(bank.cnt), dtype=np.uint64)
    cut[: bank.n] = cutoffs
    if q_packed is None:
        q_packed = pack_query_bucketed(q_full, bank.B)
    qhi, qlo, qcnt, dq, tail = q_packed
    out = np.asarray(
        _counts_qvm_cutoff(
            qhi,
            qlo,
            qcnt,
            bank.hi,
            bank.lo,
            bank.cnt,
            jnp.asarray((cut >> np.uint64(32)).astype(np.uint32)),
            jnp.asarray((cut & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        )
    )
    counts = out[: bank.n].astype(np.int64)
    _spill_counts_qvm(q_full, bank, counts, cutoffs=cutoffs)
    return counts


def pairwise_counts_bucketed(mins_list, block=16):
    """All-pairs exact intersection-count matrix [n, n] via bucketed dense
    compare. One async device dispatch per `block` query rows (pipelined
    by the scheduler); results are read back once at the end (a single
    tunnel round-trip). block=16 is the measured sweet spot at 2k x 5000:
    4.6 ms/row kernel time (8-row blocks: 5.3, 32+: 8.1 — an XLA tiling
    cliff) against ~12-15 ms/dispatch tunnel submission."""
    n = len(mins_list)
    if not n:
        return np.zeros((0, 0), dtype=np.int64)
    B = choose_buckets(max((len(m) for m in mins_list), default=0))
    bank = pack_rows_device(mins_list, B)  # raw-sized upload, device pack
    if bank is None:
        bank = pack_rows_bucketed(mins_list, B)
    rows = bank.hi.shape[0]
    block = min(block, rows)
    outs = []
    for i in range(0, rows, block):
        Qhi = jax.lax.dynamic_slice_in_dim(bank.hi, i, block, 0)
        Qlo = jax.lax.dynamic_slice_in_dim(bank.lo, i, block, 0)
        Qcnt = jax.lax.dynamic_slice_in_dim(bank.cnt, i, block, 0)
        outs.append(_counts_block(Qhi, Qlo, Qcnt, bank.hi, bank.lo, bank.cnt))
    out = np.asarray(jnp.concatenate(outs, axis=0)[:n, :n]).astype(np.int64)
    _pairwise_spill_correction(out, mins_list, bank)
    return out


def _pairwise_spill_correction(out, mins_list, bank: BucketedRows) -> None:
    """Exact all-pairs spill correction, in place. For pair (i, j):

        true = stored∩stored + |sp_i ∩ m_j| + |sp_j ∩ m_i| − |sp_i ∩ sp_j|

    (the cross-term is counted once from each side). Every spilled value is
    joined against one value-sorted table of ALL (value, row) pairs, so the
    cost scales with spill count, not with n^2."""
    if not bank.n_spilled:
        return
    n = len(mins_list)
    sp_rows_list = [i for i in range(n) if len(bank.spills[i])]
    sp_vals = np.concatenate([bank.spills[i] for i in sp_rows_list])
    sp_rows = np.repeat(
        np.asarray(sp_rows_list, dtype=np.int64),
        [len(bank.spills[i]) for i in sp_rows_list],
    )
    # (value-sorted (V, R) table over only the UNIQUE spilled values: each
    # row is already sorted, so membership is one searchsorted per row —
    # sorting ALL n*len values cost more than the device pass itself)
    uniq = np.unique(sp_vals)
    cols_parts, rows_parts = [], []
    for j in range(n):
        mj = np.asarray(mins_list[j], dtype=np.uint64)
        if not len(mj):
            continue
        idx = np.searchsorted(mj, uniq)
        np.minimum(idx, len(mj) - 1, out=idx)
        cols = np.flatnonzero(mj[idx] == uniq)
        if len(cols):
            cols_parts.append(cols)
            rows_parts.append(np.full(len(cols), j, dtype=np.int64))
    if not cols_parts:
        return
    Cv = np.concatenate(cols_parts)
    Rv = np.concatenate(rows_parts)
    order = np.argsort(Cv, kind="stable")
    Cv, R = Cv[order], Rv[order]
    kcol = np.searchsorted(uniq, sp_vals)
    lo = np.searchsorted(Cv, kcol, side="left")
    hi_b = np.searchsorted(Cv, kcol, side="right")
    # vectorized: expand every (spill k, matching row j) pair at once
    spans = hi_b - lo
    if spans.sum():
        is_ = np.repeat(sp_rows, spans)
        # gather R[lo[k] : hi_b[k]] for all k: offsets within each span
        js = R[
            np.repeat(lo, spans)
            + (np.arange(int(spans.sum())) - np.repeat(
                np.cumsum(spans) - spans, spans))
        ]
        np.add.at(out, (is_, js), 1)
        off = js != is_
        np.add.at(out, (js[off], is_[off]), 1)
    # a value spilled by BOTH rows of a pair was counted from each side;
    # remove the double count once per ordered pair
    sp_order = np.argsort(sp_vals, kind="stable")
    sv, sr = sp_vals[sp_order], sp_rows[sp_order]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(sv)) + 1])
    ends = np.concatenate([starts[1:], [len(sv)]])
    for a, b in zip(starts, ends):
        if b - a < 2:
            continue
        grp = sr[a:b]
        for x in range(len(grp)):
            for y in range(len(grp)):
                if x != y:
                    out[grp[x], grp[y]] -= 1


def membership_matrix(q_full: np.ndarray, bank: BucketedRows, row_ids, q_packed=None):
    """Bitmask membership of the query's bucketed slots in selected bank
    rows: returns (M [len(row_ids), dq, B] bool device array, q_packed).

    M[r, k, b] == True iff query slot (k, b) holds a hash present in bank
    row row_ids[r]. Spilled subject hashes are OR-ed in on host via the
    query slot map. The caller keeps counts/alive vectors in the same
    (dq, B) layout."""
    if q_packed is None:
        q_packed = pack_query_bucketed(q_full, bank.B)
    qhi, qlo, qcnt, dq, tail = q_packed
    ids = np.asarray(row_ids, dtype=np.int64)
    Shi = bank.hi[jnp.asarray(ids)]
    Slo = bank.lo[jnp.asarray(ids)]
    Scnt = bank.cnt[jnp.asarray(ids)]
    M = _membership_rows(qhi, qlo, Shi, Slo, Scnt)
    spill_bits = {}
    for r, i in enumerate(ids):
        sp = bank.spills[i]
        if len(sp):
            spill_bits[r] = sp
    if spill_bits:
        M = np.array(M)  # np.asarray of a device array is read-only
        # slot map is over the plane-representable query (2**64-1 excluded
        # at pack time; the caller handles that single hash exactly)
        q_full = q_full[q_full != MAX_U64]
        b = (q_full & np.uint64(bank.B - 1)).astype(np.int64)
        # slot of each query hash: rank within its bucket
        order = np.argsort(b, kind="stable")
        bs = b[order]
        change = np.flatnonzero(np.diff(bs)) + 1
        starts = np.concatenate([[0], change])
        sizes = np.diff(np.concatenate([starts, [len(bs)]]))
        slot = np.arange(len(bs)) - np.repeat(starts, sizes)
        pos = {}  # hash -> (slot, bucket)
        qf = q_full[order]
        for h, s, bb in zip(qf.tolist(), slot.tolist(), bs.tolist()):
            pos[h] = (s, bb)
        for r, sp in spill_bits.items():
            for h in sp.tolist():
                if h in pos:
                    s, bb = pos[h]
                    M[r, s, bb] = True
        M = jnp.asarray(M)
    return M, q_packed


@jax.jit
def _membership_bits_packed(qhi, qlo, Shi, Slo, Scnt, slotmap):
    """Selected subject rows -> packed membership bitsets in sorted-query
    INDEX space, entirely on device.

    qhi/qlo: [dq, B] query planes; Shi/Slo/Scnt: [nm, d, B] subject planes
    (already row-gathered); slotmap: [W*32] int32 mapping query index j ->
    flat slot position slot*B+bucket (dq*B for positions with no slot:
    padding past len(q), and the 2^64-1 tail). Returns [nm, W] u32 with
    bit j of word w == (query hash 32w+j) in subject row."""
    m = _membership_rows(qhi, qlo, Shi, Slo, Scnt)  # [nm, dq, B] bool
    nm = m.shape[0]
    flat = m.reshape(nm, -1)
    flat = jnp.concatenate(
        [flat, jnp.zeros((nm, 1), dtype=flat.dtype)], axis=1
    )
    bits = jnp.take(flat, slotmap, axis=1)  # [nm, W*32]
    return pack_bits_u32(bits)


@jax.jit
def _membership_bits_packed_batch(Qhi, Qlo, Shi, Slo, Scnt, sel, slotmaps):
    """Batched _membership_bits_packed: bq queries against per-query row
    selections from ONE chunk's planes.

    Qhi/Qlo: [bq, dq, B] query planes (PAD-padded dq rows are inert);
    Shi/Slo/Scnt: the chunk planes [rows, d, B] / [rows, B];
    sel: [bq, cap] int32 row selections (pad rows point anywhere — the
    caller's row_src marks them); slotmaps: [bq, Wbits] int32.
    Returns [bq, cap, Wbits/32] u32."""

    def one(qhi, qlo, s, smap):
        m = _membership_rows(
            qhi, qlo,
            jnp.take(Shi, s, axis=0),
            jnp.take(Slo, s, axis=0),
            jnp.take(Scnt, s, axis=0),
        )
        flat = m.reshape(m.shape[0], -1)
        flat = jnp.concatenate(
            [flat, jnp.zeros((m.shape[0], 1), dtype=flat.dtype)], axis=1
        )
        return pack_bits_u32(jnp.take(flat, smap, axis=1))

    return jax.vmap(one, in_axes=(0, 0, 0, 0))(Qhi, Qlo, sel, slotmaps)


def query_slot_map(q_core: np.ndarray, B: int, dq: int, n_positions: int):
    """Host helper: flat slot position (slot*B + bucket) of each sorted
    query hash, padded with the dummy position dq*B out to n_positions
    (covers the word-padding tail and an excluded 2^64-1 hash)."""
    slotmap = np.full(n_positions, dq * B, dtype=np.int32)
    if len(q_core):
        _b, bs, slot, order = _bucketize(q_core, B)
        slotmap[order] = (slot * B + bs).astype(np.int32)
    return slotmap


# -- abundance-weighted products (angular similarity) -----------------------


def _products_block_impl(Qhi, Qlo, Qav, Qcnt, Shi, Slo, Sav, Scnt):
    """[bq, d, B] query planes (+ int32 abundance planes, occupancy counts)
    vs [ns, d, B] subjects -> [bq, ns] i64 sums of abundance products over
    the hash intersection. Occupancy counts gate validity, so zero-filled
    empty slots can never alias a real hash; empty slots carry abundance 0
    anyway, making any residual false compare contribute nothing."""
    d = Shi.shape[1]
    dq = Qhi.shape[1]
    acc = jnp.zeros((Qhi.shape[0], Shi.shape[0]), jnp.int64)
    qa64 = Qav.astype(jnp.int64)
    qvalid = Qcnt[:, None, :] > jnp.arange(dq, dtype=Qcnt.dtype)[None, :, None]
    for k2 in range(d):
        svalid = Scnt[:, None, :] > k2  # [ns, 1, B]
        eq = (
            (Shi[None, :, k2, None, :] == Qhi[:, None, :, :])
            & (Slo[None, :, k2, None, :] == Qlo[:, None, :, :])
            & qvalid[:, None, :, :]
            & svalid[None, :, :, :]
        )
        prod = qa64[:, None, :, :] * Sav[None, :, k2, None, :].astype(jnp.int64)
        acc = acc + jnp.sum(
            jnp.where(eq, prod, 0), axis=(2, 3), dtype=jnp.int64
        )
    return acc


_products_block = jax.jit(_products_block_impl)


def _pack_weighted(mins_list, abunds_list):
    """Occupancy-validity packing of (hash, abundance) rows: slot depth d
    is the max observed bucket load, so nothing spills and every value
    (including 2**64-1) is representable. Returns (hi, lo, av, cnt, B)."""
    n = len(mins_list)
    B = choose_buckets(max((len(m) for m in mins_list), default=0))
    lens = np.fromiter((len(m) for m in mins_list), dtype=np.int64, count=n)
    N = int(lens.sum())

    if N:
        vals = np.concatenate([np.asarray(m, np.uint64) for m in mins_list])
        ab = np.concatenate([np.asarray(a, np.int64) for a in abunds_list])
        row = np.repeat(np.arange(n, dtype=np.int64), lens)
        b = (vals & np.uint64(B - 1)).astype(np.int64)
        key = row * B + b
        order = np.argsort(key, kind="stable")
        ks, vs, avs = key[order], vals[order], ab[order]
        pos = np.arange(len(ks), dtype=np.int64)
        is_start = np.empty(len(ks), dtype=bool)
        is_start[0] = True
        np.not_equal(ks[1:], ks[:-1], out=is_start[1:])
        slot = pos - np.maximum.accumulate(np.where(is_start, pos, 0))
        d = max(8, int(slot.max()) + 1)
    else:
        d = 8

    rows = _pad_rows(n)
    hi = np.zeros((rows, d, B), dtype=np.uint32)
    lo = np.zeros((rows, d, B), dtype=np.uint32)
    av = np.zeros((rows, d, B), dtype=np.int32)
    cnt = np.zeros((rows, B), dtype=np.uint8)
    if N:
        ro = row[order]
        bo = b[order]
        hi[ro, slot, bo] = (vs >> np.uint64(32)).astype(np.uint32)
        lo[ro, slot, bo] = (vs & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        av[ro, slot, bo] = avs.astype(np.int32)
        starts = np.flatnonzero(is_start)
        sizes = np.diff(np.concatenate([starts, [len(ks)]]))
        assert sizes.max() <= 255
        cnt.reshape(-1)[ks[starts]] = sizes.astype(np.uint8)
    return hi, lo, av, cnt, B


def pairwise_weighted_products(mins_list, abunds_list, block=8):
    """All-pairs exact [n, n] i64 matrix of sum(a_i(h) * a_j(h)) over each
    pair's hash intersection — the hot term of abundance-weighted (angular)
    similarity (reference `minhash.rs:635-680`), batched on device.

    Integer accumulation makes the result order-independent and equal to
    the host's f64 merge-join sum whenever it fits 2**53 (callers guard)."""
    n = len(mins_list)
    if not n:
        return np.zeros((0, 0), dtype=np.int64)
    hi, lo, av, cnt, B = _pack_weighted(mins_list, abunds_list)
    hi, lo = jnp.asarray(hi), jnp.asarray(lo)
    av, cnt = jnp.asarray(av), jnp.asarray(cnt)
    rows = hi.shape[0]
    blk = min(block, rows)
    outs = []
    for i in range(0, rows, blk):
        Qhi = jax.lax.dynamic_slice_in_dim(hi, i, blk, 0)
        Qlo = jax.lax.dynamic_slice_in_dim(lo, i, blk, 0)
        Qav = jax.lax.dynamic_slice_in_dim(av, i, blk, 0)
        Qcnt = jax.lax.dynamic_slice_in_dim(cnt, i, blk, 0)
        outs.append(_products_block(Qhi, Qlo, Qav, Qcnt, hi, lo, av, cnt))
    return np.asarray(jnp.concatenate(outs, axis=0))[:n, :n]
