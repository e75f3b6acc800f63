"""Pallas TPU kernel for the canonical-k-mer murmur sketch hot path.

Replaces the XLA elementwise pipeline in `ops/sketch.py:_window_hash_pairs`
with a single fused VMEM-resident kernel: every shifted window column, the
canonical-strand compare, and the 32-bit-limb murmur pipeline execute on
one block of windows without intermediate HBM round-trips.

Behavioral reference: `/root/reference/src/core/src/signature.rs:246-306`
(SeqToHashes canonical window iteration) — implementation is an original
TPU design.

Layout: windows are laid out flat as rows of 128 lanes; each grid step
processes R rows (R*128 windows) and reads an (R+8, 128) block so shifted
streams resolve inside the block. A flat shift by j of an (R, 128) stream
is one lane roll plus a row-select and consumes one row:

    shifted[r, l] = stream[r + (l + j) // 128, (l + j) % 128]
                  = select(l < 128 - j, roll(stream, -j, lanes)[r],
                                        roll(stream, -j, lanes)[r + 1])

The per-window work is organized around *limb streams* rather than k byte
columns: the little-endian 4-byte word starting at position q is computed
ONCE as a stream L0(q), and every murmur input limb of the window at p is
a lane shift of it (flimb_b(p) = L0(p + 4b)). Likewise the reverse-
complement limbs are shifts of one byte-reversed complement stream, the
big-endian compare groups are shifts of the byteswapped streams, and
window validity is a log-depth AND tree over one per-byte validity stream.
This cuts the vector op count roughly in half versus materializing all k
shifted byte columns (complementing and validity-checking each).

Requires ksize <= 129 (max lane shift of a limb stream is k-1 <= 128).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .murmur32 import byteswap32, murmur_words32

LANES = 128
DEFAULT_ROWS = 512  # windows per grid step = ROWS * LANES (v5e sweep optimum)
EXTRA_ROWS = 8      # lookahead rows per block (supports shift-chain depth 8)


def _auto_rows(ksize: int) -> int:
    """Rows per grid step, scaled down for large k: live VMEM grows with
    the limb-stream count (~nlimbs + fixed), and k=51 at 512 rows
    measures 18.4M scoped VMEM against the 16M limit. 512 rows fit
    through k<=31 (8 limbs); halve per ~doubling of limbs."""
    nlimbs = -(-ksize // 4)
    if nlimbs <= 8:
        return DEFAULT_ROWS
    if nlimbs <= 17:
        return DEFAULT_ROWS // 2
    return DEFAULT_ROWS // 4


def _shift_stream(x, j: int, interpret: bool):
    """Flat left-shift by j lanes of an (R, LANES) stream -> (R-1, LANES).

    j in [0, 128]; consumes one lookahead row."""
    R = x.shape[0]
    if j == 0:
        return x[: R - 1]
    if j == LANES:
        return x[1:]
    if interpret:
        rolled = jnp.roll(x, -j, axis=1)
    else:
        # pltpu.roll requires non-negative shifts; LANES - j == -j (mod 128).
        # The shift must be an i32 scalar (x64 mode would make a bare int i64).
        rolled = pltpu.roll(x, shift=jnp.int32(LANES - j), axis=1)
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (R - 1, LANES), 1)
    return jnp.where(lane_idx < LANES - j, rolled[: R - 1], rolled[1:])


_A = np.uint32(ord("A"))
_C = np.uint32(ord("C"))
_G = np.uint32(ord("G"))
_T = np.uint32(ord("T"))


def _complement_bytes(c):
    """Branchless ACGT complement via the ASCII 2-bit code:
    code = (c >> 1) & 3 gives A=0, C=1, T=2, G=3; A<->T differ by XOR 21,
    C<->G by XOR 4, and code bit 0 distinguishes the two pairs.
    Non-ACGT bytes map to garbage — their windows are invalid anyway."""
    pair = (c >> np.uint32(1)) & np.uint32(1)
    mask = jnp.where(pair != 0, np.uint32(4), np.uint32(21))
    return c ^ mask


def _valid_window_stream(v1, ksize: int, interpret: bool):
    """AND over k consecutive per-byte validity lanes, log-depth.

    v1: (R, LANES) uint32 0/1 per-byte validity. Builds v_{2^t} streams by
    doubling (v_{2t}(p) = v_t(p) & v_t(p+t)), then combines
    v_k(p) = v_m(p) & v_m(p + k - m) with m the largest power of two <= k.
    Consumes one lookahead row per level (<= 8 for k <= 129)."""
    span = 1
    v = v1
    while span * 2 <= ksize:
        sh = _shift_stream(v, span, interpret)
        v = v[: sh.shape[0]] & sh
        span *= 2
    if span < ksize:
        sh = _shift_stream(v, ksize - span, interpret)
        v = v[: sh.shape[0]] & sh
    return v


def _hash_streams(squ, *, ksize: int, seed: int, rows: int, interpret: bool):
    "Shared hash pipeline: (brows, LANES) block -> (hi, lo, valid) (rows, LANES)."
    nlimbs = -(-ksize // 4)
    rem = ksize - 4 * (nlimbs - 1)  # bytes in the last limb (1..4)

    # per-byte streams on the full block (elementwise, one pass)
    comp = _complement_bytes(squ)
    valid1 = (
        ((squ == _A) | (squ == _C) | (squ == _G) | (squ == _T))
    ).astype(jnp.uint32)

    # window validity: log-depth AND tree over the per-byte stream
    valid = _valid_window_stream(valid1, ksize, interpret)[:rows]

    # little-endian 4-byte word streams (rows+1 rows so limb shifts resolve)
    def word_stream(byte_stream):
        c0 = byte_stream[: rows + 1]
        c1 = _shift_stream(byte_stream[: rows + 2], 1, interpret)
        c2 = _shift_stream(byte_stream[: rows + 3], 2, interpret)[: rows + 1]
        c3 = _shift_stream(byte_stream[: rows + 4], 3, interpret)[: rows + 1]
        le = (
            c0
            | (c1 << np.uint32(8))
            | (c2 << np.uint32(16))
            | (c3 << np.uint32(24))
        )
        return le, (c0, c1, c2, c3)

    L0, _ = word_stream(squ)          # fwd LE words:   L0(q) = seq[q..q+3] LE
    C0, ccols = word_stream(comp)     # comp LE words:  C0(q) = comp[q..q+3] LE
    BEL0 = byteswap32(L0)             # fwd BE words (for the canonical compare)
    V0 = byteswap32(C0)               # byte-reversed comp words: rc LE limbs

    # forward limbs: flimb_b(p) = L0(p + 4b); last limb masks bytes past k
    last_mask = (
        np.uint32(0xFFFFFFFF) if rem == 4 else np.uint32((1 << (8 * rem)) - 1)
    )
    flimbs = [_shift_stream(L0, 4 * b, interpret) for b in range(nlimbs)]
    flimbs[-1] = flimbs[-1] & last_mask
    fbe = [_shift_stream(BEL0, 4 * b, interpret) for b in range(nlimbs - 1)]
    fbe.append(byteswap32(flimbs[-1]))

    # reverse-complement limbs: rlimb_b(p) = V0(p + k - 4 - 4b) for full
    # limbs; the last (rem-byte) limb is assembled from the comp byte
    # streams directly (its V0 offset would be negative for rem < 4)
    rlimbs = [
        _shift_stream(V0, ksize - 4 - 4 * b, interpret)
        for b in range(nlimbs - 1)
    ]
    rbe = [
        _shift_stream(C0, ksize - 4 - 4 * b, interpret)
        for b in range(nlimbs - 1)
    ]
    if rem == 4:
        rlimbs.append(V0[:rows])
        rbe.append(C0[:rows])
    else:
        last = ccols[rem - 1][:rows].astype(jnp.uint32)
        for i in range(rem - 2, -1, -1):
            last = last | (
                ccols[i][:rows] << np.uint32(8 * (rem - 1 - i))
            )
        rlimbs.append(last)
        rbe.append(byteswap32(last))

    # canonical strand: fwd <= rc over the k bytes, big-endian group compare
    use_fwd = jnp.ones((rows, LANES), dtype=bool)
    for gf, gr in zip(reversed(fbe), reversed(rbe)):
        use_fwd = (gf < gr) | ((gf == gr) & use_fwd)

    # canonical limbs -> (hi, lo) word pairs for murmur
    climbs = [jnp.where(use_fwd, f, r) for f, r in zip(flimbs, rlimbs)]
    zero = jnp.zeros((rows, LANES), dtype=jnp.uint32)
    nwords = -(-ksize // 8)
    words = []
    for w in range(nwords):
        lo_limb = climbs[2 * w]
        hi_limb = climbs[2 * w + 1] if 2 * w + 1 < len(climbs) else zero
        words.append((hi_limb, lo_limb))
    if len(words) % 2:
        words.append((zero, zero))

    hi, lo = murmur_words32(words, ksize, seed, (rows, LANES))
    return hi, lo, valid


def _aa_hash_streams(squ, *, ksize: int, seed: int, rows: int, interpret: bool):
    """Amino-acid hash pipeline: (brows, LANES) byte block -> (hi, lo,
    valid) (rows, LANES). Protein windows hash as-is — no reverse
    complement, no canonical compare, and every residue (incl. 'X'/'*')
    is hashable (reference `signature.rs:362-393` applies no validity
    filter) — so validity only marks windows that run past the sequence
    into the zero padding (aa bytes are ASCII letters/'*', never 0)."""
    nlimbs = -(-ksize // 4)
    rem = ksize - 4 * (nlimbs - 1)

    valid1 = (squ != 0).astype(jnp.uint32)
    valid = _valid_window_stream(valid1, ksize, interpret)[:rows]

    c0 = squ[: rows + 1]
    c1 = _shift_stream(squ[: rows + 2], 1, interpret)
    c2 = _shift_stream(squ[: rows + 3], 2, interpret)[: rows + 1]
    c3 = _shift_stream(squ[: rows + 4], 3, interpret)[: rows + 1]
    L0 = (
        c0
        | (c1 << np.uint32(8))
        | (c2 << np.uint32(16))
        | (c3 << np.uint32(24))
    )

    last_mask = (
        np.uint32(0xFFFFFFFF) if rem == 4 else np.uint32((1 << (8 * rem)) - 1)
    )
    flimbs = [_shift_stream(L0, 4 * b, interpret) for b in range(nlimbs)]
    flimbs[-1] = flimbs[-1] & last_mask

    zero = jnp.zeros((rows, LANES), dtype=jnp.uint32)
    nwords = -(-ksize // 8)
    words = []
    for w in range(nwords):
        lo_limb = flimbs[2 * w]
        hi_limb = flimbs[2 * w + 1] if 2 * w + 1 < len(flimbs) else zero
        words.append((hi_limb, lo_limb))
    if len(words) % 2:
        words.append((zero, zero))

    hi, lo = murmur_words32(words, ksize, seed, (rows, LANES))
    return hi, lo, valid


def _sketch_block_kernel(
    squ_ref, look_ref, hi_ref, lo_ref, valid_ref, *, ksize: int, seed: int,
    rows: int, interpret: bool, streams=_hash_streams
):
    squ = jnp.concatenate(
        [squ_ref[:], look_ref[:EXTRA_ROWS]], axis=0
    ).astype(jnp.uint32)
    hi, lo, valid = streams(
        squ, ksize=ksize, seed=seed, rows=rows, interpret=interpret
    )
    hi_ref[:] = hi
    lo_ref[:] = lo
    valid_ref[:] = valid


LOOK_ROWS = 32  # lookahead block rows (u8 VMEM tiles are (32, 128))


def _flat_rows_layout(squ, ksize: int, rows: int):
    """Lay a [B, S] byte batch out as contiguous uint8 lane rows with NO
    overlapping-block gather: each batch pads to a whole number of row
    blocks plus one spare block, and the kernel reads its (rows, 128)
    main block plus a (LOOK_ROWS, 128) lookahead block through two
    BlockSpec views of the SAME array (only EXTRA_ROWS of the lookahead
    are consumed; 32 satisfies the u8 sublane tile). The previous
    `squ[:, idx]` gather materialization cost 11.8 ms/batch on v5e —
    3x the kernel itself — and an i32 staging copy 4x the bytes.

    Returns (flat [B*(nblocks+1)*rows, LANES] u8, nblocks, n_pad,
    main_spec, look_spec) where the specs map grid step b = q*nblocks + j
    to the right row blocks."""
    B, S = squ.shape
    n = S - ksize + 1
    block = rows * LANES
    nblocks = -(-n // block)
    n_pad = nblocks * block
    rb = (nblocks + 1) * rows  # rows per batch incl. lookahead padding
    pad = rb * LANES - S
    flat = jnp.pad(squ, ((0, 0), (0, pad))).reshape(B * rb, LANES)
    per_look = rows // LOOK_ROWS

    # all index math in explicit i32 lax ops: python `//` on a traced
    # index promotes through jnp floor_divide, which recurses under
    # jax_enable_x64 during Mosaic index-map lowering
    def main_ix(b):
        b = jax.lax.convert_element_type(b, jnp.int32)
        q = jax.lax.div(b, jnp.int32(nblocks))
        return (b + q, np.int32(0))

    def look_ix(b):
        b = jax.lax.convert_element_type(b, jnp.int32)
        q = jax.lax.div(b, jnp.int32(nblocks))
        return ((b + q + jnp.int32(1)) * jnp.int32(per_look), np.int32(0))

    main_spec = pl.BlockSpec((rows, LANES), main_ix)
    look_spec = pl.BlockSpec((LOOK_ROWS, LANES), look_ix)
    return flat, nblocks, n_pad, main_spec, look_spec


SLOTS = 8  # default survivors per 128-window segment (one lane row)


def _sketch_slots_kernel(
    mh_ref, squ_ref, look_ref, out_ref, *, ksize: int, seed: int, rows: int,
    slots: int, interpret: bool
):
    """Fused sketch + threshold + segment-local compaction.

    Applies the scaled cutoff in-kernel and extracts up to SLOTS surviving
    hashes per 128-window lane row by repeated min-position reduction —
    reductions and selects only, no gathers (TPU gathers serialize at
    ~25 ns/element; the old XLA searchsorted compaction was 64% of total
    sketch time). Output block (rows, 128) uint32 packs, per lane row:
    lanes [0, SLOTS) = survivor his, [SLOTS, 2*SLOTS) = survivor los (in
    window order), lane 2*SLOTS = the TRUE survivor count (callers detect
    count > SLOTS overflow and reroute that chunk to the dense path).
    """
    squ = jnp.concatenate(
        [squ_ref[:], look_ref[:EXTRA_ROWS]], axis=0
    ).astype(jnp.uint32)
    hi, lo, valid = _hash_streams(
        squ, ksize=ksize, seed=seed, rows=rows, interpret=interpret
    )

    th = mh_ref[0, 0]
    tl = mh_ref[0, 1]
    keep = (valid != 0) & ((hi < th) | ((hi == th) & (lo <= tl)))

    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)

    # rank each survivor by an inclusive lane prefix sum (Hillis-Steele
    # over pltpu.roll — Mosaic does not lower cumsum), then per slot j
    # ONE-HOT select rank j+1 and extract via signed i32 sums — Mosaic has
    # no unsigned reductions; exactly one lane hits per (row, slot), so
    # the sum IS the value bit-identically mod 2^32. (The earlier
    # per-slot min-position loop cost an extra cross-lane min reduction +
    # mask update per slot; measured ~14% of the kernel.)
    rank = keep.astype(jnp.int32)
    for d in (1, 2, 4, 8, 16, 32, 64):
        if interpret:
            sh = jnp.roll(rank, d, axis=1)
        else:
            sh = pltpu.roll(rank, shift=jnp.int32(d), axis=1)
        rank = rank + jnp.where(lane_idx >= d, sh, jnp.int32(0))
    hi_s = hi.astype(jnp.int32)
    lo_s = lo.astype(jnp.int32)
    zero = jnp.int32(0)

    out = jnp.zeros((rows, LANES), dtype=jnp.int32)
    for j in range(slots):
        hit = keep & (rank == j + 1)
        hij = jnp.sum(
            jnp.where(hit, hi_s, zero), axis=1, keepdims=True,
            dtype=jnp.int32,
        )
        loj = jnp.sum(
            jnp.where(hit, lo_s, zero), axis=1, keepdims=True,
            dtype=jnp.int32,
        )
        out = jnp.where(lane_idx == j, hij, out)
        out = jnp.where(lane_idx == slots + j, loj, out)

    count = jax.lax.slice_in_dim(rank, LANES - 1, LANES, axis=1)
    out = jnp.where(lane_idx == 2 * slots, count, out)
    out_ref[:] = out.astype(jnp.uint32)


@functools.partial(
    jax.jit, static_argnames=("ksize", "seed", "rows", "slots", "interpret")
)
def sketch_survivor_slots_pallas(
    squ,
    max_hash,
    *,
    ksize: int,
    seed: int = 42,
    rows: int | None = None,
    slots: int = SLOTS,
    interpret: bool = False,
):
    """Fused sketch kernel with in-kernel compaction (scaled path).

    squ: [B, S] uint8 uppercased sequences; max_hash: uint64 scalar cutoff.
    Returns (slots_hi [B, R, slots] uint32, slots_lo [B, R, slots] uint32,
    counts [B, R] int32) where R = n_pad // 128 segments of 128 consecutive
    windows. Survivors appear in window order (segment-major, slot-minor).
    counts hold TRUE per-segment survivor counts; count > slots means the
    segment overflowed and its slots are truncated (callers reroute those
    chunks). slots=4 runs ~16% faster than 8 (three fewer reduce passes
    per extraction loop) and is safe when expected survivor density
    leaves P[overflow] negligible — see ops/sketch.py:_pick_slots.
    """
    if rows is None:
        rows = _auto_rows(ksize)
    B, S = squ.shape
    flat, nblocks, n_pad, main_spec, look_spec = _flat_rows_layout(
        squ, ksize, rows
    )

    mh = max_hash.astype(jnp.uint64)
    mh_pair = jnp.stack(
        [(mh >> np.uint64(32)).astype(jnp.uint32), mh.astype(jnp.uint32)]
    ).reshape(1, 2)

    kernel = functools.partial(
        _sketch_slots_kernel,
        ksize=ksize,
        seed=seed,
        rows=rows,
        slots=slots,
        interpret=interpret,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B * nblocks,),
        in_specs=[
            pl.BlockSpec(
                (1, 2), lambda b: (np.int32(0), np.int32(0)),
                memory_space=pltpu.SMEM,
            ),
            main_spec,
            look_spec,
        ],
        out_specs=pl.BlockSpec((rows, LANES), lambda b: (b, np.int32(0))),
        out_shape=jax.ShapeDtypeStruct((B * nblocks * rows, LANES), jnp.uint32),
        interpret=interpret,
    )(mh_pair, flat, flat)

    out = out.reshape(B, nblocks * rows, LANES)
    packed = jax.lax.slice(out, (0, 0, 0), (B, nblocks * rows, 2 * slots + 1))
    slots_hi = packed[:, :, :slots]
    slots_lo = packed[:, :, slots : 2 * slots]
    counts = packed[:, :, 2 * slots].astype(jnp.int32)
    return slots_hi, slots_lo, counts


def _window_hash_pairs_impl(squ, ksize, seed, rows, interpret, streams):
    batched = squ.ndim == 2
    if not batched:
        squ = squ[None, :]
    B, S = squ.shape
    flat, nblocks, n_pad, main_spec, look_spec = _flat_rows_layout(
        squ, ksize, rows
    )

    kernel = functools.partial(
        _sketch_block_kernel,
        ksize=ksize,
        seed=seed,
        rows=rows,
        interpret=interpret,
        streams=streams,
    )
    hi, lo, valid = pl.pallas_call(
        kernel,
        grid=(B * nblocks,),
        # index maps return int32 zeros explicitly: under jax_enable_x64 a
        # bare 0 traces as i64, which Mosaic cannot legalize in func.return
        in_specs=[main_spec, look_spec],
        out_specs=[
            pl.BlockSpec((rows, LANES), lambda b: (b, np.int32(0))),
            pl.BlockSpec((rows, LANES), lambda b: (b, np.int32(0))),
            pl.BlockSpec((rows, LANES), lambda b: (b, np.int32(0))),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * nblocks * rows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((B * nblocks * rows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((B * nblocks * rows, LANES), jnp.uint32),
        ],
        interpret=interpret,
    )(flat, flat)
    hi = hi.reshape(B, n_pad)
    lo = lo.reshape(B, n_pad)
    valid = valid.reshape(B, n_pad)
    if not batched:
        return hi[0], lo[0], valid[0]
    return hi, lo, valid


@functools.partial(
    jax.jit, static_argnames=("ksize", "seed", "rows", "interpret")
)
def window_hash_pairs_pallas(
    squ,
    *,
    ksize: int,
    seed: int = 42,
    rows: int | None = None,
    interpret: bool = False,
):
    """Canonical murmur hashes + validity for all windows of an uppercased
    byte array.

    squ: [S] or [B, S] uint8 — uppercased sequence(s). Returns
    (hi, lo, valid) uint32 arrays of shape [n_pad] (or [B, n_pad]) where
    n_pad = ceil((S - ksize + 1) / (rows*128)) * rows*128; entries past the
    real window count have valid == 0 (zero padding is non-ACGT).
    """
    if rows is None:
        rows = _auto_rows(ksize)
    return _window_hash_pairs_impl(
        squ, ksize, seed, rows, interpret, _hash_streams
    )


@functools.partial(
    jax.jit, static_argnames=("ksize", "seed", "rows", "interpret")
)
def aa_window_hash_pairs_pallas(
    squ,
    *,
    ksize: int,
    seed: int = 42,
    rows: int | None = None,
    interpret: bool = False,
):
    """Murmur hashes for all amino-acid windows of an uppercased (and, for
    dayhoff/hp, pre-remapped) aa byte array — the protein half of the
    reference's sketch surface (`signature.rs:362-393`) on the chip.
    Same contract as window_hash_pairs_pallas; `valid` marks windows fully
    inside the true sequence (zero padding is invalid, every real residue
    hashes). ~2x the DNA rate: no reverse complement or canonical compare.
    """
    if rows is None:
        rows = _auto_rows(ksize)
    return _window_hash_pairs_impl(
        squ, ksize, seed, rows, interpret, _aa_hash_streams
    )
