"""EXPERIMENT V2: pressure-minimized single-pass sketch kernel.

The production `_hash_streams` materializes ~30 live (rows,128) streams
(all forward/rc limbs + BE compare groups + words) before murmur runs; the
mulchain microbench shows the VPU sustains ~5.7 Tops/s on a tight chain,
while the full kernel achieves only ~0.7 Tops/s-equivalent — a scheduling
/ live-range penalty, not an op-count problem.

V2 restructures the SAME math to keep the live set small:
 1. compute use_fwd first — the BE compare chain walks group t = nlimbs-1
    down to 0 holding only (BEL0, C0shift, acc);
 2. then walk word pairs w = 0..3, each time deriving the two climbs from
    (L0, V0, use_fwd) by shifts and feeding the murmur h1/h2 update for
    that word immediately, so limb streams die right after use.

Value-exactness is asserted against the production kernel on the chip.
Usage: python tools/exp_v2_kernel.py [check|time]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import sourmash_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sourmash_tpu.ops import pallas_sketch as ps
from sourmash_tpu.ops.murmur32 import (
    C1,
    C2,
    N1,
    N2,
    add64,
    byteswap32,
    fmix64,
    mul64_const,
    mul_small,
    rotl64,
    shr64,
    xor64,
)

LANES = ps.LANES
ROWS = ps.DEFAULT_ROWS
EXTRA = ps.EXTRA_ROWS
KSIZE, SEED = 31, 42


def _hash_streams_v2(squ, *, ksize, seed, rows, interpret):
    "Same (hi, lo, valid) as ps._hash_streams, low-pressure op order."
    shift = lambda x, j: ps._shift_stream(x, j, interpret)
    nlimbs = -(-ksize // 4)
    rem = ksize - 4 * (nlimbs - 1)
    last_mask = (
        np.uint32(0xFFFFFFFF) if rem == 4 else np.uint32((1 << (8 * rem)) - 1)
    )

    comp = ps._complement_bytes(squ)

    # base word streams (kept live throughout: 4 streams)
    def word_stream(byte_stream):
        c0 = byte_stream[: rows + 1]
        c1 = shift(byte_stream[: rows + 2], 1)
        c2 = shift(byte_stream[: rows + 3], 2)[: rows + 1]
        c3 = shift(byte_stream[: rows + 4], 3)[: rows + 1]
        return (
            c0
            | (c1 << np.uint32(8))
            | (c2 << np.uint32(16))
            | (c3 << np.uint32(24))
        ), (c0, c1, c2, c3)

    L0, _ = word_stream(squ)
    C0, ccols = word_stream(comp)
    BEL0 = byteswap32(L0)
    V0 = byteswap32(C0)

    def flimb(b):
        v = shift(L0, 4 * b)
        return v & last_mask if b == nlimbs - 1 else v

    def rlimb(b):
        if b < nlimbs - 1:
            return shift(V0, ksize - 4 - 4 * b)
        if rem == 4:
            return V0[:rows]
        last = ccols[rem - 1][:rows].astype(jnp.uint32)
        for i in range(rem - 2, -1, -1):
            last = last | (ccols[i][:rows] << np.uint32(8 * (rem - 1 - i)))
        return last

    def fbe(b):
        if b < nlimbs - 1:
            return shift(BEL0, 4 * b)
        return byteswap32(flimb(b))

    def rbe(b):
        if b < nlimbs - 1:
            return shift(C0, ksize - 4 - 4 * b)
        return byteswap32(rlimb(b))

    # 1. canonical strand first: walk the compare groups high-to-low with
    #    only the accumulator + current pair live
    use_fwd = jnp.ones((rows, LANES), dtype=bool)
    for b in reversed(range(nlimbs)):
        gf = fbe(b)[:rows]
        gr = rbe(b)[:rows]
        use_fwd = (gf < gr) | ((gf == gr) & use_fwd)

    # 2. murmur, one word pair at a time; climbs derived on demand
    def climb(i):
        if i >= nlimbs:
            return jnp.zeros((rows, LANES), dtype=jnp.uint32)
        return jnp.where(use_fwd, flimb(i)[:rows], rlimb(i)[:rows])

    shape = (rows, LANES)
    seed_pair = (
        jnp.full(shape, np.uint32((seed >> 32) & 0xFFFFFFFF), jnp.uint32),
        jnp.full(shape, np.uint32(seed & 0xFFFFFFFF), jnp.uint32),
    )
    h1 = seed_pair
    h2 = (seed_pair[0], seed_pair[1])

    def word(w):
        return (climb(2 * w + 1), climb(2 * w))  # (hi, lo)

    L = ksize
    nblocks = L // 16
    for blk in range(nblocks):
        k1 = word(2 * blk)
        k1 = mul64_const(k1, C1)
        k1 = rotl64(k1, 31)
        k1 = mul64_const(k1, C2)
        h1 = xor64(h1, k1)
        h1 = rotl64(h1, 27)
        h1 = add64(h1, h2)
        h1 = add64(mul_small(h1, 5), (jnp.uint32(N1[0]), jnp.uint32(N1[1])))
        k2 = word(2 * blk + 1)
        k2 = mul64_const(k2, C2)
        k2 = rotl64(k2, 33)
        k2 = mul64_const(k2, C1)
        h2 = xor64(h2, k2)
        h2 = rotl64(h2, 31)
        h2 = add64(h2, h1)
        h2 = add64(mul_small(h2, 5), (jnp.uint32(N2[0]), jnp.uint32(N2[1])))

    t = L & 15
    if t > 8:
        k2 = word(2 * nblocks + 1)
        k2 = mul64_const(k2, C2)
        k2 = rotl64(k2, 33)
        k2 = mul64_const(k2, C1)
        h2 = xor64(h2, k2)
    if t > 0:
        k1 = word(2 * nblocks)
        k1 = mul64_const(k1, C1)
        k1 = rotl64(k1, 31)
        k1 = mul64_const(k1, C2)
        h1 = xor64(h1, k1)

    ln = (jnp.uint32(0), jnp.uint32(L))
    h1 = xor64(h1, ln)
    h2 = xor64(h2, ln)
    h1 = add64(h1, h2)
    h2 = add64(h2, h1)
    h1 = fmix64(h1)
    h2 = fmix64(h2)
    h1 = add64(h1, h2)

    # 3. validity last (independent subgraph)
    valid1 = (
        (squ == ps._A) | (squ == ps._C) | (squ == ps._G) | (squ == ps._T)
    ).astype(jnp.uint32)
    valid = ps._valid_window_stream(valid1, ksize, interpret)[:rows]
    return h1[0], h1[1], valid


def _slots_kernel_v2(mh_ref, squ_ref, out_ref, *, ksize, rows, slots,
                     interpret):
    squ = squ_ref[:].astype(jnp.uint32)
    hi, lo, valid = _hash_streams_v2(
        squ, ksize=ksize, seed=SEED, rows=rows, interpret=interpret
    )
    th = mh_ref[0, 0]
    tl = mh_ref[0, 1]
    keep = (valid != 0) & ((hi < th) | ((hi == th) & (lo <= tl)))
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    sentinel = jnp.int32(LANES)
    masked = jnp.where(keep, lane_idx, sentinel)
    hi_s = hi.astype(jnp.int32)
    lo_s = lo.astype(jnp.int32)
    zero = jnp.int32(0)
    out = jnp.zeros((rows, LANES), dtype=jnp.int32)
    for j in range(slots):
        m = jnp.min(masked, axis=1, keepdims=True)
        hit = masked == m
        hij = jnp.sum(jnp.where(hit, hi_s, zero), axis=1, keepdims=True,
                      dtype=jnp.int32)
        loj = jnp.sum(jnp.where(hit, lo_s, zero), axis=1, keepdims=True,
                      dtype=jnp.int32)
        masked = jnp.where(hit, sentinel, masked)
        out = jnp.where(lane_idx == j, hij, out)
        out = jnp.where(lane_idx == slots + j, loj, out)
    count = jnp.sum(keep.astype(jnp.int32), axis=1, keepdims=True,
                    dtype=jnp.int32)
    out = jnp.where(lane_idx == 2 * slots, count, out)
    out_ref[:] = out.astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("ksize", "rows", "slots"))
def v2_sketch(squ, max_hash, *, ksize=KSIZE, rows=ROWS, slots=4):
    B, S = squ.shape
    n = S - ksize + 1
    block = rows * LANES
    nblocks = -(-n // block)
    n_pad = nblocks * block
    need = n_pad + EXTRA * LANES
    pad = need - S
    squ32 = jnp.pad(squ, ((0, 0), (0, max(pad, 0)))).astype(jnp.int32)
    brows = rows + EXTRA
    starts = jnp.arange(nblocks, dtype=jnp.int32) * block
    offs = jnp.arange(brows * LANES, dtype=jnp.int32)
    idx = starts[:, None] + offs[None, :]
    squ_blocks = squ32[:, idx].reshape(B * nblocks * brows, LANES)
    mh = max_hash.astype(jnp.uint64)
    mh_pair = jnp.stack(
        [(mh >> np.uint64(32)).astype(jnp.uint32), mh.astype(jnp.uint32)]
    ).reshape(1, 2)
    out = pl.pallas_call(
        functools.partial(_slots_kernel_v2, ksize=ksize, rows=rows,
                          slots=slots, interpret=False),
        grid=(B * nblocks,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda b: (np.int32(0), np.int32(0)),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((brows, LANES), lambda b: (b, np.int32(0))),
        ],
        out_specs=pl.BlockSpec((rows, LANES), lambda b: (b, np.int32(0))),
        out_shape=jax.ShapeDtypeStruct((B * nblocks * rows, LANES),
                                       jnp.uint32),
    )(mh_pair, squ_blocks)
    out = out.reshape(B, nblocks * rows, LANES)
    packed = jax.lax.slice(out, (0, 0, 0), (B, nblocks * rows, 2 * slots + 1))
    return (
        packed[:, :, :slots],
        packed[:, :, slots : 2 * slots],
        packed[:, :, 2 * slots].astype(jnp.int32),
    )


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    max_hash = np.uint64((2**64 - 1) // 1000)
    rng = np.random.default_rng(0)

    if mode == "check":
        seqs = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8),
                          size=(1, (1 << 16) + KSIZE - 1))
        got = v2_sketch(jnp.asarray(seqs), jnp.asarray(max_hash))
        want = ps.sketch_survivor_slots_pallas(
            jnp.asarray(seqs), jnp.asarray(max_hash), ksize=KSIZE, slots=4
        )
        for g, w, name in zip(got, want, ("hi", "lo", "cnt")):
            assert np.array_equal(np.asarray(g), np.asarray(w)), name
        print("v2 == production: value-exact", flush=True)
        return

    B, S = 8, (1 << 21) + KSIZE - 1
    batches = [
        jax.device_put(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8),
                                  size=(B, S)))
        for _ in range(2)
    ]
    mhs = [jax.device_put(np.uint64(int(max_hash) - i)) for i in range(8)]
    for x in batches + mhs:
        np.asarray(x).ravel()[:1]
    n_windows = B * (1 << 21)
    last = v2_sketch(batches[0], mhs[0])
    float(np.asarray(last[2].ravel()[:1])[0])
    reps = 24
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(reps):
            last = v2_sketch(batches[i % 2], mhs[i % 8])
        float(np.asarray(last[2].ravel()[:1])[0])
        best = min(best, time.perf_counter() - t0)
    per = best / reps
    print(f"v2 slots=4: {per*1e3:.2f} ms/batch -> "
          f"{n_windows/per/1e6:.0f} Mk/s", flush=True)


if __name__ == "__main__":
    main()
