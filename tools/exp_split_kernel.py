"""EXPERIMENT: two-pass sketch kernel — pass A materializes canonical limb
words to HBM, pass B does murmur + threshold + slot compaction.

Hypothesis: the fused kernel pays a large scheduling penalty because the
cross-row shift streams force VMEM materialization boundaries inside one
giant dataflow; splitting at the natural words boundary lets Mosaic fuse
each half tightly. Costs 36B/window of extra HBM traffic — irrelevant at
~100 GB/s vs ~800 GB/s HBM.

Usage: python tools/exp_split_kernel.py [check|time]
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
from sourmash_tpu.ops.murmur32 import murmur_words32

LANES = ps.LANES
ROWS = ps.DEFAULT_ROWS
EXTRA = ps.EXTRA_ROWS
KSIZE, SEED = 31, 42
NW = -(-KSIZE // 4)  # 8 limb words for k=31


def _assembly_kernel(squ_ref, *out_refs, ksize, rows, interpret):
    "Pass A: block -> canonical limb words (climbs) + validity."
    squ = squ_ref[:].astype(jnp.uint32)

    real = ps.murmur_words32
    captured = []
    try:
        def capture(words, L, seed, shape):
            captured.append(words)
            z = jnp.zeros(shape, jnp.uint32)
            return z, z

        ps.murmur_words32 = capture
        _hi, _lo, valid = ps._hash_streams(
            squ, ksize=ksize, seed=SEED, rows=rows, interpret=interpret
        )
    finally:
        ps.murmur_words32 = real

    words = captured[0]
    flat = []
    for hi_w, lo_w in words:
        flat.extend([lo_w, hi_w])
    # k=31 -> 4 word pairs -> 8 u32 streams
    for i, ref in enumerate(out_refs[:-1]):
        ref[:] = flat[i]
    out_refs[-1][:] = valid


def _murmur_slots_kernel(mh_ref, *refs, ksize, rows, slots):
    "Pass B: words + validity -> threshold + slot compaction (packed out)."
    in_refs = refs[:-1]
    out_ref = refs[-1]
    word_refs = in_refs[:-1]
    valid = in_refs[-1][:]

    words = []
    for w in range(len(word_refs) // 2):
        lo_w = word_refs[2 * w][:]
        hi_w = word_refs[2 * w + 1][:]
        words.append((hi_w, lo_w))
    hi, lo = murmur_words32(words, ksize, SEED, (rows, LANES))

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
def split_sketch(squ, max_hash, *, ksize=KSIZE, rows=ROWS, slots=4):
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

    n_words = -(-ksize // 8)
    if n_words % 2:
        n_words += 1
    n_streams = 2 * n_words

    blk = pl.BlockSpec((rows, LANES), lambda b: (b, np.int32(0)))
    outsA = pl.pallas_call(
        functools.partial(_assembly_kernel, ksize=ksize, rows=rows,
                          interpret=False),
        grid=(B * nblocks,),
        in_specs=[pl.BlockSpec((brows, LANES), lambda b: (b, np.int32(0)))],
        out_specs=[blk] * (n_streams + 1),
        out_shape=[
            jax.ShapeDtypeStruct((B * nblocks * rows, LANES), jnp.uint32)
        ] * (n_streams + 1),
    )(squ_blocks)

    mh = max_hash.astype(jnp.uint64)
    mh_pair = jnp.stack(
        [(mh >> np.uint64(32)).astype(jnp.uint32), mh.astype(jnp.uint32)]
    ).reshape(1, 2)

    out = pl.pallas_call(
        functools.partial(_murmur_slots_kernel, ksize=ksize, rows=rows,
                          slots=slots),
        grid=(B * nblocks,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda b: (np.int32(0), np.int32(0)),
                         memory_space=pltpu.SMEM),
        ] + [blk] * (n_streams + 1),
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((B * nblocks * rows, LANES),
                                       jnp.uint32),
    )(mh_pair, *outsA)

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
    B, S = 8, (1 << 21) + KSIZE - 1

    if mode == "check":
        seqs = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8),
                          size=(1, (1 << 16) + KSIZE - 1))
        sh, sl, cnt = split_sketch(jnp.asarray(seqs), jnp.asarray(max_hash))
        rh, rl, rcnt = ps.sketch_survivor_slots_pallas(
            jnp.asarray(seqs), jnp.asarray(max_hash), ksize=KSIZE, slots=4
        )
        assert np.array_equal(np.asarray(cnt), np.asarray(rcnt))
        assert np.array_equal(np.asarray(sh), np.asarray(rh))
        assert np.array_equal(np.asarray(sl), np.asarray(rl))
        print("split == fused: value-exact", flush=True)
        return

    batches = [
        jax.device_put(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8),
                                  size=(B, S)))
        for _ in range(2)
    ]
    mhs = [jax.device_put(np.uint64(int(max_hash) - i)) for i in range(8)]
    for x in batches + mhs:
        np.asarray(x).ravel()[:1]
    n_windows = B * (1 << 21)
    last = split_sketch(batches[0], mhs[0])
    float(np.asarray(last[2].ravel()[:1])[0])
    reps = 24
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(reps):
            last = split_sketch(batches[i % 2], mhs[i % 8])
        float(np.asarray(last[2].ravel()[:1])[0])
        best = min(best, time.perf_counter() - t0)
    per = best / reps
    print(f"split slots=4: {per*1e3:.2f} ms/batch -> "
          f"{n_windows/per/1e6:.0f} Mk/s", flush=True)


if __name__ == "__main__":
    main()
