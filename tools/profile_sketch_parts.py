"""Component microbenchmarks for the sketch kernel: what does each stage
of _hash_streams cost on the chip, and what is the u32 ALU roofline?

Variants (all same block/grid shape as the production kernel):
  murmur   — murmur_words32 only, fake limbs from the raw block (no assembly)
  assembly — stream assembly + canonical compare only (no murmur)
  mulchain — N back-to-back mul64 rounds (pure u32-multiply roofline)
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

from sourmash_tpu.ops.pallas_sketch import (
    DEFAULT_ROWS,
    EXTRA_ROWS,
    LANES,
    _hash_streams,
)
from sourmash_tpu.ops.murmur32 import (
    C1,
    murmur_words32,
    mul64_const,
    rotl64,
    xor64,
)

KSIZE, SEED = 31, 42
ROWS = DEFAULT_ROWS
BROWS = ROWS + EXTRA_ROWS


def _murmur_only_kernel(squ_ref, out_ref):
    x = squ_ref[:].astype(jnp.uint32)[:ROWS]
    zero = jnp.zeros((ROWS, LANES), jnp.uint32)
    # fake limb words straight from the block: same murmur op count as the
    # real kernel (k=31 -> 4 REAL word pairs; zero words would let the
    # tail ops constant-fold and undercount)
    words = [(x ^ jnp.uint32(i * 2), x ^ jnp.uint32(i * 2 + 1))
             for i in range(4)]
    hi, lo = murmur_words32(words, KSIZE, SEED, (ROWS, LANES))
    out_ref[:] = hi ^ lo


def _assembly_only_kernel(squ_ref, out_ref, *, interpret):
    squ = squ_ref[:].astype(jnp.uint32)
    # run the full stream pipeline but slice out murmur by replacing it:
    # monkey-substitute is not possible in-kernel, so reproduce assembly
    from sourmash_tpu.ops import pallas_sketch as ps

    real = ps.murmur_words32
    try:
        ps.murmur_words32 = lambda words, L, seed, shape: (
            functools.reduce(lambda a, b: a ^ b[0] ^ b[1], words,
                             jnp.zeros(shape, jnp.uint32)),
            jnp.zeros(shape, jnp.uint32),
        )
        hi, lo, valid = _hash_streams(
            squ, ksize=KSIZE, seed=SEED, rows=ROWS, interpret=interpret
        )
    finally:
        ps.murmur_words32 = real
    out_ref[:] = hi ^ lo ^ valid


def _mulchain_kernel(squ_ref, out_ref, *, n_rounds):
    x = squ_ref[:].astype(jnp.uint32)[:ROWS]
    pair = (x, x ^ jnp.uint32(1))
    for _ in range(n_rounds):
        pair = mul64_const(pair, C1)
        pair = rotl64(pair, 31)
        pair = xor64(pair, (pair[1], pair[0]))
    out_ref[:] = pair[0] ^ pair[1]


def run(kernel, name, extra_ops_desc=""):
    rng = np.random.default_rng(0)
    B = 8
    nblocks = (1 << 21) // (ROWS * LANES)
    blocks = [
        jax.device_put(
            rng.integers(0, 256, size=(B * nblocks * BROWS, LANES)).astype(
                np.int32
            )
        )
        for _ in range(2)
    ]

    @jax.jit
    def go(xb):
        return pl.pallas_call(
            kernel,
            grid=(B * nblocks,),
            in_specs=[pl.BlockSpec((BROWS, LANES), lambda b: (b, np.int32(0)))],
            out_specs=pl.BlockSpec((ROWS, LANES), lambda b: (b, np.int32(0))),
            out_shape=jax.ShapeDtypeStruct(
                (B * nblocks * ROWS, LANES), jnp.uint32
            ),
        )(xb)

    float(np.asarray(go(blocks[0]).ravel()[:1])[0])
    reps = 24
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(reps):
            last = go(blocks[i % 2])
        float(np.asarray(last.ravel()[:1])[0])
        best = min(best, time.perf_counter() - t0)
    per = best / reps
    n_windows = B * nblocks * ROWS * LANES
    print(
        f"{name}: {per*1e3:.2f} ms/batch -> {n_windows/per/1e6:.0f} "
        f"Mwindows/s {extra_ops_desc}",
        flush=True,
    )
    return n_windows / per


def main():
    which = sys.argv[1:] or ["murmur", "assembly", "mul16"]
    for w in which:
        if w == "murmur":
            run(_murmur_only_kernel, "murmur-only")
        elif w == "assembly":
            run(
                functools.partial(_assembly_only_kernel, interpret=False),
                "assembly-only",
            )
        elif w.startswith("mul"):
            n = int(w[3:])
            r = run(
                functools.partial(_mulchain_kernel, n_rounds=n),
                f"mulchain-{n}",
            )
            # each round: 1 mul64 (6 muls) + rotl64 (~6 ops) + xor (2)
            print(
                f"  -> {r*n/1e9:.1f} G mul64/s, {r*n*6/1e12:.2f} T u32-mul/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
# appended: rows sweep of the production slots kernel via profile_sketch
