"""Cache-proof sketch profiling: every call's input depends on the previous
call's output (a broadcast XOR of one output element), so no result cache
— local or tunnel-side — can serve any repetition. One scalar readback at
the end closes the chain.

Variants: full (gather+kernel), kernel (pre-materialized blocks),
gatheronly (block materialization alone), murmur (murmur-only kernel).
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

KSIZE, SEED = 31, 42
ROWS = ps.DEFAULT_ROWS
BROWS = ROWS + ps.EXTRA_ROWS
LANES = ps.LANES
B, S = 8, (1 << 21) + KSIZE - 1
N_WINDOWS = B * (1 << 21)
REPS = 24


def _measure(step, x0, reps=REPS):
    "step: x -> (x_next, probe_scalar_arr). Chains data dependence."
    x, probe = step(x0)
    jax.block_until_ready(probe)
    best = float("inf")
    for _ in range(2):
        x = x0
        t0 = time.perf_counter()
        for _ in range(reps):
            x, probe = step(x)
        float(np.asarray(probe.ravel()[:1])[0])
        best = min(best, time.perf_counter() - t0)
    return best / reps


def main():
    which = sys.argv[1:] or ["full", "kernel", "gatheronly"]
    rng = np.random.default_rng(0)
    max_hash = jnp.asarray(np.uint64((2**64 - 1) // 1000))

    n = S - KSIZE + 1
    block = ROWS * LANES
    nblocks = -(-n // block)
    need = nblocks * block + ps.EXTRA_ROWS * LANES

    rows_opt = None
    for w in which:
        if w.startswith("rows"):
            rows_opt = int(w[4:])
            which = list(which) + ["full"]

    if "full" in which or "gatheronly" in which:
        x0 = jax.device_put(
            rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(B, S))
        )
        np.asarray(x0).ravel()[:1]

    if "full" in which:

        @jax.jit
        def step_full(x):
            sh, sl, cnt = ps.sketch_survivor_slots_pallas(
                x, max_hash, ksize=KSIZE, seed=SEED, slots=4,
                **({"rows": rows_opt} if rows_opt else {}),
            )
            # fold one output byte back into the input: breaks any cache
            perturb = (cnt[0, 0] & 3).astype(jnp.uint8)
            return x ^ perturb, cnt

        t = _measure(step_full, x0)
        print(f"full (gather+kernel): {t*1e3:.2f} ms -> "
              f"{N_WINDOWS/t/1e6:.0f} Mk/s", flush=True)

    if "gatheronly" in which:

        @jax.jit
        def step_gather(x):
            squ32 = jnp.pad(x, ((0, 0), (0, max(need - S, 0)))).astype(
                jnp.int32
            )
            starts = jnp.arange(nblocks, dtype=jnp.int32) * block
            offs = jnp.arange(BROWS * LANES, dtype=jnp.int32)
            idx = starts[:, None] + offs[None, :]
            blocks = squ32[:, idx].reshape(B * nblocks * BROWS, LANES)
            perturb = (blocks[0, 0] & 3).astype(jnp.uint8)
            return x ^ perturb, blocks[:1, :1]

        t = _measure(step_gather, x0)
        print(f"gather only: {t*1e3:.2f} ms", flush=True)

    if "kernel" in which:
        b0 = jax.device_put(
            rng.integers(0, 256, size=(B * nblocks * BROWS, LANES)).astype(
                np.int32
            )
        )
        np.asarray(b0).ravel()[:1]
        mh = max_hash.astype(jnp.uint64)
        mh_pair = jnp.stack(
            [(mh >> np.uint64(32)).astype(jnp.uint32), mh.astype(jnp.uint32)]
        ).reshape(1, 2)
        kernel = functools.partial(
            ps._sketch_slots_kernel, ksize=KSIZE, seed=SEED, rows=ROWS,
            slots=4, interpret=False,
        )

        @jax.jit
        def step_kernel(xb):
            out = pl.pallas_call(
                kernel,
                grid=(B * nblocks,),
                in_specs=[
                    pl.BlockSpec((1, 2), lambda b: (np.int32(0), np.int32(0)),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((BROWS, LANES), lambda b: (b, np.int32(0))),
                ],
                out_specs=pl.BlockSpec((ROWS, LANES),
                                       lambda b: (b, np.int32(0))),
                out_shape=jax.ShapeDtypeStruct(
                    (B * nblocks * ROWS, LANES), jnp.uint32
                ),
            )(mh_pair, xb)
            perturb = out[:1, :1].astype(jnp.int32)
            return xb ^ perturb, out

        t = _measure(step_kernel, b0)
        print(f"kernel only (slots=4): {t*1e3:.2f} ms -> "
              f"{N_WINDOWS/t/1e6:.0f} Mk/s", flush=True)


if __name__ == "__main__":
    main()
