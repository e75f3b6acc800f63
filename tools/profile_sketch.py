"""Profile the sketch kernels on the attached chip (cache-busting harness:
vary args per call, chain a tiny device-side slice, one scalar readback).

Usage: python tools/profile_sketch.py [variant ...]
Variants: dense, slots4, slots8, rows256, rows768 (default: slots4 slots8 dense)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import sourmash_tpu  # noqa: F401  (x64 + cache config)
import jax
import jax.numpy as jnp

from sourmash_tpu.ops.pallas_sketch import (
    sketch_survivor_slots_pallas,
    window_hash_pairs_pallas,
)

KSIZE, SEED = 31, 42


def main():
    max_hash = np.uint64((2**64 - 1) // 1000)
    rng = np.random.default_rng(0)
    B, S = 8, (1 << 21) + KSIZE - 1
    batches = [
        jax.device_put(
            rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(B, S))
        )
        for _ in range(2)
    ]
    mhs = [jax.device_put(np.uint64(int(max_hash) - i)) for i in range(8)]
    for x in batches + mhs:
        np.asarray(x).ravel()[:1]
    n_windows = B * (1 << 21)

    def measure(fn, reps=24):
        last = fn(batches[0], mhs[0])
        # tiny slice readback completes the chain without a 67MB transfer
        probe = lambda r: float(
            np.asarray(jax.tree.leaves(r)[0].ravel()[:1])[0]
        )
        probe(last)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for i in range(reps):
                last = fn(batches[i % 2], mhs[i % 8])
            probe(last)
            best = min(best, time.perf_counter() - t0)
        return best / reps

    variants = {
        "dense": lambda x, mh: window_hash_pairs_pallas(
            x, ksize=KSIZE, seed=SEED
        ),
        "slots4": lambda x, mh: sketch_survivor_slots_pallas(
            x, mh, ksize=KSIZE, seed=SEED, slots=4
        ),
        "slots8": lambda x, mh: sketch_survivor_slots_pallas(
            x, mh, ksize=KSIZE, seed=SEED, slots=8
        ),
        "rows256": lambda x, mh: sketch_survivor_slots_pallas(
            x, mh, ksize=KSIZE, seed=SEED, slots=4, rows=256
        ),
        "rows768": lambda x, mh: sketch_survivor_slots_pallas(
            x, mh, ksize=KSIZE, seed=SEED, slots=4, rows=768
        ),
        "rows128": lambda x, mh: sketch_survivor_slots_pallas(
            x, mh, ksize=KSIZE, seed=SEED, slots=4, rows=128
        ),
        "rows64": lambda x, mh: sketch_survivor_slots_pallas(
            x, mh, ksize=KSIZE, seed=SEED, slots=4, rows=64
        ),
        "dense128": lambda x, mh: window_hash_pairs_pallas(
            x, ksize=KSIZE, seed=SEED, rows=128
        ),
        "dense256": lambda x, mh: window_hash_pairs_pallas(
            x, ksize=KSIZE, seed=SEED, rows=256
        ),
        "rows640": lambda x, mh: sketch_survivor_slots_pallas(
            x, mh, ksize=KSIZE, seed=SEED, slots=4, rows=640
        ),
        "slots8b": lambda x, mh: sketch_survivor_slots_pallas(
            x, mh, ksize=KSIZE, seed=SEED, slots=8
        ),
    }
    names = sys.argv[1:] or ["slots4", "slots8", "dense"]
    for name in names:
        t = measure(variants[name])
        print(
            f"{name}: {t*1e3:.2f} ms/batch -> {n_windows/t/1e6:.0f} Mk/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
