"""Warm single-query search/prefetch latency vs a 10k-signature index on
the attached chip (BASELINE config 3), plus the RTT floor."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import sourmash_tpu as sm
from sourmash_tpu.index.flat import FlatIndex


def main():
    import jax
    import jax.numpy as jnp

    x = jnp.zeros(8, jnp.int32)
    np.asarray(x + 1)
    rtt = min(_t(lambda: np.asarray(x + 1)) for _ in range(5))
    print(f"rtt floor: {rtt*1e3:.1f} ms", flush=True)

    rng = np.random.default_rng(42)
    scaled = 1000
    max_hash = (2**64 - 1) // scaled

    def rand_mins(n):
        return np.unique(rng.integers(0, max_hash, size=n, dtype=np.uint64))

    genomes = [rand_mins(5000) for _ in range(10000)]
    sigs = []
    for i, m in enumerate(genomes):
        mh = sm.MinHash(0, 31, scaled=scaled)
        mh.add_many(m)
        sigs.append(sm.SourmashSignature(mh, name=f"g{i}"))
    db = FlatIndex(sigs)
    query = sigs[17]
    db._build()

    db.search(query, threshold=0.05)
    t = min(_t(lambda: db.search(query, threshold=0.05)) for _ in range(5))
    print(f"search warm: {t*1e3:.1f} ms", flush=True)

    list(db.prefetch(query, threshold_bp=50000))
    t = min(
        _t(lambda: list(db.prefetch(query, threshold_bp=50000)))
        for _ in range(5)
    )
    print(f"prefetch warm: {t*1e3:.1f} ms", flush=True)


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
