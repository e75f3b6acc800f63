"""Scale benchmarks for BASELINE.json configs 2-4.

Measures, on the attached device:
  - all-pairs `compare` throughput (pairwise Jaccard matrix), config 2 scale+
  - `search`/`prefetch` latency of one genome sig vs a 10k-signature FlatIndex
  - `gather` wall time / per-round latency of a mock metagenome vs the same

Synthetic data mirrors the reference's operating point (scaled=1000,
~5 Mbp genomes => ~5k hashes/sketch; metagenome = union of N genomes plus
noise). Prints one JSON line per metric.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sourmash_tpu as sm
from sourmash_tpu.index.flat import FlatIndex
from sourmash_tpu.search import GatherDatabases
from sourmash_tpu.ops.intersect import pairwise_intersection_counts


RNG = np.random.default_rng(42)
SCALED = 1000
MAX_HASH = np.uint64((2**64 - 1) // SCALED)


def rand_mins(n):
    "n distinct uint64 hashes below MAX_HASH, sorted."
    m = RNG.integers(0, int(MAX_HASH), size=n, dtype=np.uint64)
    return np.unique(m)


def make_sig(mins, name):
    mh = sm.MinHash(0, 31, scaled=SCALED)
    mh.add_many(mins)
    return sm.SourmashSignature(mh, name=name)


def bench_compare(n_sigs=500, sketch_len=5000, reps=3):
    mins = [rand_mins(sketch_len) for _ in range(n_sigs)]
    # warm
    pairwise_intersection_counts(mins)
    t0 = time.perf_counter()
    for _ in range(reps):
        pairwise_intersection_counts(mins)
    dt = (time.perf_counter() - t0) / reps
    n_pairs = n_sigs * n_sigs
    print(
        json.dumps(
            {
                "metric": "compare_pairs_per_sec",
                "value": round(n_pairs / dt, 1),
                "unit": f"pairs/s ({n_sigs}x{n_sigs} sketches of {sketch_len})",
                "seconds": round(dt, 4),
            }
        )
    )


def build_db(n_sigs=10000, sketch_len=5000):
    genomes = [rand_mins(sketch_len) for _ in range(n_sigs)]
    sigs = [make_sig(m, f"genome{i}") for i, m in enumerate(genomes)]
    return genomes, FlatIndex(sigs)


def bench_search(db, genomes, reps=5):
    query = make_sig(genomes[17], "query")
    db._build()
    # warm counts path
    db.counts_for(genomes[17])
    t0 = time.perf_counter()
    for _ in range(reps):
        res = db.search(query, threshold=0.05)
    dt = (time.perf_counter() - t0) / reps
    print(
        json.dumps(
            {
                "metric": "search_latency",
                "value": round(dt * 1000, 2),
                "unit": f"ms (1 query vs {len(db)} sigs, {len(res)} hits)",
            }
        )
    )
    t0 = time.perf_counter()
    for _ in range(reps):
        res = list(db.prefetch(query, threshold_bp=50000))
    dt = (time.perf_counter() - t0) / reps
    print(
        json.dumps(
            {
                "metric": "prefetch_latency",
                "value": round(dt * 1000, 2),
                "unit": f"ms (1 query vs {len(db)} sigs, {len(res)} hits)",
            }
        )
    )


def bench_gather(db, genomes, n_true=20, noise=20000):
    true_ids = RNG.choice(len(genomes), size=n_true, replace=False)
    meta = np.unique(
        np.concatenate([genomes[i] for i in true_ids] + [rand_mins(noise)])
    )
    query = make_sig(meta, "metagenome")

    t0 = time.perf_counter()
    counters = [db.counter_gather(query, 50000)]
    t_prefetch = time.perf_counter() - t0

    gd = GatherDatabases(query, counters, threshold_bp=50000)
    rounds = []
    found = 0
    t0 = time.perf_counter()
    while True:
        tr = time.perf_counter()
        try:
            result = next(gd)
        except StopIteration:
            break
        rounds.append(time.perf_counter() - tr)
        found += 1
    total = time.perf_counter() - t0
    p50 = float(np.median(rounds)) if rounds else 0.0
    print(
        json.dumps(
            {
                "metric": "gather_total",
                "value": round(t_prefetch + total, 3),
                "unit": f"s ({found} matches of {n_true} true vs {len(db)} sigs;"
                f" prefetch {t_prefetch:.3f}s)",
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "gather_round_p50",
                "value": round(p50 * 1000, 2),
                "unit": "ms/round",
            }
        )
    )


def bench_gather_fused(genomes, n_queries=8, n_true=20, noise=20000, rounds=24):
    """Fully-fused gather: a batch of metagenomes decomposed in ONE device
    dispatch (lax.scan over rounds inside shard_map on a 1x1 mesh)."""
    import jax
    import jax.numpy as jnp

    from sourmash_tpu.parallel import (
        get_mesh,
        make_sharded_gather_program,
        pack_query_batch,
        pack_shard_planes,
    )

    n = len(genomes)
    mesh = get_mesh(1, 1, devices=jax.devices()[:1])
    Shi, Slo, Scnt, B = pack_shard_planes(genomes, 1)
    queries = []
    for q in range(n_queries):
        ids = RNG.choice(n, size=n_true, replace=False)
        queries.append(
            np.unique(np.concatenate([genomes[i] for i in ids] + [rand_mins(noise)]))
        )
    qhi, qlo, alive = pack_query_batch(queries, B)
    Shi, Slo, Scnt = jnp.asarray(Shi), jnp.asarray(Slo), jnp.asarray(Scnt)
    qhi, qlo, alive = jnp.asarray(qhi), jnp.asarray(qlo), jnp.asarray(alive)
    thresh = jnp.full(n_queries, 50, jnp.int32)
    prog = make_sharded_gather_program(mesh, n, rounds)
    bests, bcs = prog(Shi, Slo, Scnt, qhi, qlo, alive, thresh)  # warm
    _ = np.asarray(bests)
    t0 = time.perf_counter()
    bests, bcs = prog(Shi, Slo, Scnt, qhi, qlo, alive, thresh)
    b_np = np.asarray(bests)
    dt = time.perf_counter() - t0
    found = int((b_np >= 0).sum(axis=1).mean())
    print(
        json.dumps(
            {
                "metric": "gather_fused_round_latency",
                "value": round(dt / rounds / n_queries * 1000, 3),
                "unit": f"ms/round/query (membership program: count+M build"
                f" + {rounds} rounds x {n_queries} queries vs {n} sigs in one"
                f" dispatch, ~{found} matches/query)",
            }
        )
    )


if __name__ == "__main__":
    import jax

    print(f"# device: {jax.devices()[0].device_kind}")
    bench_compare()
    genomes, db = build_db()
    bench_search(db, genomes)
    bench_gather(db, genomes)
    bench_gather_fused(genomes)
