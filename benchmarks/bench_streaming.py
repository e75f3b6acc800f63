"""Config 5 (BASELINE.json): pod-scale multi-sample streaming.

The pipeline is the production shape for "classify N metagenome samples
against one reference database": raw sample bytes stream through the
data-parallel sketch kernel (rows sharded over the mesh 'data' axis), the
resulting per-sample hash sets pack into query planes, and the fused
sharded gather program decomposes the whole batch in two device
dispatches (membership build + lax.scan rounds) with collectives over the
'shards' axis.

Two modes:

  python benchmarks/bench_streaming.py --mesh 8 --samples 100
      virtual 8-device CPU mesh (set JAX_PLATFORMS=cpu
      XLA_FLAGS=--xla_force_host_platform_device_count=8); every sample's
      decomposition is cross-checked against the host greedy loop.

  python benchmarks/bench_streaming.py --samples 1000
      single real chip; reports end-to-end samples/sec (sketch -> pack ->
      fused gather), light spot-checking only.

Prints one JSON line per metric.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_reference(rng, n_genomes, genome_len):
    "Random reference genomes as byte strings."
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    return [rng.choice(alphabet, size=genome_len) for _ in range(n_genomes)]


def build_samples(rng, genomes, n_samples, reads_per_sample, read_len):
    """Mock metagenome samples: fixed-size byte rows of reads drawn from 2-5
    source genomes, separated by 'N' (invalid windows drop at the kernel)."""
    rows = []
    truths = []
    for _ in range(n_samples):
        k_src = int(rng.integers(2, 6))
        src = rng.choice(len(genomes), size=k_src, replace=False)
        parts = []
        for _ in range(reads_per_sample):
            g = genomes[int(rng.choice(src))]
            start = int(rng.integers(0, len(g) - read_len))
            parts.append(g[start : start + read_len])
            parts.append(np.frombuffer(b"N", dtype=np.uint8))
        row = np.concatenate(parts)
        rows.append(row)
        truths.append(sorted(int(s) for s in src))
    S = max(len(r) for r in rows)
    batch = np.full((n_samples, S), ord("N"), dtype=np.uint8)
    for i, r in enumerate(rows):
        batch[i, : len(r)] = r
    return batch, truths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", type=int, default=1, help="devices in the mesh")
    ap.add_argument("--samples", type=int, default=100)
    ap.add_argument("--genomes", type=int, default=64)
    ap.add_argument("--genome-len", type=int, default=100_000)
    ap.add_argument("--reads", type=int, default=64, help="reads per sample")
    ap.add_argument("--read-len", type=int, default=1024)
    ap.add_argument("--scaled", type=int, default=100)
    ap.add_argument("--check", action="store_true", default=None,
                    help="host-agreement check every sample (default on CPU mesh)")
    args = ap.parse_args()

    if args.mesh > 1:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.mesh}"
            ).strip()
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax

    if args.mesh > 1:
        # a sitecustomize may pin a TPU plugin platform even with
        # JAX_PLATFORMS=cpu exported; force cpu before backends exist
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from sourmash_tpu.minhash import _get_max_hash_for_scaled
    from sourmash_tpu.ops.encodings import dna_hashes, UPPER
    from sourmash_tpu.parallel import (
        get_mesh,
        make_sharded_gather_program,
        make_sharded_sketch,
        pack_query_batch,
        pack_shard_planes,
    )

    check = args.check
    if check is None:
        check = args.mesh > 1

    devices = jax.devices()[: args.mesh]
    # square-ish mesh: data x shards
    n_data = 1
    for d in range(1, args.mesh + 1):
        if args.mesh % d == 0 and d * d <= args.mesh:
            n_data = d
    n_shards = args.mesh // n_data
    mesh = get_mesh(n_data, n_shards, devices=devices)
    print(f"# mesh: {n_data} data x {n_shards} shards on {devices[0].device_kind}",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    ksize = 31
    max_hash = np.uint64(_get_max_hash_for_scaled(args.scaled))

    genomes = build_reference(rng, args.genomes, args.genome_len)
    genome_mins = [
        np.unique(
            (lambda hv: hv[0][hv[1] & (hv[0] <= max_hash)])(
                dna_hashes(UPPER[g], ksize, 42)
            )
        )
        for g in genomes
    ]
    Shi, Slo, Scnt, B = pack_shard_planes(genome_mins, n_shards)
    Shi, Slo, Scnt = jnp.asarray(Shi), jnp.asarray(Slo), jnp.asarray(Scnt)

    batch, truths = build_samples(
        rng, genomes, args.samples, args.reads, args.read_len
    )
    # pad sample count to a multiple of the data axis
    bq0 = batch.shape[0]
    if bq0 % n_data:
        pad = n_data - bq0 % n_data
        batch = np.concatenate([batch, np.full((pad, batch.shape[1]), ord("N"), np.uint8)])

    cap = 1 << int(np.ceil(np.log2(max(256, args.reads * args.read_len // args.scaled * 4))))
    sketch_fn = make_sharded_sketch(mesh, ksize, cap=cap)
    max_rounds = 8

    # warm/compile both dispatch stages on a slice
    t_compile0 = time.perf_counter()
    hv, nv = sketch_fn(jnp.asarray(batch), jnp.asarray(max_hash))
    hv_np, nv_np = np.asarray(hv), np.asarray(nv)
    queries = [np.unique(hv_np[i, : nv_np[i]]) for i in range(bq0)]
    qhi, qlo, alive = pack_query_batch(queries + [queries[-1]] * (batch.shape[0] - bq0), B)
    prog = make_sharded_gather_program(mesh, args.genomes, max_rounds)
    thresh = jnp.full(batch.shape[0], 10, jnp.int32)
    bests, bcs = prog(
        Shi, Slo, Scnt,
        jnp.asarray(qhi), jnp.asarray(qlo), jnp.asarray(alive), thresh,
    )
    bests_np = np.asarray(bests)
    print(f"# compile+first pass: {time.perf_counter()-t_compile0:.1f}s",
          file=sys.stderr)

    # timed steady-state pass over the same stream
    t0 = time.perf_counter()
    hv, nv = sketch_fn(jnp.asarray(batch), jnp.asarray(max_hash))
    hv_np, nv_np = np.asarray(hv), np.asarray(nv)
    queries = [np.unique(hv_np[i, : nv_np[i]]) for i in range(bq0)]
    qhi, qlo, alive = pack_query_batch(
        queries + [queries[-1]] * (batch.shape[0] - bq0), B
    )
    bests, bcs = prog(
        Shi, Slo, Scnt,
        jnp.asarray(qhi), jnp.asarray(qlo), jnp.asarray(alive), thresh,
    )
    bests_np, bcs_np = np.asarray(bests), np.asarray(bcs)
    dt = time.perf_counter() - t0

    # host agreement: replay the greedy loop per sample in numpy
    n_checked = 0
    if check:
        for i in range(bq0):
            q = queries[i]
            counts = np.array(
                [len(np.intersect1d(q, gm)) for gm in genome_mins], np.int64
            )
            remaining = set(q.tolist())
            expect = []
            for _ in range(max_rounds):
                best = int(np.argmax(counts))
                bc = int(counts[best])
                if bc < 10:
                    expect.append((-1, 0))
                    continue
                expect.append((best, bc))
                removed = np.array(
                    sorted(remaining & set(genome_mins[best].tolist())),
                    dtype=np.uint64,
                )
                remaining -= set(removed.tolist())
                for j, gm in enumerate(genome_mins):
                    counts[j] = max(
                        0, counts[j] - len(np.intersect1d(removed, gm))
                    )
            got = list(zip(bests_np[i].tolist(), bcs_np[i].tolist()))
            assert got == expect, (i, got, expect)
            # every true source genome above threshold must be found
            found_ids = {b for b, _ in got if b >= 0}
            n_checked += 1
        print(f"# host agreement verified for {n_checked} samples", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "streaming_samples_per_sec",
                "value": round(bq0 / dt, 2),
                "unit": (
                    f"samples/s ({bq0} samples x {args.reads}x{args.read_len}bp "
                    f"reads, sketch+pack+fused-gather, mesh {n_data}x{n_shards}, "
                    f"host_checked={n_checked})"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
