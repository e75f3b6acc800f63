#!/usr/bin/env python
"""Benchmark: k-mer sketching throughput on the accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Headline metric (BASELINE.json): k-mers hashed+thresholded+sorted per
second per chip on the flagship sketch kernel (canonical k-mer extraction,
murmur64, scaled threshold, sort/compact), measured on the reference
E. coli genome at k=31/scaled=1000. `vs_baseline` is the speedup over the
single-threaded host (native C++) implementation of the identical pipeline
— a stand-in for the reference's single-core Rust hot loop, measured in the
same process on the same input (the reference publishes no absolute
numbers; see BASELINE.md).

Before timing, the run is gated on a VALUE-exact on-hardware check: the
device survivor hash set over the whole genome must equal the host loop's,
so a silent Mosaic lowering defect fails the bench instead of shipping.

`extra` carries the query-engine metrics (BASELINE.json configs 2-4):
all-pairs compare throughput, search/prefetch latency and scheduled-gather
time against a 10k-signature device index. Set SOURMASH_TPU_BENCH_N=<n>
to rescale the database (e.g. 85000 for the GTDB-rs214-scale run).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import sourmash_tpu  # configures x64 + compilation cache
    import jax
    import jax.numpy as jnp

    from sourmash_tpu.ops.sketch import _seq_to_sorted_hashes
    from sourmash_tpu.ops import encodings as enc
    from sourmash_tpu.minhash import _get_max_hash_for_scaled
    from sourmash_tpu.sequence_io import iter_records_bytes

    ksize = 31
    scaled = 1000
    max_hash = np.uint64(_get_max_hash_for_scaled(scaled))

    # load the benchmark genome (E. coli GCF_000005845, ~4.64 Mbp)
    genome = "/root/reference/data/GCF_000005845.2_ASM584v2_genomic.fna.gz"
    seq = b"".join(s for _, s in iter_records_bytes(genome))
    arr = enc.upper(np.frombuffer(seq, dtype=np.uint8))

    chunk = 1 << 21  # windows per device call
    n_windows_total = len(arr) - ksize + 1

    # Device-resident steady-state measurement. The dev harness reaches the
    # chip over a tunnel with ~150 ms round-trip latency, so the honest
    # per-chip number comes from: upload a pool of distinct chunks once,
    # dispatch many kernel calls (args varied so no result cache can hit),
    # chain all results into one device-side accumulator, and read back a
    # single scalar at the end — one RTT amortized over the whole batch.
    from sourmash_tpu.ops.sketch import (
        _seq_to_compact_hashes,
        _seq_batch_to_compact_hashes,
        _use_pallas_default,
    )

    use_pallas = _use_pallas_default()
    print(f"bench: pallas kernel = {use_pallas}", file=sys.stderr)

    cap = 16384
    n_buffers = 8
    calls = 256

    def make_pieces(a):
        ps = []
        for s in range(0, len(a) - ksize + 1, chunk):
            e = min(s + chunk + ksize - 1, len(a))
            piece = a[s:e]
            pad = (chunk + ksize - 1) - len(piece)
            if pad:
                piece = np.concatenate([piece, np.zeros(pad, dtype=np.uint8)])
            ps.append(piece)
        return ps

    # pool of distinct batches, uploaded once; max_hash variants pre-uploaded
    # too (any per-call host->device transfer costs a tunnel RTT).
    pieces = []
    r = 0
    while len(pieces) < n_buffers * 2:
        pieces.extend(make_pieces(np.roll(arr, 104729 * r)))
        r += 1
    B = 8
    n_batches = 2
    batches = []
    for b in range(n_batches):
        batch = np.stack(pieces[b * B : (b + 1) * B])
        batches.append(jax.device_put(batch))
    mh_variants = [jax.device_put(np.uint64(max_hash - i)) for i in range(8)]
    # force uploads to complete before timing
    for x in batches + mh_variants:
        _ = np.asarray(x).ravel()[:1]

    dev = jax.devices()[0]
    print(
        f"bench: device={dev}, {n_batches} batches of {B} x {chunk} windows",
        file=sys.stderr,
    )

    # the fused slot kernel (in-kernel threshold + segment compaction) is
    # the production scaled-sketch path; fall back to the dense pipeline
    # when it isn't applicable
    from sourmash_tpu.ops.sketch import _slot_path_ok

    slot_path = _slot_path_ok(max_hash, use_pallas)
    print(f"bench: slot path = {slot_path}", file=sys.stderr)

    def run(batch, mh):
        if slot_path:
            from sourmash_tpu.ops.pallas_sketch import (
                sketch_survivor_slots_pallas,
            )
            from sourmash_tpu.ops.sketch import _pick_slots

            sh, sl, cnt = sketch_survivor_slots_pallas(
                batch, mh, ksize=ksize, seed=42, slots=_pick_slots(max_hash)
            )
            return cnt
        h, n = _seq_batch_to_compact_hashes(batch, mh, ksize, 42, cap, use_pallas)
        return n

    # warmup/compile
    _ = int(np.asarray(run(batches[0], mh_variants[0])).sum())

    # ON-HARDWARE VALUE EXACTNESS GATE: the device survivor hash SET over
    # the full genome must equal the single-thread host loop's — counts
    # alone would let a bad lowering ship. Runs on whatever backend this
    # bench runs on (the real chip under the driver).
    def device_values(a):
        vals = []
        for piece in make_pieces(a):
            if slot_path:
                from sourmash_tpu.ops.pallas_sketch import (
                    sketch_survivor_slots_pallas,
                )
                from sourmash_tpu.ops.sketch import _pick_slots

                sh, sl, cnt = sketch_survivor_slots_pallas(
                    piece[None], np.uint64(max_hash), ksize=ksize, seed=42,
                    slots=_pick_slots(max_hash),
                )
                sh = np.asarray(sh)[0]
                sl = np.asarray(sl)[0]
                n_slots = np.asarray(cnt)[0]
                v = []
                for b in range(sh.shape[0]):
                    k = int(n_slots[b])
                    if k:
                        v.append(
                            (sh[b, :k].astype(np.uint64) << np.uint64(32))
                            | sl[b, :k].astype(np.uint64)
                        )
                if v:
                    vals.append(np.concatenate(v))
            else:
                h, n = _seq_to_compact_hashes(
                    jnp.asarray(piece), np.uint64(max_hash), ksize, 42, cap
                )
                vals.append(np.asarray(h)[: int(n)])
        return np.unique(np.concatenate(vals)) if vals else np.zeros(0, np.uint64)

    from sourmash_tpu import native

    dvals = device_values(arr)
    if native.available():
        host_surv, _first_bad = native.sketch_hashes(
            arr, ksize, 42, int(max_hash), n_threads=1
        )
        hvals = np.unique(host_surv)
    else:
        hh, valid = enc.dna_hashes(arr, ksize, 42)
        hvals = np.unique(hh[valid & (hh <= max_hash)])
    if not np.array_equal(dvals, hvals):
        only_d = np.setdiff1d(dvals, hvals)
        only_h = np.setdiff1d(hvals, dvals)
        print(
            f"bench: EXACTNESS FAILURE device-only={len(only_d)} "
            f"host-only={len(only_h)}",
            file=sys.stderr,
        )
        raise SystemExit("device/host sketch hash values disagree")
    print(
        f"bench: on-hardware value-exactness OK ({len(dvals)} survivor hashes)",
        file=sys.stderr,
    )

    # LINK-INVARIANT measurement (round 5): the whole rep chain runs in ONE
    # device dispatch — a lax.fori_loop over the pre-uploaded batch pool —
    # and the constant dispatch+RTT overhead is cancelled exactly by timing
    # two chain lengths and taking the slope. A 10 MB/s and a 200 MB/s
    # tunnel then measure the same per-chip rate (nothing but one scalar
    # crosses the link per timed call). The varying `salt` argument defeats
    # any result cache between repeated identical dispatches.
    from jax import lax

    stacked = jnp.stack([jnp.asarray(b) for b in batches])
    mhs = jnp.stack([jnp.asarray(m) for m in mh_variants])

    @jax.jit
    def run_chain(n_reps, salt):
        def body(i, acc):
            batch = lax.dynamic_index_in_dim(stacked, i % n_batches, 0,
                                             keepdims=False)
            mh = mhs[i % mhs.shape[0]]
            cnt = run(batch, mh)
            return acc + jnp.sum(cnt.astype(jnp.int64))

        return lax.fori_loop(0, n_reps, body, salt)

    r_small, r_big = 8, 72
    salt = [np.int64(0)]

    def chain(r):
        salt[0] += 1
        return int(np.asarray(run_chain(np.int32(r), salt[0])))

    total_valid = chain(r_small)  # warm/compile (bound is traced: one jit)
    t_small = min(_timed(lambda: chain(r_small)) for _ in range(3))
    t_big = min(_timed(lambda: chain(r_big)) for _ in range(3))
    t_device = t_big - t_small  # pure device time for (r_big-r_small) reps
    assert t_device > 0, (t_small, t_big)
    n_windows_timed = (r_big - r_small) * B * chunk
    kmers_per_sec = n_windows_timed / t_device
    print(
        f"bench: chained {r_small}/{r_big} reps in one dispatch each: "
        f"{t_small:.3f}s / {t_big:.3f}s -> slope {t_device:.3f}s for "
        f"{r_big - r_small} reps (salted acc={total_valid})",
        file=sys.stderr,
    )

    # host single-thread baseline: the native C++ hot loop pinned to one
    # thread — the honest stand-in for the reference's single-core Rust
    # SeqToHashes+add_hash loop (numpy would inflate the ratio ~30x).
    # Best-of-3 so a transiently loaded host doesn't skew it.
    from sourmash_tpu import native

    slice_windows = min(1 << 21, n_windows_total)
    sub = arr[: slice_windows + ksize - 1]
    t_host_slice = float("inf")
    if native.available():
        for _rep in range(3):
            t0 = time.perf_counter()
            _ = native.sketch_hashes(sub, ksize, 42, int(max_hash), n_threads=1)
            t_host_slice = min(t_host_slice, time.perf_counter() - t0)
    else:
        slice_windows = min(1 << 19, n_windows_total)
        sub = arr[: slice_windows + ksize - 1]
        for _rep in range(3):
            t0 = time.perf_counter()
            hh, valid = enc.dna_hashes(sub, ksize, 42)
            _ = np.sort(hh[valid & (hh <= max_hash)])
            t_host_slice = min(t_host_slice, time.perf_counter() - t0)
    host_kmers_per_sec = slice_windows / t_host_slice

    vs_baseline = kmers_per_sec / host_kmers_per_sec

    print(
        f"bench: device {kmers_per_sec/1e6:.2f} Mk-mers/s "
        f"({t_device*1e3:.1f} ms/genome), host {host_kmers_per_sec/1e6:.2f} Mk-mers/s",
        file=sys.stderr,
    )

    def emit(extra):
        print(
            json.dumps(
                {
                    "metric": "kmers_hashed_per_sec_per_chip",
                    "value": round(kmers_per_sec, 1),
                    "unit": "kmers/s",
                    "vs_baseline": round(vs_baseline, 3),
                    "extra": extra,
                }
            ),
            flush=True,
        )

    # the at-scale legs take minutes; emit the headline line as soon as the
    # core metrics exist, then again enriched — a driver that parses the
    # LAST JSON line gets the fullest completed result either way
    extra = query_engine_metrics()
    extra["sketch_value_exact_on_device"] = True
    extra["aa_windows_per_sec"] = aa_throughput()
    try:
        sketch_cli_metrics(extra)
    except Exception as exc:
        print(f"bench: sketch CLI leg failed: {exc!r}", file=sys.stderr)
        extra["sketch_cli_error"] = repr(exc)
    emit(extra)
    try:
        zip_gather_metrics(
            extra, _RAND_MINS_HOOK["rand_mins"], _RAND_MINS_HOOK["make_sig"]
        )
        streaming_samples_metrics(extra)
        at_scale_metrics(
            extra, _RAND_MINS_HOOK["rand_mins"], _RAND_MINS_HOOK["make_sig"]
        )
        extra["at_scale_ok"] = True
    except Exception as exc:  # keep the completed metrics + a clean exit
        print(f"bench: at-scale legs failed: {exc!r}", file=sys.stderr)
        extra["at_scale_error"] = repr(exc)
        extra["at_scale_ok"] = False  # machine-checkable: not buried in text
    emit(extra)
    # config 5 at database scale runs LAST with its own emit: it is the
    # longest leg (~10 min at 85k), and a driver timeout mid-leg must not
    # lose the completed at-scale metrics above
    ctx = _RAND_MINS_HOOK.get("at_scale_ctx")
    if ctx is not None and extra.get("at_scale_ok"):
        try:
            samples_at_scale_metrics(
                extra, ctx[0], ctx[1], ctx[2],
                _RAND_MINS_HOOK["rand_mins"], _RAND_MINS_HOOK["make_sig"],
                emit_cb=lambda: emit(extra),
            )
        except Exception as exc:
            print(f"bench: config-5 at-scale failed: {exc!r}", file=sys.stderr)
            extra["samples_big_error"] = repr(exc)
        emit(extra)


def aa_throughput():
    """Protein-window hashing rate on the chip (the aa half of the sketch
    surface, reference `signature.rs:362-393`), gated on value-exactness
    vs the host murmur loop. Cache-busting harness: distinct uploaded
    batches, chained dispatches, one readback."""
    import jax
    import jax.numpy as jnp

    from sourmash_tpu.ops.murmur import murmur3_x64_128_first64
    from sourmash_tpu.ops.pallas_sketch import aa_window_hash_pairs_pallas

    k = 10
    rng = np.random.default_rng(1)
    alpha = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    B, S = 8, (1 << 21) + k - 1
    host_aa = rng.choice(alpha, size=(B, S))

    # value-exactness gate on one row
    hi, lo, _v = aa_window_hash_pairs_pallas(
        jnp.asarray(host_aa[:1]), ksize=k
    )
    n = S - k + 1
    got = (np.asarray(hi)[0, :n].astype(np.uint64) << np.uint64(32)) | (
        np.asarray(lo)[0, :n].astype(np.uint64)
    )
    w = np.lib.stride_tricks.sliding_window_view(host_aa[0], k)
    with np.errstate(over="ignore"):
        want = murmur3_x64_128_first64(np.ascontiguousarray(w), k, 42, xp=np)
    if not np.array_equal(got, want):
        raise SystemExit("device/host aa hash values disagree")

    # LINK-INVARIANT chain (round 5): 8 distinct pre-uploaded batches, the
    # rep loop runs on device in one dispatch, constant dispatch+RTT
    # overhead cancelled by the two-length slope; `salt` defeats any
    # result cache between repeated identical dispatches.
    from jax import lax

    n_pool = 8
    stacked = jnp.stack(
        [jnp.asarray(rng.choice(alpha, size=(B, S))) for _ in range(n_pool)]
    )
    np.asarray(stacked).ravel()[:1]

    @jax.jit
    def aa_chain(n_reps, salt):
        def body(i, acc):
            b = lax.dynamic_index_in_dim(stacked, i % n_pool, 0, keepdims=False)
            hi, lo, _v = aa_window_hash_pairs_pallas(b, ksize=k)
            # consume a strided slice so the kernel can't be elided
            return acc + lo[0, :: 65536].astype(jnp.int64).sum()

        return lax.fori_loop(0, n_reps, body, salt)

    salt = [np.int64(0)]

    def chain(r):
        salt[0] += 1
        return float(np.asarray(aa_chain(np.int32(r), salt[0])))

    r_small, r_big = 4, 20
    chain(r_small)  # warm/compile
    t_small = min(_timed(lambda: chain(r_small)) for _ in range(3))
    t_big = min(_timed(lambda: chain(r_big)) for _ in range(3))
    assert t_big > t_small, (t_small, t_big)
    rate = (r_big - r_small) * B * (1 << 21) / (t_big - t_small)
    print(
        f"bench: aa hashing {rate/1e6:.0f} Maa-windows/s "
        f"(slope {t_big - t_small:.3f}s over {r_big - r_small} chained reps)",
        file=sys.stderr,
    )
    return round(rate, 1)


def sketch_cli_metrics(out):
    """BASELINE config 1 end-to-end: `sourmash sketch dna` on the three
    bundled GCF genomes (FASTA.gz -> one .sig), timed cold and warm through
    the real CLI entry point. Parity-gated two ways: every CLI md5 must
    equal the single-thread native host twin's (the reference's
    `command_sketch.py:662` _compute_individual loop, re-run here and timed
    as the vs-host baseline), and GCF_000005845's k=31 md5 must equal the
    known-good reference value."""
    import glob
    import hashlib  # noqa: F401  (kept for parity helpers)
    import io as _io
    import tempfile
    from contextlib import redirect_stderr, redirect_stdout

    import sourmash_tpu as sm
    from sourmash_tpu import native
    from sourmash_tpu.__main__ import main as sm_main
    from sourmash_tpu.ops import encodings as enc
    from sourmash_tpu.sequence_io import iter_records_bytes
    from sourmash_tpu.signature import (
        load_signatures_from_json,
        save_signatures_to_json,
    )

    genomes = sorted(glob.glob("/root/reference/data/*.fna.gz"))
    assert genomes, "bundled genomes missing"

    with tempfile.TemporaryDirectory() as td:
        outp = os.path.join(td, "out.sig")

        def run_cli():
            if os.path.exists(outp):
                os.remove(outp)
            o, e = _io.StringIO(), _io.StringIO()
            with redirect_stdout(o), redirect_stderr(e):
                rc = sm_main(["sketch", "dna", *genomes, "-o", outp])
            assert not rc, e.getvalue()

        t0 = time.perf_counter()
        run_cli()
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_cli()
        warm = time.perf_counter() - t0
        cli_md5s = [ss.md5sum() for ss in load_signatures_from_json(outp)]

        # single-thread native host twin of the same flow: stream records,
        # canonical-murmur+threshold each on ONE thread, write the .sig
        twin_path = os.path.join(td, "twin.sig")
        total_bp = 0
        t0 = time.perf_counter()
        twin_sigs = []
        for g in genomes:
            mh = sm.MinHash(0, 31, scaled=1000)
            for _name, s in iter_records_bytes(g):
                arr = enc.upper(np.frombuffer(s, dtype=np.uint8))
                total_bp += arr.shape[0]
                surv, _first_bad = native.sketch_hashes(
                    arr, 31, 42, int(mh._max_hash), n_threads=1
                )
                mh.add_many(np.unique(surv))
            twin_sigs.append(sm.SourmashSignature(mh, filename=g))
        with open(twin_path, "wb") as fp:
            save_signatures_to_json(twin_sigs, fp)
        host_s = time.perf_counter() - t0
        twin_md5s = [ss.md5sum() for ss in load_signatures_from_json(twin_path)]

    assert cli_md5s == twin_md5s, (cli_md5s, twin_md5s)
    ecoli = [g for g in genomes if "GCF_000005845" in g]
    if ecoli:
        i = genomes.index(ecoli[0])
        assert cli_md5s[i] == "0a8632c67e6d88f737ddb510bef90337", cli_md5s[i]

    out["sketch_cli_wall_s"] = round(warm, 2)
    out["sketch_cli_cold_s"] = round(cold, 2)
    out["sketch_cli_mbp_per_s"] = round(total_bp / 1e6 / warm, 1)
    out["sketch_cli_host_1t_s"] = round(host_s, 2)
    out["sketch_cli_vs_host"] = round(host_s / warm, 2)
    print(
        f"bench: sketch dna CLI ({len(genomes)} genomes, "
        f"{total_bp/1e6:.1f} Mbp) {cold:.2f}s cold / {warm:.2f}s warm = "
        f"{out['sketch_cli_mbp_per_s']} Mbp/s; single-thread host twin "
        f"{host_s:.2f}s ({out['sketch_cli_vs_host']}x), md5 parity OK",
        file=sys.stderr,
    )


def _measure_rtt_ms():
    "Round-trip cost of one tiny dispatch+readback (the tunnel floor)."
    import jax.numpy as jnp

    x = jnp.zeros(8, jnp.int32)
    np.asarray(x + 1)  # warm/compile
    return round(min(_timed(lambda: np.asarray(x + 1)) for _ in range(5)) * 1e3, 2)


def _measure_link_mbps():
    """Achieved host->device bandwidth (MB/s). Uploads are consumed by a
    strided reduce so the tunnel's deferred-transfer mode can't fake the
    timing; fresh random payloads defeat its result cache."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x.ravel()[:: 4096].sum())
    n = 16 * 1024 * 1024 // 4
    x = np.random.randint(0, 2**31, size=n, dtype=np.int32)
    np.asarray(f(jax.device_put(x)))  # warm/compile
    best = float("inf")
    for _ in range(3):
        x = np.random.randint(0, 2**31, size=n, dtype=np.int32)
        t0 = time.perf_counter()
        np.asarray(f(jax.device_put(x)))
        best = min(best, time.perf_counter() - t0)
    return round(16.0 / best, 1)


def query_engine_metrics():
    """BASELINE configs 2-4 on the same chip: all-pairs compare throughput
    (device-time and wall split; unordered pairs), search/prefetch latency,
    the scheduled device gather vs an n-signature index
    (n = SOURMASH_TPU_BENCH_N, default 10000), and the at-scale legs:
    a >=40k-sketch gather (SOURMASH_TPU_BENCH_BIG_N, config 4) plus a
    forced beyond-HBM streaming-banks pass (SOURMASH_TPU_BENCH_STREAM_N)."""
    import jax
    import jax.numpy as jnp

    import sourmash_tpu as sm
    from sourmash_tpu.index.flat import FlatIndex
    from sourmash_tpu.search import GatherDatabases
    from sourmash_tpu.ops.intersect import pairwise_intersection_counts

    rng = np.random.default_rng(42)
    scaled = 1000
    max_hash = (2**64 - 1) // scaled

    def rand_mins(n):
        return np.unique(rng.integers(0, max_hash, size=n, dtype=np.uint64))

    def make_sig(mins, name):
        mh = sm.MinHash(0, 31, scaled=scaled)
        mh.add_many(mins)
        return sm.SourmashSignature(mh, name=name)

    out = {}
    out["tunnel_rtt_ms"] = _measure_rtt_ms()
    out["link_mbps"] = _measure_link_mbps()
    print(
        f"bench: tunnel rtt {out['tunnel_rtt_ms']} ms, "
        f"link {out['link_mbps']} MB/s",
        file=sys.stderr,
    )

    # config 2: all-pairs compare; throughput in UNORDERED pairs
    # (n*(n-1)/2 distinct comparisons — the number `sourmash compare`
    # performs). CACHE-PROOF: one row is regenerated per rep so the
    # tunnel's result cache can never serve a repeated dispatch. Wall is
    # the full pipeline (host limb fill + raw-sized upload + device pack
    # + compare passes + readback + exact spill join); device time is the
    # compare passes alone over already-resident planes.
    from sourmash_tpu.ops.bucketed import (
        _counts_block,
        choose_buckets,
        pack_rows_device,
    )

    def compare_leg(n_cmp, tag):
        cmp_mins = [rand_mins(5000) for _ in range(n_cmp)]
        pairwise_intersection_counts(cmp_mins)  # warm/compile
        walls = []
        for _ in range(3):
            cmp_mins[0] = rand_mins(5000)
            walls.append(
                _timed(lambda: pairwise_intersection_counts(cmp_mins))
            )
        wall = float(np.median(walls))

        B = choose_buckets(max(len(m) for m in cmp_mins))
        bank = pack_rows_device(cmp_mins, B)
        if bank is None:
            from sourmash_tpu.ops.bucketed import pack_rows_bucketed

            bank = pack_rows_bucketed(cmp_mins, B)
        rows = bank.hi.shape[0]

        def device_pass(shift):
            # cache-proof: rotate the starting block so no dispatch
            # repeats with identical operands
            outs = []
            blk = min(16, rows)
            for i in range(0, rows, blk):
                j = (i + shift * blk) % rows
                Qhi = jax.lax.dynamic_slice_in_dim(bank.hi, j, blk, 0)
                Qlo = jax.lax.dynamic_slice_in_dim(bank.lo, j, blk, 0)
                Qcnt = jax.lax.dynamic_slice_in_dim(bank.cnt, j, blk, 0)
                outs.append(
                    _counts_block(Qhi, Qlo, Qcnt, bank.hi, bank.lo, bank.cnt)
                )
            jnp.concatenate(outs, axis=0).block_until_ready()

        device_pass(0)  # warm
        dev = float(
            np.median([_timed(lambda s=s: device_pass(s)) for s in (1, 2, 3)])
        )
        n_unordered = n_cmp * (n_cmp - 1) // 2
        out[f"compare{tag}_unordered_pairs_per_sec"] = round(
            n_unordered / wall, 1
        )
        out[f"compare{tag}_wall_s"] = round(wall, 3)
        out[f"compare{tag}_device_s"] = round(dev, 3)
        # link-byte floor: raw limb upload + counts readback — the wall
        # over device time is accountable against these bytes at link_mbps
        L = max(128, -(-max(len(m) for m in cmp_mins) // 128) * 128)
        link_mb = (rows * L * 8 + n_cmp * n_cmp * 4) / 1e6
        out[f"compare{tag}_link_mb"] = round(link_mb, 1)
        print(
            f"bench: compare {n_cmp}x{n_cmp} ({n_unordered} unordered pairs) "
            f"wall {wall:.3f}s, device {dev:.3f}s",
            file=sys.stderr,
        )

    compare_leg(int(os.environ.get("SOURMASH_TPU_BENCH_CMP_N", "500")), "")
    n2 = int(os.environ.get("SOURMASH_TPU_BENCH_CMP2_N", "2000"))
    if n2:
        compare_leg(n2, "_2k")

    # configs 3-4: search / prefetch / gather vs an n-signature index
    n_db = int(os.environ.get("SOURMASH_TPU_BENCH_N", "10000"))
    genomes = [rand_mins(5000) for _ in range(n_db)]
    sigs = [make_sig(m, f"genome{i}") for i, m in enumerate(genomes)]
    db = FlatIndex(sigs)
    query = make_sig(genomes[17], "query")
    db._build()

    db.search(query, threshold=0.05)  # warm/compile the cutoff kernel
    out["search_latency_ms"] = round(
        min(_timed(lambda: db.search(query, threshold=0.05)) for _ in range(3))
        * 1000,
        2,
    )
    # same query against a 1k-row subset: the warm-latency residual over
    # the RTT floor scales with rows, i.e. it is device compute, not
    # host/dispatch overhead (VERDICT r4 item 10 accounting)
    db1k = FlatIndex(sigs[:1000])
    db1k._build()
    db1k.search(query, threshold=0.05)  # warm
    out["search_latency_1k_ms"] = round(
        min(
            _timed(lambda: db1k.search(query, threshold=0.05))
            for _ in range(3)
        )
        * 1000,
        2,
    )

    list(db.prefetch(query, threshold_bp=50000))  # warm
    out["prefetch_latency_ms"] = round(
        min(
            _timed(lambda: list(db.prefetch(query, threshold_bp=50000)))
            for _ in range(3)
        )
        * 1000,
        2,
    )

    true_ids = rng.choice(n_db, size=20, replace=False)
    meta = np.unique(
        np.concatenate([genomes[i] for i in true_ids] + [rand_mins(20000)])
    )
    mquery = make_sig(meta, "metagenome")

    def run_gather():
        "counter build + scheduled rounds; returns (found, round times)."
        counter = db.counter_gather(mquery, 50000)
        counter.enable_device_schedule()  # the CLI single-database path
        gd = GatherDatabases(mquery, [counter], threshold_bp=50000)
        rounds = []
        found = 0
        while True:
            tr = time.perf_counter()
            try:
                next(gd)
            except StopIteration:
                break
            rounds.append(time.perf_counter() - tr)
            found += 1
        return found, rounds

    run_gather()  # warm/compile (membership + schedule scan kernels)
    t0 = time.perf_counter()
    found, rounds = run_gather()
    out["gather_total_s"] = round(time.perf_counter() - t0, 3)
    out["gather_round_p50_ms"] = round(
        float(np.median(rounds)) * 1000 if rounds else 0.0, 2
    )
    out["gather_db_size"] = n_db
    out["gather_found"] = found
    print(
        f"bench: gather {found}/20 vs {n_db} sigs in {out['gather_total_s']}s warm",
        file=sys.stderr,
    )

    _RAND_MINS_HOOK["rand_mins"] = rand_mins
    _RAND_MINS_HOOK["make_sig"] = make_sig
    return out


# main() runs the at-scale legs AFTER emitting the core headline line;
# query_engine_metrics parks its data helpers here for that second stage
_RAND_MINS_HOOK: dict = {}


def zip_gather_metrics(out, rand_mins, make_sig):
    """The reference's flagship user flow, end to end: `sourmash gather
    meta.sig db.zip` with a plain zip collection — round 4 routes this
    through the device engine via the FlatIndex view (>=512 signatures),
    so the CLI wall here includes zip load + view pack + device schedule
    + full stat rounds + CSV. SOURMASH_TPU_BENCH_ZIP_N rescales; 0
    disables."""
    import io as _io
    import tempfile
    from contextlib import redirect_stderr, redirect_stdout

    n = int(os.environ.get("SOURMASH_TPU_BENCH_ZIP_N", "2000"))
    if not n:
        return
    import sourmash_tpu.index.flat as flat
    from sourmash_tpu.__main__ import main as sm_main
    from sourmash_tpu.save_load import SaveSignaturesToLocation

    rng = np.random.default_rng(5)
    genomes = [rand_mins(2500) for _ in range(n)]
    true_ids = rng.choice(n, size=20, replace=False)
    meta = np.unique(
        np.concatenate([genomes[i] for i in true_ids] + [rand_mins(20000)])
    )
    with tempfile.TemporaryDirectory() as td:
        zpath = os.path.join(td, "db.zip")
        t0 = time.perf_counter()
        with SaveSignaturesToLocation(zpath) as save:
            for i, g in enumerate(genomes):
                save.add(make_sig(g, f"z{i}"))
        zip_write_s = time.perf_counter() - t0
        qpath = os.path.join(td, "meta.sig")
        with SaveSignaturesToLocation(qpath) as save:
            save.add(make_sig(meta, "meta"))

        # cold-phase split (VERDICT r4 item 9) on an identical COPY of the
        # zip (different file identity -> its own view-cache key, so the
        # CLI cold run below stays cold): member decompress + JSON + md5
        # (= load), then device pack + upload (= view build)
        import shutil as _sh

        zpath2 = os.path.join(td, "db2.zip")
        _sh.copyfile(zpath, zpath2)
        import sourmash_tpu as _sm

        t0 = time.perf_counter()
        idx2 = _sm.load_file_as_index(zpath2)
        sigs2 = list(idx2.signatures())
        assert len(sigs2) == n
        cold_load_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        view2 = idx2._as_flat_view()
        if view2 is not None:  # <512 sigs: below the flat-view threshold
            view2._build()
        cold_pack_s = time.perf_counter() - t0
        out["zip_cold_load_s"] = round(cold_load_s, 2)
        out["zip_cold_pack_s"] = round(cold_pack_s, 2)
        print(
            f"bench: zip cold split: load(decompress+json+md5) "
            f"{cold_load_s:.2f}s, view pack+upload {cold_pack_s:.2f}s",
            file=sys.stderr,
        )
        del idx2, sigs2, view2

        ran = {}
        orig = flat.DeviceGatherSchedule.compute

        def spy(self, threshold_bp):
            ran["scheduled"] = True
            return orig(self, threshold_bp)

        flat.DeviceGatherSchedule.compute = spy
        try:
            walls = []
            for _rep in range(2):  # cold (compiles) then warm
                t0 = time.perf_counter()
                o, e = _io.StringIO(), _io.StringIO()
                with redirect_stdout(o), redirect_stderr(e):
                    rc = sm_main(
                        ["gather", qpath, zpath, "-o",
                         os.path.join(td, "out.csv")]
                    )
                walls.append(time.perf_counter() - t0)
                assert not rc, e.getvalue()
            wall, warm_wall = walls
        finally:
            flat.DeviceGatherSchedule.compute = orig
        assert ran.get("scheduled"), "zip gather did not use the device engine"
        import csv as _csv

        with open(os.path.join(td, "out.csv")) as fp:
            found = len(list(_csv.DictReader(fp)))
    out["zip_gather_db_size"] = n
    out["zip_gather_wall_s"] = round(wall, 2)
    out["zip_gather_warm_s"] = round(warm_wall, 2)
    out["zip_gather_found"] = found
    out["zip_write_s"] = round(zip_write_s, 1)
    print(
        f"bench: CLI `gather meta.sig db.zip` ({n} sigs) end-to-end "
        f"{wall:.2f}s cold / {warm_wall:.2f}s warm, {found}/20 recovered, "
        "device-scheduled",
        file=sys.stderr,
    )


def streaming_samples_metrics(out):
    """BASELINE config 5 as a PRODUCT-path leg: N mock metagenome samples
    end-to-end — raw sample bytes through the data-parallel sketch kernel
    (on this chip the 'data' mesh axis is 1; dryrun_multichip verifies the
    multi-device form), then the multigather machinery: batched counter
    warm-up, per-query FlatCounterGather, round schedules computed in
    data-parallel batches (`compute_schedules_batch`), and full
    GatherDatabases stat rounds per sample. Reports samples/sec.
    SOURMASH_TPU_BENCH_SAMPLES rescales; 0 disables."""
    n_samples = int(os.environ.get("SOURMASH_TPU_BENCH_SAMPLES", "1000"))
    if not n_samples:
        return
    import jax
    import jax.numpy as jnp

    import sourmash_tpu as sm
    from sourmash_tpu.index.flat import (
        FlatIndex,
        compute_schedules_batch,
        schedule_device_gather,
    )
    from sourmash_tpu.minhash import _get_max_hash_for_scaled
    from sourmash_tpu.parallel import get_mesh, make_sharded_sketch
    from sourmash_tpu.search import GatherDatabases

    rng = np.random.default_rng(11)
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    ksize, scaled = 31, 100
    n_genomes, genome_len = 64, 100_000
    reads, read_len = 64, 1024
    genomes = [
        rng.choice(alphabet, size=genome_len) for _ in range(n_genomes)
    ]

    # reference sketches (device batch, one row per genome)
    gb = np.stack(genomes)
    mesh = get_mesh(1, len(jax.devices()))
    cap = 8192
    sketch_fn = make_sharded_sketch(mesh, ksize, cap=cap)
    mh_cut = np.uint64(_get_max_hash_for_scaled(scaled))
    g_out, g_n = sketch_fn(jnp.asarray(gb), jnp.asarray(mh_cut))
    g_out, g_n = np.asarray(g_out), np.asarray(g_n)
    db_sigs = []
    for i in range(n_genomes):
        mh = sm.MinHash(0, ksize, scaled=scaled)
        mh.add_many(np.unique(g_out[i, : g_n[i]]))
        db_sigs.append(sm.SourmashSignature(mh, name=f"ref{i}").to_frozen())
    db = FlatIndex(db_sigs)
    db._build()

    # mock samples: reads from 2-5 source genomes, 'N'-separated
    def build_sample():
        k_src = int(rng.integers(2, 6))
        src = rng.choice(n_genomes, size=k_src, replace=False)
        parts = []
        for _ in range(reads):
            g = genomes[int(rng.choice(src))]
            s = int(rng.integers(0, genome_len - read_len))
            parts.append(g[s : s + read_len])
            parts.append(np.frombuffer(b"N", dtype=np.uint8))
        return np.concatenate(parts), sorted(int(x) for x in src)

    rows, truths = zip(*(build_sample() for _ in range(n_samples)))
    S = max(len(r) for r in rows)
    batch = np.full((n_samples, S), ord("N"), dtype=np.uint8)
    for i, r in enumerate(rows):
        batch[i, : len(r)] = r

    # sample sketches use a tight survivor cap: the readback is [blk, cap]
    # u64 and the tunnel link pays for every byte, so cap tracks the
    # expected survivor count (asserted: no row may hit the cap)
    s_cap = -(-(S // scaled) * 4 // 128) * 128
    s_sketch_fn = make_sharded_sketch(mesh, ksize, cap=s_cap)
    s_sketch_fn(jnp.asarray(batch[:128]), jnp.asarray(mh_cut))  # compile

    t0 = time.perf_counter()
    # sketch all samples in device blocks (rows shard over 'data'):
    # dispatch every block first (async), then read back — block i+1's
    # upload overlaps block i's compute and readback
    blk = 128
    if n_samples % blk:  # pad the tail block: one compiled shape
        pad = np.full((blk - n_samples % blk, S), ord("N"), dtype=np.uint8)
        batch = np.concatenate([batch, pad])
    pending = [
        s_sketch_fn(jnp.asarray(batch[b0 : b0 + blk]), jnp.asarray(mh_cut))
        for b0 in range(0, len(batch), blk)
    ]
    sample_mhs = []
    for s_out, s_n in pending:
        s_out, s_n = np.asarray(s_out), np.asarray(s_n)
        assert int(s_n.max()) < s_cap, "survivor cap overflow"
        for i in range(len(s_n)):
            if len(sample_mhs) >= n_samples:
                break
            mh = sm.MinHash(0, ksize, scaled=scaled)
            mh.add_many(np.unique(s_out[i, : s_n[i]]))
            sample_mhs.append(mh)
    queries = [
        sm.SourmashSignature(mh, name=f"s{i}").to_frozen()
        for i, mh in enumerate(sample_mhs)
    ]

    # multigather phase 1: batched counter warm-up + data-parallel schedules
    db.warm_gather_counts([q.minhash for q in queries])
    coords = []
    counters = []
    for q in queries:
        c = db.counter_gather(q, threshold_bp=0)
        counters.append(c)
        coords.append(schedule_device_gather([c]))
    compute_schedules_batch([c for c in coords if c is not None], 0)

    found = 0
    correct = 0
    for qi, q in enumerate(queries):
        gd = GatherDatabases(q, [counters[qi]], threshold_bp=0)
        got = sorted(int(r.match.name[3:]) for r in gd)
        found += len(got)
        correct += got == truths[qi]
    total = time.perf_counter() - t0
    assert correct >= int(0.95 * n_samples), (correct, n_samples)
    out["streaming_samples"] = n_samples
    out["streaming_samples_total_s"] = round(total, 2)
    out["samples_per_sec"] = round(n_samples / total, 2)
    out["streaming_samples_correct"] = correct
    print(
        f"bench: config-5 streaming {n_samples} samples end-to-end in "
        f"{total:.1f}s ({out['samples_per_sec']}/s; {correct} exact "
        "decompositions)",
        file=sys.stderr,
    )


def _realistic_gtdb_sketches(n_big, rand_mins):
    """A GTDB-rs214-shaped collection grown from the reference's REAL
    genomes (BASELINE config 4 names GTDB reps): base sketches come from
    the checked-in 47/63 signatures plus genomes sketched by this
    framework (the 3 bundled GCF genomes and the small genome-s1x set —
    genuine length skew from ~30 kb to ~5 Mb). Each of the n_big entries
    is a mutated, subsampled relative of one base: a log-uniform mutation
    rate r in [5e-4, 5e-2] flips each hash with probability
    1-(1-r)^k (a mutated k-mer rehashes anywhere), and a 60-100%% subsample
    models assembly-completeness skew — so the collection has the
    shared-hash cluster structure of real reference databases instead of
    independent uniform draws. Returns (hash sets, number of bases,
    per-genome base assignment)."""
    import glob

    import sourmash_tpu as sm
    from sourmash_tpu.signature import load_signatures_from_json

    k, scaled = 31, 1000
    max_hash = np.uint64((2**64 - 1) // scaled)
    tdata = "/root/reference/tests/test-data"
    bases = []
    for f in ("47.fa.sig", "63.fa.sig"):
        for ss in load_signatures_from_json(os.path.join(tdata, f)):
            mh = ss.minhash
            if mh.ksize == k and mh.scaled and mh.scaled <= scaled:
                bases.append(mh.downsample(scaled=scaled).mins_array())
    genome_files = sorted(glob.glob("/root/reference/data/*.fna.gz")) + [
        os.path.join(tdata, f)
        for f in (
            "genome-s10.fa.gz", "genome-s11.fa.gz", "genome-s12.fa.gz",
            "genome-s10-small.fa.gz",
        )
    ]
    from sourmash_tpu.sequence_io import iter_records_bytes

    for path in genome_files:
        mh = sm.MinHash(0, k, scaled=scaled)
        for _name, seq in iter_records_bytes(path):
            mh.add_sequence(seq, force=True)
        if len(mh):
            bases.append(mh.mins_array())

    rng = np.random.default_rng(13)
    genomes = []
    base_of = []
    for _ in range(n_big):
        bi = int(rng.integers(len(bases)))
        base_of.append(bi)
        base = bases[bi]
        r = float(np.exp(rng.uniform(np.log(5e-4), np.log(5e-2))))
        flip = 1.0 - (1.0 - r) ** k
        keep = rng.uniform(0.6, 1.0)
        # one uniform draw decides drop/flip/keep per hash (u is uniform
        # within [0, keep) conditional on being kept)
        u = rng.random(len(base))
        kept = base[u < keep * (1.0 - flip)]  # sorted subset stays sorted
        n_fresh = int((u < keep).sum()) - len(kept)
        fresh = np.sort(
            rng.integers(0, max_hash, n_fresh, dtype=np.uint64)
        )
        # merge two sorted arrays in O(n): insert positions via searchsorted
        merged = np.insert(kept, np.searchsorted(kept, fresh), fresh)
        if len(merged) > 1 and not bool(np.all(merged[:-1] < merged[1:])):
            merged = np.unique(merged)  # astronomically rare collision
        genomes.append(merged)
    return genomes, len(bases), base_of


def at_scale_metrics(out, rand_mins, make_sig):
    """Config-4-scale legs, run on whatever chip the driver provides:

    1. a forced beyond-HBM STREAMING pass — packed planes stay host-resident
       (SOURMASH_TPU_HBM_BUDGET_BYTES=1) and stream to the device per
       counter query, value-checked against host np.intersect1d;
    2. a GTDB-rs214-scale (85k-sketch, ~2500 hashes each, 11.3 GB of
       device-resident packed planes) scheduled gather with 30 planted
       genomes and full GatherDatabases stat rounds.

    SOURMASH_TPU_BENCH_STREAM_N / SOURMASH_TPU_BENCH_BIG_N rescale; 0
    disables a leg."""
    import sourmash_tpu as sm
    from sourmash_tpu.index.flat import FlatIndex
    from sourmash_tpu.search import GatherDatabases
    from sourmash_tpu.ops import index_ops

    # -- streaming-banks leg ------------------------------------------------
    n_stream = int(os.environ.get("SOURMASH_TPU_BENCH_STREAM_N", "5000"))
    if n_stream:
        genomes = [rand_mins(2500) for _ in range(n_stream)]
        old = os.environ.get("SOURMASH_TPU_HBM_BUDGET_BYTES")
        os.environ["SOURMASH_TPU_HBM_BUDGET_BYTES"] = "1"
        try:
            banks = index_ops.build_banks(genomes)
            assert not any(
                hasattr(c.hi, "devices") for b in banks for c in b.chunks
            ), "planes unexpectedly device-resident"
            q = np.unique(np.concatenate([genomes[3], genomes[7], rand_mins(2000)]))
            counts = index_ops.counts_for_banks(banks, q, n_stream)  # warm
            t0 = time.perf_counter()
            counts = index_ops.counts_for_banks(banks, q, n_stream)
            dt = time.perf_counter() - t0
            for i in (3, 7, 11, n_stream - 1):
                want = len(np.intersect1d(q, genomes[i], assume_unique=True))
                assert counts[i] == want, (i, counts[i], want)
            out["streaming_mode"] = True
            out["streaming_db_size"] = n_stream
            out["streaming_pass_s"] = round(dt, 3)
            plane_bytes = index_ops._planes_nbytes(banks)
            out["streaming_plane_gb"] = round(plane_bytes / 1e9, 2)
            print(
                f"bench: streaming pass {n_stream} sigs "
                f"({out['streaming_plane_gb']} GB host planes) in {dt:.3f}s, "
                "counts exact",
                file=sys.stderr,
            )
            del banks
        finally:
            if old is None:
                os.environ.pop("SOURMASH_TPU_HBM_BUDGET_BYTES", None)
            else:
                os.environ["SOURMASH_TPU_HBM_BUDGET_BYTES"] = old

    # -- >=40k device-resident scheduled gather -----------------------------
    n_big = int(os.environ.get("SOURMASH_TPU_BENCH_BIG_N", "85000"))
    if not n_big:
        return
    rng = np.random.default_rng(7)
    t0 = time.perf_counter()
    genomes, n_bases, base_of = _realistic_gtdb_sketches(n_big, rand_mins)
    sigs = [make_sig(m, f"big{i}") for i, m in enumerate(genomes)]
    true_ids = rng.choice(n_big, size=30, replace=False)
    meta = np.unique(
        np.concatenate([genomes[i] for i in true_ids] + [rand_mins(30000)])
    )
    mquery = make_sig(meta, "bigmeta")
    gen_s = time.perf_counter() - t0
    out["gather_big_realistic_bases"] = n_bases

    db = FlatIndex(sigs)
    t0 = time.perf_counter()
    db._build()  # host pack + device upload
    build_s = time.perf_counter() - t0
    print(
        f"bench: big index {n_big} sigs generated in {gen_s:.1f}s, "
        f"packed+uploaded in {build_s:.1f}s",
        file=sys.stderr,
    )

    # per-phase accounting (VERDICT r4 item 3): counter counts pass,
    # schedule scans (incl. reschedules), recounts, and the residual =
    # host stat rounds + bookkeeping
    from sourmash_tpu.index import flat as _flat

    phase = {"sched_s": 0.0, "n_sched": 0, "recount_s": 0.0, "n_recount": 0,
             "counter_s": 0.0}
    _orig_compute = _flat.DeviceGatherSchedule.compute
    _orig_recount = _flat.FlatCounterGather._recount

    def _timed_compute(self, threshold_bp):
        t = time.perf_counter()
        r = _orig_compute(self, threshold_bp)
        phase["sched_s"] += time.perf_counter() - t
        phase["n_sched"] += 1
        return r

    def _timed_recount(self, cur_query_mh, threshold_bp):
        t = time.perf_counter()
        r = _orig_recount(self, cur_query_mh, threshold_bp)
        phase["recount_s"] += time.perf_counter() - t
        phase["n_recount"] += 1
        return r

    def run_big():
        t = time.perf_counter()
        counter = db.counter_gather(mquery, 50000)
        counter.enable_device_schedule()
        phase["counter_s"] = time.perf_counter() - t
        gd = GatherDatabases(mquery, [counter], threshold_bp=50000)
        rounds = []
        while True:
            tr = time.perf_counter()
            try:
                next(gd)
            except StopIteration:
                break
            rounds.append(time.perf_counter() - tr)
        return rounds, gd

    _flat.DeviceGatherSchedule.compute = _timed_compute
    _flat.FlatCounterGather._recount = _timed_recount
    try:
        run_big()  # warm/compile
        for k in ("sched_s", "recount_s"):
            phase[k] = 0.0
        phase["n_sched"] = phase["n_recount"] = 0
        t0 = time.perf_counter()
        rounds, gd = run_big()
        total_s = time.perf_counter() - t0
    finally:
        _flat.DeviceGatherSchedule.compute = _orig_compute
        _flat.FlatCounterGather._recount = _orig_recount
    out["gather_big_db_size"] = n_big
    out["gather_big_total_s"] = round(total_s, 3)
    out["gather_big_round_p50_ms"] = round(
        float(np.median(rounds)) * 1000 if rounds else 0.0, 2
    )
    out["gather_big_found"] = len(rounds)
    out["gather_big_build_s"] = round(build_s, 1)
    out["gather_big_counter_s"] = round(phase["counter_s"], 3)
    out["gather_big_sched_s"] = round(phase["sched_s"], 3)
    out["gather_big_sched_n"] = phase["n_sched"]
    out["gather_big_recount_s"] = round(phase["recount_s"], 3)
    out["gather_big_recount_n"] = phase["n_recount"]
    out["gather_big_stat_s"] = round(
        max(total_s - phase["counter_s"] - phase["sched_s"]
            - phase["recount_s"], 0.0), 3,
    )
    print(
        f"bench: big gather split: counter {phase['counter_s']:.2f}s, "
        f"sched {phase['sched_s']:.2f}s x{phase['n_sched']}, "
        f"recount {phase['recount_s']:.2f}s x{phase['n_recount']}, "
        f"stat-rounds+misc {out['gather_big_stat_s']:.2f}s",
        file=sys.stderr,
    )
    # true genomes not recovered must be legitimately ABSORBED by closer
    # relatives under greedy min-set-cov: their remaining overlap with the
    # post-gather query must sit below the round threshold (50 hashes)
    rem = gd.query.minhash.mins_array()
    leftovers = [
        int(len(np.intersect1d(rem, genomes[i], assume_unique=True)))
        for i in true_ids
    ]
    assert max(leftovers, default=0) < 50, leftovers
    out["gather_big_absorption_verified"] = True

    _RAND_MINS_HOOK["at_scale_ctx"] = (db, genomes, base_of)
    print(
        f"bench: big gather {len(rounds)}/30 vs {n_big} sigs in "
        f"{out['gather_big_total_s']}s warm "
        f"(p50 round {out['gather_big_round_p50_ms']} ms; non-recovered "
        "true genomes verified absorbed below threshold)",
        file=sys.stderr,
    )


def samples_at_scale_metrics(
    out, db, genomes, base_of, rand_mins, make_sig, emit_cb=None
):
    """BASELINE config 5 AT DATABASE SCALE (VERDICT r4 item 1): N metagenome
    samples data-parallel against the full >=85k-sketch realistic bank
    (device-resident), end to end through the multigather machinery —
    batched warm counts over the resident planes, per-sample counters,
    data-parallel round schedules with ON-DEVICE membership bitsets, full
    GatherDatabases stat rounds. Every sample is built from 2-5 sources in
    DISTINCT base clusters (so greedy min-set-cov provably recovers exactly
    the sources), and exact decomposition is asserted for >=95% of samples.
    SOURMASH_TPU_BENCH_SAMPLES_BIG rescales; 0 disables."""
    from sourmash_tpu.index.flat import (
        converge_schedules_batch,
        schedule_device_gather,
    )
    from sourmash_tpu.search import GatherDatabases

    n_samp = int(os.environ.get("SOURMASH_TPU_BENCH_SAMPLES_BIG", "1000"))
    if not n_samp:
        return

    by_base = {}
    for i, b in enumerate(base_of):
        by_base.setdefault(b, []).append(i)
    bases_list = sorted(by_base)
    srng = np.random.default_rng(29)
    samples, truths = [], []
    for _ in range(n_samp):
        k_src = int(srng.integers(2, min(6, len(bases_list) + 1)))
        chosen = srng.choice(bases_list, size=k_src, replace=False)
        srcs = [int(srng.choice(by_base[b])) for b in chosen]
        parts = [
            genomes[s][srng.random(len(genomes[s])) < srng.uniform(0.6, 0.9)]
            for s in srcs
        ]
        samples.append(
            np.union1d(np.concatenate(parts), rand_mins(5000))
        )
        truths.append(sorted(srcs))
    queries = [make_sig(q, f"samp{i}") for i, q in enumerate(samples)]

    t0 = time.perf_counter()
    found = exact = 0
    absorbed_ok = 0
    leftover_fail = []
    done = 0
    wave = 250  # bounds the host counts-cache footprint (~250 x n rows)
    for w0 in range(0, n_samp, wave):
        wq = queries[w0 : w0 + wave]
        db.warm_gather_counts([q.minhash for q in wq])
        counters, coords = [], []
        for q in wq:
            c = db.counter_gather(q, threshold_bp=50000)
            counters.append(c)
            coords.append(schedule_device_gather([c]))
        converge_schedules_batch(coords, 50000)
        for qi, q in enumerate(wq):
            gd = GatherDatabases(q, [counters[qi]], threshold_bp=50000)
            got = sorted(int(r.match.name[3:]) for r in gd)
            found += len(got)
            truth = truths[w0 + qi]
            if got == truth:
                exact += 1
            else:
                # EXACT-DECOMPOSITION CHECK under greedy min-set-cov:
                # bases share hashes (real genomes 47/63 overlap), so a
                # planted source may legitimately be absorbed by earlier
                # rounds. Every non-recovered source must sit below the
                # round threshold against the final remaining query.
                rem = gd.query.minhash.mins_array()
                for s in set(truth) - set(got):
                    left = len(
                        np.intersect1d(
                            rem, genomes[s], assume_unique=True
                        )
                    )
                    if left >= 50:
                        leftover_fail.append((w0 + qi, s, int(left)))
                absorbed_ok += 1
        done = w0 + len(wq)
        assert not leftover_fail, leftover_fail[:5]
        # per-wave partial emit: the longest leg must survive a driver
        # timeout with the completed portion's rate on record
        part = time.perf_counter() - t0
        out["samples_big_n"] = done
        out["samples_big_db_size"] = len(db)
        out["samples_big_total_s"] = round(part, 2)
        out["samples_per_sec_at_scale"] = round(done / part, 2)
        out["samples_big_exact"] = exact
        out["samples_big_absorption_verified"] = True
        out["samples_big_partial"] = done < n_samp
        if emit_cb is not None:
            emit_cb()
        print(
            f"bench: config-5 at-scale progress {done}/{n_samp} "
            f"({out['samples_per_sec_at_scale']}/s)",
            file=sys.stderr,
        )
    total = time.perf_counter() - t0
    assert not leftover_fail, leftover_fail[:5]
    assert exact >= int(0.5 * n_samp), (exact, n_samp)

    # scheduled == plain host-round parity spot check on a few samples
    os.environ["SOURMASH_TPU_NO_SCHEDULE"] = "1"
    try:
        for qi in (0, n_samp // 2, n_samp - 1):
            c = db.counter_gather(queries[qi], threshold_bp=50000)
            gd = GatherDatabases(queries[qi], [c], threshold_bp=50000)
            host_got = sorted(int(r.match.name[3:]) for r in gd)
            c2 = db.counter_gather(queries[qi], threshold_bp=50000)
            del os.environ["SOURMASH_TPU_NO_SCHEDULE"]
            c2.enable_device_schedule()
            gd2 = GatherDatabases(queries[qi], [c2], threshold_bp=50000)
            sched_got = sorted(int(r.match.name[3:]) for r in gd2)
            os.environ["SOURMASH_TPU_NO_SCHEDULE"] = "1"
            assert host_got == sched_got, (qi, host_got, sched_got)
    finally:
        os.environ.pop("SOURMASH_TPU_NO_SCHEDULE", None)

    out["samples_big_n"] = n_samp
    out["samples_big_db_size"] = len(db)
    out["samples_big_total_s"] = round(total, 2)
    out["samples_per_sec_at_scale"] = round(n_samp / total, 2)
    out["samples_big_exact"] = exact
    out["samples_big_absorption_verified"] = True
    out["samples_big_partial"] = False
    print(
        f"bench: config-5 AT SCALE: {n_samp} samples vs {len(db)} sigs "
        f"end-to-end in {total:.1f}s ({out['samples_per_sec_at_scale']}/s; "
        f"{exact} byte-exact decompositions, every deviation verified "
        "absorbed below threshold; scheduled==host spot checks OK)",
        file=sys.stderr,
    )


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
