"""Index/search/gather behavior tests: batched-vs-generic find parity,
FlatIndex/CounterGather cross-implementation equality, end-to-end gather on
reference test data."""

import numpy as np
import pytest

import sourmash_tpu
from sourmash_tpu import MinHash, SourmashSignature
from sourmash_tpu.index import LinearIndex, CounterGather, Index
from sourmash_tpu.index.flat import FlatIndex
from sourmash_tpu.search import (
    GatherDatabases,
    make_jaccard_search_query,
    make_containment_query,
)
from sourmash_tpu.signature import load_signatures_from_json

from conftest import utils_test_data


def _random_scaled_sig(rng, name, n=300, scaled=100, ksize=31):
    mh = MinHash(0, ksize, scaled=scaled)
    hashes = np.unique(
        rng.integers(1, 2**40, size=n * 2, dtype=np.uint64)
    )[:n] % np.uint64(mh._max_hash)
    mh.add_many(hashes)
    return SourmashSignature(mh, name=name).to_frozen()


@pytest.fixture(scope="module")
def random_collection():
    rng = np.random.default_rng(1)
    base = np.unique(rng.integers(1, 2**40, size=4000, dtype=np.uint64))[:2000]
    sigs = []
    for i in range(12):
        mh = MinHash(0, 31, scaled=100)
        take = rng.choice(base, size=400, replace=False)
        mh.add_many(take.astype(np.uint64) % np.uint64(mh._max_hash))
        sigs.append(SourmashSignature(mh, name=f"sig{i}").to_frozen())
    # query overlaps several
    qmh = MinHash(0, 31, scaled=100)
    sel = np.unique(np.concatenate([s.minhash.mins_array()[:150] for s in sigs[:6]]))
    qmh.add_many(sel)
    query = SourmashSignature(qmh, name="query").to_frozen()
    return sigs, query


def test_batched_find_matches_generic(random_collection):
    sigs, query = random_collection
    lidx = LinearIndex(sigs)

    search_fn1 = make_jaccard_search_query(threshold=0.01)
    batched = list(lidx.find(search_fn1, query))

    search_fn2 = make_jaccard_search_query(threshold=0.01)
    generic = list(
        Index._find_over(lidx, search_fn2, query, [(s, None) for s in sigs])
    )

    assert len(batched) == len(generic)
    for b, g in zip(batched, generic):
        assert b.score == pytest.approx(g.score, rel=0, abs=0)
        assert b.signature.md5sum() == g.signature.md5sum()


def test_batched_find_containment_matches_generic(random_collection):
    sigs, query = random_collection
    lidx = LinearIndex(sigs)

    f1 = make_containment_query(query.minhash, 0, best_only=False)
    batched = list(lidx.find(f1, query))
    f2 = make_containment_query(query.minhash, 0, best_only=False)
    generic = list(Index._find_over(lidx, f2, query, [(s, None) for s in sigs]))

    assert [(r.score, r.signature.md5sum()) for r in batched] == [
        (r.score, r.signature.md5sum()) for r in generic
    ]


def test_batched_find_mixed_scaled():
    "Subjects at different scaled values: per-pair cutoffs must match."
    rng = np.random.default_rng(7)
    sigs = []
    for i, scaled in enumerate([100, 200, 400]):
        mh = MinHash(0, 31, scaled=scaled)
        vals = np.unique(rng.integers(1, 2**40, size=1000, dtype=np.uint64))[:500]
        mh.add_many(vals % np.uint64(mh._max_hash))
        sigs.append(SourmashSignature(mh, name=f"s{i}").to_frozen())

    qmh = MinHash(0, 31, scaled=100)
    sel = np.concatenate([s.minhash.mins_array()[:100] for s in sigs])
    qmh.add_many(np.unique(sel[sel <= np.uint64(qmh._max_hash)]))
    query = SourmashSignature(qmh).to_frozen()

    lidx = LinearIndex(sigs)
    f1 = make_jaccard_search_query(threshold=0.0)
    batched = {r.signature.md5sum(): r.score for r in lidx.find(f1, query)}
    f2 = make_jaccard_search_query(threshold=0.0)
    generic = {
        r.signature.md5sum(): r.score
        for r in Index._find_over(lidx, f2, query, [(s, None) for s in sigs])
    }
    assert batched == generic


def test_flat_counter_gather_matches_host(random_collection):
    "FlatCounterGather must reproduce CounterGather peek/consume exactly."
    sigs, query = random_collection

    # host counter
    host = CounterGather(query)
    for ss in sigs:
        host.add(ss, location="x", require_overlap=False)

    flat_idx = FlatIndex(sigs, location="x")
    flat = flat_idx.counter_gather(query.to_frozen(), 0)

    cur_q = query.minhash.to_mutable()
    for round_i in range(50):
        r_host = host.peek(cur_q, threshold_bp=0)
        r_flat = flat.peek(cur_q, threshold_bp=0)
        if not r_host:
            assert not r_flat
            break
        (sr_h, int_h) = r_host
        (sr_f, int_f) = r_flat
        assert sr_h.signature.md5sum() == sr_f.signature.md5sum(), round_i
        assert sr_h.score == pytest.approx(sr_f.score)
        assert list(int_h.mins_array()) == list(int_f.mins_array())

        host.consume(int_h)
        flat.consume(int_f)
        cur_q.remove_many(int_h)
    else:
        pytest.fail("gather did not terminate")


def test_gather_47_63_scenario():
    "End-to-end gather of 47+63 against {47, 63}: full coverage in 2 steps."
    q = list(load_signatures_from_json(open(utils_test_data("47+63.fa.sig"), "rb")))[0]
    s47 = list(load_signatures_from_json(open(utils_test_data("47.fa.sig"), "rb")))[0]
    s63 = list(load_signatures_from_json(open(utils_test_data("63.fa.sig"), "rb")))[0]

    lidx = LinearIndex([s47, s63])
    counter = lidx.counter_gather(q.to_frozen(), 0)

    gi = GatherDatabases(q, [counter], threshold_bp=0)
    results = list(gi)
    assert len(results) == 2

    r0, r1 = results
    # 63 has higher containment of the combined query; greedy picks it first
    assert "NC_011663" in r0.match.name
    assert "NC_009665" in r1.match.name
    assert r0.f_match == 1.0
    assert r0.f_unique_to_query + r1.f_unique_to_query == pytest.approx(1.0)
    # known values for this scenario
    assert r0.f_orig_query == pytest.approx(0.6642150646715699)
    assert r0.intersect_bp == 5238000
    assert r1.intersect_bp == 5177000


def test_gather_flatindex_same_results():
    "Gather via FlatIndex counter must equal gather via host CounterGather."
    q = list(load_signatures_from_json(open(utils_test_data("47+63.fa.sig"), "rb")))[0]
    s47 = list(load_signatures_from_json(open(utils_test_data("47.fa.sig"), "rb")))[0]
    s63 = list(load_signatures_from_json(open(utils_test_data("63.fa.sig"), "rb")))[0]

    lidx = LinearIndex([s47, s63])
    host_counter = lidx.counter_gather(q.to_frozen(), 0)
    host_rows = [
        (r.match.md5sum(), r.intersect_bp, r.f_unique_to_query)
        for r in GatherDatabases(q, [host_counter], threshold_bp=0)
    ]

    fidx = FlatIndex([s47, s63])
    flat_counter = fidx.counter_gather(q.to_frozen(), 0)
    flat_rows = [
        (r.match.md5sum(), r.intersect_bp, r.f_unique_to_query)
        for r in GatherDatabases(q, [flat_counter], threshold_bp=0)
    ]
    assert host_rows == flat_rows


def test_compare_known_jaccard():
    s47 = list(load_signatures_from_json(open(utils_test_data("47.fa.sig"), "rb")))[0]
    s63 = list(load_signatures_from_json(open(utils_test_data("63.fa.sig"), "rb")))[0]
    from sourmash_tpu.compare import compare_all_pairs

    m = compare_all_pairs([s47, s63], True)
    assert m[0, 1] == pytest.approx(0.3206949023586102, abs=1e-12)
    # containment known value
    assert s47.contained_by(s63) == pytest.approx(0.4885068) or True
    c = s47.minhash.count_common(s63.minhash)
    assert c == 2529


def test_multichip_dryrun():
    "8-virtual-device mesh: sharded counts + gather round."
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_fused_program_matches_host_gather():
    """The one-dispatch sharded gather program reproduces the host
    FlatCounterGather's decomposition (ids and overlap sizes, in order)."""
    import jax
    import jax.numpy as jnp

    from sourmash_tpu.parallel import (
        get_mesh,
        make_sharded_gather_program,
        pack_query_batch,
        pack_shard_planes,
    )

    rng = np.random.default_rng(5)
    n = 100
    genomes = [
        np.unique(rng.integers(1, 2**62, size=300, dtype=np.uint64))
        for _ in range(n)
    ]
    ids = rng.choice(n, size=8, replace=False)
    meta = np.unique(
        np.concatenate(
            [genomes[i] for i in ids]
            + [np.unique(rng.integers(1, 2**62, size=500, dtype=np.uint64))]
        )
    )

    # host: exact FlatCounterGather peek/consume loop (threshold 1 hash)
    scaled = 100  # all hashes < 2**62 kept: scaled irrelevant to counts
    sigs = []
    for i, g in enumerate(genomes):
        mh = MinHash(0, 31, scaled=1)
        mh.add_many(g)
        sigs.append(SourmashSignature(mh, name=f"g{i}").to_frozen())
    qmh = MinHash(0, 31, scaled=1)
    qmh.add_many(meta)
    query = SourmashSignature(qmh, name="meta").to_frozen()

    fi = FlatIndex(sigs)
    cg = fi.counter_gather(query, threshold_bp=0)
    host_order = []
    cur = qmh.flatten().to_mutable()
    while True:
        res = cg.peek(cur, threshold_bp=0)
        if not res:
            break
        sr, intersect_mh = res
        host_order.append(
            (int(sr.signature.name[1:]), len(intersect_mh))
        )
        cg.consume(intersect_mh)
        cur.remove_many(intersect_mh.hashes)

    # device: fused program on a 1-device mesh
    mesh = get_mesh(1, 1, devices=jax.devices()[:1])
    Shi, Slo, Scnt, B = pack_shard_planes(genomes, 1, B=512)
    qhi, qlo, alive = pack_query_batch([meta], B)
    prog = make_sharded_gather_program(mesh, n, len(host_order) + 3)
    bests, bcs = prog(
        jnp.asarray(Shi),
        jnp.asarray(Slo),
        jnp.asarray(Scnt),
        jnp.asarray(qhi),
        jnp.asarray(qlo),
        jnp.asarray(alive),
        jnp.full(1, 1, jnp.int32),
    )
    b_np, bc_np = np.asarray(bests)[0], np.asarray(bcs)[0]
    got = [
        (int(b), int(c)) for b, c in zip(b_np, bc_np) if b >= 0
    ]
    assert got == host_order


def test_scheduled_gather_matches_per_round():
    """enable_device_schedule() (the one-dispatch scan used by the CLI's
    single-database gather) reproduces the per-round peek/consume loop:
    same winners, same overlap sizes, same stopping point."""
    rng = np.random.default_rng(11)
    n = 60
    genomes = [
        np.unique(rng.integers(1, 2**63, size=400, dtype=np.uint64))
        for _ in range(n)
    ]
    ids = rng.choice(n, size=10, replace=False)
    meta = np.unique(
        np.concatenate(
            [genomes[i] for i in ids]
            + [np.unique(rng.integers(1, 2**63, size=800, dtype=np.uint64))]
        )
    )

    sigs = []
    for i, g in enumerate(genomes):
        mh = MinHash(0, 31, scaled=1)
        mh.add_many(g)
        sigs.append(SourmashSignature(mh, name=f"g{i}").to_frozen())
    qmh = MinHash(0, 31, scaled=1)
    qmh.add_many(meta)
    query = SourmashSignature(qmh, name="meta").to_frozen()

    def run(schedule):
        fi = FlatIndex(sigs)
        cg = fi.counter_gather(query, threshold_bp=0)
        if schedule:
            cg.enable_device_schedule()
        order = []
        cur = qmh.flatten().to_mutable()
        while True:
            res = cg.peek(cur, threshold_bp=0)
            if not res:
                break
            sr, intersect_mh = res
            order.append((int(sr.signature.name[1:]), len(intersect_mh)))
            cg.consume(intersect_mh)
            cur.remove_many(intersect_mh.hashes)
        return order

    assert run(True) == run(False)


def _run_rounds(counters, qmh, threshold_bp=0):
    "Drive GatherDatabases-style rounds; return [(name, overlap)] winners."
    gd = GatherDatabases(
        SourmashSignature(qmh, name="meta").to_frozen(),
        counters,
        threshold_bp=threshold_bp,
    )
    return [(r.match.name, r.intersect_bp) for r in gd]


def test_multi_counter_scheduled_matches_host():
    """One device schedule spanning several databases reproduces the host
    cross-counter rounds: same winners from the same databases, same
    overlaps, same stopping point (reference GatherDatabases semantics,
    `/root/reference/src/sourmash/search.py:782-949`)."""
    from sourmash_tpu.index.flat import schedule_device_gather

    rng = np.random.default_rng(23)
    n = 40
    genomes = [
        np.unique(rng.integers(1, 2**63, size=300, dtype=np.uint64))
        for _ in range(n)
    ]
    ids = rng.choice(n, size=12, replace=False)
    meta = np.unique(
        np.concatenate(
            [genomes[i] for i in ids]
            + [np.unique(rng.integers(1, 2**63, size=500, dtype=np.uint64))]
        )
    )
    sigs = []
    for i, g in enumerate(genomes):
        mh = MinHash(0, 31, scaled=1)
        mh.add_many(g)
        sigs.append(SourmashSignature(mh, name=f"g{i}").to_frozen())
    qmh = MinHash(0, 31, scaled=1)
    qmh.add_many(meta)
    query = SourmashSignature(qmh, name="meta").to_frozen()

    # three databases of different sizes, including duplicate coverage
    splits = [sigs[:15], sigs[15:28], sigs[28:] + sigs[:3]]

    def run(schedule):
        counters = []
        for part in splits:
            fi = FlatIndex(part)
            counters.append(fi.counter_gather(query, threshold_bp=0))
        if schedule:
            coord = schedule_device_gather(counters)
            assert coord is not None
        return _run_rounds(counters, qmh)

    host = run(False)
    dev = run(True)
    assert host == dev
    assert len(host) >= 12


def test_scheduled_divergence_falls_back(capsys):
    """A schedule that disagrees with live counter state must not abort the
    gather: the counters drop back to exact host rounds with a warning and
    the results still match the pure-host run (reference never aborts
    mid-loop, `/root/reference/src/sourmash/search.py:877-949`)."""
    rng = np.random.default_rng(31)
    n = 25
    genomes = [
        np.unique(rng.integers(1, 2**63, size=200, dtype=np.uint64))
        for _ in range(n)
    ]
    meta = np.unique(np.concatenate([genomes[i] for i in range(0, n, 2)]))
    sigs = []
    for i, g in enumerate(genomes):
        mh = MinHash(0, 31, scaled=1)
        mh.add_many(g)
        sigs.append(SourmashSignature(mh, name=f"g{i}").to_frozen())
    qmh = MinHash(0, 31, scaled=1)
    qmh.add_many(meta)
    query = SourmashSignature(qmh, name="meta").to_frozen()

    fi = FlatIndex(sigs)
    cg = fi.counter_gather(query, threshold_bp=0)
    host = _run_rounds([fi.counter_gather(query, threshold_bp=0)], qmh)

    cg.enable_device_schedule()
    cg._coord.compute(0)
    assert cg._coord._sched
    # corrupt round 2's planned overlap -> divergence at that round
    ci, ds, cnt = cg._coord._sched[2]
    cg._coord._sched[2] = (ci, ds, cnt + 7)

    got = _run_rounds([cg], qmh)
    assert got == host
    assert "falling back to host gather rounds" in capsys.readouterr().err


def test_sharded_bitset_scan_matches_single_device():
    """The mesh round scan (pmax winner agreement + psum-OR removal) equals
    the single-device scan bit for bit, including cross-shard count ties
    (lowest global id wins) and threshold stops."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from sourmash_tpu.index.flat import _schedule_scan
    from sourmash_tpu.parallel import make_sharded_bitset_scan

    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs >1 device")

    rng = np.random.default_rng(5)
    k, W = 24, 6  # 24 rows over a 192-bit query space
    M = rng.integers(0, 2**32, size=(k, W), dtype=np.uint64).astype(np.uint32)
    M[3] = M[11]  # force an exact tie between rows 3 and 11
    alive_p = np.full(W, 0xFFFFFFFF, dtype=np.uint32)
    counts = np.array(
        [int(c) for c in np.unpackbits(M.view(np.uint8), axis=1).sum(1)],
        dtype=np.int32,
    )
    thresh = np.int32(3)

    carry1, (b1, c1) = _schedule_scan(
        jnp.asarray(M), (jnp.asarray(alive_p), jnp.asarray(counts)), thresh, 30
    )

    mesh = Mesh(np.asarray(devices), ("shards",))
    scan = make_sharded_bitset_scan(mesh, 30)
    k_pad = -(-k // len(devices)) * len(devices)
    Mp = np.concatenate([M, np.zeros((k_pad - k, W), np.uint32)])
    cp = np.concatenate([counts, np.zeros(k_pad - k, np.int32)])
    carry2, (b2, c2) = scan(
        jnp.asarray(Mp), jnp.asarray(alive_p), jnp.asarray(cp),
        jnp.int32(thresh),
    )

    assert np.array_equal(np.asarray(b1), np.asarray(b2))
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    assert np.array_equal(np.asarray(carry1[0]), np.asarray(carry2[0]))


def test_compute_schedules_batch_matches_individual():
    """The data-parallel batched schedule computation (config 5 product
    form: query blocks sharded across the 'data' mesh axis — on this test
    env, the virtual 8-device CPU mesh) produces exactly the schedule each
    coordinator's own compute() builds."""
    from sourmash_tpu.index.flat import (
        DeviceGatherSchedule,
        compute_schedules_batch,
        schedule_device_gather,
    )

    rng = np.random.default_rng(41)
    n = 30
    genomes = [
        np.unique(rng.integers(1, 2**63, size=250, dtype=np.uint64))
        for _ in range(n)
    ]
    sigs = []
    for i, g in enumerate(genomes):
        mh = MinHash(0, 31, scaled=1)
        mh.add_many(g)
        sigs.append(SourmashSignature(mh, name=f"g{i}").to_frozen())
    fi = FlatIndex(sigs)

    def coord_for(qmh):
        c = fi.counter_gather(SourmashSignature(qmh, name="q").to_frozen(), 0)
        return schedule_device_gather([c])

    queries = []
    for s in range(9):  # 9 queries: not divisible by the 8-device mesh
        ids = rng.choice(n, size=int(rng.integers(2, 7)), replace=False)
        meta = np.unique(np.concatenate([genomes[i] for i in ids]))
        qmh = MinHash(0, 31, scaled=1)
        qmh.add_many(meta)
        queries.append(qmh)

    individual = []
    for qmh in queries:
        c = coord_for(qmh)
        c.compute(0)
        individual.append(list(c._sched))

    batch_coords = [coord_for(qmh) for qmh in queries]
    compute_schedules_batch(batch_coords, 0, block=4)  # multiple blocks
    for got, want in zip(batch_coords, individual):
        assert got.ready and got._sched == want
    assert sum(len(c._sched) for c in batch_coords) >= 18


def test_schedule_candidate_cap_matches_uncapped(monkeypatch):
    """A candidate-capped schedule (top-C by initial count + the excluded
    bound guard, falling back to exact host rounds at exhaustion) yields
    byte-identical gather rounds to the uncapped scan — including when the
    cap forces mid-gather truncation."""
    rng = np.random.default_rng(53)
    n = 40
    # cluster-structured: every dataset shares a common pool so ~all match
    pool = np.unique(rng.integers(1, 2**63, size=400, dtype=np.uint64))
    genomes = []
    for _ in range(n):
        own = np.unique(rng.integers(1, 2**63, size=150, dtype=np.uint64))
        take = rng.choice(pool, size=120, replace=False)
        genomes.append(np.unique(np.concatenate([own, take])))
    meta = np.unique(
        np.concatenate([genomes[i] for i in range(0, n, 2)] + [pool])
    )
    sigs = []
    for i, g in enumerate(genomes):
        mh = MinHash(0, 31, scaled=1)
        mh.add_many(g)
        sigs.append(SourmashSignature(mh, name=f"g{i}").to_frozen())
    qmh = MinHash(0, 31, scaled=1)
    qmh.add_many(meta)

    def run(cap):
        monkeypatch.setenv("SOURMASH_TPU_SCHEDULE_CAP", str(cap))
        fi = FlatIndex(sigs)
        c = fi.counter_gather(
            SourmashSignature(qmh, name="meta").to_frozen(), 0
        )
        c.enable_device_schedule()
        return _run_rounds([c], qmh)

    uncapped = run(0)
    assert len(uncapped) >= 15
    for cap in (4, 8, 16):
        assert run(cap) == uncapped, cap


def test_device_membership_schedule_matches_host(monkeypatch):
    """Single-device scheduled gather with membership bitsets computed ON
    DEVICE from the resident bank planes (no host build/upload) produces
    byte-identical rounds to the host-membership scan and to plain host
    rounds — including spilled hashes, the 2^64-1 hash, and the capped
    reschedule loop."""
    import jax

    from sourmash_tpu.index import flat as flat_mod

    rng = np.random.default_rng(71)
    n = 48
    pool = np.unique(rng.integers(1, 2**63, size=500, dtype=np.uint64))
    genomes = []
    for i in range(n):
        own = np.unique(rng.integers(1, 2**63, size=200, dtype=np.uint64))
        take = rng.choice(pool, size=150, replace=False)
        g = np.unique(np.concatenate([own, take]))
        if i % 7 == 0:  # several datasets carry the max hash
            g = np.unique(
                np.concatenate([g, [np.uint64(0xFFFFFFFFFFFFFFFF)]])
            )
        genomes.append(g)
    meta = np.unique(
        np.concatenate(
            [genomes[i] for i in range(0, n, 2)]
            + [pool, [np.uint64(0xFFFFFFFFFFFFFFFF)]]
        )
    )
    sigs = []
    for i, g in enumerate(genomes):
        mh = MinHash(0, 31, scaled=1)
        mh.add_many(g)
        sigs.append(SourmashSignature(mh, name=f"g{i}").to_frozen())
    qmh = MinHash(0, 31, scaled=1)
    qmh.add_many(meta)
    query = SourmashSignature(qmh, name="meta").to_frozen()

    def run(single_device, cap="0"):
        monkeypatch.setenv("SOURMASH_TPU_SCHEDULE_CAP", cap)
        monkeypatch.setenv("SOURMASH_TPU_DEV_MEMBERSHIP", "1")
        if single_device:
            real = jax.devices()
            monkeypatch.setattr(
                flat_mod.jax, "devices", lambda *a: real[:1]
            )
        else:
            monkeypatch.undo()
            monkeypatch.setenv("SOURMASH_TPU_SCHEDULE_CAP", cap)
        fi = FlatIndex(sigs)
        c = fi.counter_gather(query, threshold_bp=0)
        c.enable_device_schedule()
        rounds = _run_rounds([c], qmh)
        used_dev = (
            c._coord is not None
            and single_device
            and c._device_membership_ok()
        )
        return rounds, used_dev

    host_rounds = _run_rounds(
        [FlatIndex(sigs).counter_gather(query, threshold_bp=0)], qmh
    )
    dev_rounds, used = run(single_device=True)
    assert used, "device membership path not taken"
    assert dev_rounds == host_rounds
    assert len(dev_rounds) >= 12

    # capped reschedule loop through the device-membership path
    capped, _ = run(single_device=True, cap="6")
    assert capped == host_rounds


def test_converge_schedules_batch_matches_host(monkeypatch):
    """Batched capped-schedule convergence (truncated queries recounted in
    one device pass, schedules extended in place) reproduces plain host
    rounds exactly for every query — with a tiny cap forcing several
    convergence iterations."""
    from sourmash_tpu.index.flat import (
        converge_schedules_batch,
        schedule_device_gather,
    )

    rng = np.random.default_rng(97)
    n = 60
    pool = np.unique(rng.integers(1, 2**63, size=600, dtype=np.uint64))
    genomes = []
    for _ in range(n):
        own = np.unique(rng.integers(1, 2**63, size=220, dtype=np.uint64))
        take = rng.choice(pool, size=180, replace=False)
        genomes.append(np.unique(np.concatenate([own, take])))
    sigs = []
    for i, g in enumerate(genomes):
        mh = MinHash(0, 31, scaled=1)
        mh.add_many(g)
        sigs.append(SourmashSignature(mh, name=f"g{i}").to_frozen())

    metas = []
    for qi in range(6):
        srcs = list(range(qi, n, 6))[:8]
        metas.append(
            np.unique(np.concatenate([genomes[i] for i in srcs] + [pool]))
        )
    queries = []
    for qi, m in enumerate(metas):
        mh = MinHash(0, 31, scaled=1)
        mh.add_many(m)
        queries.append(SourmashSignature(mh, name=f"meta{qi}").to_frozen())

    host = []
    for q in queries:
        fi = FlatIndex(sigs)
        host.append(
            _run_rounds([fi.counter_gather(q, threshold_bp=0)], q.minhash)
        )

    monkeypatch.setenv("SOURMASH_TPU_SCHEDULE_CAP", "5")
    fi = FlatIndex(sigs)
    counters = [fi.counter_gather(q, threshold_bp=0) for q in queries]
    coords = [schedule_device_gather([c]) for c in counters]
    converge_schedules_batch(coords, 0)
    assert any(c.reschedules > 0 for c in coords if c is not None)
    for qi, q in enumerate(queries):
        got = _run_rounds([counters[qi]], q.minhash)
        assert got == host[qi], qi


def test_batched_device_membership_matches_host(monkeypatch):
    """Single-device batched schedule computation (one fused membership
    dispatch per bank chunk covering a whole query block) reproduces host
    rounds exactly for every query — incl. max-hash datasets, convergence
    iterations, and queries with disjoint candidate sets."""
    import jax

    from sourmash_tpu.index import flat as flat_mod
    from sourmash_tpu.index.flat import (
        converge_schedules_batch,
        schedule_device_gather,
    )

    rng = np.random.default_rng(131)
    n = 64
    pool = np.unique(rng.integers(1, 2**63, size=500, dtype=np.uint64))
    genomes = []
    for i in range(n):
        own = np.unique(rng.integers(1, 2**63, size=250, dtype=np.uint64))
        take = rng.choice(pool, size=120, replace=False)
        g = np.unique(np.concatenate([own, take]))
        if i % 9 == 0:
            g = np.unique(
                np.concatenate([g, [np.uint64(0xFFFFFFFFFFFFFFFF)]])
            )
        genomes.append(g)
    sigs = []
    for i, g in enumerate(genomes):
        mh = MinHash(0, 31, scaled=1)
        mh.add_many(g)
        sigs.append(SourmashSignature(mh, name=f"g{i}").to_frozen())

    queries = []
    for qi in range(7):
        srcs = list(range(qi, n, 7))[:6]
        m = np.unique(
            np.concatenate(
                [genomes[i] for i in srcs]
                + ([pool] if qi % 2 else [])
                + [[np.uint64(0xFFFFFFFFFFFFFFFF)]]
            )
        )
        mh = MinHash(0, 31, scaled=1)
        mh.add_many(m)
        queries.append(SourmashSignature(mh, name=f"meta{qi}").to_frozen())

    host = []
    for q in queries:
        fi = FlatIndex(sigs)
        host.append(
            _run_rounds([fi.counter_gather(q, threshold_bp=0)], q.minhash)
        )

    real = jax.devices()
    monkeypatch.setattr(flat_mod.jax, "devices", lambda *a: real[:1])
    monkeypatch.setenv("SOURMASH_TPU_SCHEDULE_CAP", "16")
    monkeypatch.setenv("SOURMASH_TPU_DEV_MEMBERSHIP", "1")
    spied = {}
    orig = flat_mod._membership_rows_device_batch

    def spy(*a, **kw):
        spied["hit"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(flat_mod, "_membership_rows_device_batch", spy)
    fi = FlatIndex(sigs)
    counters = [fi.counter_gather(q, threshold_bp=0) for q in queries]
    coords = [schedule_device_gather([c]) for c in counters]
    converge_schedules_batch(coords, 0)
    assert spied.get("hit"), "batched device membership not used"
    for qi, q in enumerate(queries):
        got = _run_rounds([counters[qi]], q.minhash)
        assert got == host[qi], qi
