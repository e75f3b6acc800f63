"""Device-engine routing for the standard database formats.

Round-4 headline (VERDICT r3 item 1): a uniform-scaled collection loaded
from ANY container — .zip, .sig list, directory, manifest, SBT, LCA,
sqlite — builds a memoized FlatIndex view so counter_gather/find ride the
device engine, the way the reference accelerates every container through
its Rust core (`/root/reference/src/core/src/index/linear.rs:52-90`).
Host and device paths must agree byte-for-byte on gather CSVs.
"""

import numpy as np
import pytest

from conftest import utils_test_data
from sourmash_tpu import MinHash, SourmashSignature
from sourmash_tpu.index import CounterGather, LinearIndex
from sourmash_tpu.index.flat import FlatCounterGather, FlatIndex
from sourmash_tpu.search import GatherDatabases

from test_cli import Runner


@pytest.fixture
def runtmp(tmp_path):
    return Runner(tmp_path)


def _collection(rng, n, size=200, scaled=1):
    "n random scaled-1 signatures plus a metagenome covering half of them."
    genomes = [
        np.unique(rng.integers(1, 2**63, size=size, dtype=np.uint64))
        for _ in range(n)
    ]
    sigs = []
    for i, g in enumerate(genomes):
        mh = MinHash(0, 31, scaled=scaled)
        mh.add_many(g)
        sigs.append(SourmashSignature(mh, name=f"g{i}").to_frozen())
    meta = np.unique(np.concatenate([genomes[i] for i in range(0, n, 2)]))
    qmh = MinHash(0, 31, scaled=scaled)
    qmh.add_many(meta)
    return sigs, SourmashSignature(qmh, name="meta").to_frozen()


def _rounds(counter, query):
    gd = GatherDatabases(query, [counter], threshold_bp=0)
    return [(r.match.name, r.intersect_bp, r.filename) for r in gd]


def test_view_gated_by_threshold(monkeypatch):
    "Small collections stay host; SOURMASH_TPU_FLAT_VIEW=1 forces the view."
    rng = np.random.default_rng(5)
    sigs, _q = _collection(rng, 10)
    lidx = LinearIndex(sigs, filename="some.sig")

    monkeypatch.delenv("SOURMASH_TPU_FLAT_VIEW", raising=False)
    assert lidx._as_flat_view() is None  # 10 < default threshold

    monkeypatch.setenv("SOURMASH_TPU_FLAT_VIEW", "1")
    lidx2 = LinearIndex(sigs, filename="some.sig")
    view = lidx2._as_flat_view()
    assert isinstance(view, FlatIndex)
    assert view._as_flat_view() is view
    assert lidx2._as_flat_view() is view  # memoized

    monkeypatch.setenv("SOURMASH_TPU_FLAT_VIEW", "0")
    lidx3 = LinearIndex(sigs, filename="some.sig")
    assert lidx3._as_flat_view() is None


def test_view_ineligible_num_and_mixed_scaled(monkeypatch):
    monkeypatch.setenv("SOURMASH_TPU_FLAT_VIEW", "1")
    rng = np.random.default_rng(6)
    sigs, _q = _collection(rng, 6)

    num_mh = MinHash(50, 31)
    num_mh.add_many(np.unique(rng.integers(1, 2**63, 80, dtype=np.uint64)))
    with_num = sigs + [SourmashSignature(num_mh, name="numsig").to_frozen()]
    assert LinearIndex(with_num)._as_flat_view() is None

    coarse = MinHash(0, 31, scaled=10)
    coarse.add_many(np.unique(rng.integers(1, 2**63, 80, dtype=np.uint64)))
    mixed = sigs + [SourmashSignature(coarse, name="coarse").to_frozen()]
    assert LinearIndex(mixed)._as_flat_view() is None


def test_view_counter_gather_matches_host(monkeypatch):
    """counter_gather through the view reproduces the host CounterGather's
    gather rounds exactly, including result locations."""
    rng = np.random.default_rng(7)
    sigs, query = _collection(rng, 24)

    monkeypatch.setenv("SOURMASH_TPU_FLAT_VIEW", "0")
    host_counter = LinearIndex(sigs, filename="db.sig").counter_gather(query, 0)
    assert isinstance(host_counter, CounterGather)
    host = _rounds(host_counter, query)

    monkeypatch.setenv("SOURMASH_TPU_FLAT_VIEW", "1")
    view_counter = LinearIndex(sigs, filename="db.sig").counter_gather(query, 0)
    assert isinstance(view_counter, FlatCounterGather)
    got = _rounds(view_counter, query)

    assert got == host
    assert len(host) >= 8


def test_view_md5_duplicate_parity(monkeypatch):
    """md5-duplicate candidates collapse exactly like the host
    CounterGather's md5-keyed dict: first occurrence's counter position,
    LAST occurrence's signature object/location — both for gather rounds
    and for the counter's signatures() enumeration (reference
    index/__init__.py:777-806)."""
    rng = np.random.default_rng(8)
    sigs, query = _collection(rng, 12)
    # duplicate of g2's sketch under a different name, listed later
    dup = SourmashSignature(sigs[2].minhash, name="g2-duplicate").to_frozen()
    entries = sigs + [dup]

    monkeypatch.setenv("SOURMASH_TPU_FLAT_VIEW", "0")
    host_counter = LinearIndex(entries).counter_gather(query, 0)
    host_sigs = [ss.name for ss in host_counter.signatures()]
    host = _rounds(LinearIndex(entries).counter_gather(query, 0), query)

    monkeypatch.setenv("SOURMASH_TPU_FLAT_VIEW", "1")
    view_counter = LinearIndex(entries).counter_gather(query, 0)
    view_sigs = [ss.name for ss in view_counter.signatures()]
    got = _rounds(LinearIndex(entries).counter_gather(query, 0), query)

    assert got == host
    assert view_sigs == host_sigs
    assert "g2-duplicate" in view_sigs and "g2" not in view_sigs


def test_view_find_matches_batched(monkeypatch):
    "search/prefetch through the view equals the per-call batched path."
    import sourmash_tpu

    rng = np.random.default_rng(9)
    sigs, query = _collection(rng, 20)

    def hits(env):
        monkeypatch.setenv("SOURMASH_TPU_FLAT_VIEW", env)
        idx = LinearIndex(sigs, filename="db.sig")
        res = idx.search(query, threshold=0.0, do_containment=True)
        return [(r.score, r.signature.name, r.location) for r in res]

    assert hits("1") == hits("0")


def test_cli_zip_gather_device_scheduled_identical(runtmp, monkeypatch):
    """The reference's flagship flow — `gather meta.sig db.zip` — runs the
    device gather schedule when the view is active and its 25-column CSV is
    byte-identical to the pure-host run."""
    runtmp.sourmash(
        "sig", "cat", utils_test_data("47.fa.sig"), utils_test_data("63.fa.sig"),
        "-o", "db.zip",
    )

    import sourmash_tpu.index.flat as flat

    seen = {}
    orig = flat.DeviceGatherSchedule.compute

    def spy(self, threshold_bp):
        seen["ran"] = True
        return orig(self, threshold_bp)

    monkeypatch.setattr(flat.DeviceGatherSchedule, "compute", spy)
    monkeypatch.setenv("SOURMASH_TPU_FLAT_VIEW", "1")
    runtmp.sourmash(
        "gather", utils_test_data("47+63.fa.sig"), "db.zip", "-o", "dev.csv",
    )
    assert seen.get("ran"), "zip database did not reach the device schedule"
    assert "found 2 matches total" in runtmp.out

    monkeypatch.setenv("SOURMASH_TPU_FLAT_VIEW", "0")
    runtmp.sourmash(
        "gather", utils_test_data("47+63.fa.sig"), "db.zip", "-o", "host.csv",
    )
    with open(runtmp.output("dev.csv"), "rb") as f1, open(
        runtmp.output("host.csv"), "rb"
    ) as f2:
        assert f1.read() == f2.read()


def test_cli_zip_gather_abund_identical(runtmp, monkeypatch):
    "Abundance-weighted zip gather: view vs host CSVs byte-identical."
    against = [
        utils_test_data(f"gather-abund/genome-s1{i}.fa.gz.sig") for i in "012"
    ]
    runtmp.sourmash("sig", "cat", *against, "-o", "dbab.zip")
    q = utils_test_data("gather-abund/reads-s10x10-s11.sig")

    monkeypatch.setenv("SOURMASH_TPU_FLAT_VIEW", "1")
    runtmp.sourmash("gather", q, "dbab.zip", "-k", "21", "-o", "dev.csv")
    monkeypatch.setenv("SOURMASH_TPU_FLAT_VIEW", "0")
    runtmp.sourmash("gather", q, "dbab.zip", "-k", "21", "-o", "host.csv")
    with open(runtmp.output("dev.csv"), "rb") as f1, open(
        runtmp.output("host.csv"), "rb"
    ) as f2:
        assert f1.read() == f2.read()


def test_cli_sbt_and_lca_gather_identical(runtmp, monkeypatch):
    """SBT and LCA databases inherit the view through the Index ABC's
    counter_gather: gather CSVs byte-identical view vs host."""
    runtmp.sourmash(
        "index", "db.sbt.zip", utils_test_data("47.fa.sig"),
        utils_test_data("63.fa.sig"), "-k", "31",
    )
    q = utils_test_data("47+63.fa.sig")
    for db in ("db.sbt.zip", utils_test_data("lca/47+63.lca.json")):
        monkeypatch.setenv("SOURMASH_TPU_FLAT_VIEW", "1")
        runtmp.sourmash("gather", q, db, "-o", "dev.csv")
        monkeypatch.setenv("SOURMASH_TPU_FLAT_VIEW", "0")
        runtmp.sourmash("gather", q, db, "-o", "host.csv")
        with open(runtmp.output("dev.csv"), "rb") as f1, open(
            runtmp.output("host.csv"), "rb"
        ) as f2:
            assert f1.read() == f2.read(), db


def test_cli_directory_gather_locations(runtmp, monkeypatch):
    """A directory of .sig files loads as MultiIndex with per-signature
    locations; the view must preserve them in the gather CSV's filename
    column (byte-identical CSVs)."""
    import os
    import shutil

    os.makedirs(runtmp.output("sigdir"), exist_ok=True)
    for f in ("47.fa.sig", "63.fa.sig"):
        shutil.copy(utils_test_data(f), runtmp.output(f"sigdir/{f}"))
    q = utils_test_data("47+63.fa.sig")

    monkeypatch.setenv("SOURMASH_TPU_FLAT_VIEW", "1")
    runtmp.sourmash("gather", q, "sigdir", "-o", "dev.csv")
    monkeypatch.setenv("SOURMASH_TPU_FLAT_VIEW", "0")
    runtmp.sourmash("gather", q, "sigdir", "-o", "host.csv")
    with open(runtmp.output("dev.csv"), "rb") as f1, open(
        runtmp.output("host.csv"), "rb"
    ) as f2:
        dev, host = f1.read(), f2.read()
    assert dev == host
    assert b"sigdir" in dev or b"47.fa.sig" in dev


def test_cli_multigather_batched_schedules_identical(runtmp, monkeypatch):
    """multigather precomputes every query's round schedule in one
    data-parallel batch (config 5 product path; on this test env the
    batch shards over the virtual 8-device mesh); outputs byte-identical
    to the host peek/consume rounds."""
    import sourmash_tpu.index.flat as flat

    runtmp.sourmash(
        "sig", "cat", utils_test_data("47.fa.sig"), utils_test_data("63.fa.sig"),
        "-o", "db.zip",
    )
    q1 = utils_test_data("47+63.fa.sig")
    q2 = utils_test_data("47.fa.sig")

    seen = {}
    orig = flat.compute_schedules_batch

    def spy(coords, threshold_bp, block=64):
        seen["n"] = seen.get("n", 0) + len(coords)
        return orig(coords, threshold_bp, block=block)

    monkeypatch.setattr(flat, "compute_schedules_batch", spy)
    import sourmash_tpu.commands as commands
    monkeypatch.setattr(commands, "_multigather_prepare", commands._multigather_prepare)

    import os

    os.makedirs(runtmp.output("dev"), exist_ok=True)
    os.makedirs(runtmp.output("host"), exist_ok=True)

    monkeypatch.setenv("SOURMASH_TPU_FLAT_VIEW", "1")
    runtmp.sourmash(
        "multigather", "--query", q1, q2, "--db", "db.zip", "-U",
        "--output-dir", "dev",
    )
    assert seen.get("n") == 2, "batched scheduler did not cover both queries"

    monkeypatch.setenv("SOURMASH_TPU_NO_SCHEDULE", "1")
    runtmp.sourmash(
        "multigather", "--query", q1, q2, "--db", "db.zip", "-U",
        "--output-dir", "host",
    )
    import os

    dev_csvs = sorted(
        f for f in os.listdir(runtmp.output("dev")) if f.endswith(".csv")
    )
    host_csvs = sorted(f for f in os.listdir(runtmp.output("host")) if f.endswith(".csv"))
    assert dev_csvs == host_csvs and dev_csvs
    for f in dev_csvs:
        with open(runtmp.output(f"dev/{f}"), "rb") as a, open(
            runtmp.output(f"host/{f}"), "rb"
        ) as b:
            assert a.read() == b.read(), f


def test_view_gather_fuzz_matches_host(monkeypatch):
    """Randomized stress of the flagship path: collections mixing tiny and
    genome-scale sketches, md5 duplicates, cluster structure, the 2**64-1
    hash, and varied thresholds — device-view gather rounds (including the
    scheduled scan and the candidate cap) must equal host CounterGather
    rounds exactly."""
    from sourmash_tpu.index.flat import schedule_device_gather

    rng = np.random.default_rng(1234)
    for trial in range(6):
        n = int(rng.integers(8, 28))
        pool = np.unique(rng.integers(1, 2**63, size=300, dtype=np.uint64))
        genomes = []
        for i in range(n):
            size = int(rng.choice([5, 40, 400]))
            own = np.unique(
                rng.integers(1, 2**63, size=size, dtype=np.uint64)
            )
            take = rng.choice(
                pool, size=int(rng.integers(0, 100)), replace=False
            )
            g = np.unique(np.concatenate([own, take]))
            if rng.random() < 0.15:
                g = np.unique(
                    np.concatenate([g, [np.uint64(2**64 - 1)]])
                )
            genomes.append(g)
        if rng.random() < 0.5 and n > 2:
            genomes[n - 1] = genomes[1]  # md5 duplicate
        sigs = []
        for i, g in enumerate(genomes):
            mh = MinHash(0, 31, scaled=1)
            mh.add_many(g)
            sigs.append(SourmashSignature(mh, name=f"g{i}").to_frozen())
        picks = rng.choice(n, size=max(2, n // 3), replace=False)
        meta = np.unique(np.concatenate([genomes[i] for i in picks]))
        qmh = MinHash(0, 31, scaled=1)
        qmh.add_many(meta)
        query = SourmashSignature(qmh, name="meta").to_frozen()
        threshold_bp = int(rng.choice([0, 5, 50]))

        def rounds(env_view, schedule, cap):
            monkeypatch.setenv("SOURMASH_TPU_FLAT_VIEW", env_view)
            monkeypatch.setenv("SOURMASH_TPU_SCHEDULE_CAP", str(cap))
            from sourmash_tpu.index import LinearIndex

            counter = LinearIndex(sigs, filename="db").counter_gather(
                query, threshold_bp
            )
            if schedule and hasattr(counter, "enable_device_schedule"):
                schedule_device_gather([counter])
            gd = GatherDatabases(
                query, [counter], threshold_bp=threshold_bp
            )
            return [
                (r.match.name, r.intersect_bp, r.f_match) for r in gd
            ]

        host = rounds("0", False, 0)
        assert rounds("1", False, 0) == host, trial
        assert rounds("1", True, 0) == host, trial
        assert rounds("1", True, 4) == host, trial  # forced truncation
