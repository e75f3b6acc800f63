"""Sidecar flat-view cache (index/view_cache.py): warm zip loads rebuild
signatures from the cached payload, byte-identically, with clean
invalidation when the zip changes."""

import os

import numpy as np
import pytest

from sourmash_tpu.index import ZipFileLinearIndex
from sourmash_tpu.index import view_cache
from sourmash_tpu.minhash import MinHash
from sourmash_tpu.signature import SourmashSignature
from sourmash_tpu.save_load import SaveSignaturesToLocation


def _mk(mins, name, track=False, filename=None):
    mh = MinHash(n=0, ksize=31, scaled=1000, track_abundance=track)
    if track:
        mh.set_abundances({int(m): int(m % 7 + 1) for m in mins})
    else:
        mh.add_many(np.asarray(mins, dtype=np.uint64))
    sig = SourmashSignature(mh, name=name or "", filename=filename or "")
    sig._name = name
    sig._filename = filename
    return sig


@pytest.fixture
def cache_env(tmp_path, monkeypatch):
    monkeypatch.setenv("SOURMASH_TPU_VIEW_CACHE_DIR", str(tmp_path / "vc"))
    monkeypatch.setenv("SOURMASH_TPU_VIEW_CACHE", "1")
    monkeypatch.setenv("SOURMASH_TPU_FLAT_VIEW", "1")  # force any size
    return tmp_path


def _write_zip(path, sigs):
    with SaveSignaturesToLocation(str(path)) as save:
        for s in sigs:
            save.add(s)


def test_warm_zip_view_from_cache(cache_env):
    rng = np.random.default_rng(1)
    sigs = [
        _mk(np.unique(rng.integers(0, 2**60, 50, dtype=np.uint64)), f"s{i}",
            track=(i % 3 == 0), filename=(f"f{i}.fa" if i % 2 else None))
        for i in range(8)
    ]
    sigs[5]._name = None  # None-ness must round-trip
    zpath = cache_env / "db.zip"
    _write_zip(zpath, sigs)

    idx = ZipFileLinearIndex.load(str(zpath)).select(ksize=31)
    v1 = idx._as_flat_view()
    assert v1 is not None
    cache_files = os.listdir(cache_env / "vc")
    assert len(cache_files) == 1

    # a fresh index object on the same zip must hit the cache
    idx2 = ZipFileLinearIndex.load(str(zpath)).select(ksize=31)
    called = {}
    orig = view_cache.load

    def spy(key):
        out = orig(key)
        called["hit"] = out is not None
        return out

    view_cache.load = spy
    try:
        v2 = idx2._as_flat_view()
    finally:
        view_cache.load = orig
    assert called.get("hit") is True

    a = sorted(v1.signatures(), key=lambda s: s.md5sum())
    b = sorted(v2.signatures(), key=lambda s: s.md5sum())
    assert len(a) == len(b) == 8
    for sa, sb in zip(a, b):
        assert sa.md5sum() == sb.md5sum()
        assert sa._name == sb._name
        assert sa._filename == sb._filename
        assert np.array_equal(
            sa.minhash.mins_array(), sb.minhash.mins_array()
        )
        assert sa.minhash.track_abundance == sb.minhash.track_abundance
        if sa.minhash.track_abundance:
            assert np.array_equal(
                sa.minhash.abunds_array(), sb.minhash.abunds_array()
            )
        assert sa == sb


def test_zip_rewrite_invalidates(cache_env):
    rng = np.random.default_rng(2)
    mins = np.unique(rng.integers(0, 2**60, 40, dtype=np.uint64))
    zpath = cache_env / "db.zip"
    _write_zip(zpath, [_mk(mins, "one")])
    ZipFileLinearIndex.load(str(zpath)).select(ksize=31)._as_flat_view()

    # rewrite with different content: view must reflect the new zip
    os.unlink(zpath)
    mins2 = np.unique(rng.integers(0, 2**60, 40, dtype=np.uint64))
    _write_zip(zpath, [_mk(mins2, "two")])
    v = ZipFileLinearIndex.load(str(zpath)).select(ksize=31)._as_flat_view()
    names = [s.name for s in v.signatures()]
    assert names == ["two"]


def test_cache_disabled(cache_env, monkeypatch):
    monkeypatch.setenv("SOURMASH_TPU_VIEW_CACHE", "0")
    rng = np.random.default_rng(3)
    zpath = cache_env / "db.zip"
    _write_zip(zpath, [_mk(np.unique(rng.integers(0, 2**60, 30,
                                                  dtype=np.uint64)), "x")])
    v = ZipFileLinearIndex.load(str(zpath)).select(ksize=31)._as_flat_view()
    assert v is not None
    assert not (cache_env / "vc").exists()


def test_corrupt_cache_falls_back(cache_env):
    rng = np.random.default_rng(4)
    zpath = cache_env / "db.zip"
    _write_zip(zpath, [_mk(np.unique(rng.integers(0, 2**60, 30,
                                                  dtype=np.uint64)), "y")])
    ZipFileLinearIndex.load(str(zpath)).select(ksize=31)._as_flat_view()
    (fn,) = os.listdir(cache_env / "vc")
    with open(cache_env / "vc" / fn, "r+b") as fp:
        fp.write(b"garbage!")
    v = ZipFileLinearIndex.load(str(zpath)).select(ksize=31)._as_flat_view()
    assert [s.name for s in v.signatures()] == ["y"]


def test_standalone_manifest_cache(cache_env):
    from sourmash_tpu.index import StandaloneManifestIndex
    from sourmash_tpu.manifest import CollectionManifest
    from sourmash_tpu.save_load import SaveSignaturesToLocation as Save

    rng = np.random.default_rng(6)
    rows = []
    sig_by_name = {}
    for i in range(4):
        s = _mk(np.unique(rng.integers(0, 2**60, 40, dtype=np.uint64)),
                f"m{i}")
        p = str(cache_env / f"m{i}.sig")
        with Save(p) as save:
            save.add(s)
        sig_by_name[f"m{i}"] = p
        rows.append(
            CollectionManifest.make_manifest_row(
                s, p, include_signature=False
            )
        )
    mf = CollectionManifest(rows)
    mf_path = str(cache_env / "mf.csv")
    mf.write_to_filename(mf_path)

    idx = StandaloneManifestIndex.load(mf_path).select(ksize=31)
    v1 = idx._as_flat_view()
    assert v1 is not None
    assert len(os.listdir(cache_env / "vc")) == 1

    idx2 = StandaloneManifestIndex.load(mf_path).select(ksize=31)
    called = {}
    orig = view_cache.load

    def spy(key):
        out = orig(key)
        called["hit"] = out is not None
        return out

    view_cache.load = spy
    try:
        v2 = idx2._as_flat_view()
    finally:
        view_cache.load = orig
    assert called.get("hit") is True
    a = sorted(v1.signatures_with_location(), key=lambda t: t[0].md5sum())
    b = sorted(v2.signatures_with_location(), key=lambda t: t[0].md5sum())
    assert [(s.md5sum(), loc) for s, loc in a] == [
        (s.md5sum(), loc) for s, loc in b
    ]
    # per-signature locations must point at the member .sig files
    assert {loc for _s, loc in b} == set(sig_by_name.values())

    # touching ONE member .sig invalidates the cached view
    os.utime(sig_by_name["m2"], ns=(1, 1))
    idx3 = StandaloneManifestIndex.load(mf_path).select(ksize=31)
    called.clear()
    view_cache.load = spy
    try:
        v3 = idx3._as_flat_view()
    finally:
        view_cache.load = orig
    assert called.get("hit") is False
    assert sorted(s.name for s in v3.signatures()) == [
        "m0", "m1", "m2", "m3"
    ]


def test_eviction_budget(cache_env, monkeypatch):
    monkeypatch.setenv("SOURMASH_TPU_VIEW_CACHE_BYTES", "1")
    rng = np.random.default_rng(5)
    for j in range(3):
        zpath = cache_env / f"db{j}.zip"
        _write_zip(zpath, [_mk(np.unique(rng.integers(0, 2**60, 30,
                                                      dtype=np.uint64)),
                               f"z{j}")])
        ZipFileLinearIndex.load(str(zpath)).select(ksize=31)._as_flat_view()
    # budget of 1 byte: at most one (just-written) entry may survive
    assert len(os.listdir(cache_env / "vc")) <= 1


def test_payload_roundtrip_all_moltypes(cache_env):
    "store/load must rebuild every sketch flavor bit-identically."
    rng = np.random.default_rng(7)
    sigs = []
    for moltype in ("DNA", "protein", "dayhoff", "hp"):
        for track in (False, True):
            mh = MinHash(
                n=0, ksize=33 if moltype == "DNA" else 11, scaled=200,
                track_abundance=track,
                is_protein=moltype == "protein",
                dayhoff=moltype == "dayhoff",
                hp=moltype == "hp",
            )
            mins = np.unique(rng.integers(0, 2**55, 30, dtype=np.uint64))
            if track:
                mh.set_abundances(
                    {int(m): int(m % 11 + 1) for m in mins}
                )
            else:
                mh.add_many(mins)
            s = SourmashSignature(mh, name=f"{moltype}-{track}")
            s._name = f"{moltype}-{track}"
            s._filename = None
            sigs.append(s)
    key = "k" * 64
    assert view_cache.store(key, sigs)
    got, locs = view_cache.load(key)
    assert locs is None
    assert len(got) == len(sigs)
    for a, b in zip(sigs, got):
        assert a.md5sum() == b.md5sum()
        assert a.minhash.moltype == b.minhash.moltype
        assert a.minhash.ksize == b.minhash.ksize
        assert a.minhash.scaled == b.minhash.scaled
        assert a.minhash.seed == b.minhash.seed
        assert np.array_equal(
            a.minhash.mins_array(), b.minhash.mins_array()
        )
        if a.minhash.track_abundance:
            assert np.array_equal(
                a.minhash.abunds_array(), b.minhash.abunds_array()
            )
        assert a == b
