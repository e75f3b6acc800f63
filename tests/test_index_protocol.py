"""Index protocol conformance suite: one set of behavioral tests run
against every Index implementation (reference pattern:
`tests/test_index_protocol.py:178-500` — same invariants, original code).
"""

import pytest

import sourmash_tpu
from sourmash_tpu.index import (
    CounterGather,
    LazyLinearIndex,
    LinearIndex,
    MultiIndex,
    StandaloneManifestIndex,
)
from sourmash_tpu.index.flat import FlatIndex
from sourmash_tpu.index.revindex import RevIndex
from sourmash_tpu.sourmash_args import load_file_as_signatures
from sourmash_tpu.manifest import CollectionManifest

from conftest import utils_test_data


def _load_three_sigs():
    out = []
    for fn in ("2.fa.sig", "47.fa.sig", "63.fa.sig"):
        out.extend(load_file_as_signatures(utils_test_data(fn), ksize=31))
    assert len(out) == 3
    return out


def build_linear_index(tmp_path):
    return LinearIndex(_load_three_sigs())


def build_lazy_linear_index(tmp_path):
    return LazyLinearIndex(LinearIndex(_load_three_sigs()))


def build_flat_index(tmp_path):
    return FlatIndex(_load_three_sigs())


def build_revindex(tmp_path):
    return RevIndex(signatures=_load_three_sigs())


def build_revindex_save_load(tmp_path):
    path = str(tmp_path / "db.revindex")
    RevIndex(signatures=_load_three_sigs()).save(path)
    return sourmash_tpu.load_file_as_index(path)


def build_zipfile_index(tmp_path):
    from sourmash_tpu.save_load import SaveSignaturesToLocation

    path = str(tmp_path / "db.zip")
    with SaveSignaturesToLocation(path) as save:
        for ss in _load_three_sigs():
            save.add(ss)
    return sourmash_tpu.load_file_as_index(path).select(ksize=31)


def build_multi_index(tmp_path):
    return MultiIndex.load([LinearIndex(_load_three_sigs())], [None], None)


def build_standalone_manifest_index(tmp_path):
    sigfiles = [
        utils_test_data(fn) for fn in ("2.fa.sig", "47.fa.sig", "63.fa.sig")
    ]
    rows = []
    for loc in sigfiles:
        for ss in load_file_as_signatures(loc, ksize=31):
            rows.append(
                CollectionManifest.make_manifest_row(
                    ss, loc, include_signature=False
                )
            )
    mf = CollectionManifest(rows)
    mf_path = str(tmp_path / "mf.csv")
    mf.write_to_filename(mf_path)
    return StandaloneManifestIndex.load(mf_path).select(ksize=31)


def build_sbt_index(tmp_path):
    from sourmash_tpu.sbtmh import create_sbt_index, SigLeaf

    tree = create_sbt_index()
    for ss in _load_three_sigs():
        tree.insert(ss)
    return tree


def build_sbt_index_save_load(tmp_path):
    from sourmash_tpu.sbtmh import create_sbt_index, load_sbt_index

    tree = create_sbt_index()
    for ss in _load_three_sigs():
        tree.insert(ss)
    out = str(tmp_path / "db.sbt.zip")
    tree.save(out)
    return load_sbt_index(out)


def build_lca_index_save_load(tmp_path):
    from sourmash_tpu.lca.lca_db import LCA_Database

    db = LCA_Database(31, 1000, "DNA")
    for ss in _load_three_sigs():
        db.insert(ss)
    out = str(tmp_path / "db.lca.json")
    db.save(out)
    return sourmash_tpu.load_file_as_index(out)


def build_sqlite_index(tmp_path):
    from sourmash_tpu.index.sqlite_index import SqliteIndex

    out = str(tmp_path / "db.sqldb")
    db = SqliteIndex.create(out)
    for ss in _load_three_sigs():
        db.insert(ss)
    db.commit()
    return db


@pytest.fixture(
    params=[
        build_linear_index,
        build_lazy_linear_index,
        build_flat_index,
        build_revindex,
        build_revindex_save_load,
        build_zipfile_index,
        build_multi_index,
        build_standalone_manifest_index,
        build_sbt_index,
        build_sbt_index_save_load,
        build_lca_index_save_load,
        build_sqlite_index,
    ]
)
def index_obj(request, tmp_path):
    return request.param(tmp_path)


def test_index_search_exact_match(index_obj):
    ss2, ss47, ss63 = _load_three_sigs()
    sr = index_obj.search(ss2, threshold=1.0)
    assert len(sr) == 1
    assert sr[0].signature.minhash == ss2.minhash
    assert sr[0].score == 1.0


def test_index_search_lower_threshold(index_obj):
    ss2, ss47, ss63 = _load_three_sigs()
    sr = index_obj.search(ss47, threshold=0.1)
    assert len(sr) == 2
    sr.sort(key=lambda x: -x[0])
    assert sr[0].signature.minhash == ss47.minhash
    assert sr[0].score == 1.0
    assert sr[1].signature.minhash == ss63.minhash
    assert round(sr[1].score, 2) == 0.32


def test_index_search_higher_threshold(index_obj):
    ss2, ss47, ss63 = _load_three_sigs()
    sr = index_obj.search(ss47, threshold=0.5)
    assert len(sr) == 1
    assert sr[0].signature.minhash == ss47.minhash


def test_index_search_containment(index_obj):
    ss2, ss47, ss63 = _load_three_sigs()
    sr = index_obj.search(ss63, do_containment=True, threshold=0.1)
    assert len(sr) == 2
    sr.sort(key=lambda x: -x[0])
    assert sr[0].signature.minhash == ss63.minhash
    assert round(sr[1].score, 2) == 0.48


def test_index_signatures_and_len(index_obj):
    sigs = list(index_obj.signatures())
    assert len(sigs) == 3
    assert len(index_obj) == 3
    assert bool(index_obj)

    md5s = {ss.md5sum() for ss in _load_three_sigs()}
    assert {ss.md5sum() for ss in sigs} == md5s


def test_index_select_basic(index_obj):
    idx = index_obj.select(
        ksize=31, moltype="DNA", abund=False, picklist=None
    )
    assert len(list(idx.signatures())) == 3


def test_index_select_nada(index_obj):
    # whole-database indexes (SBT/LCA) may raise instead of returning empty
    # (reference test_index_protocol.py:380-392, sourmash issue #1940)
    try:
        idx = index_obj.select(ksize=21)
    except ValueError:
        idx = LinearIndex([])
    assert len(list(idx.signatures())) == 0


def test_index_select_fail(index_obj):
    with pytest.raises(ValueError):
        index_obj.select(ksize="31")
    with pytest.raises(ValueError):
        index_obj.select(moltype="dna")
    with pytest.raises(ValueError):
        index_obj.select(moltype="foo")
    with pytest.raises(ValueError):
        index_obj.select(plausible_extra_parameter=5)


def test_index_prefetch(index_obj):
    ss2, ss47, ss63 = _load_three_sigs()
    results = list(index_obj.prefetch(ss47, threshold_bp=0))
    results.sort(key=lambda x: -x.score)
    assert len(results) == 2
    assert results[0].signature.minhash == ss47.minhash
    assert results[1].signature.minhash == ss63.minhash


def test_index_best_containment(index_obj):
    ss2, ss47, ss63 = _load_three_sigs()
    result = index_obj.best_containment(ss47)
    assert result
    assert result.score == 1.0
    assert result.signature.minhash == ss47.minhash


def test_index_counter_gather_vs_host(index_obj):
    "counter_gather (device or generic) must match the host CounterGather."
    ss2, ss47, ss63 = _load_three_sigs()

    query = ss47.copy()
    with query.update() as query:
        query.minhash = query.minhash.flatten()

    try:
        cg = index_obj.counter_gather(query, 0)
    except ValueError:
        pytest.skip("index does not support counter_gather directly")

    host = CounterGather(query)
    for ss in _load_three_sigs():
        try:
            host.add(ss)
        except ValueError:
            pass  # no overlap (ss2)

    cur = query.minhash.to_mutable()
    while True:
        a = host.peek(cur)
        b = cg.peek(cur)
        if not a:
            assert not b
            break
        assert a[0].signature.md5sum() == b[0].signature.md5sum()
        assert set(a[1].hashes) == set(b[1].hashes)
        host.consume(a[1])
        cg.consume(b[1])
        cur.remove_many(a[1].hashes)
