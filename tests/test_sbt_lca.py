"""SBT, Nodegraph, and LCA database tests against reference test data."""

import glob
import os

import numpy as np
import pytest

import sourmash_tpu
from sourmash_tpu.nodegraph import Nodegraph
from sourmash_tpu.sbtmh import load_sbt_index, create_sbt_index
from sourmash_tpu.lca.lca_db import LCA_Database
from sourmash_tpu.signature import load_signatures_from_json

from conftest import utils_test_data


def test_nodegraph_roundtrip(tmp_path):
    ng = Nodegraph(21, 1e5, 4)
    hashes = np.random.default_rng(0).integers(0, 2**63, 500, dtype=np.uint64)
    ng.count_many(hashes)
    assert ng.get_many(hashes).all()

    # round-trip through the khmer OXLI binary format
    p = tmp_path / "test.ng"
    ng.save(str(p))
    ng2 = Nodegraph.load(str(p))
    assert ng2.hashsizes() == ng.hashsizes()
    assert ng2.get_many(hashes).all()
    # non-member hashes mostly absent
    other = np.random.default_rng(1).integers(0, 2**63, 500, dtype=np.uint64)
    assert ng2.get_many(other).sum() < 50


def test_nodegraph_load_reference_file():
    "Load a khmer-generated nodegraph from the reference test data."
    path = utils_test_data(".sbt.v3/internal.0")
    if not os.path.exists(path):
        pytest.skip("no reference nodegraph file")
    ng = Nodegraph.load(path)
    assert ng.hashsizes()


@pytest.mark.parametrize("version", ["v1", "v2", "v3", "v4", "v5", "v6"])
def test_sbt_load_all_versions(version):
    ext = ".sbt.zip" if version == "v6" else ".sbt.json"
    tree = load_sbt_index(
        utils_test_data(version + ext), print_version_warning=False
    )
    assert len(tree) == 7
    sigs = list(tree.signatures())
    assert len(sigs) == 7

    q = sigs[0]
    res = tree.search(q, threshold=0.08)
    assert res
    assert max(r.score for r in res) == 1.0


def test_sbt_build_search_save_roundtrip(tmp_path):
    s47 = list(load_signatures_from_json(open(utils_test_data("47.fa.sig"), "rb")))[0]
    s63 = list(load_signatures_from_json(open(utils_test_data("63.fa.sig"), "rb")))[0]

    tree = create_sbt_index()
    tree.insert(s47)
    tree.insert(s63)

    res = tree.search(s47, threshold=0.08)
    scores = sorted(r.score for r in res)
    assert scores[-1] == 1.0
    assert len(res) == 2  # 47 itself + 63 at 0.32

    out = str(tmp_path / "test.sbt.zip")
    tree.save(out)

    tree2 = load_sbt_index(out)
    res2 = tree2.search(s47, threshold=0.08)
    assert sorted(r.score for r in res2) == scores
    # manifest got written
    assert tree2.manifest is not None
    assert len(tree2.manifest) == 2


def test_sbt_loader_chain():
    "load_file_as_index must route .sbt.zip files to the SBT loader."
    idx = sourmash_tpu.load_file_as_index(utils_test_data("v6.sbt.zip"))
    from sourmash_tpu.sbt import SBT

    assert isinstance(idx, SBT)


def test_lca_load_and_search():
    db = LCA_Database.load(utils_test_data("lca/47+63.lca.json"))
    assert db.ksize == 31
    assert len(db) == 2 or len(db) > 0
    sigs = list(db.signatures())
    assert sigs

    s = sigs[0]
    res = db.search(s, threshold=0.1)
    assert res
    assert res[0].score == 1.0


def test_lca_roundtrip(tmp_path):
    db = LCA_Database.load(utils_test_data("lca/47+63.lca.json"))
    out = str(tmp_path / "out.lca.json")
    db.save(out)

    db2 = LCA_Database.load(out)
    assert db2.ksize == db.ksize
    assert db2.scaled == db.scaled
    assert set(db2._ident_to_idx) == set(db._ident_to_idx)
    assert db2._hashval_to_idx.keys() == db._hashval_to_idx.keys()

    # lineages round-trip
    for lid, lin in db._lid_to_lineage.items():
        assert db2._lid_to_lineage[lid] == lin


def test_lca_loader_chain():
    idx = sourmash_tpu.load_file_as_index(utils_test_data("lca/47+63.lca.json"))
    assert isinstance(idx, LCA_Database)


def test_lca_lineage_assignments():
    db = LCA_Database.load(utils_test_data("lca/47+63.lca.json"))
    found = 0
    for hashval in list(db.hashvals)[:200]:
        lins = db.get_lineage_assignments(hashval)
        if lins:
            found += 1
            for lin in lins:
                assert lin[-1].name
    assert found


def test_ipfs_redis_storages_with_fake_clients(monkeypatch):
    """IPFS/Redis storages drive their client libraries correctly
    (round-trip through in-memory fakes injected as the client modules)."""
    import sys
    import types

    from sourmash_tpu.sbt_storage import IPFSStorage, RedisStorage

    # --- fake ipfshttpclient -----------------------------------------
    blobs = {}

    class FakePin:
        def add(self, obj):
            blobs.setdefault("_pinned", set()).add(obj)

    class FakeIPFS:
        pin = FakePin()

        def add_bytes(self, content):
            key = f"Qm{len(blobs)}"
            blobs[key] = content
            return key

        def cat(self, path):
            return blobs[path]

    fake_mod = types.ModuleType("ipfshttpclient")
    fake_mod.connect = lambda **kw: FakeIPFS()
    monkeypatch.setitem(sys.modules, "ipfshttpclient", fake_mod)

    with IPFSStorage() as st:
        key = st.save("ignored", b"node-bytes")
        assert st.load(key) == b"node-bytes"
        assert key in blobs["_pinned"]
        assert st.init_args() == {}

    # --- fake redis ---------------------------------------------------
    kv = {}

    class FakeRedis:
        def __init__(self, **kw):
            self.kw = kw

        def set(self, k, v):
            kv[k] = v

        def get(self, k):
            return kv.get(k)

    fake_redis = types.ModuleType("redis")
    fake_redis.Redis = FakeRedis
    monkeypatch.setitem(sys.modules, "redis", fake_redis)

    with RedisStorage(host="localhost", port=6379) as st:
        assert st.save("node/1", bytearray(b"xyz")) == "node/1"
        assert st.load("node/1") == b"xyz"
        assert st.init_args() == {"host": "localhost", "port": 6379}


def test_ipfs_redis_raise_without_clients():
    "Without client libraries the constructors raise NotImplementedError."
    import pytest

    from sourmash_tpu.sbt_storage import IPFSStorage, RedisStorage

    for cls in (IPFSStorage, RedisStorage):
        try:
            cls()
        except NotImplementedError:
            pass
        except Exception as exc:  # client lib present and reachable
            pytest.skip(f"client library available: {exc}")
