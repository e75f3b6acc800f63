"""RevIndex (memory + disk) tests: roundtrip, incremental update, loader
chain, and gather parity with the host CounterGather."""

import numpy as np
import pytest

import sourmash_tpu
from sourmash_tpu.index import CounterGather
from sourmash_tpu.index.revindex import (
    RevIndex,
    load_revindex,
    update_revindex,
)
from sourmash_tpu.sourmash_args import load_file_as_signatures

from conftest import utils_test_data


@pytest.fixture
def sigs47_63():
    a = list(load_file_as_signatures(utils_test_data("47.fa.sig")))
    b = list(load_file_as_signatures(utils_test_data("63.fa.sig")))
    return a + b


@pytest.fixture
def query4763():
    return list(load_file_as_signatures(utils_test_data("47+63.fa.sig")))[0]


def test_revindex_memory(sigs47_63, query4763):
    ri = RevIndex(signatures=sigs47_63)
    assert len(ri) == 2
    assert ri.scaled == 1000
    counts = ri.counts_for(query4763.minhash.mins_array())
    assert counts.tolist() == [5177, 5238]  # known 47/63 overlaps with 47+63


def test_revindex_disk_roundtrip(tmp_path, sigs47_63, query4763):
    path = str(tmp_path / "db.revindex")
    RevIndex(signatures=sigs47_63).save(path)

    back = load_revindex(path)
    assert len(back) == 2
    assert back.scaled == 1000
    assert {ss.md5sum() for ss in back.signatures()} == {
        ss.md5sum() for ss in sigs47_63
    }

    # device tensors loaded from disk give the same counts
    counts = back.counts_for(query4763.minhash.mins_array())
    assert counts.tolist() == [5177, 5238]


def test_revindex_loader_chain_and_gather_parity(
    tmp_path, sigs47_63, query4763
):
    path = str(tmp_path / "db.revindex")
    RevIndex(signatures=sigs47_63).save(path)

    idx = sourmash_tpu.load_file_as_index(path)
    assert type(idx).__name__ == "RevIndex"

    q = query4763.copy()
    with q.update() as q:
        q.minhash = q.minhash.flatten()

    host = CounterGather(q)
    for ss in idx.signatures():
        host.add(ss)
    dev = idx.counter_gather(query4763, 0)

    cur = q.minhash.to_mutable()
    while True:
        a = host.peek(cur)
        b = dev.peek(cur)
        if not a:
            assert not b
            break
        assert a[0].signature.md5sum() == b[0].signature.md5sum()
        assert set(a[1].hashes) == set(b[1].hashes)
        host.consume(a[1])
        dev.consume(b[1])
        cur.remove_many(a[1].hashes)


def test_revindex_incremental_update(tmp_path, sigs47_63):
    path = str(tmp_path / "db.revindex")
    RevIndex(signatures=sigs47_63[:1]).save(path)

    # re-adding the same signature is skipped (resumable-build semantics)
    _, added = update_revindex(path, sigs47_63[:1])
    assert added == 0

    idx, added = update_revindex(path, sigs47_63)
    assert added == 1
    assert len(idx) == 2
    assert len(load_revindex(path)) == 2


def test_revindex_select(sigs47_63):
    ri = RevIndex(signatures=sigs47_63)
    assert len(ri.select(ksize=31)) == 2
    assert len(ri.select(ksize=21)) == 0
    assert len(ri.select(moltype="protein")) == 0


def test_revindex_v3_packed_planes(tmp_path, sigs47_63, query4763):
    "v3 format: packed planes load from disk, skipping the host re-pack."
    path = str(tmp_path / "db.revindex")
    RevIndex(signatures=sigs47_63).save(path)
    import os

    assert os.path.exists(os.path.join(path, "planes", "banks.json"))

    idx = load_revindex(path)
    assert idx._banks_dir is not None
    q = query4763.minhash.mins_array()
    got = idx.counts_for(q)

    # same counts as a freshly-packed index
    fresh = RevIndex(signatures=sigs47_63)
    assert got.tolist() == fresh.counts_for(q).tolist()

    # insert invalidates the on-disk planes
    idx.insert(sigs47_63[0])
    assert idx._banks_dir is None


def test_revindex_load_prefers_raw_upload_when_resident(
    tmp_path, sigs47_63, query4763, monkeypatch
):
    """A loaded revindex that fits the HBM budget rebuilds its banks from
    the raw mins (raw limbs upload + on-device pack: ~6x fewer bytes over
    the link than uploading the disk planes); beyond the budget the
    mmapped disk planes stream instead."""
    import sourmash_tpu.ops.index_ops as io_

    path = str(tmp_path / "db.revindex")
    RevIndex(signatures=sigs47_63).save(path)

    calls = []
    orig_build, orig_load = io_.build_banks, io_.load_banks
    monkeypatch.setattr(
        "sourmash_tpu.index.flat.build_banks",
        lambda m: calls.append("build") or orig_build(m),
    )
    monkeypatch.setattr(
        io_, "load_banks", lambda d: calls.append("load") or orig_load(d)
    )

    idx = load_revindex(path)
    q = query4763.minhash.mins_array()
    got = idx.counts_for(q)
    assert calls == ["build"]

    # beyond-HBM: the disk planes must be used (streaming path)
    monkeypatch.setenv("SOURMASH_TPU_HBM_BUDGET_BYTES", "1")
    calls.clear()
    idx2 = load_revindex(path)
    got2 = idx2.counts_for(q)
    assert calls == ["load"]
    assert got.tolist() == got2.tolist()
