"""Beyond-HBM collections: packed planes stay host-resident (numpy/mmap)
and stream to the device per query pass. Exercised by forcing a tiny HBM
budget; counts must match the resident path exactly."""

import numpy as np
import pytest

from sourmash_tpu.ops import index_ops


@pytest.fixture
def mins_list():
    rng = np.random.default_rng(7)
    return [
        np.unique(rng.integers(0, 2**62, size=n, dtype=np.uint64))
        for n in (300, 5000, 1200, 64, 5000)
    ]


def test_streaming_counts_match_resident(mins_list, monkeypatch):
    query = np.unique(
        np.concatenate([mins_list[1][::3], mins_list[3], mins_list[0][:50]])
    )

    resident = index_ops.build_banks(mins_list)
    want = index_ops.counts_for_banks(resident, query, len(mins_list))

    monkeypatch.setenv("SOURMASH_TPU_HBM_BUDGET_BYTES", "1")
    streaming = index_ops.build_banks(mins_list)
    for bank in streaming:
        for chunk in bank.chunks:
            assert isinstance(chunk.hi, np.ndarray)  # stayed on host

    got = index_ops.counts_for_banks(streaming, query, len(mins_list))
    assert np.array_equal(got, want)


def test_streaming_roundtrip_through_disk(mins_list, tmp_path, monkeypatch):
    banks = index_ops.build_banks(mins_list)
    index_ops.save_banks(banks, str(tmp_path / "banks"))

    monkeypatch.setenv("SOURMASH_TPU_HBM_BUDGET_BYTES", "1")
    loaded = index_ops.load_banks(str(tmp_path / "banks"))
    for bank in loaded:
        for chunk in bank.chunks:
            assert isinstance(chunk.hi, np.ndarray)

    query = mins_list[2]
    want = index_ops.counts_for_banks(banks, query, len(mins_list))
    got = index_ops.counts_for_banks(loaded, query, len(mins_list))
    assert np.array_equal(got, want)


def test_streaming_banks_with_mesh_scheduled_gather(monkeypatch):
    """Streaming banks + multi-device mesh COMBINED: the product gather
    path (DeviceGatherSchedule, round scan sharded over the virtual
     8-device mesh) over host-resident streamed planes equals the fully
    device-resident host-round run."""
    import jax
    from sourmash_tpu import MinHash, SourmashSignature
    from sourmash_tpu.index.flat import FlatIndex, schedule_device_gather
    from sourmash_tpu.search import GatherDatabases

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs a multi-device mesh")

    rng = np.random.default_rng(17)
    genomes = [
        np.unique(rng.integers(1, 2**63, size=300, dtype=np.uint64))
        for _ in range(30)
    ]
    meta = np.unique(np.concatenate([genomes[i] for i in range(0, 30, 3)]))
    sigs = []
    for i, g in enumerate(genomes):
        mh = MinHash(0, 31, scaled=1)
        mh.add_many(g)
        sigs.append(SourmashSignature(mh, name=f"g{i}").to_frozen())
    qmh = MinHash(0, 31, scaled=1)
    qmh.add_many(meta)
    query = SourmashSignature(qmh, name="meta").to_frozen()

    def run(streaming, schedule):
        if streaming:
            monkeypatch.setenv("SOURMASH_TPU_HBM_BUDGET_BYTES", "1")
        else:
            monkeypatch.delenv("SOURMASH_TPU_HBM_BUDGET_BYTES", raising=False)
        counters = [FlatIndex(sigs).counter_gather(query, threshold_bp=0)]
        if schedule:
            assert schedule_device_gather(counters) is not None
        gd = GatherDatabases(query, counters, threshold_bp=0)
        return [(r.match.name, r.intersect_bp) for r in gd]

    got = run(streaming=True, schedule=True)
    want = run(streaming=False, schedule=False)
    assert got == want and len(got) >= 10
