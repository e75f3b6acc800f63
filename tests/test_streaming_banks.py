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
