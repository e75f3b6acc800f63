"""End-to-end sketching parity against reference sourmash's checked-in
signatures: the hash sets, md5sums, and JSON serialization must be
bit-identical."""

import gzip
import json
import os

import numpy as np
import pytest

import sourmash_tpu
from sourmash_tpu import MinHash, SourmashSignature, save_signatures_to_json
from sourmash_tpu.signature import load_signatures_from_json
from sourmash_tpu.sequence_io import iter_records_bytes

from conftest import utils_test_data

GCF = "/root/reference/data/GCF_000005845.2_ASM584v2_genomic.fna.gz"
GCF_SIG = utils_test_data("GCF_000005845.2_ASM584v2_genomic.fna.gz.sig")


@pytest.fixture(scope="module")
def gcf_reference_sigs():
    with open(GCF_SIG) as f:
        return json.load(f)


@pytest.mark.parametrize("ksize", [21, 31, 51])
def test_gcf_sketch_parity(ksize, gcf_reference_sigs):
    "Sketch E. coli GCF_000005845.2 at scaled=1000; compare hash set + md5."
    ref = None
    for rec in gcf_reference_sigs:
        for sk in rec["signatures"]:
            if sk["ksize"] == ksize:
                ref = sk
    assert ref is not None

    mh = MinHash(0, ksize, scaled=1000)
    for name, seq in iter_records_bytes(GCF):
        mh.add_sequence(seq, force=False)

    assert len(mh) == len(ref["mins"])
    assert [int(x) for x in mh.mins_array()] == ref["mins"]
    assert mh.md5sum() == ref["md5sum"]
    assert mh._max_hash == ref["max_hash"]


def test_short_fa_num_sketch():
    "num=500 minhash of short.fa matches a self-consistent oracle set."
    path = utils_test_data("short.fa")
    mh = MinHash(500, 21)
    for name, seq in iter_records_bytes(path):
        mh.add_sequence(seq)
    # basic sanity: <= 500 hashes, sorted unique
    mins = mh.mins_array()
    assert len(mins) <= 500
    assert (np.diff(mins.astype(np.int64)) > 0).all() or len(mins) <= 1


def test_sig_json_roundtrip_bit_identical():
    "Load reference .sig, re-serialize, and compare semantically + ordering."
    with open(GCF_SIG, "rb") as f:
        data = f.read()
    sigs = list(load_signatures_from_json(data))
    assert len(sigs) == 3
    out = save_signatures_to_json(sigs)
    ours = json.loads(out)
    theirs = json.loads(data)
    # reference file may predate current field order; compare contents
    for a, b in zip(ours, theirs):
        for k in ("class", "email", "hash_function", "license", "version"):
            assert a[k] == b[k], k
        assert a.get("name") == b.get("name")
        assert a.get("filename") == b.get("filename")
        sa, sb = a["signatures"][0], b["signatures"][0]
        for k in ("ksize", "max_hash", "md5sum", "mins", "seed"):
            assert sa[k] == sb[k], k
        assert sa["molecule"].lower() == sb["molecule"].lower()
    # our own serialization must round-trip byte-for-byte
    sigs2 = list(load_signatures_from_json(out))
    assert save_signatures_to_json(sigs2) == out


def test_sig_writer_field_order():
    "Field order must match Rust serde declaration order exactly."
    mh = MinHash(0, 31, scaled=1000)
    mh.add_sequence("ATGCGAGTGTTGAAGTTCGGCGGTACATCAGTGGCAAATGCAGAACGTTTTCTGCGTGTTGCCGATATT")
    sig = SourmashSignature(mh, name="testname", filename="testfile")
    out = save_signatures_to_json([sig]).decode()
    rec = json.loads(out)[0]
    assert list(rec.keys()) == [
        "class",
        "email",
        "hash_function",
        "filename",
        "name",
        "license",
        "signatures",
        "version",
    ]
    assert list(rec["signatures"][0].keys()) == [
        "num",
        "ksize",
        "seed",
        "max_hash",
        "mins",
        "md5sum",
        "molecule",
    ]
    assert '"version":0.4' in out


def test_track_abundance_counts():
    mh = MinHash(0, 21, scaled=1, track_abundance=True)
    mh.add_sequence("ATGGCATGGCATGGCATGGCATGGCATGGC")
    h = mh.hashes
    assert len(h) > 0
    assert sum(h.values()) == 10  # 30bp => 10 k-mer windows at k=21


def test_gz_sig_loading():
    path = utils_test_data("genome-s10+s11.sig.gz")
    sigs = list(load_signatures_from_json(open(path, "rb")))
    assert len(sigs) > 0


def test_multisketch_signature_keeps_all_minhashes():
    """Regression: SourmashSignature.__init__ assigns via the overridden
    minhash setter, which used to collapse a MultiSketchSignature to its
    first sketch (broke 'compute' defaults and 'sketch -p k=21,k=31')."""
    from sourmash_tpu.command_sketch import ComputeParameters, signature_from_params

    p = ComputeParameters(ksizes=(21, 31, 51))
    sig = signature_from_params(p)
    assert [mh.ksize for mh in sig._all_minhashes()] == [21, 31, 51]

    # dna + protein simultaneously (legacy compute): order protein, dna per k
    p2 = ComputeParameters(ksizes=(21,), dna=True, protein=True)
    sig2 = signature_from_params(p2)
    assert [(mh.moltype, mh.ksize) for mh in sig2._all_minhashes()] == [
        ("protein", 7),
        ("DNA", 21),
    ]


class TestSlotPath:
    """The fused in-kernel compaction path (pallas slot kernel, interpret
    mode on CPU) must reproduce the host oracle exactly: same survivors,
    window order, and multiplicity."""

    @pytest.mark.parametrize("ksize,scaled", [(21, 2000), (31, 1000), (51, 1000)])
    def test_slot_survivors_match_oracle(self, monkeypatch, ksize, scaled):
        monkeypatch.setenv("SOURMASH_PALLAS", "1")
        from sourmash_tpu.minhash import _get_max_hash_for_scaled
        from sourmash_tpu.ops.encodings import dna_hashes, UPPER
        from sourmash_tpu.ops.sketch import seq_chunks_to_hashes

        rng = np.random.default_rng(11)
        alph = np.frombuffer(b"ACGTN", dtype=np.uint8)
        seq = rng.choice(alph, size=250_000, p=[0.24, 0.24, 0.24, 0.24, 0.04])
        # duplicate a prefix so repeated k-mers exercise multiplicity
        raw = seq[:2000].tobytes() + seq.tobytes()

        mh = int(_get_max_hash_for_scaled(scaled))
        got = seq_chunks_to_hashes(raw, ksize, mh, chunk=1 << 17)
        arr = UPPER[np.frombuffer(raw, dtype=np.uint8)]
        hh, vv = dna_hashes(arr, ksize, 42)
        expect = hh[vv & (hh <= np.uint64(mh))]
        assert np.array_equal(got, expect)

    def test_slot_path_gate(self):
        from sourmash_tpu.ops.sketch import _slot_path_ok

        assert _slot_path_ok((1 << 64) // 1000, True)
        assert _slot_path_ok((1 << 64) // 512, True)
        assert not _slot_path_ok((1 << 64) // 100, True)  # too dense
        assert not _slot_path_ok((1 << 64) - 1, True)  # num sketch
        assert not _slot_path_ok((1 << 64) // 1000, False)  # pallas off

    def test_slots_overflow_detected(self):
        from sourmash_tpu.ops.pallas_sketch import SLOTS
        from sourmash_tpu.ops.sketch import _slots_to_hashes

        hi = np.zeros((2, 4, SLOTS), dtype=np.uint32)
        lo = np.zeros((2, 4, SLOTS), dtype=np.uint32)
        hi[1, 0, 0] = 7  # row 1 has one good survivor
        counts = np.zeros((2, 4), dtype=np.int32)
        counts[0, 1] = SLOTS + 3  # truncated segment in row 0
        counts[1, 0] = 1
        hashes, bad_rows = _slots_to_hashes(hi, lo, counts)
        assert bad_rows == [0]  # only the overflowing row is rerouted
        assert hashes.tolist() == [7 << 32]  # good rows still extracted

    def test_slot_value_extraction_matches_host(self, monkeypatch):
        """bench.py's exactness gate reconstructs survivor hash VALUES from
        the slot kernel's (hi, lo, count) outputs; the reconstruction must
        equal the host loop's survivor set (interpret mode on CPU)."""
        monkeypatch.setenv("SOURMASH_PALLAS", "1")
        from sourmash_tpu.minhash import _get_max_hash_for_scaled
        from sourmash_tpu.ops.encodings import dna_hashes, UPPER
        from sourmash_tpu.ops.pallas_sketch import sketch_survivor_slots_pallas
        from sourmash_tpu.ops.sketch import _pick_slots

        ksize, scaled = 31, 1000
        rng = np.random.default_rng(5)
        alph = np.frombuffer(b"ACGT", dtype=np.uint8)
        piece = rng.choice(alph, size=(1 << 15) + ksize - 1)
        mh = np.uint64(_get_max_hash_for_scaled(scaled))

        sh, sl, cnt = sketch_survivor_slots_pallas(
            piece[None], mh, ksize=ksize, seed=42, slots=_pick_slots(int(mh)),
            interpret=True,
        )
        sh, sl = np.asarray(sh)[0], np.asarray(sl)[0]
        n_slots = np.asarray(cnt)[0]
        vals = []
        for b in range(sh.shape[0]):
            k = int(n_slots[b])
            if k:
                vals.append(
                    (sh[b, :k].astype(np.uint64) << np.uint64(32))
                    | sl[b, :k].astype(np.uint64)
                )
        got = np.unique(np.concatenate(vals)) if vals else np.zeros(0, np.uint64)

        hh, vv = dna_hashes(UPPER[piece], ksize, 42)
        expect = np.unique(hh[vv & (hh <= mh)])
        assert np.array_equal(got, expect)


def test_flat_layout_boundary_fuzz():
    """Fuzz the gather-free flat row layout (interpret mode): sequence
    lengths at and around block multiples, tiny and multi-block inputs,
    several batch sizes — survivors must match the host loop exactly."""
    import jax.numpy as jnp

    from sourmash_tpu.ops import encodings as enc
    from sourmash_tpu.ops.pallas_sketch import (
        DEFAULT_ROWS,
        LANES,
        sketch_survivor_slots_pallas,
    )
    from sourmash_tpu.ops.sketch import _slots_to_hashes

    rng = np.random.default_rng(99)
    k = 31
    block = DEFAULT_ROWS * LANES
    max_hash = np.uint64((2**64 - 1) // 500)
    lengths = [
        k, k + 1, 200, block + k - 1, block + k, block + k + 1,
        2 * block - 7, 2 * block + k + 13,
    ]
    for B in (1, 3):
        for S in lengths:
            seqs = rng.choice(
                np.frombuffer(b"ACGTN", dtype=np.uint8), size=(B, S),
                p=[0.24, 0.24, 0.24, 0.24, 0.04],
            )
            sh, sl, cnt = sketch_survivor_slots_pallas(
                jnp.asarray(seqs), jnp.asarray(max_hash), ksize=k,
                slots=8, interpret=True,
            )
            hashes, bad = _slots_to_hashes(sh, sl, cnt)
            assert not bad, (B, S)
            want = []
            for b in range(B):
                hh, valid = enc.dna_hashes(seqs[b], k, 42)
                want.append(hh[valid & (hh <= max_hash)])
            want = np.sort(np.concatenate(want))
            assert np.array_equal(np.sort(hashes), want), (B, S)
