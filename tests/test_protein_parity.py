"""Protein / dayhoff / hp / translate parity against the reference's
known-good signatures (computed by its independent oracle scripts)."""

import numpy as np
import pytest

import jax.numpy as jnp

import sourmash_tpu
from sourmash_tpu import MinHash
from sourmash_tpu.signature import load_signatures_from_json, SourmashSignature
from sourmash_tpu.sequence_io import iter_records_bytes

from conftest import utils_test_data


def _sigs_per_record(path, make_mh, add):
    "Build one signature per record (singleton mode)."
    out = []
    for name, seq in iter_records_bytes(path):
        mh = make_mh()
        add(mh, seq)
        out.append(SourmashSignature(mh, name=name))
    return sorted(out, key=lambda s: s.name)


def test_knowngood_dna():
    "sketch dna k=21,num=500 --singleton ecoli.genes.fna vs benchmark.dna.sig"
    sigs = _sigs_per_record(
        utils_test_data("ecoli.genes.fna"),
        lambda: MinHash(500, 21),
        lambda mh, seq: mh.add_sequence(seq, True),
    )
    good = list(
        load_signatures_from_json(open(utils_test_data("benchmark.dna.sig"), "rb"))
    )[0]
    assert sigs[1].similarity(good) == 1.0


def test_knowngood_input_protein():
    "sketch protein k=7,num=500 --singleton ecoli.faa vs benchmark.input_prot.sig"
    sigs = _sigs_per_record(
        utils_test_data("ecoli.faa"),
        lambda: MinHash(500, 7, is_protein=True),
        lambda mh, seq: mh.add_protein(seq),
    )
    good = list(
        load_signatures_from_json(
            open(utils_test_data("benchmark.input_prot.sig"), "rb")
        )
    )[0]
    assert sigs[0].similarity(good) == 1.0


def test_knowngood_translate():
    "sketch translate k=7,num=500 --singleton ecoli.genes.fna vs benchmark.prot.sig"
    from sourmash_tpu.ops import encodings as enc

    def add_translated(mh, seq):
        arr = enc.upper(np.frombuffer(seq, dtype=np.uint8))
        h = enc.translate_hashes(arr, mh.ksize, mh.moltype, mh.seed)
        mh._insert_hashes(h)

    sigs = _sigs_per_record(
        utils_test_data("ecoli.genes.fna"),
        lambda: MinHash(500, 7, is_protein=True),
        add_translated,
    )
    good = list(
        load_signatures_from_json(open(utils_test_data("benchmark.prot.sig"), "rb"))
    )[0]
    assert sigs[1].similarity(good) == 1.0


@pytest.mark.parametrize("moltype", ["protein", "dayhoff", "hp"])
def test_prot_zip_collections_load(moltype):
    "Load reference protein-family zip collections and check moltypes."
    idx = sourmash_tpu.load_file_as_index(
        utils_test_data(f"prot/{moltype}.zip")
    )
    sigs = list(idx.signatures())
    assert sigs
    for ss in sigs:
        assert ss.minhash.moltype == moltype

    # self-search gives 1.0
    res = idx.search(sigs[0], threshold=0.0)
    assert max(r.score for r in res) == 1.0


def test_dayhoff_hp_hashing_basics():
    "dayhoff/hp compress the aa alphabet; sketches must differ from protein."
    seq = b"MKVLLVACLLVACSGSGS"
    mhs = {}
    for molt, kwargs in [
        ("protein", dict(is_protein=True)),
        ("dayhoff", dict(dayhoff=True)),
        ("hp", dict(hp=True)),
    ]:
        mh = MinHash(0, 5, scaled=1, **kwargs)
        mh.add_protein(seq)
        mhs[molt] = set(mh.hashes)
        assert len(mh) > 0

    assert mhs["protein"] != mhs["dayhoff"]
    assert mhs["protein"] != mhs["hp"]
    assert mhs["dayhoff"] != mhs["hp"]


def test_translate_codon_table():
    from sourmash_tpu.ops.encodings import translate_codon

    assert translate_codon("ATG") == "M"
    assert translate_codon("TAA") == "*"
    assert translate_codon("GCN") == "A"
    assert translate_codon("NNN") == "X"
    assert translate_codon("AT") == "X"  # 2-mer + N -> not in table
    assert translate_codon("A") == "X"


class TestDeviceAAKernel:
    """The pallas amino-acid window kernel (interpret mode on CPU) is
    value-exact against the host numpy murmur loop — protein, dayhoff and
    hp remaps, plus the 6-frame translate driver."""

    def _host(self, aa, k, seed=42):
        from sourmash_tpu.ops.murmur import murmur3_x64_128_first64

        w = np.lib.stride_tricks.sliding_window_view(aa, k)
        with np.errstate(over="ignore"):
            return murmur3_x64_128_first64(np.ascontiguousarray(w), k, seed, xp=np)

    @pytest.mark.parametrize("k", [7, 10, 17])
    def test_aa_kernel_matches_host(self, k):
        from sourmash_tpu.ops.pallas_sketch import aa_window_hash_pairs_pallas

        rng = np.random.default_rng(3)
        aa = rng.choice(
            np.frombuffer(b"ACDEFGHIKLMNPQRSTVWYX*", dtype=np.uint8), size=4000
        )
        n = len(aa) - k + 1
        hi, lo, valid = aa_window_hash_pairs_pallas(
            jnp.asarray(aa[None, :]), ksize=k, interpret=True
        )
        got = (np.asarray(hi)[0, :n].astype(np.uint64) << np.uint64(32)) | (
            np.asarray(lo)[0, :n].astype(np.uint64)
        )
        assert np.array_equal(got, self._host(aa, k))
        v = np.asarray(valid)[0]
        assert v[:n].all() and not v[n:].any()

    def test_aa_chunks_driver_matches_host(self):
        "Multi-chunk driver: ordering and chunk boundaries are exact."
        from sourmash_tpu.ops.sketch import aa_chunks_to_hashes

        rng = np.random.default_rng(5)
        aa = rng.choice(
            np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8),
            size=3 * 4096 + 11,
        )
        got = aa_chunks_to_hashes(aa, 10, chunk=4096)
        assert np.array_equal(got, self._host(aa, 10))

    def test_protein_hashes_device_branch(self, monkeypatch):
        """protein_hashes routes big streams through the device kernel and
        the result equals the native/numpy loop, for all three moltypes."""
        from sourmash_tpu.ops import encodings as enc

        monkeypatch.setattr(enc, "_aa_device_ok", lambda: True)
        rng = np.random.default_rng(7)
        aa = rng.choice(
            np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8),
            size=(1 << 16) + 123,
        )
        for moltype in ("protein", "dayhoff", "hp"):
            dev = enc.protein_hashes(aa, 10, moltype)
            monkeypatch.setenv("SOURMASH_TPU_HOST_SKETCH", "numpy")
            host = enc.protein_hashes(aa, 10, moltype)
            monkeypatch.delenv("SOURMASH_TPU_HOST_SKETCH")
            assert np.array_equal(dev, host), moltype


class TestBatchedAASketchFile:
    """The batched device path for `sketch protein`/`sketch translate`
    (_sketch_aa_file: remap -> zero-separator join -> one chip stream) is
    md5-identical to the per-record host loop on reference test data."""

    @pytest.mark.parametrize("translate", [False, True])
    @pytest.mark.parametrize("moltype", ["protein", "dayhoff", "hp"])
    def test_batched_matches_per_record(self, monkeypatch, translate, moltype):
        from sourmash_tpu.command_sketch import _sketch_whole_file
        from sourmash_tpu.ops import encodings as enc

        fn = utils_test_data("ecoli.genes.fna" if translate else "ecoli.faa")

        def build(device):
            monkeypatch.setattr(
                enc, "_aa_device_ok", lambda: device
            )
            mh = MinHash(
                0, 7, is_protein=True,
                dayhoff=moltype == "dayhoff", hp=moltype == "hp",
                scaled=20, track_abundance=True,
            )
            sig = SourmashSignature(mh)
            n, first = _sketch_whole_file(
                [sig], fn, input_is_protein=not translate,
                check_sequence=False,
            )
            assert n
            return mh

        dev = build(True)
        host = build(False)
        assert dev.hashes == host.hashes  # values AND abundances


def test_batched_aa_flush_boundaries(monkeypatch):
    """The streaming flush path (bounded aa buffering) produces the same
    hash multiset as one unflushed pass — records split across flush
    boundaries must not gain or lose windows."""
    import sourmash_tpu.command_sketch as cs
    from sourmash_tpu.ops import encodings as enc

    monkeypatch.setattr(enc, "_aa_device_ok", lambda: True)
    fn = utils_test_data("ecoli.faa")

    def build():
        mh = MinHash(0, 7, is_protein=True, scaled=20, track_abundance=True)
        sig = SourmashSignature(mh)
        cs._sketch_whole_file(
            [sig], fn, input_is_protein=True, check_sequence=False
        )
        return mh

    big = build()
    monkeypatch.setattr(cs, "_AA_FLUSH_BYTES", 1000)  # flush every record+
    small = build()
    assert big.hashes == small.hashes
