"""Protein / dayhoff / hp / translate parity against the reference's
known-good signatures (computed by its independent oracle scripts)."""

import numpy as np
import pytest

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
