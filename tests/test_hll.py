"""HyperLogLog tests against the reference's Rust test oracles
(`src/core/src/sketch/hyperloglog/mod.rs:266-390`): every assertion there
is tolerance-based (abs error < ERR_RATE vs recorded constants), and the
register update is checked bit-exactly against a loop port of add_hash."""

import numpy as np
import pytest

from sourmash_tpu.hll import HLL, _ranks
from sourmash_tpu.minhash import MinHash
from sourmash_tpu.ops import encodings as enc
from sourmash_tpu.sequence_io import iter_records_bytes

from conftest import utils_test_data

ERR_RATE = 0.01
KSIZE = 21


def _add_file(hll, path):
    for _, seq in iter_records_bytes(path):
        hll.add_sequence(seq)


def test_hll_add_ecoli_genes():
    "Rust hll_add: ecoli.genes.fna has 3356 distinct canonical 21-mers."
    hll = HLL(ERR_RATE, KSIZE)
    uniq = set()
    for _, seq in iter_records_bytes(utils_test_data("ecoli.genes.fna")):
        hll.add_sequence(seq)
        s = enc.upper(np.frombuffer(seq, dtype=np.uint8))
        h, v = enc.dna_hashes(s, KSIZE, 42)
        uniq.update(h[v].tolist())
    assert len(uniq) == 3356
    assert abs(1 - hll.cardinality() / 3356) < ERR_RATE


def test_hll_registers_match_scalar_oracle():
    "Vectorized rank/index fold == Rust add_hash semantics, bit-exact."
    rng = np.random.default_rng(7)
    H = rng.integers(0, 2**64, size=20000, dtype=np.uint64)
    hll = HLL(ERR_RATE, KSIZE)
    hll.add_many(H)

    p = hll.p
    regs = np.zeros(1 << p, dtype=np.uint8)
    for hh in H.tolist():
        value = hh >> p
        index = hh - (value << p)
        leftmost = (64 - value.bit_length()) + 1 - p
        regs[index] = max(regs[index], leftmost)
    assert (regs == hll.registers).all()


def test_hll_joint_mle_genomes():
    "Rust hll_joint_mle constants, all asserted within ERR_RATE."
    h1 = HLL(ERR_RATE, KSIZE)
    h2 = HLL(ERR_RATE, KSIZE)
    hu = HLL(ERR_RATE, KSIZE)
    for _, seq in iter_records_bytes(utils_test_data("genome-s10.fa.gz")):
        h1.add_sequence(seq)
        hu.add_sequence(seq)
    for _, seq in iter_records_bytes(utils_test_data("genome-s10+s11.fa.gz")):
        h2.add_sequence(seq)
        hu.add_sequence(seq)

    assert abs(1 - h1.cardinality() / 500741) < ERR_RATE
    assert abs(1 - h2.cardinality() / 995845) < ERR_RATE
    assert abs(1 - h1.union(h2) / 995845) < ERR_RATE
    assert abs(1 - h1.similarity(h2) / 0.502783) < ERR_RATE
    assert abs(1 - h1.containment(h2) / 1.0) < ERR_RATE
    assert abs(1 - h2.containment(h1) / 0.502783) < ERR_RATE
    assert abs(1 - h1.intersection(h2) / 500838) < ERR_RATE

    h1.merge(h2)
    assert abs(1 - hu.similarity(h1)) < ERR_RATE
    assert abs(1 - hu.containment(h1)) < ERR_RATE
    assert abs(1 - h1.containment(hu)) < ERR_RATE
    assert abs(1 - h1.intersection(hu) / 995845) < ERR_RATE


def test_hll_save_load_roundtrip(tmp_path):
    "Rust save_load_hll: binary format roundtrips registers exactly."
    hll = HLL(ERR_RATE, 1)
    hll.add_many(np.arange(1, 5000, dtype=np.uint64))
    path = str(tmp_path / "x.hll")
    hll.save(path)
    back = HLL.load(path)
    assert (back.registers == hll.registers).all()
    assert back.ksize == 1
    assert back.p == hll.p
    assert back.cardinality() == hll.cardinality()
    # buffer roundtrip too
    b2 = HLL.from_buffer(hll.to_bytes())
    assert (b2.registers == hll.registers).all()


def test_hll_update_minhash_and_matches():
    mh = MinHash(0, KSIZE, scaled=1)
    for _, seq in iter_records_bytes(utils_test_data("ecoli.genes.fna")):
        mh.add_sequence(seq, True)

    hll = HLL(ERR_RATE, KSIZE)
    hll.update(mh)
    assert abs(1 - hll.cardinality() / len(mh)) < ERR_RATE

    # matches: intersection of the hll with the mh's own hash set
    m = hll.matches(mh)
    assert abs(1 - m / len(mh)) < 2 * ERR_RATE


def test_hll_api_guards():
    hll = HLL(ERR_RATE, KSIZE)
    with pytest.raises(TypeError):
        hll.update(42)
    with pytest.raises(TypeError):
        hll.similarity("x")
    with pytest.raises(ValueError):
        hll.add_kmer("ACG")  # wrong length
    with pytest.raises(NotImplementedError):
        hll.get(123)
    with pytest.raises(ValueError):
        HLL(0.5, KSIZE)  # p < 4
    other = HLL(0.3, KSIZE)  # different p
    with pytest.raises(ValueError):
        hll.update(other)
    with pytest.raises(ValueError):
        hll.add_sequence("ACGTNACGTNACGTNACGTNACGTN")  # invalid, no force
    hll.add_sequence("ACGTNACGTNACGTNACGTNACGTN", force=True)
