"""asv-style microbenchmark suite (parity: reference
`benchmarks/benchmarks.py:36-230` and the Rust criterion benches in
`src/core/benches/`). Runs standalone too: `python benchmarks/benchmarks.py`
prints per-benchmark timings.

Device-path benchmarks select the accelerator when present; set
SOURMASH_PLATFORM=cpu to pin to host.
"""

import random
import time

import numpy as np

from sourmash_tpu import MinHash
from sourmash_tpu.signature import SourmashSignature


RANDOM_SEQ = "".join(random.Random(1).choices("ACGT", k=500))
RANDOM_PROT = "".join(random.Random(2).choices("ACDEFGHIKLMNPQRSTVWY", k=500))


class TimeMinHashSuite:
    def setup(self):
        self.mh = MinHash(500, 21, track_abundance=False)
        self.protein_mh = MinHash(500, 7, is_protein=True, track_abundance=False)
        self.sequences = [RANDOM_SEQ] * 10
        self.protein_sequences = [RANDOM_PROT] * 10

        self.populated_mh = MinHash(500, 21, track_abundance=False)
        for seq in self.sequences:
            self.populated_mh.add_sequence(seq)

    def time_add_sequence(self):
        mh = self.mh
        for seq in self.sequences:
            mh.add_sequence(seq)

    def time_add_protein(self):
        mh = self.protein_mh
        for seq in self.protein_sequences:
            mh.add_protein(seq)

    def time_get_mins(self):
        mh = self.populated_mh
        for _ in range(500):
            mh.get_mins()

    def time_add_hash(self):
        mh = self.mh
        for i in range(1000):
            mh.add_hash(i)

    def time_add_many(self):
        mh = self.mh
        mh.add_many(list(range(1000)))

    def time_similarity(self):
        mh = self.mh
        other_mh = self.populated_mh
        for _ in range(500):
            mh.similarity(other_mh)

    def time_count_common(self):
        mh = self.mh
        other_mh = self.populated_mh
        for _ in range(500):
            mh.count_common(other_mh)

    def time_merge(self):
        mh = self.mh.copy()
        other_mh = self.populated_mh
        for _ in range(500):
            mh.merge(other_mh)

    def time_copy(self):
        mh = self.populated_mh
        for _ in range(500):
            mh.copy()


class TimeMinAbundanceSuite(TimeMinHashSuite):
    def setup(self):
        TimeMinHashSuite.setup(self)
        self.mh = MinHash(500, 21, track_abundance=True)
        self.protein_mh = MinHash(500, 7, is_protein=True, track_abundance=True)

        self.populated_mh = MinHash(500, 21, track_abundance=True)
        for seq in self.sequences:
            self.populated_mh.add_sequence(seq)

    def time_get_mins_abundance(self):
        mh = self.populated_mh
        for _ in range(500):
            mh.hashes

    def time_set_abundances(self):
        mh = self.mh
        mins = self.populated_mh.hashes
        for _ in range(500):
            mh.set_abundances(mins)


class TimeSketchKernelSuite:
    "Device sketch-kernel throughput (replaces Rust compute benches)."

    def setup(self):
        from sourmash_tpu.ops import sketch as _sk

        self._sk = _sk
        rng = np.random.default_rng(0)
        self.seq = bytes(rng.choice(list(b"ACGT"), size=1 << 20).astype(np.uint8))

    def time_seq_chunks_to_hashes(self):
        self._sk.seq_chunks_to_hashes(self.seq, 31, int(2**64 // 1000))


class TimeCompareSuite:
    "All-pairs device comparison (replaces minhash intersection benches)."

    def setup(self):
        rng = np.random.default_rng(1)
        self.sigs = []
        for i in range(16):
            mh = MinHash(0, 31, scaled=1000)
            mh.add_many(rng.integers(0, 2**61, size=2000, dtype=np.uint64))
            self.sigs.append(SourmashSignature(mh, name=f"s{i}"))

    def time_compare_all_pairs(self):
        from sourmash_tpu.compare import compare_all_pairs

        compare_all_pairs(self.sigs, ignore_abundance=True)


class TimeGatherSuite:
    def setup(self):
        rng = np.random.default_rng(2)
        pool = rng.integers(0, 2**61, size=20000, dtype=np.uint64)
        self.sigs = []
        for i in range(8):
            mh = MinHash(0, 31, scaled=1000)
            mh.add_many(rng.choice(pool, size=4000, replace=False))
            self.sigs.append(SourmashSignature(mh, name=f"g{i}"))
        qmh = MinHash(0, 31, scaled=1000)
        qmh.add_many(pool[:8000])
        self.query = SourmashSignature(qmh, name="q")

    def time_counter_gather(self):
        from sourmash_tpu.index.flat import FlatIndex

        idx = FlatIndex(self.sigs)
        cg = idx.counter_gather(self.query, 0)
        cur = self.query.minhash.to_mutable()
        while True:
            res = cg.peek(cur)
            if not res:
                break
            cg.consume(res[1])
            cur.remove_many(res[1].hashes)


def _run_all():
    for suite_cls in [
        TimeMinHashSuite,
        TimeMinAbundanceSuite,
        TimeSketchKernelSuite,
        TimeCompareSuite,
        TimeGatherSuite,
    ]:
        suite = suite_cls()
        suite.setup()
        for name in sorted(dir(suite)):
            if not name.startswith("time_"):
                continue
            fn = getattr(suite, name)
            fn()  # warm
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            print(f"{suite_cls.__name__}.{name}: {dt * 1000:.1f} ms")


if __name__ == "__main__":
    _run_all()
