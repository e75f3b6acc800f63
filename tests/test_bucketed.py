"""Exactness tests for the bucketed dense-compare engine (ops/bucketed.py)
against a brute-force numpy oracle, including Poisson-tail spills (forced
with tiny bucket counts), the 2**64-1 PAD collision, per-pair cutoffs,
empty rows, and membership-matrix bits."""

import numpy as np
import pytest

from sourmash_tpu.ops.bucketed import (
    MAX_U64,
    choose_buckets,
    membership_matrix,
    pack_query_bucketed,
    pack_rows_bucketed,
    pairwise_counts_bucketed,
    query_counts_bucketed,
    query_cutoff_counts_bucketed,
)

RNG = np.random.default_rng(7)


def rand_set(n, lo=0, hi=2**63, rng=RNG):
    return np.unique(rng.integers(lo, hi, size=n, dtype=np.uint64))


def oracle_isect(a, b):
    return len(np.intersect1d(a, b))


def overlapping_rows(n_rows, size, shared_frac=0.3, rng=RNG):
    "Rows sharing a common pool so intersections are nonzero."
    pool = rand_set(int(size * n_rows * 0.4), rng=rng)
    rows = []
    for _ in range(n_rows):
        own = rand_set(size, rng=rng)
        pick = rng.choice(pool, size=int(size * shared_frac), replace=False)
        rows.append(np.unique(np.concatenate([own, pick])))
    return rows


def test_query_counts_exact():
    rows = overlapping_rows(23, 400)
    q = np.unique(np.concatenate([rows[3][:200], rand_set(300)]))
    B = choose_buckets(512)
    bank = pack_rows_bucketed(rows, B)
    counts = query_counts_bucketed(q, bank)
    expect = [oracle_isect(q, m) for m in rows]
    assert counts.tolist() == expect


def test_query_counts_with_forced_spills():
    # B=128 with 400-hash rows => Poisson(3.1) load, many buckets over d=8
    rows = overlapping_rows(17, 400)
    q = np.unique(np.concatenate([rows[5][:150], rand_set(200)]))
    bank = pack_rows_bucketed(rows, 128)
    assert bank.n_spilled > 0, "test should exercise the spill path"
    counts = query_counts_bucketed(q, bank)
    expect = [oracle_isect(q, m) for m in rows]
    assert counts.tolist() == expect


def test_max_u64_hash_is_exact():
    a = np.unique(np.array([1, 5, MAX_U64, 2**63], dtype=np.uint64))
    b = np.unique(np.array([5, MAX_U64, 7], dtype=np.uint64))
    bank = pack_rows_bucketed([a, b], 128)
    q = a
    counts = query_counts_bucketed(q, bank)
    assert counts.tolist() == [4, 2]


def test_empty_rows_and_query():
    rows = [rand_set(100), np.zeros(0, dtype=np.uint64), rand_set(50)]
    bank = pack_rows_bucketed(rows, 128)
    counts = query_counts_bucketed(rows[0], bank)
    assert counts[1] == 0
    assert counts[0] == len(rows[0])
    counts = query_counts_bucketed(np.zeros(0, dtype=np.uint64), bank)
    assert counts.tolist() == [0, 0, 0]


def test_large_query_small_bank():
    "dq adapts: a 20k-hash query against 200-hash rows (B=128, load ~156)."
    rows = [rand_set(200, hi=2**40) for _ in range(5)]
    q = np.unique(np.concatenate([rand_set(20000, hi=2**40)] + [rows[2][:100]]))
    bank = pack_rows_bucketed(rows, 128)
    counts = query_counts_bucketed(q, bank)
    expect = [oracle_isect(q, m) for m in rows]
    assert counts.tolist() == expect


def test_cutoff_counts_exact():
    rows = overlapping_rows(11, 300)
    q = np.unique(np.concatenate([rows[0][:100], rand_set(200)]))
    bank = pack_rows_bucketed(rows, 128)  # force spills too
    cuts = np.array(
        [2**61, 2**62, 2**63, int(MAX_U64), 2**60] * 3 + [2**59], dtype=np.uint64
    )[: len(rows)]
    counts = query_cutoff_counts_bucketed(q, bank, cuts)
    expect = [
        oracle_isect(q[q <= c], m[m <= c]) for c, m in zip(cuts, rows)
    ]
    assert counts.tolist() == expect


def test_cutoff_max_with_max_hash():
    a = np.array([3, MAX_U64], dtype=np.uint64)
    b = np.array([3, 9, MAX_U64], dtype=np.uint64)
    bank = pack_rows_bucketed([b], 128)
    cuts = np.array([int(MAX_U64)], dtype=np.uint64)
    assert query_cutoff_counts_bucketed(a, bank, cuts).tolist() == [2]
    cuts = np.array([10], dtype=np.uint64)
    assert query_cutoff_counts_bucketed(a, bank, cuts).tolist() == [1]


@pytest.mark.parametrize("n_rows,size", [(10, 200), (33, 700), (8, 5)])
def test_pairwise_exact(n_rows, size):
    rows = overlapping_rows(n_rows, size)
    out = pairwise_counts_bucketed(rows)
    for i in range(n_rows):
        for j in range(n_rows):
            assert out[i, j] == oracle_isect(rows[i], rows[j]), (i, j)


def test_pairwise_with_spills_and_max():
    "Spill correction via the real helper, incl. values spilled by BOTH rows."
    from sourmash_tpu.ops import bucketed as bk
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    rows = overlapping_rows(9, 400, rng=rng)
    rows[2] = np.unique(np.concatenate([rows[2], [MAX_U64]]))
    rows[5] = np.unique(np.concatenate([rows[5], [MAX_U64]]))
    # force a value to spill in BOTH rows 0 and 1: 9 hashes in one bucket
    # of B=128 (slots d=8 -> the largest spills), sharing the largest value
    shared = (np.arange(9, dtype=np.uint64) << np.uint64(32)) * np.uint64(128)
    shared = shared + np.uint64(7)  # same bucket (low bits = 7)
    rows[0] = np.unique(np.concatenate([rows[0], shared]))
    rows[1] = np.unique(np.concatenate([rows[1], shared]))

    bank = bk.pack_rows_bucketed(rows, 128)
    assert bank.n_spilled > 0
    shared_spill = set(bank.spills[0]) & set(bank.spills[1])
    assert shared_spill, "test should exercise the double-spill path"

    outs = []
    block = 8
    for i in range(0, bank.hi.shape[0], block):
        Qhi = jax.lax.dynamic_slice_in_dim(bank.hi, i, block, 0)
        Qlo = jax.lax.dynamic_slice_in_dim(bank.lo, i, block, 0)
        Qcnt = jax.lax.dynamic_slice_in_dim(bank.cnt, i, block, 0)
        outs.append(bk._counts_block(Qhi, Qlo, Qcnt, bank.hi, bank.lo, bank.cnt))
    out = np.asarray(jnp.concatenate(outs, axis=0))[:9, :9].astype(np.int64)
    bk._pairwise_spill_correction(out, rows, bank)
    for i in range(9):
        for j in range(9):
            assert out[i, j] == oracle_isect(rows[i], rows[j]), (i, j)


def test_pairwise_public_wrapper_max_u64():
    rows = [
        np.array([1, 2, MAX_U64], dtype=np.uint64),
        np.array([2, MAX_U64], dtype=np.uint64),
        np.array([7], dtype=np.uint64),
    ]
    out = pairwise_counts_bucketed(rows)
    expect = [[3, 2, 0], [2, 2, 0], [0, 0, 1]]
    assert out.tolist() == expect


def test_membership_matrix_bits():
    rows = overlapping_rows(13, 300)
    q = np.unique(np.concatenate([rows[1][:150], rand_set(150)]))
    bank = pack_rows_bucketed(rows, 128)  # spills likely
    ids = [1, 4, 7]
    M, q_packed = membership_matrix(q, bank, ids)
    M = np.asarray(M)
    qhi, qlo, qcnt, dq, tail = q_packed
    # reconstruct hash value at each set bit and check true membership;
    # and per-row popcount == true intersection size
    qhi_h = np.asarray(qhi, dtype=np.uint64)
    qlo_h = np.asarray(qlo, dtype=np.uint64)
    vals = (qhi_h << np.uint64(32)) | qlo_h
    for r, i in enumerate(ids):
        got = np.sort(vals[M[r]])
        expect = np.intersect1d(q, rows[i])
        assert got.tolist() == expect.tolist(), i


# -- property-based: random sets through the full public wrappers ----------

try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


if HAVE_HYP:

    @st.composite
    def hash_sets(draw, max_rows=6, max_len=60):
        n = draw(st.integers(1, max_rows))
        rows = []
        for _ in range(n):
            vals = draw(
                st.lists(
                    st.integers(0, 2**64 - 1), min_size=0, max_size=max_len
                )
            )
            rows.append(np.unique(np.array(vals, dtype=np.uint64)))
        return rows

    @settings(deadline=None, max_examples=30)
    @given(hash_sets())
    def test_hypothesis_pairwise_and_query(rows):
        out = pairwise_counts_bucketed(rows)
        for i in range(len(rows)):
            for j in range(len(rows)):
                assert out[i, j] == oracle_isect(rows[i], rows[j])
        q = rows[0]
        bank = pack_rows_bucketed(rows, 128)
        counts = query_counts_bucketed(q, bank)
        assert counts.tolist() == [oracle_isect(q, m) for m in rows]

    @settings(deadline=None, max_examples=20)
    @given(hash_sets(max_rows=4), st.integers(0, 2**64 - 1))
    def test_hypothesis_cutoff(rows, cut):
        cuts = np.full(len(rows), cut, dtype=np.uint64)
        bank = pack_rows_bucketed(rows, 128)
        q = rows[-1]
        counts = query_cutoff_counts_bucketed(q, bank, cuts)
        expect = [
            oracle_isect(q[q <= np.uint64(cut)], m[m <= np.uint64(cut)])
            for m in rows
        ]
        assert counts.tolist() == expect


def test_pairwise_weighted_products_exact():
    "Device abundance-product matrix == host merge-join, incl 2**64-1."
    from sourmash_tpu.ops.bucketed import pairwise_weighted_products

    rng = np.random.default_rng(3)
    n = 12
    mins, abunds = [], []
    for i in range(n):
        m = np.unique(rng.integers(1, 2**63, size=rng.integers(5, 400), dtype=np.uint64))
        if i == 4:
            m = np.unique(np.concatenate([m, [np.uint64(2**64 - 1)]]))
        a = rng.integers(1, 1000, size=len(m)).astype(np.int64)
        mins.append(m)
        abunds.append(a)
    # force dataset 7 to share lots with 4
    mins[7] = np.unique(np.concatenate([mins[4][::2], mins[7]]))
    abunds[7] = rng.integers(1, 1000, size=len(mins[7])).astype(np.int64)

    got = pairwise_weighted_products(mins, abunds)
    for i in range(n):
        for j in range(n):
            idx = np.searchsorted(mins[j], mins[i])
            idx_c = np.minimum(idx, len(mins[j]) - 1)
            hit = mins[j][idx_c] == mins[i]
            expect = int(
                np.sum(abunds[i][hit] * abunds[j][idx_c[hit]], dtype=np.int64)
            )
            assert got[i, j] == expect, (i, j, got[i, j], expect)


def test_compare_angular_batched_matches_host():
    "Batched angular compare == per-pair angular_similarity."
    from sourmash_tpu import MinHash, SourmashSignature
    from sourmash_tpu.compare import compare_serial

    rng = np.random.default_rng(8)
    sigs = []
    for i in range(8):
        mh = MinHash(0, 31, scaled=1000, track_abundance=True)
        m = np.unique(
            rng.integers(1, 2**64 // 1000, size=300, dtype=np.uint64)
        )
        mh.set_abundances(
            dict(zip(m.tolist(), rng.integers(1, 50, size=len(m)).tolist()))
        )
        sigs.append(SourmashSignature(mh, name=f"s{i}"))

    got = compare_serial(sigs, ignore_abundance=False)
    for i in range(8):
        for j in range(8):
            if i == j:
                continue
            expect = sigs[i].minhash.angular_similarity(sigs[j].minhash)
            assert got[i, j] == expect, (i, j, got[i, j], expect)


def test_counts_for_banks_batch_matches_single():
    """Batched multi-query counting (one _counts_block pass per query
    block) equals per-query counts, including subject spills and the
    2**64-1 tail hash."""
    from sourmash_tpu.ops import index_ops

    rng = np.random.default_rng(9)
    mins_list = [
        np.unique(rng.integers(1, 2**63, size=n, dtype=np.uint64))
        for n in (50, 400, 3, 1000, 256)
    ]
    # force a spill + the all-ones hash into one dataset
    mins_list[1] = np.unique(
        np.concatenate(
            [mins_list[1],
             np.arange(1, 33, dtype=np.uint64) * np.uint64(1 << 20),
             [np.uint64(2**64 - 1)]]
        )
    )
    banks = index_ops.build_banks(mins_list)

    queries = [
        np.unique(np.concatenate([mins_list[0][:20], mins_list[1][:37]])),
        np.unique(
            np.concatenate(
                [mins_list[3][100:300], [np.uint64(2**64 - 1)]]
            )
        ),
        np.arange(10**6, 10**6 + 64, dtype=np.uint64),  # zero-match
    ]
    got = index_ops.counts_for_banks_batch(banks, queries, len(mins_list),
                                           block=2)
    for qi, q in enumerate(queries):
        want = index_ops.counts_for_banks(banks, q, len(mins_list))
        assert np.array_equal(got[qi], want), qi


def test_warm_gather_counts_cache_hits():
    "warm_gather_counts rows equal what counter_gather would compute."
    from sourmash_tpu import MinHash, SourmashSignature
    from sourmash_tpu.index.flat import FlatIndex

    rng = np.random.default_rng(12)
    genomes = [
        np.unique(rng.integers(1, 2**40, size=200, dtype=np.uint64))
        for _ in range(10)
    ]
    sigs = []
    for i, g in enumerate(genomes):
        mh = MinHash(0, 31, scaled=100)
        mh.add_many(g % np.uint64(mh._max_hash))
        sigs.append(SourmashSignature(mh, name=f"g{i}").to_frozen())

    def query(i, j):
        mh = MinHash(0, 31, scaled=100)
        mh.add_many(
            np.unique(np.concatenate([s.minhash.mins_array()[:80]
                                      for s in (sigs[i], sigs[j])]))
        )
        return SourmashSignature(mh, name=f"q{i}{j}").to_frozen()

    queries = [query(0, 3), query(2, 7)]

    cold = FlatIndex(sigs)
    cold_counts = [
        cold.counter_gather(q, threshold_bp=0).counts.copy() for q in queries
    ]

    warm = FlatIndex(sigs)
    warm.warm_gather_counts([q.minhash for q in queries])
    assert len(warm._counts_cache) == 2
    warm_counts = [
        warm.counter_gather(q, threshold_bp=0).counts.copy() for q in queries
    ]
    assert not warm._counts_cache  # popped on hit
    for a, b in zip(cold_counts, warm_counts):
        assert np.array_equal(a, b)


def test_native_pack_matches_numpy(monkeypatch):
    """The thread-parallel native pack (native/pack.cpp) is value-identical
    to the numpy argsort pack: planes, counts, and per-row spill lists —
    including forced Poisson overflow (tiny B), the 2**64-1 PAD sentinel,
    and empty rows."""
    from sourmash_tpu import native
    from sourmash_tpu.ops import bucketed

    if not native.available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(17)
    rows = overlapping_rows(13, 400, rng=rng)
    rows[3] = np.zeros(0, dtype=np.uint64)  # empty row
    rows[5] = np.unique(
        np.concatenate([rows[5], np.array([MAX_U64], dtype=np.uint64)])
    )
    B = 64  # tiny: forces many spills past d=8

    nat = pack_rows_bucketed(rows, B, device=False)
    monkeypatch.setattr(native, "available", lambda: False)
    ref = pack_rows_bucketed(rows, B, device=False)

    assert np.array_equal(np.asarray(nat.hi), np.asarray(ref.hi))
    assert np.array_equal(np.asarray(nat.lo), np.asarray(ref.lo))
    assert np.array_equal(np.asarray(nat.cnt), np.asarray(ref.cnt))
    assert nat.n_spilled == ref.n_spilled and nat.n_spilled > 0
    assert len(nat.spills) == len(ref.spills)
    for a, b in zip(nat.spills, ref.spills):
        assert np.array_equal(a, b)
    assert (nat.n, nat.d, nat.B) == (ref.n, ref.d, ref.B)


def test_native_pack_used_by_default():
    "When the native lib is present, pack_rows_bucketed routes through it."
    from sourmash_tpu import native
    from sourmash_tpu.ops import bucketed

    if not native.available():
        pytest.skip("native library unavailable")
    out = bucketed._pack_rows_native(
        [rand_set(100), rand_set(50)], 2, 8, 128, 8, False
    )
    assert out is not None and out.n == 2


def test_huge_query_vs_tiny_bank_pad_correction_exact():
    """Regression: a metagenome-scale query packed against a SMALL-B bank
    (tiny sketches -> B=128) gives query bucket loads (dq) in the
    hundreds — past bf16's 256-integer exactness, which silently broke
    the pad-count correction (counts were off by thousands). The
    correction must be exact at any dq."""
    rng = np.random.default_rng(99)
    rows = [rand_set(45, rng=rng) for _ in range(40)]
    B = choose_buckets(max(len(r) for r in rows))
    assert B <= 256  # the small length class that triggers the bug
    q = np.unique(
        np.concatenate(rows[:5] + [rand_set(80000, rng=rng)])
    )
    bank = pack_rows_bucketed(rows, B)
    counts = query_counts_bucketed(q, bank)
    for i in range(len(rows)):
        assert counts[i] == oracle_isect(q, rows[i]), (
            i, counts[i], oracle_isect(q, rows[i]),
        )
    cuts = np.full(len(rows), MAX_U64, dtype=np.uint64)
    ccounts = query_cutoff_counts_bucketed(q, bank, cuts)
    for i in range(len(rows)):
        assert ccounts[i] == oracle_isect(q, rows[i])


def test_warm_gather_counts_adaptive_block(monkeypatch):
    """warm_gather_counts picks its query block from bank residency
    (streamed banks amortize a full plane stream per block) and still
    produces exact counts — here with the planes forced host-resident."""
    from sourmash_tpu import MinHash, SourmashSignature
    from sourmash_tpu.index.flat import FlatIndex
    from sourmash_tpu.ops import index_ops

    monkeypatch.setenv("SOURMASH_TPU_HBM_BUDGET_BYTES", "1")
    rng = np.random.default_rng(21)
    genomes = [rand_set(150, rng=rng) for _ in range(30)]
    sigs = []
    for i, g in enumerate(genomes):
        mh = MinHash(0, 31, scaled=1)
        mh.add_many(g)
        sigs.append(SourmashSignature(mh, name=f"g{i}").to_frozen())
    queries = []
    for i in range(5):
        mh = MinHash(0, 31, scaled=1)
        mh.add_many(np.unique(np.concatenate([genomes[i], genomes[i + 7]])))
        queries.append(mh)

    seen = {}
    orig = index_ops.counts_for_banks_batch

    def spy(banks, qs, n, block=8):
        seen["block"] = block
        return orig(banks, qs, n, block=block)

    monkeypatch.setattr(index_ops, "counts_for_banks_batch", spy)

    fi = FlatIndex(sigs)
    fi.warm_gather_counts(queries)  # block=None -> adaptive
    assert seen.get("block", 0) > 8  # streamed banks choose a big block
    # exactness through the cache
    for i, q in enumerate(queries):
        c = fi.counter_gather(
            SourmashSignature(q, name=f"q{i}").to_frozen(), 0
        )
        for j, g in enumerate(genomes):
            want = len(np.intersect1d(q.mins_array(), g, assume_unique=True))
            got = int(c.counts[j]) if want else 0
            if want:
                assert got == want, (i, j, got, want)


def test_device_query_pack_matches_host():
    """pack_query_block_device (one raw-limb upload, per-B device packs)
    is value-identical to the host pack_query_bucketed across bucket
    counts, including the 2^64-1 tail exclusion and int32 loads."""
    import numpy as np

    from sourmash_tpu.ops.bucketed import (
        pack_query_block_device,
        pack_query_bucketed,
    )

    rng = np.random.default_rng(9)
    q = np.unique(rng.integers(1, 2**64 - 1, size=20000, dtype=np.uint64))
    q = np.unique(np.concatenate([q, [np.uint64(2**64 - 1)]]))
    raw = None
    for B in (128, 512, 2048):
        hhi, hlo, hcnt, hdq, _tail = pack_query_bucketed(q, B)
        Qhi, Qlo, Qcnt, ddq, raw = pack_query_block_device([q], B, raw)
        # device depth quantizes to multiples of 8 (host pack is pow2);
        # both must cover the max load, and values must agree on the
        # occupied slots
        m = min(ddq, hdq)
        assert ddq >= int(np.asarray(hcnt).max())
        assert np.array_equal(np.asarray(Qhi)[0, :m], np.asarray(hhi)[:m])
        assert np.array_equal(np.asarray(Qlo)[0, :m], np.asarray(hlo)[:m])
        assert np.array_equal(np.asarray(Qcnt)[0], np.asarray(hcnt))
        # rows past the host depth (if any) must be pure PAD
        if ddq > hdq:
            assert np.all(np.asarray(Qhi)[0, hdq:] == 0xFFFFFFFF)
