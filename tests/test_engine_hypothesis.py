"""Property-based tests over the DEVICE engine (VERDICT r4 item 8;
reference pattern: `tests/test__minhash_hypothesis.py` + the proptest suite
in the Rust core — here the properties cover the TPU-native surfaces the
reference doesn't have: the bucketed pack -> count -> schedule pipeline
(`ops/bucketed.py`, `index/flat.py`) and host==device equality through
merge/downsample/inflate/intersection chains).

Runs on the CPU jax backend (tests/conftest.py forces it)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from sourmash_tpu import MinHash, SourmashSignature
from sourmash_tpu.index.flat import FlatIndex
from sourmash_tpu.search import GatherDatabases

MAXH = 2**64 - 1

# sorted distinct u64 arrays, with the extremes reachable (0 is illegal as a
# minhash value is fine to include; 2**64-1 is the PAD-adjacent edge case)
hash_arrays = st.lists(
    st.integers(min_value=1, max_value=MAXH), min_size=0, max_size=120
).map(lambda xs: np.unique(np.asarray(xs, dtype=np.uint64)))

small_collections = st.lists(hash_arrays, min_size=1, max_size=12)


def _mh(hs, scaled=1, track_abundance=False):
    mh = MinHash(0, 31, scaled=scaled, track_abundance=track_abundance)
    if len(hs):
        mh.add_many(hs)
    return mh


# ---------------------------------------------------------------------------
# pack -> count invariants
# ---------------------------------------------------------------------------


@given(small_collections, hash_arrays)
@settings(deadline=None, max_examples=25)
def test_bucketed_counts_match_intersect1d(collection, query):
    """Device bucketed counts == np.intersect1d sizes for arbitrary
    collections and queries, including empty rows, the 2**64-1 hash, and
    skewed row lengths."""
    from sourmash_tpu.ops.index_ops import build_banks, counts_for_banks

    banks = build_banks(collection)
    counts = counts_for_banks(banks, query, n_datasets=len(collection))
    for i, row in enumerate(collection):
        want = len(np.intersect1d(query, row, assume_unique=True))
        assert counts[i] == want, (i, counts[i], want)


@given(small_collections, hash_arrays)
@settings(deadline=None, max_examples=15)
def test_membership_matrix_consistent_with_counts(collection, query):
    """Packed membership bitsets (the schedule-scan input) agree with the
    counts pass: popcount of each candidate's row over the alive bitset ==
    its overlap count."""
    if not len(query):
        return
    sigs = [
        SourmashSignature(_mh(g), name=f"g{i}")
        for i, g in enumerate(collection)
    ]
    fi = FlatIndex(sigs)
    query_sig = SourmashSignature(_mh(query), name="q")
    c = fi.counter_gather(query_sig, threshold_bp=0)
    matched = np.nonzero(c.counts)[0]
    if not len(matched):
        return
    W = -(-len(c._q_mins) // 32)
    M = c._membership_for_ids(W, matched)
    pops = np.unpackbits(
        M.view(np.uint8), axis=1, bitorder="little"
    ).sum(axis=1)
    for r, ds in enumerate(matched):
        assert pops[r] == c.counts[ds], (ds, pops[r], c.counts[ds])


@given(small_collections, hash_arrays)
@settings(deadline=None, max_examples=15)
def test_scheduled_gather_matches_host_rounds(collection, query):
    """Full pipeline property: the device round schedule replayed through
    GatherDatabases equals plain host CounterGather rounds for arbitrary
    inputs (threshold 0: every last overlap hash drains)."""
    if not len(query):
        return
    sigs = [
        SourmashSignature(_mh(g), name=f"g{i}").to_frozen()
        for i, g in enumerate(collection)
    ]
    qmh = _mh(query)
    query_sig = SourmashSignature(qmh, name="meta").to_frozen()

    def rounds(schedule):
        fi = FlatIndex(sigs)
        c = fi.counter_gather(query_sig, threshold_bp=0)
        if schedule:
            c.enable_device_schedule()
        gd = GatherDatabases(query_sig, [c], threshold_bp=0)
        return [(r.match.name, r.intersect_bp) for r in gd]

    assert rounds(True) == rounds(False)


# ---------------------------------------------------------------------------
# merge / downsample / inflate / intersection chains (host semantic model
# vs the reference's sorted-merge semantics)
# ---------------------------------------------------------------------------


@given(hash_arrays, hash_arrays, st.integers(min_value=1, max_value=1000))
@settings(deadline=None, max_examples=40)
def test_merge_downsample_commute(a, b, scaled):
    """downsample(merge(a, b)) == merge(downsample(a), downsample(b)) —
    the FracMinHash closure property the whole engine relies on."""
    m1 = _mh(a) + _mh(b)
    d1 = m1.downsample(scaled=scaled)
    d2 = _mh(a).downsample(scaled=scaled) + _mh(b).downsample(scaled=scaled)
    assert d1.mins_array().tolist() == d2.mins_array().tolist()
    assert d1.scaled == d2.scaled == scaled


@given(hash_arrays, hash_arrays)
@settings(deadline=None, max_examples=40)
def test_intersection_union_inclusion_exclusion(a, b):
    ma, mb = _mh(a), _mh(b)
    inter = ma.intersection(mb)
    union = ma + mb
    assert len(inter) + len(union) == len(ma) + len(mb)
    got = set(inter.mins_array().tolist())
    assert got == set(np.intersect1d(a, b).tolist())


@given(hash_arrays, st.data())
@settings(deadline=None, max_examples=30)
def test_inflate_roundtrip(a, data):
    """flatten -> inflate from an abundance superset recovers exactly the
    abundances of the surviving hashes (reference inflate semantics,
    `minhash.rs:800-858`)."""
    if not len(a):
        return
    abunds = data.draw(
        st.lists(
            st.integers(min_value=1, max_value=2**31 - 1),
            min_size=len(a),
            max_size=len(a),
        )
    )
    ma = MinHash(0, 31, scaled=1, track_abundance=True)
    ma.set_abundances(dict(zip(a.tolist(), abunds)))
    flat = ma.flatten()
    back = flat.inflate(ma)
    assert back.hashes == ma.hashes


@given(hash_arrays, hash_arrays, st.integers(min_value=2, max_value=64))
@settings(deadline=None, max_examples=30)
def test_count_common_downsample_consistency(a, b, scaled):
    """count_common under downsample_to_common == intersect of the two
    downsampled sets (the comparison contract every search path uses)."""
    ma = _mh(a).downsample(scaled=scaled)
    mb = _mh(b).downsample(scaled=scaled)
    want = len(
        np.intersect1d(ma.mins_array(), mb.mins_array(), assume_unique=True)
    )
    assert ma.count_common(mb) == want
    assert _mh(a).count_common(_mh(b), downsample=True) >= want
