"""Property-based MinHash tests (reference pattern:
`tests/test__minhash_hypothesis.py` — same properties, original code)."""

from hypothesis import given, settings, strategies as st
import numpy as np

from sourmash_tpu import MinHash
from sourmash_tpu.minhash import (
    _get_max_hash_for_scaled,
    _get_scaled_for_max_hash,
)

hashes = st.lists(
    st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=200
)


@given(hashes, st.integers(min_value=10, max_value=1000))
@settings(deadline=None, max_examples=30)
def test_add_many_is_sorted_unique(hs, num):
    mh = MinHash(num, 21)
    mh.add_many(hs)
    mins = mh.mins_array().tolist()
    assert mins == sorted(set(mins))
    # num-trim: keep the smallest `num` distinct hashes
    assert mins == sorted(set(hs))[:num]


@given(hashes)
@settings(deadline=None, max_examples=30)
def test_scaled_keeps_only_below_max_hash(hs):
    scaled = 100
    mh = MinHash(0, 21, scaled=scaled)
    mh.add_many(hs)
    cutoff = _get_max_hash_for_scaled(scaled)
    expected = sorted({h for h in hs if h <= cutoff})
    assert mh.mins_array().tolist() == expected


@given(st.integers(min_value=1, max_value=2**32))
@settings(deadline=None, max_examples=50)
def test_scaled_max_hash_roundtrip(scaled):
    mh = _get_max_hash_for_scaled(scaled)
    back = _get_scaled_for_max_hash(mh)
    # the roundtrip is within 1 part in 2^20 (reference uses trunc one way,
    # round the other)
    assert abs(back - scaled) <= max(1, scaled >> 20)


@given(hashes, hashes)
@settings(deadline=None, max_examples=30)
def test_count_common_symmetric(a, b):
    m1 = MinHash(0, 21, scaled=1)
    m2 = MinHash(0, 21, scaled=1)
    m1.add_many(a)
    m2.add_many(b)
    assert m1.count_common(m2) == m2.count_common(m1)
    assert m1.count_common(m2) == len(set(a) & set(b))


@given(hashes, hashes)
@settings(deadline=None, max_examples=30)
def test_merge_is_union(a, b):
    m1 = MinHash(0, 21, scaled=1)
    m2 = MinHash(0, 21, scaled=1)
    m1.add_many(a)
    m2.add_many(b)
    m1.merge(m2)
    assert set(m1.hashes) == set(a) | set(b)


@given(hashes, st.integers(min_value=100, max_value=10000))
@settings(deadline=None, max_examples=30)
def test_downsample_scaled_monotone(hs, scaled2):
    m = MinHash(0, 21, scaled=100)
    m.add_many(hs)
    if scaled2 < 100:
        return
    d = m.downsample(scaled=scaled2)
    assert set(d.hashes) <= set(m.hashes)
    cutoff = _get_max_hash_for_scaled(scaled2)
    assert all(h <= cutoff for h in d.hashes)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**64 - 1),
            st.integers(min_value=1, max_value=100),
        ),
        max_size=100,
    )
)
@settings(deadline=None, max_examples=30)
def test_abundance_accumulates(pairs):
    m = MinHash(0, 21, scaled=1, track_abundance=True)
    expect = {}
    for h, c in pairs:
        for _ in range(c):
            m.add_hash(h)
        expect[h] = expect.get(h, 0) + c
    assert dict(m.hashes) == expect
