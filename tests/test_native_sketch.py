"""Parity tests for the native C++ sketching hot loop (native/sketch.cpp)
against the numpy oracle, including thread-chunk boundaries, invalid bytes
at window edges, and num-sketch (unfiltered) mode."""

import numpy as np
import pytest

from sourmash_tpu import native
from sourmash_tpu.ops import encodings as enc

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)

RNG = np.random.default_rng(11)
ACGT = np.frombuffer(b"ACGT", dtype=np.uint8)


def oracle(seq, k, seed, mh):
    h, valid = enc.dna_hashes(seq, k, seed)
    return h[valid & (h <= np.uint64(mh))]


@pytest.mark.parametrize("k", [21, 31, 51])
@pytest.mark.parametrize("nthreads", [1, 3, 8])
def test_native_matches_numpy(k, nthreads):
    seq = RNG.choice(ACGT, size=30011)
    mh = (1 << 64) // 50  # dense survivors
    got, fb = native.sketch_hashes(seq, k, 42, mh, n_threads=nthreads)
    assert fb == -1
    assert np.array_equal(got, oracle(seq, k, 42, mh))


def test_thread_boundary_windows_exact():
    "Windows straddling thread chunk edges must not be lost or doubled."
    k = 31
    seq = RNG.choice(ACGT, size=1 << 19)  # big enough for auto-threading
    mh = (1 << 64) // 10
    expect = oracle(seq, k, 42, mh)
    for nt in (1, 2, 5, 16):
        got, _ = native.sketch_hashes(seq, k, 42, mh, n_threads=nt)
        assert np.array_equal(got, expect), nt


def test_invalid_bytes_and_first_bad():
    k = 21
    seq = RNG.choice(ACGT, size=5000)
    for pos in (0, 19, 20, 21, 2500, 4999):
        s2 = seq.copy()
        s2[pos] = ord("N")
        got, fb = native.sketch_hashes(s2, k, 42, (1 << 63), n_threads=2)
        assert fb == pos
        assert np.array_equal(got, oracle(s2, k, 42, 1 << 63)), pos


def test_unfiltered_multiset_order():
    "num-sketch mode: every valid window hash, in window order."
    k = 5
    seq = np.frombuffer(b"ACGTACGTACGTACGT", dtype=np.uint8)
    got, fb = native.sketch_hashes(seq, k, 42, (1 << 64) - 1)
    h, valid = enc.dna_hashes(seq, k, 42)
    assert np.array_equal(got, h[valid])


def test_short_and_empty():
    got, fb = native.sketch_hashes(np.zeros(0, dtype=np.uint8), 21, 42, 1 << 62)
    assert len(got) == 0
    got, fb = native.sketch_hashes(RNG.choice(ACGT, size=20), 21, 42, 1 << 62)
    assert len(got) == 0


def test_native_sketch_md5_matches_hashlib():
    """The native decimal-mins MD5 (native/sigmd5.cpp, clean-room RFC 1321)
    equals the Python join+hashlib digest over adversarial inputs: empty,
    one min, boundary values (0, 2**64-1), long runs crossing many 64-byte
    MD5 blocks, and digit-length variety."""
    import hashlib

    import numpy as np
    import pytest

    from sourmash_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(3)
    cases = [
        (31, np.zeros(0, dtype=np.uint64)),
        (21, np.array([0], dtype=np.uint64)),
        (51, np.array([0xFFFFFFFFFFFFFFFF], dtype=np.uint64)),
        (63, np.array([1, 9, 10, 99, 100, 10**19], dtype=np.uint64)),
        (31, np.sort(rng.integers(0, 2**64 - 1, 5000, dtype=np.uint64))),
        (7, np.sort(rng.integers(0, 1000, 300, dtype=np.uint64))),
    ]
    for ksize, mins in cases:
        ref = hashlib.md5()
        ref.update(str(ksize).encode())
        ref.update("".join(str(int(x)) for x in mins).encode())
        assert native.sketch_md5(ksize, mins) == ref.hexdigest(), (ksize, len(mins))


def test_native_sig_json_scanner_adversarial():
    """The sigjson scanner either extracts arrays exactly or bails (None)
    so the plain json path handles the input — behavior must match plain
    parsing for exotic layouts: swapped field order, names containing
    '"mins":[', floats, nulls, escapes, whitespace."""
    import gzip as _gzip
    import json

    import numpy as np
    import pytest

    from sourmash_tpu import native
    from sourmash_tpu.signature import load_signatures_from_json

    if not native.available():
        pytest.skip("native library unavailable")

    def sig_doc(mins, abunds=None, name="x", swap=False, spaces=False):
        sk = {}
        if swap and abunds is not None:
            sk["abundances"] = abunds
            sk["mins"] = mins
        else:
            sk["mins"] = mins
            if abunds is not None:
                sk["abundances"] = abunds
        sk.update({"ksize": 31, "num": 0, "seed": 42,
                   "max_hash": 18446744073709552, "molecule": "dna"})
        doc = [{"class": "sourmash_signature", "name": name,
                "signatures": [sk]}]
        txt = json.dumps(doc, indent=2 if spaces else None)
        return txt.encode()

    rng = np.random.default_rng(4)
    mins = sorted(int(x) for x in
                  np.unique(rng.integers(1, 10**15, 4000, dtype=np.uint64)))
    ab = [int(x) for x in rng.integers(1, 100, len(mins))]

    # pad docs above the fast-path size threshold with harmless content
    def load(buf):
        return [
            (list(s.minhash.hashes.keys()), s.name)
            for s in load_signatures_from_json(buf, ignore_md5sum=True)
        ]

    plain = sig_doc(mins)
    assert native.extract_sig_arrays(plain) is not None
    for variant in (
        sig_doc(mins),                              # flat
        sig_doc(mins, ab),                          # abund
        sig_doc(mins, ab, swap=True),               # abundances first
        sig_doc(mins, ab, spaces=True),             # whitespace everywhere
        sig_doc(mins, name='trap \\" "mins":[1,2]'),  # key text inside a string
    ):
        got = load(variant)
        want = [
            ([int(x) for x in mins], json.loads(variant)[0]["name"])
        ]
        assert got[0][0] == want[0][0], "mins mismatch"

    # bail cases: scanner returns None, plain path still loads
    floats = sig_doc(mins).replace(b'"mins": [', b'"mins": [0.5, ', 1) \
        if b'"mins": [' in sig_doc(mins) else \
        sig_doc(mins).replace(b'"mins":[', b'"mins":[0.5,', 1)
    assert native.extract_sig_arrays(floats) is None
    nulls = sig_doc(mins).replace(b'"mins":', b'"abundances":null,"mins":', 1)
    assert native.extract_sig_arrays(nulls) is None
