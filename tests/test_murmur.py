"""MurmurHash3 x64_128 correctness: independent pure-Python oracle vs the
vectorized numpy/JAX implementations."""

import numpy as np
import pytest

from sourmash_tpu.ops.murmur import murmur3_x64_128_first64, hash_murmur_scalar

M = (1 << 64) - 1


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M


def _fmix(k):
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & M
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & M
    k ^= k >> 33
    return k


def murmur_oracle(data: bytes, seed: int) -> int:
    "Straightforward big-int implementation of murmur3 x64_128 (first word)."
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    h1 = h2 = seed
    L = len(data)
    nblocks = L // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little")
        k1 = (k1 * c1) & M
        k1 = _rotl(k1, 31)
        k1 = (k1 * c2) & M
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & M
        h1 = (h1 * 5 + 0x52DCE729) & M
        k2 = (k2 * c2) & M
        k2 = _rotl(k2, 33)
        k2 = (k2 * c1) & M
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & M
        h2 = (h2 * 5 + 0x38495AB5) & M
    tail = data[nblocks * 16 :]
    t = len(tail)
    k1 = k2 = 0
    if t > 8:
        for i in range(t - 1, 7, -1):
            k2 ^= tail[i] << (8 * (i - 8))
        k2 = (k2 * c2) & M
        k2 = _rotl(k2, 33)
        k2 = (k2 * c1) & M
        h2 ^= k2
    if t > 0:
        for i in range(min(t, 8) - 1, -1, -1):
            k1 ^= tail[i] << (8 * i)
        k1 = (k1 * c1) & M
        k1 = _rotl(k1, 31)
        k1 = (k1 * c2) & M
        h1 ^= k1
    h1 ^= L
    h2 ^= L
    h1 = (h1 + h2) & M
    h2 = (h2 + h1) & M
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & M
    return h1


@pytest.mark.parametrize("length", [1, 5, 8, 9, 15, 16, 17, 21, 31, 32, 48, 51])
@pytest.mark.parametrize("seed", [0, 42])
def test_murmur_matches_oracle(length, seed):
    rng = np.random.default_rng(length * 1000 + seed)
    data = rng.integers(0, 256, size=(16, length), dtype=np.uint8)
    with np.errstate(over="ignore"):
        got = murmur3_x64_128_first64(data, length, seed, xp=np)
    want = [murmur_oracle(bytes(row), seed) for row in data]
    assert [int(x) for x in got] == want


def test_murmur_jax_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, size=(64, 31), dtype=np.uint8)
    with np.errstate(over="ignore"):
        np_out = murmur3_x64_128_first64(data, 31, 42, xp=np)
    jax_out = np.asarray(murmur3_x64_128_first64(jnp.asarray(data), 31, 42, xp=jnp))
    assert (np_out == jax_out).all()


def test_known_kmer_hash():
    # From the reference test suite: hashing DNA k-mers with seed 42.
    # Regression anchor: murmur("TTAACCTTAACC", 42) per mmh3.hash64.
    h = hash_murmur_scalar(b"TTAACCTTAACC", 42)
    assert h == murmur_oracle(b"TTAACCTTAACC", 42)


def test_pallas_kernel_matches_xla_path():
    """Pallas sketch kernel (interpret mode) is bit-identical to the XLA
    elementwise path for several ksizes, including invalid-byte masking."""
    import numpy as np
    import jax.numpy as jnp

    from sourmash_tpu.ops.pallas_sketch import window_hash_pairs_pallas
    from sourmash_tpu.ops.sketch import _window_hash_pairs
    from sourmash_tpu.ops.encodings import COMPLEMENT, UPPER

    rng = np.random.default_rng(11)
    S = 64 * 128 * 2 + 333
    seq = rng.choice(list(b"ACGTN"), size=S, p=[0.24, 0.24, 0.24, 0.24, 0.04])
    squ = UPPER[seq.astype(np.uint8)]
    for k in (7, 21, 31, 51):
        n = S - k + 1
        (hr, lr), vr = _window_hash_pairs(jnp.asarray(squ), n, k, 42)
        hp, lp, vp = window_hash_pairs_pallas(
            jnp.asarray(squ), ksize=k, interpret=True
        )
        vp = np.asarray(vp)[:n] != 0
        vr = np.asarray(vr)
        assert np.array_equal(vr, vp)
        # hashes must agree on valid windows (invalid windows are masked)
        assert np.array_equal(np.asarray(hr)[vr], np.asarray(hp)[:n][vp])
        assert np.array_equal(np.asarray(lr)[vr], np.asarray(lp)[:n][vp])
