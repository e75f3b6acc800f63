"""MurmurHash3 x64_128 (first word) in 32-bit limb arithmetic.

The TPU has no native 64-bit integer datapath: XLA emulates every uint64
multiply at ~12x the cost of a uint32 op (measured on v5e). This module
implements the full murmur pipeline on (hi, lo) uint32 lane pairs —
the same limb decomposition a Pallas kernel uses — so the hot sketch path
never touches uint64 until the final pack.

All functions operate on jnp uint32 arrays and are shape-polymorphic.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

U16_MASK = np.uint32(0xFFFF)

# murmur3 x64_128 constants as (hi, lo) uint32 pairs
C1 = (np.uint32(0x87C37B91), np.uint32(0x114253D5))
C2 = (np.uint32(0x4CF5AD43), np.uint32(0x2745937F))
F1 = (np.uint32(0xFF51AFD7), np.uint32(0xED558CCD))
F2 = (np.uint32(0xC4CEB9FE), np.uint32(0x1A85EC53))
N1 = (np.uint32(0), np.uint32(0x52DCE729))
N2 = (np.uint32(0), np.uint32(0x38495AB5))


def xor64(a, b):
    return (a[0] ^ b[0], a[1] ^ b[1])


def shl64(a, r: int):
    hi, lo = a
    if r == 0:
        return a
    if r < 32:
        return (
            (hi << np.uint32(r)) | (lo >> np.uint32(32 - r)),
            lo << np.uint32(r),
        )
    if r == 32:
        return (lo, jnp.zeros_like(lo))
    return (lo << np.uint32(r - 32), jnp.zeros_like(lo))


def shr64(a, r: int):
    hi, lo = a
    if r == 0:
        return a
    if r < 32:
        return (
            hi >> np.uint32(r),
            (lo >> np.uint32(r)) | (hi << np.uint32(32 - r)),
        )
    if r == 32:
        return (jnp.zeros_like(hi), hi)
    return (jnp.zeros_like(hi), hi >> np.uint32(r - 32))


def rotl64(a, r: int):
    l = shl64(a, r)
    rr = shr64(a, 64 - r)
    return (l[0] | rr[0], l[1] | rr[1])


def add64(a, b):
    lo = a[1] + b[1]
    carry = (lo < a[1]).astype(jnp.uint32)
    hi = a[0] + b[0] + carry
    return (hi, lo)


def mul64(a, b):
    """(a * b) mod 2^64 on (hi, lo) uint32 pairs.

    8 uint32 multiplies + carries; the 32x32->64 low product uses 16-bit
    half-limbs."""
    ah, al = a
    bh, bl = b

    a0 = al & U16_MASK
    a1 = al >> np.uint32(16)
    b0 = bl & U16_MASK
    b1 = bl >> np.uint32(16)

    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1

    mid = p01 + p10
    mid_carry = (mid < p01).astype(jnp.uint32)

    mid_shift = mid << np.uint32(16)
    low = p00 + mid_shift
    low_carry = (low < p00).astype(jnp.uint32)

    hi32 = p11 + (mid >> np.uint32(16)) + (mid_carry << np.uint32(16)) + low_carry
    # cross terms land in the high limb (mod 2^32)
    hi32 = hi32 + ah * bl + al * bh
    return (hi32, low)


def mul64_const(a, c):
    "Multiply by a (hi, lo) numpy-uint32 constant pair."
    return mul64(a, (jnp.uint32(c[0]), jnp.uint32(c[1])))


def mul_small(a, k: int):
    "Multiply by a small scalar constant (fits in uint32, e.g. 5)."
    ah, al = a
    kk = np.uint32(k)
    a0 = al & U16_MASK
    a1 = al >> np.uint32(16)
    p0 = a0 * kk
    p1 = a1 * kk  # < 2^16 * 2^16 * k — may exceed 32 bits if k large; k<=31 ok
    low = p0 + (p1 << np.uint32(16))
    low_carry = (low < p0).astype(jnp.uint32)
    hi = ah * kk + (p1 >> np.uint32(16)) + low_carry
    return (hi, low)


def fmix64(k):
    k = xor64(k, shr64(k, 33))
    k = mul64_const(k, F1)
    k = xor64(k, shr64(k, 33))
    k = mul64_const(k, F2)
    k = xor64(k, shr64(k, 33))
    return k


def murmur_cols32(col, L: int, seed: int, n: int):
    """MurmurHash3 x64_128 first word over n parallel byte streams.

    col(i) -> [n] uint32 lane holding byte i of every window.
    Returns (hi, lo) uint32 pair arrays of shape [n].
    """
    shape = (n,) if isinstance(n, int) else tuple(n)
    seed_pair = (
        jnp.full(shape, np.uint32((seed >> 32) & 0xFFFFFFFF), dtype=jnp.uint32),
        jnp.full(shape, np.uint32(seed & 0xFFFFFFFF), dtype=jnp.uint32),
    )
    h1 = seed_pair
    h2 = (seed_pair[0], seed_pair[1])

    def le64(base):
        lo = col(base)
        for i in range(1, 4):
            lo = lo | (col(base + i) << np.uint32(8 * i))
        hi = col(base + 4)
        for i in range(1, 4):
            hi = hi | (col(base + 4 + i) << np.uint32(8 * i))
        return (hi, lo)

    nblocks = L // 16
    for blk in range(nblocks):
        base = blk * 16
        k1 = le64(base)
        k2 = le64(base + 8)

        k1 = mul64_const(k1, C1)
        k1 = rotl64(k1, 31)
        k1 = mul64_const(k1, C2)
        h1 = xor64(h1, k1)
        h1 = rotl64(h1, 27)
        h1 = add64(h1, h2)
        h1 = add64(mul_small(h1, 5), (jnp.uint32(N1[0]), jnp.uint32(N1[1])))

        k2 = mul64_const(k2, C2)
        k2 = rotl64(k2, 33)
        k2 = mul64_const(k2, C1)
        h2 = xor64(h2, k2)
        h2 = rotl64(h2, 31)
        h2 = add64(h2, h1)
        h2 = add64(mul_small(h2, 5), (jnp.uint32(N2[0]), jnp.uint32(N2[1])))

    t = L & 15
    base = nblocks * 16
    if t > 8:
        k2hi = jnp.zeros(shape, dtype=jnp.uint32)
        k2lo = jnp.zeros(shape, dtype=jnp.uint32)
        for i in range(t - 1, 7, -1):
            shift = 8 * (i - 8)
            if shift < 32:
                k2lo = k2lo ^ (col(base + i) << np.uint32(shift))
            else:
                k2hi = k2hi ^ (col(base + i) << np.uint32(shift - 32))
        k2 = (k2hi, k2lo)
        k2 = mul64_const(k2, C2)
        k2 = rotl64(k2, 33)
        k2 = mul64_const(k2, C1)
        h2 = xor64(h2, k2)
    if t > 0:
        k1hi = jnp.zeros(shape, dtype=jnp.uint32)
        k1lo = jnp.zeros(shape, dtype=jnp.uint32)
        for i in range(min(t, 8) - 1, -1, -1):
            shift = 8 * i
            if shift < 32:
                k1lo = k1lo ^ (col(base + i) << np.uint32(shift))
            else:
                k1hi = k1hi ^ (col(base + i) << np.uint32(shift - 32))
        k1 = (k1hi, k1lo)
        k1 = mul64_const(k1, C1)
        k1 = rotl64(k1, 31)
        k1 = mul64_const(k1, C2)
        h1 = xor64(h1, k1)

    ln = (jnp.uint32(0), jnp.uint32(L))
    h1 = xor64(h1, ln)
    h2 = xor64(h2, ln)
    h1 = add64(h1, h2)
    h2 = add64(h2, h1)
    h1 = fmix64(h1)
    h2 = fmix64(h2)
    h1 = add64(h1, h2)
    return h1


def le64_pair(hi, lo):
    "Pack (hi, lo) uint32 arrays into a uint64 array (final output only)."
    return (hi.astype(jnp.uint64) << np.uint64(32)) | lo.astype(jnp.uint64)


def pair_leq(a, threshold_pair):
    "a <= threshold where both are (hi, lo) uint32 pairs."
    th, tl = threshold_pair
    return (a[0] < th) | ((a[0] == th) & (a[1] <= tl))


def murmur_words32(words, L: int, seed: int, shape):
    """MurmurHash3 x64_128 first word from pre-assembled little-endian
    64-bit words (as (hi, lo) uint32 pairs), one pair per 8 input bytes,
    zero-padded past L. Same math as `murmur_cols32` without the per-byte
    assembly — callers that already hold the words skip ~2L ops/lane."""
    shape = tuple(shape)
    seed_pair = (
        jnp.full(shape, np.uint32((seed >> 32) & 0xFFFFFFFF), dtype=jnp.uint32),
        jnp.full(shape, np.uint32(seed & 0xFFFFFFFF), dtype=jnp.uint32),
    )
    h1 = seed_pair
    h2 = (seed_pair[0], seed_pair[1])

    nblocks = L // 16
    for blk in range(nblocks):
        k1 = words[2 * blk]
        k2 = words[2 * blk + 1]

        k1 = mul64_const(k1, C1)
        k1 = rotl64(k1, 31)
        k1 = mul64_const(k1, C2)
        h1 = xor64(h1, k1)
        h1 = rotl64(h1, 27)
        h1 = add64(h1, h2)
        h1 = add64(mul_small(h1, 5), (jnp.uint32(N1[0]), jnp.uint32(N1[1])))

        k2 = mul64_const(k2, C2)
        k2 = rotl64(k2, 33)
        k2 = mul64_const(k2, C1)
        h2 = xor64(h2, k2)
        h2 = rotl64(h2, 31)
        h2 = add64(h2, h1)
        h2 = add64(mul_small(h2, 5), (jnp.uint32(N2[0]), jnp.uint32(N2[1])))

    t = L & 15
    if t > 8:
        k2 = words[2 * nblocks + 1]
        k2 = mul64_const(k2, C2)
        k2 = rotl64(k2, 33)
        k2 = mul64_const(k2, C1)
        h2 = xor64(h2, k2)
    if t > 0:
        k1 = words[2 * nblocks]
        k1 = mul64_const(k1, C1)
        k1 = rotl64(k1, 31)
        k1 = mul64_const(k1, C2)
        h1 = xor64(h1, k1)

    ln = (jnp.uint32(0), jnp.uint32(L))
    h1 = xor64(h1, ln)
    h2 = xor64(h2, ln)
    h1 = add64(h1, h2)
    h2 = add64(h2, h1)
    h1 = fmix64(h1)
    h2 = fmix64(h2)
    h1 = add64(h1, h2)
    return h1


def byteswap32(x):
    "Reverse the 4 bytes of each uint32 lane."
    return (
        ((x & np.uint32(0xFF)) << np.uint32(24))
        | ((x & np.uint32(0xFF00)) << np.uint32(8))
        | ((x >> np.uint32(8)) & np.uint32(0xFF00))
        | (x >> np.uint32(24))
    )
