"""Pallas TPU kernel for the canonical-k-mer murmur sketch hot path.

Replaces the XLA elementwise pipeline in `ops/sketch.py:_window_hash_pairs`
with a single fused VMEM-resident kernel: every shifted window column, the
canonical-strand compare, and the 32-bit-limb murmur pipeline execute on
one block of windows without intermediate HBM round-trips. The XLA path
materializes ~2k shifted [n] arrays per chunk in HBM; here they are lane
rolls of a VMEM block.

Behavioral reference: `/root/reference/src/core/src/signature.rs:246-306`
(SeqToHashes canonical window iteration) — implementation is an original
TPU design.

Layout: windows are laid out flat as rows of 128 lanes; each grid step
processes R rows (R*128 windows) and reads an (R+1, 128) block so shifted
columns j in [0, k) resolve inside the block:

    col_j[r, l] = block[r + (l + j) // 128, (l + j) % 128]
                = select(l < 128 - j, roll(block, -j, lanes)[r],
                                      roll(block, -j, lanes)[r + 1])

requiring k <= 129.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .murmur32 import murmur_cols32

LANES = 128
DEFAULT_ROWS = 256  # windows per grid step = ROWS * LANES


def _shifted(block, j: int, rows: int, lane_idx, interpret: bool):
    "Flat shift by j of an (rows+1, LANES) block -> (rows, LANES)."
    if j == 0:
        return block[:rows]
    if interpret:
        rolled = jnp.roll(block, -j, axis=1)
    else:
        # pltpu.roll requires non-negative shifts; LANES - j == -j (mod LANES).
        # The shift must be an i32 scalar (x64 mode would make a bare int i64).
        rolled = pltpu.roll(block, shift=jnp.int32(LANES - j), axis=1)
    return jnp.where(lane_idx < LANES - j, rolled[:rows], rolled[1 : rows + 1])


_A = np.uint32(ord("A"))
_C = np.uint32(ord("C"))
_G = np.uint32(ord("G"))
_T = np.uint32(ord("T"))


def _complement_col(c):
    "Branchless ACGT complement (table gathers are slow on TPU)."
    out = jnp.where(c == _A, _T, c)
    out = jnp.where(c == _T, _A, out)
    out = jnp.where(c == _C, _G, out)
    out = jnp.where(c == _G, _C, out)
    return out


def _sketch_block_kernel(
    squ_ref, hi_ref, lo_ref, valid_ref, *, ksize: int, seed: int, rows: int,
    interpret: bool
):
    squ = squ_ref[:].astype(jnp.uint32)
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)

    # one roll per byte offset; rc-window columns are complements of the
    # SAME shifted columns: rcol_j = complement(scol_{k-1-j})
    scols = [_shifted(squ, j, rows, lane_idx, interpret) for j in range(ksize)]
    fcols = scols
    rcols = [_complement_col(scols[ksize - 1 - j]) for j in range(ksize)]

    # window validity: every byte ACGT (computed in-kernel; the XLA path
    # needs a full-array cumsum for this)
    valid = jnp.ones((rows, LANES), dtype=bool)
    for c in scols:
        valid = valid & ((c == _A) | (c == _C) | (c == _G) | (c == _T))

    # assemble little-endian murmur words (4 bytes per uint32 limb) for
    # both strands; big-endian compare groups are byteswaps of the limbs
    from .murmur32 import byteswap32, murmur_words32

    def assemble_limbs(cols):
        "k byte columns -> list of uint32 limbs (4 bytes each, LE)."
        limbs = []
        for base in range(0, ksize, 4):
            acc = cols[base]
            for b in range(1, 4):
                if base + b < ksize:
                    acc = acc | (cols[base + b] << np.uint32(8 * b))
            limbs.append(acc)
        return limbs

    flimbs = assemble_limbs(fcols)
    rlimbs = assemble_limbs(rcols)

    # canonical strand: fwd <= rc over the k bytes (zero padding past k
    # matches on both sides); compare LE limbs as byteswapped BE groups
    use_fwd = jnp.ones((rows, LANES), dtype=bool)
    for fl, rl in zip(reversed(flimbs), reversed(rlimbs)):
        gf = byteswap32(fl)
        gr = byteswap32(rl)
        use_fwd = (gf < gr) | ((gf == gr) & use_fwd)

    # canonical limbs -> (hi, lo) word pairs for murmur
    climbs = [jnp.where(use_fwd, f, r) for f, r in zip(flimbs, rlimbs)]
    zero = jnp.zeros((rows, LANES), dtype=jnp.uint32)
    nwords = -(-ksize // 8)
    words = []
    for w in range(nwords):
        lo_limb = climbs[2 * w]
        hi_limb = climbs[2 * w + 1] if 2 * w + 1 < len(climbs) else zero
        words.append((hi_limb, lo_limb))
    if len(words) % 2:
        words.append((zero, zero))

    hi, lo = murmur_words32(words, ksize, seed, (rows, LANES))
    hi_ref[:] = hi
    lo_ref[:] = lo
    valid_ref[:] = valid.astype(jnp.uint32)


@functools.partial(
    jax.jit, static_argnames=("ksize", "seed", "rows", "interpret")
)
def window_hash_pairs_pallas(
    squ,
    *,
    ksize: int,
    seed: int = 42,
    rows: int = DEFAULT_ROWS,
    interpret: bool = False,
):
    """Canonical murmur hashes + validity for all windows of an uppercased
    byte array.

    squ: [S] or [B, S] uint8 — uppercased sequence(s). Returns
    (hi, lo, valid) uint32 arrays of shape [n_pad] (or [B, n_pad]) where
    n_pad = ceil((S - ksize + 1) / (rows*128)) * rows*128; entries past the
    real window count have valid == 0 (zero padding is non-ACGT).
    """
    batched = squ.ndim == 2
    if not batched:
        squ = squ[None, :]
    B, S = squ.shape
    n = S - ksize + 1
    block = rows * LANES
    nblocks = -(-n // block)
    n_pad = nblocks * block

    # flat byte stream padded so every block's view exists; blocks carry
    # rows+8 rows (sublane dim must be a multiple of 8) though only rows+1
    # are read
    need = n_pad + 8 * LANES
    pad = need - S
    squ32 = jnp.pad(squ, ((0, 0), (0, max(pad, 0)))).astype(jnp.int32)

    # overlapping block views, duplicated once in HBM (~1.6% overhead)
    brows = rows + 8
    starts = jnp.arange(nblocks, dtype=jnp.int32) * block
    offs = jnp.arange(brows * LANES, dtype=jnp.int32)
    idx = starts[:, None] + offs[None, :]
    squ_blocks = squ32[:, idx].reshape(B * nblocks * brows, LANES)

    kernel = functools.partial(
        _sketch_block_kernel,
        ksize=ksize,
        seed=seed,
        rows=rows,
        interpret=interpret,
    )
    hi, lo, valid = pl.pallas_call(
        kernel,
        grid=(B * nblocks,),
        # index maps return int32 zeros explicitly: under jax_enable_x64 a
        # bare 0 traces as i64, which Mosaic cannot legalize in func.return
        in_specs=[
            pl.BlockSpec((brows, LANES), lambda b: (b, np.int32(0))),
        ],
        out_specs=[
            pl.BlockSpec((rows, LANES), lambda b: (b, np.int32(0))),
            pl.BlockSpec((rows, LANES), lambda b: (b, np.int32(0))),
            pl.BlockSpec((rows, LANES), lambda b: (b, np.int32(0))),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * nblocks * rows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((B * nblocks * rows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((B * nblocks * rows, LANES), jnp.uint32),
        ],
        interpret=interpret,
    )(squ_blocks)
    hi = hi.reshape(B, n_pad)
    lo = lo.reshape(B, n_pad)
    valid = valid.reshape(B, n_pad)
    if not batched:
        return hi[0], lo[0], valid[0]
    return hi, lo, valid
