"""EXPERIMENT (not wired): pallas kernel for the bucketed counter query.

MEASURED SLOWER than the XLA form and kept only as a record: on v5e at
8192 rows x (d=8, B=2048) vs a dq=64 metagenome query, XLA runs 43
ms/chunk and this kernel 212 ms — the fori loop over (k2, q, lane-group)
executes ~8k tiny (8, 128) bodies per grid step and is loop-latency
bound, while XLA fuses the same compares into wide streamed loops. A
future attempt should vectorize lane groups inside the body and use a
larger ROW_BLOCK with manual double-buffering. Value-parity (incl. the
pad correction) was verified on hardware before timing.

The XLA form (`bucketed._counts_qvm`) materializes [ns, dq, B]-shaped
compare intermediates per subject slot and measures ~20 ms per 8192-row
chunk on v5e; this kernel keeps the (tiny) query planes VMEM-resident
and streams subject row blocks through a fori loop, emitting per-row
128-lane partial counts (the final lane reduction happens outside).

Contract matches `_counts_qvm` BEFORE its pad correction: the count
includes PAD==PAD hits, and the caller subtracts the same bf16
pad-count correction — so the surrounding exactness machinery
(occupancy counts, spills, 2**64-1 tails) is untouched.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROW_BLOCK = 8  # subject rows per grid step (bounds VMEM double-buffering)


def _counts_kernel(qhi_ref, qlo_ref, shi_ref, slo_ref, out_ref, *, d, dq, gb):
    """One (ROW_BLOCK, d*gb, 128) subject block vs the full (dq*gb, 128)
    query planes -> (ROW_BLOCK, 128) partial counts (summed over d, dq and
    lane groups; lanes hold independent partials)."""
    acc = jnp.zeros((ROW_BLOCK, LANES), jnp.int32)

    gb_c = jnp.int32(gb)
    dq_c = jnp.int32(dq)

    def body(i, acc):
        # i enumerates (k2, q, g): subject slot, query slot, lane group
        # (all index math in explicit i32 — bare python ints trace as i64
        # under jax_enable_x64, which Mosaic cannot mix with the i32 loop
        # counter)
        g = jax.lax.rem(i, gb_c)
        t = jax.lax.div(i, gb_c)
        q = jax.lax.rem(t, dq_c)
        k2 = jax.lax.div(t, dq_c)
        sh = shi_ref[:, k2 * gb_c + g, :]
        sl = slo_ref[:, k2 * gb_c + g, :]
        qh = qhi_ref[q * gb_c + g, :]
        ql = qlo_ref[q * gb_c + g, :]
        eq = (sh == qh[None, :]) & (sl == ql[None, :])
        return acc + eq.astype(jnp.int32)

    acc = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(d * dq * gb), body, acc
    )
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("d", "dq", "gb", "interpret"))
def _counts_rows_pallas(qhi, qlo, shi, slo, *, d, dq, gb, interpret=False):
    "(dq*gb,128) query planes x (rows, d*gb, 128) subjects -> [rows] i32."
    rows = shi.shape[0]
    grid = rows // ROW_BLOCK
    kernel = functools.partial(_counts_kernel, d=d, dq=dq, gb=gb)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (dq * gb, LANES), lambda b: (np.int32(0), np.int32(0))
            ),
            pl.BlockSpec(
                (dq * gb, LANES), lambda b: (np.int32(0), np.int32(0))
            ),
            pl.BlockSpec((ROW_BLOCK, d * gb, LANES),
                         lambda b: (b, np.int32(0), np.int32(0))),
            pl.BlockSpec((ROW_BLOCK, d * gb, LANES),
                         lambda b: (b, np.int32(0), np.int32(0))),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, LANES),
                               lambda b: (b, np.int32(0))),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        interpret=interpret,
    )(qhi, qlo, shi, slo)
    return jnp.sum(out, axis=1, dtype=jnp.int32)


def counts_qvm_pallas(qhi, qlo, qcnt, Shi, Slo, Scnt, interpret=False):
    """Drop-in twin of `bucketed._counts_qvm` (same exact outputs): raw
    stored-element equality counts via the pallas kernel, minus the bf16
    pad-count correction matmul."""
    rows, d, B = Shi.shape
    dq = qhi.shape[0]
    gb = B // LANES
    shi = Shi.reshape(rows, d * gb, LANES)
    slo = Slo.reshape(rows, d * gb, LANES)
    qh = qhi.reshape(dq * gb, LANES)
    ql = qlo.reshape(dq * gb, LANES)
    acc = _counts_rows_pallas(
        qh, ql, shi, slo, d=d, dq=dq, gb=gb, interpret=interpret
    )
    npad_q = (dq - qcnt).astype(jnp.bfloat16)
    npad_s = (d - Scnt).astype(jnp.bfloat16)
    corr = jnp.dot(npad_s, npad_q, preferred_element_type=jnp.float32)
    return acc - corr.astype(jnp.int32)
