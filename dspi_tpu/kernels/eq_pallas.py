"""Mosaic (Pallas) kernels for the Q28 EQ cascade scans.

The RP2040 chain's hot loops are the two per-sample Q28 cascades
(dsp_process_rp2040.S:225-394 / usb_audio.c:1022-1100): loudness + master
EQ + leveller RMS envelope (pipeline.py scan_a) and the per-output EQ
(scan_b).  They are exact integer recurrences — `q28_mul` partial
products with int32 wrap — so unlike the float path they cannot ride the
MXU; the op count is the op count.  What CAN be bought is VPU efficiency:
the XLA scan lowering round-trips the band states through VMEM every
unrolled step, sustaining ~63% of the VPU; a Mosaic kernel with the
states resident in registers across a whole time-block measures ~95%
(the 10-band cascade probe: 71k x RT under lax.scan vs 89k as a kernel).

One kernel template covers both scans: G independent cascades laid out on
the GRID (one cascade per grid step, so register pressure stays at the
single-cascade level), each with

  * an optional 2-filter bypassable loudness prefix
    (usb_audio.c:1022-1031) — coefficient rows shared across cascades,
    runtime bypass flags in SMEM;
  * ``nb`` TDF2 bands (exact `_band_step_q28` semantics, imported from
    the pipeline so the kernel can never drift from the scan path);
  * an optional leveller RMS envelope tail (leveller.c:150-156 Q28 form)
    whose value is emitted once per packet (the block phase only ever
    reads packet-end envelopes), not per sample.

Grid (G, B/bt, Ttot/tc) iterates time innermost; the running states live
in the state OUTPUT ref (initialized from the input states at the first
time-block, exactly the pdm_pallas pattern), so state is carried across
time-blocks without touching HBM.

Bit-exactness: the kernel reuses the pipeline's band-step code on int32
lanes; Mosaic int32 mul/shift/and semantics match XLA's, and
tests/test_eq_pallas.py asserts word equality against the lax.scan
lowering on the TPU (the CPU suite always takes the scan path).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.qmath import q28_mul


def _cascade_block(scal_ref, cf_ref, x_ref, s_ref, *out_refs,
                   nb, has_loud, has_env, tc, env_rows):
    """One (cascade, stream-tile, time-block) grid step."""
    from ..chain.pipeline import _band_step_q28, _tdf2_q28_bypassable

    if has_env:
        y_ref, env_ref, s_out_ref = out_refs
    else:
        y_ref, s_out_ref = out_refs
    ti = pl.program_id(2)

    @pl.when(ti == 0)
    def _():
        s_out_ref[...] = s_ref[...]

    cf = cf_ref[0]                                     # [loud+nb, 5]
    n_loud = 2 if has_loud else 0
    if has_loud:
        byp = (scal_ref[0] != 0, scal_ref[1] != 0)
    if has_env:
        a_rms, one_minus = scal_ref[2], scal_ref[3]

    rows = 2 * (n_loud + nb) + (1 if has_env else 0)
    carry0 = tuple(s_out_ref[0, r] for r in range(rows))

    def body(i, carry):
        cur = x_ref[0, i]
        st = list(carry)
        r = 0
        for j in range(n_loud):
            cur, (sa, sb) = _tdf2_q28_bypassable(
                cf[j], (st[r], st[r + 1]), cur, byp[j])
            st[r], st[r + 1] = sa, sb
            r += 2
        for b in range(nb):
            cur, (sa, sb) = _band_step_q28(
                cf[n_loud + b], (st[r], st[r + 1]), cur)
            st[r], st[r + 1] = sa, sb
            r += 2
        if has_env:
            sq = q28_mul(cur, cur)
            st[r] = q28_mul(a_rms, st[r]) + q28_mul(one_minus, sq)
        y_ref[0, i] = cur
        return tuple(st)

    carry = lax.fori_loop(0, tc, body, carry0)
    for r in range(rows):
        s_out_ref[0, r] = carry[r]
    if has_env:
        env_ref[0, lax.rem(ti, env_rows)] = carry[rows - 1]


@functools.partial(jax.jit, static_argnames=("nb", "has_loud", "has_env",
                                             "tc", "bt", "interpret"))
def q28_cascades(x, cf, s0, scalars, *, nb, has_loud=False, has_env=False,
                 tc=48, bt=8192, interpret=False):
    """Run G Q28 cascades over a segment.

    x [G, Ttot, B] int32; cf [G, n_loud+nb, 5] int32; s0 [G, S, B] int32
    with S = 2*(n_loud+nb) + has_env (row layout: loudness pairs, then
    band (s1, s2) pairs, then the envelope); scalars int32 [4] =
    (bypass0, bypass1, a_rms_q28, one_minus_q28) (zeros where unused).

    Returns (y [G, Ttot, B], env_ends [G, Ttot//tc, B] | None,
    s_final [G, S, B]).  ``tc`` must equal the packet size when has_env
    (envelope values are packet-end samples)."""
    G, Ttot, B = x.shape
    S = s0.shape[1]
    if cf.shape[1] == 0:            # envelope-only cascade: the kernel
        cf = jnp.zeros((G, 1, 5), jnp.int32)  # never reads cf, but the
    grid = (G, B // bt, Ttot // tc)           # block machinery needs rows
    npkt = Ttot // tc
    # env blocks revisit 8 packet rows at a time (ti innermost, so the
    # block stays VMEM-resident across its 8 writes); a full-packet-axis
    # block would cost npkt*bt*4 bytes double-buffered — VMEM OOM at
    # npkt=128, bt=8192.  TPU tiling wants dim -2 divisible by 8 or equal
    # to the array dim.
    env_rows = 8 if npkt % 8 == 0 else npkt
    kern = functools.partial(_cascade_block, nb=nb, has_loud=has_loud,
                             has_env=has_env, tc=tc, env_rows=env_rows)
    out_shape = [jax.ShapeDtypeStruct((G, Ttot, B), jnp.int32)]
    out_specs = [pl.BlockSpec((1, tc, bt), lambda g, bi, ti: (g, ti, bi))]
    if has_env:
        out_shape.append(
            jax.ShapeDtypeStruct((G, npkt, B), jnp.int32))
        out_specs.append(
            pl.BlockSpec((1, env_rows, bt),
                         lambda g, bi, ti: (g, ti // env_rows, bi)))
    out_shape.append(jax.ShapeDtypeStruct((G, S, B), jnp.int32))
    out_specs.append(pl.BlockSpec((1, S, bt), lambda g, bi, ti: (g, 0, bi)))
    res = pl.pallas_call(
        kern,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cf.shape[1], 5), lambda g, bi, ti: (g, 0, 0)),
            pl.BlockSpec((1, tc, bt), lambda g, bi, ti: (g, ti, bi)),
            pl.BlockSpec((1, S, bt), lambda g, bi, ti: (g, 0, bi)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
    )(scalars, cf, x, s0)
    if has_env:
        y, env_ends, s_final = res
        return y, env_ends, s_final
    y, s_final = res
    return y, None, s_final


def pick_bt(B, cap=8192):
    """Largest power-of-two stream tile dividing B (>=128 lanes), or None
    if B cannot be tiled (kernel caller falls back to the XLA scan)."""
    bt = cap
    while bt >= 128:
        if B % bt == 0:
            return bt
        bt //= 2
    return None
