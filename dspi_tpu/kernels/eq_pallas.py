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
    (usb_audio.c:1022-1031) with per-cascade runtime bypass flags;
  * ``nb`` TDF2 bands (exact `_band_step_q28` semantics, imported from
    the pipeline so the kernel can never drift from the scan path);
  * an optional leveller RMS envelope tail (leveller.c:150-156 Q28 form)
    with per-cascade alpha, emitted once per packet (the block phase
    only ever reads packet-end envelopes).

Per-sample vectors are RANK-1 [bt] slices: Mosaic packs 1-D int32
vectors densely into (8,128) vregs, while a 2-D [R, bt] row layout is
lane-major and measured 4-5x slower even at R=8/16 — so cascades ride
the grid, never the sublane axis.  Per-cascade scalars (bypass flags,
envelope alphas) live in SMEM, indexed by the cascade grid coordinate.

Grid (G, B/bt, Ttot/kt) iterates time innermost; the running states live
in the state OUTPUT ref (initialized from the input states at the first
time-block, exactly the pdm_pallas pattern), so state is carried across
time-blocks without touching HBM.  ``kt`` divides the packet size and is
chosen against a VMEM budget; the kernel requests a 64 MB scoped-vmem
limit (v5e has 128 MB VMEM — the default 16 MB limit is exceeded at
serving shapes because XLA also places the small env/state OUTPUT arrays
in VMEM).  Lane counts pad up to the tile (idle lanes, sliced off), so
any B works; a custom_vmap rule flattens vmapped group axes into the
cascade axis — a pure reshape, since the cascade axis is leading — so
GroupedEngine / HeteroServer RP2040 serving runs one kernel over K*G
cascades instead of a batched grid of narrow ones.

Bit-exactness: the lane_cf variant reuses the pipeline's band-step code
verbatim; the scalar variant runs the same arithmetic with the
partial-product splits of loop-invariant coefficients hoisted out of
the sample loop (``_band_step_ps`` — the identical int32 ops,
reassociated only across the deterministic ah/al split, so words cannot
change).  Mosaic int32 mul/shift/and semantics match XLA's, and
tests/test_eq_pallas.py asserts word equality against the lax.scan
lowering on the TPU (the CPU suite always takes the scan path).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.qmath import q28_mul


def _psplit(c):
    """Partial-product halves of a Q28 operand (fast_mul_q28's ah/al,
    dsp_pipeline.c:50-52).  SCALAR mode only: hoisting the splits of
    loop-invariant per-cascade coefficients out of the sample loop is
    free (scalar-unit ops) and measured 82.4 -> 79.4 ms at the probe
    shape; in lane_cf mode the same hoist carries 120 live [bt] vector
    rows across the loop and measured slower (91.3 vs 88.4 ms), so the
    lane variant keeps the pipeline's per-mul q28_mul form."""
    return c >> 16, c & 0xFFFF


def _mul_ps(a_hl, bh, bl):
    """fast_mul_q28 with both operands pre-split: exactly
    (ah*bh << 4) + ((ah*bl + al*bh) >> 12), int32 wrap, truncating —
    bit-identical to core.qmath.q28_mul (the split is deterministic)."""
    ah, al = a_hl
    return ((ah * bh) << 4) + (((ah * bl) + (al * bh)) >> 12)


def _band_step_ps(cfj, s1, s2, xin):
    """_band_step_q28 with pre-split coefficients and the sample/output
    splits shared across the five multiplies (xin feeds b0/b1/b2, out
    feeds a1/a2 — the pipeline form re-splits them per q28_mul)."""
    xh, xl = _psplit(xin)
    out = _mul_ps(cfj[0], xh, xl) + s1
    oh, ol = _psplit(out)
    s1n = (_mul_ps(cfj[1], xh, xl) - _mul_ps(cfj[3], oh, ol)) + s2
    s2n = _mul_ps(cfj[2], xh, xl) - _mul_ps(cfj[4], oh, ol)
    return out, s1n, s2n


def _cascade_block(scal_ref, cf_ref, x_ref, s_ref, *out_refs,
                   nb, has_loud, has_env, kt, per_pkt, env_rows,
                   env_dense, t_real, lane_cf):
    """One (cascade, stream-tile, time-block) grid step.

    ``kt`` samples per time-block (divides the packet size; chosen
    against the VMEM budget), ``per_pkt`` time-blocks per packet — the
    envelope is emitted only at packet-end blocks.  ``env_dense`` emits
    the envelope every sample instead (variable-packet schedules, where
    packet ends do not align to time-blocks; the caller gathers the
    static end indices).  ``t_real`` (scheduled segments whose length
    is not a multiple of kt) bounds the final block's loop to the real
    samples — the time axis is padded to the kt grid, and the state
    must freeze after the last real sample.

    ``lane_cf``: coefficients and scalars arrive as PER-LANE [bt]
    vector rows instead of per-cascade scalars (cf_ref [1, nr*5, bt]
    VMEM, scal_ref [1, 4, bt] VMEM) — the grouped/hetero lowering,
    where one wide lane tile spans streams of several configs.  The
    band math is identical — the pipeline's per-multiply q28_mul form:
    pre-splitting the [bt] coefficient/sample vectors measured SLOWER
    either way (hoisted splits 91.3 ms, in-loop shared splits 91.8 ms
    vs 88.4 ms per-mul at the 8192-lane probe shape — long live ranges
    lose more to vreg scheduling than the saved split ops win), while
    the scalar path's pre-split loop-invariant coefficients are free
    scalar-unit ops and measured 82.4 -> 79.4 ms (probe_lane_cf)."""
    from ..chain.pipeline import _band_step_q28, _tdf2_q28_bypassable

    if has_env:
        y_ref, env_ref, s_out_ref = out_refs
    else:
        y_ref, s_out_ref = out_refs
    g = pl.program_id(0)
    ti = pl.program_id(2)

    @pl.when(ti == 0)
    def _():
        s_out_ref[...] = s_ref[...]

    n_loud = 2 if has_loud else 0
    if lane_cf:
        # [bt] vector rows, unsplit (per-mul q28_mul splits in-loop)
        cf = [tuple(cf_ref[0, j * 5 + k] for k in range(5))
              for j in range(n_loud + nb)]
        if has_loud:
            byp = (scal_ref[0, 0] != 0, scal_ref[0, 1] != 0)
        if has_env:
            a_rms, one_minus = scal_ref[0, 2], scal_ref[0, 3]
    else:
        cf = [tuple(_psplit(cf_ref[0, j, k]) for k in range(5))
              for j in range(n_loud + nb)]
        if has_loud:
            byp = (scal_ref[g, 0] != 0, scal_ref[g, 1] != 0)
        if has_env:
            a_rms = _psplit(scal_ref[g, 2])
            one_minus = _psplit(scal_ref[g, 3])

    rows = 2 * (n_loud + nb) + (1 if has_env else 0)
    carry0 = tuple(s_out_ref[0, r] for r in range(rows))

    def body(i, carry):
        cur = x_ref[0, i]
        st = list(carry)
        r = 0
        for j in range(n_loud):
            if lane_cf:
                cur, (st[r], st[r + 1]) = _tdf2_q28_bypassable(
                    cf[j], (st[r], st[r + 1]), cur, byp[j])
            else:
                out, sa, sb = _band_step_ps(
                    cf[j], st[r], st[r + 1], cur)
                # runtime bypass freezes output and state
                # (usb_audio.c:1022-1031)
                st[r] = jnp.where(byp[j], st[r], sa)
                st[r + 1] = jnp.where(byp[j], st[r + 1], sb)
                cur = jnp.where(byp[j], cur, out)
            r += 2
        for b in range(nb):
            if lane_cf:
                cur, (st[r], st[r + 1]) = _band_step_q28(
                    cf[n_loud + b], (st[r], st[r + 1]), cur)
            else:
                cur, st[r], st[r + 1] = _band_step_ps(
                    cf[n_loud + b], st[r], st[r + 1], cur)
            r += 2
        if has_env:
            sq = q28_mul(cur, cur)
            if lane_cf:
                st[r] = q28_mul(a_rms, st[r]) + q28_mul(one_minus, sq)
            else:
                sh, sl = _psplit(st[r])
                qh, ql = _psplit(sq)
                st[r] = (_mul_ps(a_rms, sh, sl)
                         + _mul_ps(one_minus, qh, ql))
            if env_dense:
                env_ref[0, i] = st[r]
        y_ref[0, i] = cur
        return tuple(st)

    if t_real is None:
        n = kt
    else:                            # partial final block (time padding)
        n = jnp.minimum(kt, t_real - ti * kt)
    carry = lax.fori_loop(0, n, body, carry0)
    for r in range(rows):
        s_out_ref[0, r] = carry[r]
    if has_env and not env_dense:
        at_pkt_end = lax.rem(ti, per_pkt) == per_pkt - 1
        env_row = lax.rem(lax.div(ti, per_pkt), env_rows)

        @pl.when(at_pkt_end)
        def _():
            env_ref[0, env_row] = carry[rows - 1]


def _pick_bt(B, bt0=None):
    """Stream-tile width: minimal padded lanes ceil(B/bt)*bt, ties to the
    widest tile (fewer grid steps).  Any B <= 8192 may also run as ONE
    128-multiple block — essential for hetero bucket sizes just past a
    power of two (B=1085 would otherwise pad to 2048, 47% idle lanes;
    a single 1152-lane block wastes 6%)."""
    if bt0 is not None:
        return bt0
    if B <= 1024:
        return -(-B // 128) * 128
    best = None
    cands = [8192, 4096, 2048, 1024]
    if B <= 8192:
        cands.append(-(-B // 128) * 128)         # single-block candidate
    for bt in cands:
        key = (-(-B // bt) * bt, -bt)
        if best is None or key < best[0]:
            best = (key, bt)
    return best[1]


@functools.lru_cache(maxsize=None)
def _core(nb, has_loud, has_env, tc, sched, bt0, interpret,
          lane_cf=False):
    n_loud = 2 if has_loud else 0
    env_dense = bool(has_env and sched)

    def run(x, cf, s0, scal):
        G, Ttot, B = x.shape
        S = s0.shape[1]
        bt = _pick_bt(B, bt0)
        Bp = -(-B // bt) * bt
        if sched:
            npkt, env_rows = len(sched), 1
        else:
            npkt = Ttot // tc
            env_rows = 8 if npkt % 8 == 0 else npkt

        # kernel time-block kt: largest divisor of the packet size
        # (uniform chains — envelopes emit only at packet-end blocks) or
        # of the whole segment (schedules — dense envelopes) fitting the
        # VMEM budget (28 MB of the requested 64 MB limit; the other
        # half is headroom for XLA's own VMEM placement of the small
        # outputs).
        def est(k):
            env = (2 * k if env_dense else
                   2 * env_rows if has_env else 0)
            lane = (cf.shape[1] + 4) if lane_cf else 0
            return 4 * bt * (4 * k + 4 * S + env + lane)
        if sched:
            # any multiple-of-8 block (TPU sublane rule); the time axis
            # pads to the kt grid and the kernel's dynamic loop bound
            # freezes state after the last real sample
            kt = next((k for k in (96, 64, 48, 32, 24, 16, 8)
                       if est(k) <= (28 << 20)), 8)
            per_pkt = 1
        else:
            kt = next((k for k in (tc, tc // 2, tc // 3, tc // 4,
                                   tc // 6)
                       if k and tc % k == 0 and est(k) <= (28 << 20)), 1)
            per_pkt = tc // kt
        Tp = -(-Ttot // kt) * kt

        if cf.shape[1] == 0:            # envelope-only cascade: the kernel
            cfa = jnp.zeros((G, 1, 5) if not lane_cf else (G, 5, B),
                            jnp.int32)  # never reads cf, but the
        else:                                      # block machinery needs rows
            cfa = cf
        if Bp != B:                 # idle lanes, sliced off below
            b_pad = [(0, 0), (0, 0), (0, Bp - B)]
            x = jnp.pad(x, b_pad)
            s0 = jnp.pad(s0, b_pad)
            if lane_cf:             # padded lanes compute garbage, dropped
                cfa = jnp.pad(cfa, b_pad)
                scal = jnp.pad(scal, b_pad)
        if Tp != Ttot:              # time pads to the kt grid; the
            x = jnp.pad(x, [(0, 0), (0, Tp - Ttot), (0, 0)])
        nr = cfa.shape[1] if not lane_cf else cfa.shape[1] // 5

        grid = (G, Bp // bt, Tp // kt)
        kern = functools.partial(_cascade_block, nb=nb, has_loud=has_loud,
                                 has_env=has_env, kt=kt, per_pkt=per_pkt,
                                 env_rows=env_rows, env_dense=env_dense,
                                 t_real=Ttot if Tp != Ttot else None,
                                 lane_cf=lane_cf)
        out_shape = [jax.ShapeDtypeStruct((G, Tp, Bp), jnp.int32)]
        out_specs = [pl.BlockSpec((1, kt, bt),
                                  lambda g, bi, ti: (g, ti, bi))]
        if env_dense:
            # per-sample envelopes, same blocking as y; packet ends are
            # gathered below (static indices)
            out_shape.append(
                jax.ShapeDtypeStruct((G, Tp, Bp), jnp.int32))
            out_specs.append(pl.BlockSpec((1, kt, bt),
                                          lambda g, bi, ti: (g, ti, bi)))
        elif has_env:
            # env_rows-packet revisited blocks (ti innermost keeps a
            # block VMEM-resident across its writes); a full-packet-axis
            # block would blow the VMEM budget at npkt=128, bt=8192
            out_shape.append(
                jax.ShapeDtypeStruct((G, npkt, Bp), jnp.int32))
            out_specs.append(
                pl.BlockSpec(
                    (1, env_rows, bt),
                    lambda g, bi, ti: (g, (ti // per_pkt) // env_rows,
                                       bi)))
        out_shape.append(jax.ShapeDtypeStruct((G, S, Bp), jnp.int32))
        out_specs.append(pl.BlockSpec((1, S, bt),
                                      lambda g, bi, ti: (g, 0, bi)))
        res = pl.pallas_call(
            kern,
            grid=grid,
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=64 << 20),
            in_specs=[
                pl.BlockSpec((1, 4, bt), lambda g, bi, ti: (g, 0, bi))
                if lane_cf else pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, nr * 5 if lane_cf else nr,
                              bt if lane_cf else 5),
                             lambda g, bi, ti: ((g, 0, bi) if lane_cf
                                                else (g, 0, 0))),
                pl.BlockSpec((1, kt, bt), lambda g, bi, ti: (g, ti, bi)),
                pl.BlockSpec((1, S, bt), lambda g, bi, ti: (g, 0, bi)),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
        )(scal, cfa, x, s0)
        res = tuple(v[:, :, :B] for v in res)
        if Tp != Ttot:                     # drop padded time rows (y, env)
            res = list(res)
            res[0] = res[0][:, :Ttot]
            if env_dense:
                res[1] = res[1][:, :Ttot]
            res = tuple(res)
        if env_dense:                      # dense -> packet-end envelopes
            ends = np.cumsum(np.asarray(sched, np.int64)) - 1
            res = (res[0], res[1][:, ends, :], res[2])
        return res

    @custom_vmap
    def core(x, cf, s0, scal):
        return run(x, cf, s0, scal)

    @core.def_vmap
    def _rule(axis_size, in_batched, x, cf, s0, scal):
        """K vmapped groups -> one call over K*B-wide lane tiles.

        Streams of all K groups flatten into the LANE axis (the PDM
        kernel's pattern) rather than the cascade grid: per-grid-step
        vector width sets VPU efficiency, so 8 groups x 1024 streams
        run as ONE 8192-lane call at anchor efficiency instead of 8x
        more 1024-lane grid steps (measured 7,045x -> see README for
        the grouped Q28 chain).  Coefficients/scalars become per-lane
        [K*B] rows (each group's scalars broadcast over its own lane
        range), handled by the kernel's ``lane_cf`` variant — the band
        math is unchanged, broadcasts just become elementwise vector
        multiplies."""
        k = axis_size
        vs = []
        for v, b in zip((x, cf, s0, scal), in_batched):
            if not b:
                v = jnp.broadcast_to(v[None], (k,) + v.shape)
            vs.append(v)
        x, cf, s0, scal = vs
        G, Ttot, B = x.shape[1:]
        xl = jnp.moveaxis(x, 0, -2).reshape(G, Ttot, k * B)
        s0l = jnp.moveaxis(s0, 0, -2).reshape(G, s0.shape[2], k * B)
        if lane_cf:                       # nested vmap: already per-lane
            cfl = jnp.moveaxis(cf, 0, -2).reshape(G, cf.shape[2], k * B)
            scl = jnp.moveaxis(scal, 0, -2).reshape(G, 4, k * B)
        else:
            nr = cf.shape[2]
            cfl = jnp.broadcast_to(
                cf.transpose(1, 2, 3, 0).reshape(G, nr * 5, k)[..., None],
                (G, nr * 5, k, B)).reshape(G, nr * 5, k * B)
            scl = jnp.broadcast_to(
                scal.transpose(1, 2, 0)[..., None],
                (G, 4, k, B)).reshape(G, 4, k * B)
        lane_core = _core(nb, has_loud, has_env, tc, sched, bt0,
                          interpret, lane_cf=True)
        res = lane_core(xl, cfl, s0l, scl)
        out = tuple(jnp.moveaxis(v.reshape(v.shape[:-1] + (k, B)), -2, 0)
                    for v in res)
        return out, (True,) * len(out)

    return core


def q28_cascades(x, cf, s0, scal, *, nb, has_loud=False, has_env=False,
                 tc=48, sched=None, bt=None, interpret=False):
    """Run G Q28 cascades over a segment.

    x [G, Ttot, B] int32; cf [G, n_loud+nb, 5] int32; s0 [G, S, B] int32
    with S = 2*(n_loud+nb) + has_env (row layout: loudness pairs, then
    band (s1, s2) pairs, then the envelope); scal int32 [G, 4] =
    per-cascade (bypass0, bypass1, a_rms_q28, one_minus_q28) (zeros
    where unused).

    Returns (y [G, Ttot, B], env_ends [G, Npkt, B] | None,
    s_final [G, S, B]).  ``tc`` must equal the packet size when has_env
    (envelope values are packet-end samples); a variable-packet
    ``sched`` tuple (e.g. the 44.1 kHz 44/45 cadence) replaces ``tc``
    and switches the envelope to dense emission with a static
    packet-end gather; ``bt`` overrides the stream-tile auto-selection
    (tests).

    PER-LANE coefficients: cf [G, n_loud+nb, 5, B] (+ scal [G, 4, B])
    runs the ``lane_cf`` kernel variant directly — every lane carries
    its own coefficients, the flattened-group serving layout
    (build_params_multi / GroupedEngine flat mode).  Same band math;
    coefficient broadcasts become elementwise vector multiplies."""
    lane = cf.ndim == 4
    if lane:
        g_, nr_, _, b_ = cf.shape
        cf = cf.reshape(g_, nr_ * 5, b_)
    res = _core(nb, bool(has_loud), bool(has_env), tc,
                tuple(sched) if sched else None, bt,
                bool(interpret), lane_cf=lane)(x, cf, s0, scal)
    if has_env:
        y, env_ends, s_final = res
        return y, env_ends, s_final
    y, s_final = res
    return y, None, s_final
