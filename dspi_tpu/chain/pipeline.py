"""The batched TPU pipeline: PASS 1-5 of process_audio_packet as JAX.

Execution model
---------------
One call processes a *segment* of ``n_packets`` emulated USB packets of
``block_size`` samples for ``B`` independent streams at once:

    x: int32 [n_packets, 2, block_size, B]  ->  outputs [..., B]

The segment is flattened to time-major [Ttot, B] up front.  Everything
stateless — unpack, preamp, matrix mix, output gains, delay reads/writes,
lookahead shifting, the leveller's limiter, s24 conversion, peak metering —
runs as whole-segment vectorized ops.  Only the true per-sample recurrences
march through ``lax.scan`` over the time axis, with every carried state
shaped [B] so a single recurrence step is one wide VPU op across streams:

  scan A   loudness shelves + master EQ + leveller RMS envelope
  scan L   leveller per-packet gain smoothing (n_packets steps)
  scan R   leveller gain ramp (block_size steps, vectorized over packets)
  scan X   crossfeed (stereo-coupled 1-pole + allpass)
  scan B   per-output EQ

Block-scoped firmware semantics are preserved exactly: the leveller's
once-per-packet gain computer reads the RMS envelope at each packet
boundary (sliced from scan A's per-sample emission), its denormal flush
fires only on boundary samples (a packet-end flag inside scan A), and the
per-packet gain ramp accumulates sequentially within each packet — the
ramp scan carries [n_packets, B] so all packets ramp in parallel while
each reproduces the firmware's float accumulation order.

The sample-level arithmetic is the firmware's, op for op:

  PASS 1  unpack + preamp + loudness shelves    usb_audio.c:590-718 / 996-1047
  PASS 2  master EQ block                       dsp_pipeline.c:282-365 / .S
  PASS 2.5 leveller                             leveller.c:147-262 / 274-389
  PASS 3  crossfeed + master peaks              usb_audio.c:737-749 / 1064-1073
  PASS 4  matrix mix                            usb_audio.c:751-779 / 1075-1100
  PASS 5  per-output EQ/gain/delay/convert      usb_audio.c:873-959 / 1191-1275

Loop-order note: the firmware processes EQ band-major within a block; this
pipeline runs sample-major.  For a causal chain the two orders compute the
identical sequence of scalar operations per (band, sample), so results are
bit-identical in both int32 and float32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core import constants as C
from ..core import fmath
from ..core.qmath import q15_mul, q28_mul, q28_to_s24
from ..kernels.pdm import pdm_segment
from .pack import (SKIP, SVF_HP, SVF_LP, SVF_PEAK, SVF_SHELF, TDF2,
                   ChainParams, ChainState, StaticChain)

F = np.float32
I = np.int32


def _f32_to_i32(x):
    """vcvt.s32.f32 on jnp arrays (saturating truncation)."""
    x = jnp.where(jnp.isnan(x), 0.0, x)
    out = jnp.trunc(x.clip(-2147483648.0, 2147483520.0)).astype(jnp.int32)
    return jnp.where(x >= 2147483648.0, jnp.int32(2**31 - 1), out)


# Float-path rounding contract: XLA's backends may contract a float
# ``a*b + c`` into a fused multiply-add inside a fusion (observed on
# XLA:CPU for the flat matrix mix: the emitted code computes
# fma(bl, gl, round(br*gr)), a 1-ulp difference from rounding each
# product).  This is not preventable at the HLO level — optimization
# barriers and identity reduce_precision are stripped before codegen — and
# the firmware's own compiler (gcc -mcpu=cortex-m33, default
# -ffp-contract=fast with VFMA hardware) contracts too.  The float path is
# therefore *ulp-faithful*, not bit-frozen: device vs golden is asserted
# at <=1e-6 relative RMS (the firmware-fidelity budget), while the Q28
# path stays strictly bit-exact (integer ops never contract).


# ----------------------------------------------------------------------------
# per-band sample steps
# ----------------------------------------------------------------------------


def _band_step_f32(kind: int, cf, s, xin):
    """One band, one sample, float path (dsp_pipeline.c:298-364).

    cf: [11] coefficient row; s: (a, b) state pair [B]; returns (out, s')."""
    if kind == TDF2:
        b0, b1, b2, a1, a2 = cf[6], cf[7], cf[8], cf[9], cf[10]
        s1, s2 = s
        out = b0 * xin + s1
        s1n = b1 * xin - a1 * out + s2
        s2n = b2 * xin - a2 * out
        return out, (s1n, s2n)
    a1, a2, a3 = cf[0], cf[1], cf[2]
    m0, m1, m2 = cf[3], cf[4], cf[5]
    ic1, ic2 = s
    v3 = xin - ic2
    v1 = a1 * ic1 + a2 * v3
    v2 = ic2 + a2 * ic1 + a3 * v3
    ic1n = 2.0 * v1 - ic1
    ic2n = 2.0 * v2 - ic2
    if kind == SVF_LP:
        out = v2
    elif kind == SVF_HP:
        out = xin + m1 * v1 - v2
    elif kind == SVF_PEAK:
        out = xin + m1 * v1
    else:
        out = m0 * xin + m1 * v1 + m2 * v2
    return out, (ic1n, ic2n)


def _band_step_q28(cf, s, xin):
    """One band, one sample, Q28 TDF2 (dsp_process_rp2040.S:263-365)."""
    b0, b1, b2, a1, a2 = cf[0], cf[1], cf[2], cf[3], cf[4]
    s1, s2 = s
    out = q28_mul(b0, xin) + s1
    s1n = (q28_mul(b1, xin) - q28_mul(a1, out)) + s2
    s2n = q28_mul(b2, xin) - q28_mul(a2, out)
    return out, (s1n, s2n)


def _svf_general_f32(cf_row, s, xin, bypass):
    """Loudness shelf: general SVF mix with runtime bypass
    (usb_audio.c:697-702).  When bypassed, both state and output freeze."""
    sva1, sva2, sva3, svm0, svm1, svm2 = (cf_row[0], cf_row[1], cf_row[2],
                                          cf_row[3], cf_row[4], cf_row[5])
    ic1, ic2 = s
    v3 = xin - ic2
    v1 = sva1 * ic1 + sva2 * v3
    v2 = ic2 + sva2 * ic1 + sva3 * v3
    ic1n = 2.0 * v1 - ic1
    ic2n = 2.0 * v2 - ic2
    out = svm0 * xin + svm1 * v1 + svm2 * v2
    return (jnp.where(bypass, xin, out),
            (jnp.where(bypass, ic1, ic1n), jnp.where(bypass, ic2, ic2n)))


def _tdf2_q28_bypassable(cf_row, s, xin, bypass):
    """Loudness Q28 biquad with runtime bypass (usb_audio.c:1022-1031)."""
    out, (s1n, s2n) = _band_step_q28(cf_row, s, xin)
    return (jnp.where(bypass, xin, out),
            (jnp.where(bypass, s[0], s1n), jnp.where(bypass, s[1], s2n)))


# ----------------------------------------------------------------------------
# EQ cascade scans
# ----------------------------------------------------------------------------


def _active_bands(static: StaticChain, channels):
    """(ch, band, kind) for every non-skipped band of the given channels."""
    out = []
    for ch in channels:
        for band, kind in enumerate(static.band_kinds[ch]):
            if kind != SKIP:
                out.append((ch, band, kind))
    return out


def _gather_states(static, state: ChainState, bands):
    init = []
    for ch, band, kind in bands:
        if static.is_float and kind != TDF2:
            init.append((state.eq_c[ch, band], state.eq_d[ch, band]))
        else:
            init.append((state.eq_a[ch, band], state.eq_b[ch, band]))
    return tuple(init)


def _scatter_states(static, state: ChainState, bands, finals) -> ChainState:
    eq_a, eq_b = state.eq_a, state.eq_b
    eq_c, eq_d = state.eq_c, state.eq_d
    for (ch, band, kind), (sa, sb) in zip(bands, finals):
        if static.is_float and kind != TDF2:
            eq_c = eq_c.at[ch, band].set(sa)
            eq_d = eq_d.at[ch, band].set(sb)
        else:
            eq_a = eq_a.at[ch, band].set(sa)
            eq_b = eq_b.at[ch, band].set(sb)
    return state._replace(eq_a=eq_a, eq_b=eq_b, eq_c=eq_c, eq_d=eq_d)


def _delay_apply(ring_k, buf, dly, T, D):
    """One output's delayed read over a whole segment (usb_audio.c:897-911).

    Rings are stored TIME-ORDERED (oldest first, newest last) rather than
    circular: the delayed stream is then just a window into
    concat(ring, buf), so a scalar delay is one dynamic_slice (a bulk copy
    — far cheaper on TPU than the modular gathers a circular ring needs)
    and the ring update is a static tail slice.  Per-stream [B] delays use
    one take_along_axis over the same combined buffer.

    Returns (delayed [T, B], ring' [D, B])."""
    comb = jnp.concatenate([ring_k, buf], axis=0)        # [D+T, B]
    if jnp.ndim(dly) == 0:
        delayed = lax.dynamic_slice_in_dim(comb, D - dly, T, axis=0)
    else:
        tvec = jnp.arange(T, dtype=jnp.int32)
        idx = (D - dly)[None, :] + tvec[:, None]
        delayed = jnp.take_along_axis(comb, idx, axis=0)
    # ring': the last D rows of comb.  When the segment covers the ring
    # (T >= D, every production shape) that is a STATIC slice of buf —
    # expressing it that way leaves the concat a single consumer so XLA
    # fuses it into the delayed-read instead of materializing [D+T, B].
    ring_new = buf[T - D:] if T >= D else comb[T:]
    return delayed, ring_new


def _flatten_time(x):
    """[Npkt, 2, T, B] -> [2, Npkt*T, B] (time-major segment view)."""
    n, _, t, b = x.shape
    return jnp.swapaxes(x, 0, 1).reshape(2, n * t, b)


def _segment_layout(static: StaticChain, x):
    """Resolve the packet schedule to static geometry.

    Uniform chains take x as [Npkt, 2, T, B]; scheduled chains
    (static.schedule non-empty, e.g. the 44.1 kHz 44/45 cadence) take the
    already-flat [2, Ttot, B].  Returns (x2 [2, Ttot, B], sched int64
    [Npkt], Npkt, Ttot, ends int64 [Npkt] = last sample index per packet).
    Everything except x2 is static."""
    if static.schedule:
        sched = np.asarray(static.schedule, np.int64)
        Npkt = len(sched)
        Ttot = int(sched.sum())
        x2 = x
    else:
        Npkt = x.shape[0]
        sched = np.full(Npkt, static.block_size, np.int64)
        Ttot = Npkt * static.block_size
        x2 = _flatten_time(x)
    ends = np.cumsum(sched) - 1
    return x2, sched, Npkt, Ttot, ends


def _ramp_indices(sched):
    """Static (t_within_packet, packet) index pair for every flat sample —
    used to gather the per-packet gain ramps into [Ttot, B]."""
    tt = np.concatenate([np.arange(t, dtype=np.int64) for t in sched])
    kk = np.repeat(np.arange(len(sched), dtype=np.int64), sched)
    return tt, kk


def _pattern_len(sched: np.ndarray):
    """Smallest p with sched = tile(sched[:p]) — e.g. 2 for the 44.1 kHz
    (44, 45) cadence, 1 for uniform.  TPU gathers are scalar-core-driven
    and slow, so periodic schedules take reshape/slice packet
    choreography instead (here and in chain/mxu.py)."""
    n = len(sched)
    for p in range(1, n // 2 + 1):
        if n % p == 0 and bool(
                (sched == np.tile(sched[:p], n // p)).all()):
            return p
    return None


def _pkts_to_flat(arr, sched, Ttot):
    """[Npkt, Tmax, ...] -> [Ttot, ...], dropping each packet's padded
    tail rows.  Periodic schedules use static slices (no gathers)."""
    sched = np.asarray(sched, np.int64)
    p = _pattern_len(sched)
    if p:
        pat = sched[:p]
        nper = len(sched) // p
        g = arr.reshape((nper, p) + arr.shape[1:])
        parts = [g[:, j, :int(pat[j])] for j in range(p)]
        return jnp.concatenate(parts, axis=1).reshape(
            (Ttot,) + arr.shape[2:])
    tt, kk = _ramp_indices(sched)
    return arr[kk, tt]


def _per_packet(vals, sched, Ttot):
    """Broadcast a per-packet [Npkt, 1|B] array to [Ttot, 1|B] along the
    (static) schedule."""
    sched = np.asarray(sched, np.int64)
    p = _pattern_len(sched)
    if p:
        pat = sched[:p]
        nper = len(sched) // p
        g = vals.reshape((nper, p) + vals.shape[1:])
        parts = [jnp.broadcast_to(g[:, j:j + 1],
                                  (nper, int(pat[j])) + vals.shape[1:])
                 for j in range(p)]
        return jnp.concatenate(parts, axis=1).reshape(
            (Ttot,) + vals.shape[1:])
    return jnp.repeat(vals, sched, axis=0, total_repeat_length=Ttot)


def _unflatten(arrs, Npkt, T):
    """[K, Ttot, B] -> [Npkt, K, T, B] for emit='full' compatibility."""
    k, _, b = arrs.shape
    return jnp.moveaxis(arrs.reshape(k, Npkt, T, b), 1, 0)


# ----------------------------------------------------------------------------
# the segment processor
# ----------------------------------------------------------------------------


def make_process(static: StaticChain):
    """Build the jitted segment processor for a static chain structure.

    Returns ``process(params, state, x, preset_mute) -> (state', outputs)``
    with ``x`` int32 [n_packets, 2, block_size, B] (s16 or s24 values per
    ``static.bit_depth``) and ``preset_mute`` float32 [n_packets].
    """
    fn = _process_float if static.is_float else _process_q28
    jitted = jax.jit(functools.partial(fn, static), donate_argnums=(1,))

    def process(params, state, x, preset_mute=None):
        if preset_mute is None:
            npkt = len(static.schedule) if static.schedule else x.shape[0]
            preset_mute = jnp.ones((npkt,), jnp.float32)
        return jitted(params, state, x, preset_mute)

    return process


def _chain_structure(static: StaticChain):
    """Shared static analysis of which bands/outputs are live."""
    nout = static.n_outputs
    master_bands = _active_bands(
        static, [ch for ch in (0, 1)
                 if not static.bypass_master_eq and not static.channel_bypassed[ch]])
    if static.is_float:
        out_channels = [
            C.CH_OUT_1 + o for o in range(nout)
            if static.output_enabled[o] and not static.output_mute[o]
            and not static.channel_bypassed[C.CH_OUT_1 + o]]
    else:
        # NOTE: on RP2040 bypass_master_eq gates per-output EQ too
        # (usb_audio.c:1200)
        out_channels = [] if static.bypass_master_eq else [
            C.CH_OUT_1 + o for o in range(nout)
            if static.output_enabled[o] and not static.output_mute[o]
            and not static.channel_bypassed[C.CH_OUT_1 + o]]
    return master_bands, _active_bands(static, out_channels)


# ---------------------------- float path -----------------------------------


def _wire_stage(static, st, s24, Ttot, outputs):
    """Device-side wire-word output (static.wire non-empty): emit the exact
    DMA word streams the firmware's PIO state machines shift out —
    S/PDIF IEC 60958 subframe pairs (audio_spdif.c:276-288,
    sample_encoding.cpp:24-68) or I2S 24-in-32 words
    (audio_i2s_multi.c:223-226) — per configured slot type, with the
    192-frame block position threaded through ChainState.wire_pos so the
    Z preamble lands every 192 frames ACROSS segment boundaries.

    ``s24`` indexes per-channel [Ttot, B] planes (list in reduced mode,
    stacked [ns2, Ttot, B] in full mode — both index the same way).
    emit='full' -> uint32 word streams 'wire{pair}' ([Ttot, 4, B] S/PDIF,
    [Ttot, 2, B] I2S); emit='reduced' -> one uint32 fold per pair."""
    from ..kernels import encoders

    pos0 = st.wire_pos
    folds = []
    for pair, typ in enumerate(static.wire):
        sl, sr = s24[2 * pair], s24[2 * pair + 1]
        if typ == 1:
            words = jnp.stack([encoders.encode_i2s(sl),
                               encoders.encode_i2s(sr)], axis=1)
        else:
            words = encoders.encode_spdif_block(
                sl, sr, start_frame=pos0, sample_rate=static.wire_rate)
        if static.emit == "full":
            outputs[f"wire{pair}"] = words
        else:
            folds.append(jnp.sum(words, dtype=jnp.uint32))
    if folds:
        outputs["wire_sum"] = jnp.stack(folds)
    return st._replace(
        wire_pos=(pos0 + Ttot) % C.SPDIF_BLOCK_FRAMES)



def _process_float(static: StaticChain, p: ChainParams, state: ChainState,
                   x, preset_mute):
    x2, sched, Npkt, Ttot, ends = _segment_layout(static, x)
    nout = static.n_outputs
    ns2 = static.n_spdif * 2
    master_bands, out_bands = _chain_structure(static)
    unroll = static.unroll
    st = state

    # per-packet volume staging (usb_audio.c:569-574), [Npkt, 1|B]
    vol_mul_master = (p.vol_mul * preset_mute[:, None]) * p.master_vol

    # ---- PASS 1: unpack + preamp (usb_audio.c:678-686), whole segment ----
    bl = x2[0].astype(jnp.float32) * p.unpack_gain[0]
    br = x2[1].astype(jnp.float32) * p.unpack_gain[1]

    # ---- scan A: loudness + master EQ + leveller envelope ----
    # MXU lowering (chain/mxu.py): the LTI passes become per-packet block
    # matmuls; the leveller envelope becomes a weighted block reduction.
    if static.mxu and (static.loudness_on or master_bands
                       or static.leveller_on):
        from . import mxu as _mxu

        if static.loudness_on or master_bands:
            st, bl, br = _mxu.chain_a(static, p, st, bl, br, master_bands,
                                      Npkt)
        if static.leveller_on:
            env_l, env_r = _mxu.env_packet_ends(static, p, st, bl, br, Npkt)
    elif static.loudness_on or master_bands or static.leveller_on:
        # the env denormal flush (leveller.c:154-156) fires once per packet,
        # on the boundary sample (static schedule -> static flag vector)
        flag_np = np.zeros(Ttot, bool)
        flag_np[ends] = True
        pkt_end = jnp.asarray(flag_np)

        def scan_a(carry_a, xt):
            loud, eqs, env = carry_a
            if static.leveller_on:
                l_t, r_t, end_t = xt
            else:
                l_t, r_t = xt
            if static.loudness_on:
                loud_n = []
                for chi, cur in ((0, l_t), (1, r_t)):
                    for j in range(2):
                        cur, s_n = _svf_general_f32(
                            p.loud_sva[j], loud[chi * 2 + j], cur,
                            p.loud_bypass[j])
                        loud_n.append(s_n)
                    if chi == 0:
                        l_t = cur
                    else:
                        r_t = cur
                loud = tuple(loud_n)
            eqs_n = list(eqs)
            for i, (ch, band, kind) in enumerate(master_bands):
                cur = l_t if ch == 0 else r_t
                cur, eqs_n[i] = _band_step_f32(kind, p.eq_f32[ch, band],
                                               eqs[i], cur)
                if ch == 0:
                    l_t = cur
                else:
                    r_t = cur
            if static.leveller_on:
                a = p.lev[0]
                env = (a * env[0] + (1.0 - a) * (l_t * l_t),
                       a * env[1] + (1.0 - a) * (r_t * r_t))
                env = (jnp.where(end_t & (env[0] < 1e-30), 0.0, env[0]),
                       jnp.where(end_t & (env[1] < 1e-30), 0.0, env[1]))
                ys = (l_t, r_t, env[0], env[1])
            else:
                ys = (l_t, r_t)
            return (loud, tuple(eqs_n), env), ys

        loud0 = tuple(
            (st.loud_a[chi, j], st.loud_b[chi, j])
            for chi in range(2) for j in range(2))
        eqs0 = _gather_states(static, st, master_bands)
        env0 = (st.lev_env[0], st.lev_env[1])
        xs = (bl, br, pkt_end) if static.leveller_on else (bl, br)
        (loudF, eqsF, envF), ys = lax.scan(
            scan_a, (loud0, eqs0, env0), xs, unroll=unroll)
        if static.leveller_on:
            bl, br, env_seq_l, env_seq_r = ys
            # per-packet boundary envelopes (denormal-flushed in scan A)
            env_l = env_seq_l[ends]                     # [Npkt, B]
            env_r = env_seq_r[ends]
        else:
            bl, br = ys

        st = st._replace(
            loud_a=jnp.stack([jnp.stack([loudF[0][0], loudF[1][0]]),
                              jnp.stack([loudF[2][0], loudF[3][0]])]),
            loud_b=jnp.stack([jnp.stack([loudF[0][1], loudF[1][1]]),
                              jnp.stack([loudF[2][1], loudF[3][1]])]))
        st = _scatter_states(static, st, master_bands, eqsF)

    # ---- PASS 2.5 leveller block phase (leveller.c:147-262) ----
    if static.leveller_on:
        st = st._replace(lev_env=jnp.stack([env_l[-1], env_r[-1]]))

        a_att, a_rel = p.lev[1], p.lev[2]
        thresh, knee, gate = p.lev[3], p.lev[4], p.lev[5]
        max_gain, makeup = p.lev[7], p.lev[8]
        slope, inv_two_knee = p.lev[9], p.lev[10]

        # gain computer, vectorized over packets
        rms_sq = jnp.maximum(env_l, env_r)
        rms_db = 10.0 * fmath.log10_f32(rms_sq + jnp.float32(1e-30))
        half = knee * 0.5
        d = thresh + half - rms_db
        gc = jnp.where(
            rms_db > thresh + half, 0.0,
            jnp.where(rms_db >= thresh - half,
                      slope * d * d * inv_two_knee,
                      (thresh - rms_db) * slope))
        gc = jnp.minimum(gc + makeup, max_gain)
        gc = jnp.where(rms_db < gate, 0.0, gc)          # [Npkt, B]

        # block-rate attack/release smoothing: a recurrence over packets.
        # alpha^count correction (leveller.c:223-227) hoisted: pow of the
        # selected scalar == select of the pows; with a variable schedule
        # the exponent is each packet's own sample count.
        counts_f = jnp.asarray(sched.astype(np.float32))[:, None]
        pow_att = fmath.pow_f32(a_att, counts_f)        # [Npkt, 1|B]
        pow_rel = fmath.pow_f32(a_rel, counts_f)
        inv20 = jnp.float32(np.float32(1.0) / np.float32(20.0))

        def lev_step(carry, xs_k):
            gc_k, pa_k, pr_k = xs_k
            gdb, g = carry
            alpha = jnp.where(gc_k < gdb, pa_k, pr_k)
            gdb_n = fmath.smooth_det(alpha, gdb, gc_k)
            g_cur = fmath.exp10_f32(gdb_n * inv20)
            return (gdb_n, g_cur), (g, g_cur)

        (gdbF, gF), (g_prev_p, g_cur_p) = lax.scan(
            lev_step, (st.lev_gain_db, st.lev_gain), (gc, pow_att, pow_rel))
        st = st._replace(lev_gain_db=gdbF, lev_gain=gF,
                         lev_gain_prev=g_prev_p[-1])

        # gain ramp with the firmware's sequential accumulation, all
        # packets in parallel (count == 1 packets jump straight to g_cur,
        # leveller.c:216-221)
        Tmax = int(sched.max())
        if Tmax == 1:
            gains = g_cur_p.reshape(Ttot, -1)
        else:
            inv = np.zeros(Npkt, np.float32)
            nz = sched > 1
            inv[nz] = np.float32(1.0) / (sched[nz] - 1).astype(np.float32)
            step = (g_cur_p - g_prev_p) * jnp.asarray(inv)[:, None]
            if bool(np.any(~nz)):
                one = jnp.asarray(~nz)[:, None]
                start = jnp.where(one, g_cur_p, g_prev_p)
                step = jnp.where(one, 0.0, step)
            else:
                start = g_prev_p

            def ramp(g, _):
                return g + step, g

            _, gains_t = lax.scan(ramp, start, None, length=Tmax,
                                  unroll=unroll)
            if static.schedule:
                gains = _pkts_to_flat(jnp.swapaxes(gains_t, 0, 1),
                                      sched, Ttot)      # [Ttot, B]
            else:
                gains = jnp.swapaxes(gains_t, 0, 1).reshape(Ttot, -1)

        if static.leveller_lookahead:
            # time-ordered lookahead ring: the 480-sample delayed stream is
            # a static window of concat(ring, segment) — no gathers
            comb_l = jnp.concatenate([st.lev_la[0], bl], axis=0)
            comb_r = jnp.concatenate([st.lev_la[1], br], axis=0)
            out_l = comb_l[:Ttot]
            out_r = comb_r[:Ttot]
            st = st._replace(
                lev_la=jnp.stack([comb_l[Ttot:], comb_r[Ttot:]]))
        else:
            out_l, out_r = bl, br

        peak = jnp.maximum(jnp.abs(out_l), jnp.abs(out_r))
        max_g = fmath.det_div(jnp.float32(C.LEVELLER_LIMITER_CEIL), peak)
        cap = jnp.where(max_g > 1.0, max_g, 1.0)
        g_eff = jnp.where((peak > 0.0) & (gains > 1.0) & (max_g < gains),
                          cap, gains)
        bl = out_l * g_eff
        br = out_r * g_eff

    # ---- PASS 3: master peaks (pre-crossfeed) + crossfeed ----
    peak_ml = jnp.max(jnp.abs(bl), axis=0)               # [B]
    peak_mr = jnp.max(jnp.abs(br), axis=0)

    if static.mxu and (static.crossfeed_on or out_bands):
        # PASS 3-5 (crossfeed + matrix + per-output EQ) as one MIMO block
        # matmul per packet (chain/mxu.py)
        from . import mxu as _mxu

        st, bufs = _mxu.chain_b(static, p, st, bl, br, out_bands, Npkt)
    else:
        if static.crossfeed_on:
            lp_a0, lp_b1, ap_a = p.xf[0], p.xf[1], p.xf[2]

            def xf_body(cxf, xt):
                lpL, lpR, apL, apR = cxf
                ml, mr = xt
                lp_l = lp_a0 * ml + lp_b1 * lpL
                lp_r = lp_a0 * mr + lp_b1 * lpR
                ap_l = ap_a * lp_l + apL
                apL_n = lp_l - ap_a * ap_l
                ap_r = ap_a * lp_r + apR
                apR_n = lp_r - ap_a * ap_r
                return ((lp_l, lp_r, apL_n, apR_n),
                        ((ml - lp_l) + ap_r, (mr - lp_r) + ap_l))

            xf0 = (st.xf_lp[0], st.xf_lp[1], st.xf_ap[0], st.xf_ap[1])
            (lpL, lpR, apL, apR), (bl, br) = lax.scan(
                xf_body, xf0, (bl, br), unroll=unroll)
            st = st._replace(xf_lp=jnp.stack([lpL, lpR]),
                             xf_ap=jnp.stack([apL, apR]))

        # ---- PASS 4: matrix mix (usb_audio.c:751-779) ----
        bufs = []
        for o in range(nout):
            if not static.output_enabled[o]:
                bufs.append(jnp.zeros_like(bl))
                continue
            gl, gr = p.matrix_gain[0, o], p.matrix_gain[1, o]
            both = bl * gl + br * gr
            dst = jnp.where(
                (gl != 0.0) & (gr != 0.0), both,
                jnp.where(gl != 0.0, bl * gl,
                          jnp.where(gr != 0.0, br * gr, 0.0)))
            bufs.append(dst)

        # ---- PASS 5: per-output EQ ----
        if out_bands:
            def scan_b(eqs, xt):
                eqs_n = list(eqs)
                outs = list(xt)
                for i, (ch, band, kind) in enumerate(out_bands):
                    o = ch - C.CH_OUT_1
                    outs[o], eqs_n[i] = _band_step_f32(
                        kind, p.eq_f32[ch, band], eqs[i], outs[o])
                return tuple(eqs_n), tuple(outs)

            eqs0b = _gather_states(static, st, out_bands)
            eqsFb, outs = lax.scan(scan_b, eqs0b, tuple(bufs), unroll=unroll)
            st = _scatter_states(static, st, out_bands, eqsFb)
            bufs = list(outs)

    # output gains (usb_audio.c:885-894); gain varies per packet through
    # the preset-mute envelope
    for o in range(nout):
        if not static.output_enabled[o]:
            continue
        if static.output_mute[o]:
            bufs[o] = jnp.zeros_like(bufs[o])
            continue
        gain = p.out_gain[o] * vol_mul_master            # [Npkt, 1|B]
        gain_t = _per_packet(gain, sched, Ttot)          # [Ttot, 1|B]
        bufs[o] = jnp.where(gain_t == 0.0, 0.0, bufs[o] * gain_t)

    # delay lines (usb_audio.c:897-911)
    if static.delayed_outputs:
        D = static.delay_ring
        rows = []
        for k, o in enumerate(static.delayed_outputs):
            bufs[o], ring_k = _delay_apply(st.delay[k], bufs[o],
                                           p.delay_samples[k], Ttot, D)
            rows.append(ring_k)
        st = st._replace(delay=jnp.stack(rows))

    # peaks / clip flags (sticky over the segment == sticky per packet)
    peaks = [peak_ml, peak_mr]
    for o in range(ns2):
        peaks.append(jnp.max(jnp.abs(bufs[o]), axis=0))
    if static.output_enabled[nout - 1]:
        peaks.append(jnp.max(jnp.abs(bufs[nout - 1]), axis=0))
    else:
        peaks.append(jnp.zeros_like(peak_ml))
    peaks = jnp.stack(peaks)                             # [nch', B]
    clip = st.clip_flags
    for chi in range(peaks.shape[0]):
        ch_bit = chi if chi < 2 + ns2 else static.n_channels - 1
        clip = clip | jnp.where(peaks[chi] > C.CLIP_THRESH_F,
                                jnp.int32(1 << ch_bit), 0)
    st = st._replace(clip_flags=clip)

    # S/PDIF conversion (usb_audio.c:934-940)
    s24 = []
    for pair in range(static.n_spdif):
        lch, rch = pair * 2, pair * 2 + 1
        on = static.output_enabled[lch] or static.output_enabled[rch]
        for chn in (lch, rch):
            if on:
                dl = jnp.clip(bufs[chn], -1.0, 1.0)
                s24.append(_f32_to_i32(dl * jnp.float32(8388607.0)))
            else:
                s24.append(jnp.zeros(bufs[chn].shape, jnp.int32))
    outputs = {}
    # peak u16 conversion (usb_audio.c:841,921): trunc(min(1,peak)*32767)
    outputs["peaks"] = jnp.trunc(
        jnp.minimum(1.0, peaks) * 32767.0).astype(jnp.int32)
    if static.emit == "full":
        s24 = jnp.stack(s24)                             # [ns2, Ttot, B]
        if static.schedule:
            outputs["out"] = jnp.stack(bufs)             # [nout, Ttot, B]
            outputs["s24"] = s24                         # [ns2, Ttot, B]
        else:
            outputs["out"] = _unflatten(jnp.stack(bufs), Npkt,
                                        static.block_size)
            outputs["s24"] = _unflatten(s24, Npkt, static.block_size)
    else:
        # per-output sums fuse into the conversion — no [ns2, Ttot, B]
        # stack materializes in reduced mode
        outputs["s24_sum"] = jnp.stack(
            [jnp.sum(v, axis=0) for v in s24])

    if static.wire:
        st = _wire_stage(static, st, s24, Ttot, outputs)

    if static.pdm_on:
        sub_q28 = _f32_to_i32(bufs[nout - 1] * jnp.float32(1 << 28))
        st, words = pdm_segment(st, sub_q28)
        if static.emit == "full":
            outputs["pdm"] = words                       # [Ttot, 8, B] uint32
        else:
            outputs["pdm_sum"] = jnp.sum(words, axis=(0, 1), dtype=jnp.uint32)

    return st, outputs


# ---------------------------- Q28 path -------------------------------------


def _q28_eq_kernel_on(static, B) -> bool:
    """True when the Mosaic Q28 cascade kernels replace the lax.scan
    lowering (kernels/eq_pallas.py).  Scan remains for CPU backends and
    small stream counts where a mostly-idle 128-lane tile loses to the
    scan; variable-packet schedules ride the kernel's dense-envelope
    mode; DSPI_EQ_IMPL=scan|pallas forces either."""
    import os

    import jax

    impl = os.environ.get("DSPI_EQ_IMPL", "auto")
    if impl == "scan":
        return False
    if impl == "pallas":
        return True
    return jax.default_backend() == "tpu" and B >= 512


def _q28_kernel_master(static, p, st, bl, br, master_bands,
                       a_rms_q28=None, one_minus=None):
    """scan_a as two grid-parallel Mosaic cascades (loudness prefix +
    master bands + leveller envelope); returns (st', bl', br',
    (env_l, env_r) [Npkt, B] packet-end envelopes | None)."""
    from ..kernels.eq_pallas import q28_cascades

    B = bl.shape[-1]
    has_loud = bool(static.loudness_on)
    has_env = bool(static.leveller_on)
    n_loud = 2 if has_loud else 0
    # per-stream params (build_params_multi / flat grouped serving) carry
    # a trailing lane axis on every coefficient: build the per-lane
    # [.., 5, B] cf layout and the kernel's lane_cf variant runs it
    lane = p.eq_q28.ndim == 4
    mb = [[t for t in master_bands if t[0] == ch] for ch in range(2)]
    nb = max(len(mb[0]), len(mb[1]))
    ident = jnp.asarray(
        np.array([[C.Q28_ONE, 0, 0, 0, 0]], np.int32))   # exact pass-through
    if lane:
        ident = jnp.broadcast_to(ident[..., None], (1, 5, B))
    cf_ch = []
    s_ch = []
    zero = jnp.zeros((B,), jnp.int32)
    def lane_row(r):
        """Per-lane mode: a config-uniform row (collapsed by
        build_params_multi) broadcasts to the [.., 5, B] layout."""
        if lane and r.ndim == 2:
            return jnp.broadcast_to(r[..., None], r.shape + (B,))
        return r

    for ch in range(2):
        rows = []
        srows = []
        if has_loud:
            rows.append(lane_row(p.loud_qbq))
            for j in range(2):
                srows += [st.loud_a[ch, j], st.loud_b[ch, j]]
        for (c, band, _k) in mb[ch]:
            rows.append(p.eq_q28[c, band][None])
            srows += [st.eq_a[c, band], st.eq_b[c, band]]
        for _ in range(nb - len(mb[ch])):
            rows.append(ident)
            srows += [zero, zero]
        if has_env:
            srows.append(st.lev_env[ch])
        cf_ch.append(jnp.concatenate(rows, axis=0) if rows
                     else jnp.zeros((0, 5, B) if lane else (0, 5),
                                    jnp.int32))
        s_ch.append(jnp.stack(srows))
    cf = jnp.stack(cf_ch)
    s0 = jnp.stack(s_ch)
    if has_loud:
        byp = p.loud_bypass.astype(jnp.int32)
        b0, b1 = byp[0], byp[1]
    else:
        b0 = b1 = jnp.int32(0)
    svals = (b0, b1,
             a_rms_q28 if has_env else jnp.int32(0),
             one_minus if has_env else jnp.int32(0))
    if lane:
        row = jnp.stack([jnp.broadcast_to(v, (B,)) for v in svals])
        scal = jnp.broadcast_to(row[None], (2, 4, B))
    else:
        row = jnp.stack(svals)
        scal = jnp.broadcast_to(row[None], (2, 4))  # same for both channels
    y, env_ends, sF = q28_cascades(
        jnp.stack([bl, br]), cf, s0, scal, nb=nb, has_loud=has_loud,
        has_env=has_env, tc=static.block_size,
        sched=static.schedule or None)
    if has_loud:
        st = st._replace(
            loud_a=jnp.stack([jnp.stack([sF[0, 0], sF[0, 2]]),
                              jnp.stack([sF[1, 0], sF[1, 2]])]),
            loud_b=jnp.stack([jnp.stack([sF[0, 1], sF[0, 3]]),
                              jnp.stack([sF[1, 1], sF[1, 3]])]))
    finals = []
    for t in master_bands:
        c = t[0]
        r = 2 * n_loud + 2 * mb[c].index(t)
        finals.append((sF[c, r], sF[c, r + 1]))
    st = _scatter_states(static, st, master_bands, finals)
    env = ((env_ends[0], env_ends[1]) if has_env else None)
    return st, y[0], y[1], env


def _q28_kernel_outeq(static, p, st, bufs, out_bands):
    """scan_b as grid-parallel Mosaic cascades (one per live output)."""
    from ..kernels.eq_pallas import q28_cascades

    live = sorted({ch - C.CH_OUT_1 for (ch, _b, _k) in out_bands})
    per_o = {o: [t for t in out_bands if t[0] - C.CH_OUT_1 == o]
             for o in live}
    nb = max(len(v) for v in per_o.values())
    B = bufs[live[0]].shape[-1]
    lane = p.eq_q28.ndim == 4             # per-stream params (see master)
    ident = jnp.asarray(np.array([[C.Q28_ONE, 0, 0, 0, 0]], np.int32))
    if lane:
        ident = jnp.broadcast_to(ident[..., None], (1, 5, B))
    zero = jnp.zeros((B,), jnp.int32)
    cf_g, s_g = [], []
    for o in live:
        rows, srows = [], []
        for (c, band, _k) in per_o[o]:
            rows.append(p.eq_q28[c, band][None])
            srows += [st.eq_a[c, band], st.eq_b[c, band]]
        for _ in range(nb - len(per_o[o])):
            rows.append(ident)
            srows += [zero, zero]
        cf_g.append(jnp.concatenate(rows, axis=0))
        s_g.append(jnp.stack(srows))
    scal = jnp.zeros((len(live), 4, B) if lane else (len(live), 4),
                     jnp.int32)
    y, _, sF = q28_cascades(
        jnp.stack([bufs[o] for o in live]), jnp.stack(cf_g),
        jnp.stack(s_g), scal, nb=nb, tc=static.block_size,
        sched=static.schedule or None)
    finals = []
    for t in out_bands:
        gi = live.index(t[0] - C.CH_OUT_1)
        r = 2 * per_o[live[gi]].index(t)
        finals.append((sF[gi, r], sF[gi, r + 1]))
    st = _scatter_states(static, st, out_bands, finals)
    for gi, o in enumerate(live):
        bufs[o] = y[gi]
    return st, bufs


def _process_q28(static: StaticChain, p: ChainParams, state: ChainState,
                 x, preset_mute):
    x2, sched, Npkt, Ttot, ends = _segment_layout(static, x)
    nout = static.n_outputs
    ns2 = static.n_spdif * 2
    master_bands, out_bands = _chain_structure(static)
    unroll = static.unroll
    st = state

    # per-packet volume staging (usb_audio.c:975-980), [Npkt, 1|B]
    pm_q15 = jnp.clip(_f32_to_i32(preset_mute * 32768.0 + 0.5), 0, 32768)
    vol_mul = q15_mul(p.vol_mul, pm_q15[:, None])
    vol_mul_master = q15_mul(vol_mul, p.master_vol)

    # ---- PASS 1: unpack + preamp (usb_audio.c:996-1015), whole segment ----
    if static.bit_depth == 24:
        raw = (x2 << 8) >> 2
    else:
        raw = x2 << 14
    bl = q28_mul(raw[0], p.unpack_gain[0])
    br = q28_mul(raw[1], p.unpack_gain[1])

    # ---- scan A: loudness + master EQ + leveller env ----
    eq_kern = _q28_eq_kernel_on(static, bl.shape[-1])
    env_pkts = None
    if static.loudness_on or master_bands or static.leveller_on:
        if static.leveller_on:
            a_rms_q28 = _f32_to_i32(p.lev[0] * jnp.float32(1 << 28))
            one_minus = jnp.int32(C.Q28_ONE) - a_rms_q28
        else:
            a_rms_q28 = one_minus = None
        if eq_kern:
            st, bl, br, env_pkts = _q28_kernel_master(
                static, p, st, bl, br, master_bands,
                a_rms_q28, one_minus)

        def scan_a(carry_a, xt):
            loud, eqs, env = carry_a
            l_t, r_t = xt
            if static.loudness_on:
                loud_n = []
                for chi, cur in ((0, l_t), (1, r_t)):
                    for j in range(2):
                        cur, s_n = _tdf2_q28_bypassable(
                            p.loud_qbq[j], loud[chi * 2 + j], cur,
                            p.loud_bypass[j])
                        loud_n.append(s_n)
                    if chi == 0:
                        l_t = cur
                    else:
                        r_t = cur
                loud = tuple(loud_n)
            eqs_n = list(eqs)
            for i, (ch, band, kind) in enumerate(master_bands):
                cur = l_t if ch == 0 else r_t
                cur, eqs_n[i] = _band_step_q28(p.eq_q28[ch, band], eqs[i], cur)
                if ch == 0:
                    l_t = cur
                else:
                    r_t = cur
            if static.leveller_on:
                sq_l = q28_mul(l_t, l_t)
                sq_r = q28_mul(r_t, r_t)
                env = (q28_mul(a_rms_q28, env[0]) + q28_mul(one_minus, sq_l),
                       q28_mul(a_rms_q28, env[1]) + q28_mul(one_minus, sq_r))
                ys = (l_t, r_t, env[0], env[1])
            else:
                ys = (l_t, r_t)
            return (loud, tuple(eqs_n), env), ys

        if not eq_kern:
            loud0 = tuple(
                (st.loud_a[chi, j], st.loud_b[chi, j])
                for chi in range(2) for j in range(2))
            eqs0 = _gather_states(static, st, master_bands)
            env0 = (st.lev_env[0], st.lev_env[1])
            (loudF, eqsF, envF), ys = lax.scan(
                scan_a, (loud0, eqs0, env0), (bl, br), unroll=unroll)
            if static.leveller_on:
                bl, br, env_seq_l, env_seq_r = ys
                env_pkts = (env_seq_l[ends], env_seq_r[ends])
            else:
                bl, br = ys

            st = st._replace(
                loud_a=jnp.stack([jnp.stack([loudF[0][0], loudF[1][0]]),
                                  jnp.stack([loudF[2][0], loudF[3][0]])]),
                loud_b=jnp.stack([jnp.stack([loudF[0][1], loudF[1][1]]),
                                  jnp.stack([loudF[2][1], loudF[3][1]])]))
            st = _scatter_states(static, st, master_bands, eqsF)

    # ---- PASS 2.5 leveller block phase (leveller.c:274-389) ----
    if static.leveller_on:
        env_l, env_r = env_pkts                          # [Npkt, B] Q28
        st = st._replace(lev_env=jnp.stack([env_l[-1], env_r[-1]]))
        inv_q28 = jnp.float32(1.0) / jnp.float32(1 << 28)
        env_l_f = env_l.astype(jnp.float32) * inv_q28
        env_r_f = env_r.astype(jnp.float32) * inv_q28
        a_att, a_rel = p.lev[1], p.lev[2]
        thresh, knee, gate = p.lev[3], p.lev[4], p.lev[5]
        max_gain, makeup = p.lev[7], p.lev[8]
        slope, inv_two_knee = p.lev[9], p.lev[10]
        rms_sq = jnp.maximum(env_l_f, env_r_f)
        rms_db = 10.0 * fmath.log10_f32(rms_sq + jnp.float32(1e-30))
        half = knee * 0.5
        d = thresh + half - rms_db
        gc = jnp.where(
            rms_db > thresh + half, 0.0,
            jnp.where(rms_db >= thresh - half,
                      slope * d * d * inv_two_knee,
                      (thresh - rms_db) * slope))
        gc = jnp.minimum(gc + makeup, max_gain)
        gc = jnp.where(rms_db < gate, 0.0, gc)           # [Npkt, B]

        counts_f = jnp.asarray(sched.astype(np.float32))[:, None]
        pow_att = fmath.pow_f32(a_att, counts_f)
        pow_rel = fmath.pow_f32(a_rel, counts_f)
        inv20 = jnp.float32(np.float32(1.0) / np.float32(20.0))

        def lev_step(carry, xs_k):
            gc_k, pa_k, pr_k = xs_k
            gdb, g = carry
            alpha = jnp.where(gc_k < gdb, pa_k, pr_k)
            gdb_n = fmath.smooth_det(alpha, gdb, gc_k)
            g_cur = _f32_to_i32(fmath.exp10_f32(gdb_n * inv20)
                                * jnp.float32(C.Q28_ONE))
            return (gdb_n, g_cur), (g, g_cur)

        (gdbF, gF), (g_prev_p, g_cur_p) = lax.scan(
            lev_step, (st.lev_gain_db, st.lev_gain), (gc, pow_att, pow_rel))
        st = st._replace(lev_gain_db=gdbF, lev_gain=gF,
                         lev_gain_prev=g_prev_p[-1])

        # interpolated gain: g_prev + (i64(g_cur-g_prev)*i)/(count-1) with C
        # truncating division (leveller.c:352).  JAX has no int64 by
        # default, so compute |diff|*i/(count-1) in uint32 via the split
        # (a*i)//d == (a//d)*i + ((a%d)*i)//d, exact for i <= d and
        # overflow-free since the result is <= a.  Closed form — vectorized
        # over packets and samples.
        Tmax = int(sched.max())
        if Tmax == 1:
            gains = g_cur_p.reshape(Ttot, -1)
        else:
            if static.schedule:
                d_u = jnp.asarray(
                    np.maximum(sched - 1, 1).astype(np.uint32))[:, None, None]
            else:
                d_u = np.uint32(Tmax - 1)
            diff = g_cur_p - g_prev_p                    # int32 wrap, as C
            neg = diff < 0
            a_u = jnp.where(neg, -diff, diff).astype(jnp.uint32)[:, None, :]
            i_vec = jnp.arange(Tmax, dtype=jnp.uint32)[None, :, None]
            res = (a_u // d_u) * i_vec + ((a_u % d_u) * i_vec) // d_u
            q = res.astype(jnp.int32)
            gains_full = g_prev_p[:, None, :] + jnp.where(neg[:, None, :],
                                                          -q, q)
            if bool(np.any(sched == 1)):
                gains_full = jnp.where(
                    jnp.asarray(sched == 1)[:, None, None],
                    g_cur_p[:, None, :], gains_full)
            if static.schedule:
                gains = _pkts_to_flat(gains_full, sched, Ttot)
            else:
                gains = gains_full.reshape(Ttot, -1)

        if static.leveller_lookahead:
            # time-ordered lookahead ring: the 480-sample delayed stream is
            # a static window of concat(ring, segment) — no gathers
            comb_l = jnp.concatenate([st.lev_la[0], bl], axis=0)
            comb_r = jnp.concatenate([st.lev_la[1], br], axis=0)
            out_l = comb_l[:Ttot]
            out_r = comb_r[:Ttot]
            st = st._replace(
                lev_la=jnp.stack([comb_l[Ttot:], comb_r[Ttot:]]))
        else:
            out_l, out_r = bl, br

        # limiter (leveller.c:369-379): float peak math, Q28 gain cap
        unity = jnp.int32(C.Q28_ONE)
        peak = jnp.maximum(
            jnp.abs(out_l.astype(jnp.float32) * inv_q28),
            jnp.abs(out_r.astype(jnp.float32) * inv_q28))
        max_g_q28 = _f32_to_i32(
            fmath.det_div(jnp.float32(C.LEVELLER_LIMITER_CEIL), peak)
            * jnp.float32(C.Q28_ONE))
        cap = jnp.maximum(max_g_q28, unity)
        g_eff = jnp.where(
            (gains > unity) & (peak > 0.0) & (max_g_q28 < gains),
            cap, gains)
        bl = q28_mul(out_l, g_eff)
        br = q28_mul(out_r, g_eff)

    # ---- PASS 3: peaks + crossfeed ----
    peak_ml = jnp.max(jnp.abs(bl), axis=0)
    peak_mr = jnp.max(jnp.abs(br), axis=0)

    if static.crossfeed_on:
        lp_a0, lp_b1, ap_a = p.xf[0], p.xf[1], p.xf[2]

        def xf_body(cxf, xt):
            lpL, lpR, apL, apR = cxf
            ml, mr = xt
            lp_l = q28_mul(lp_a0, ml) + q28_mul(lp_b1, lpL)
            lp_r = q28_mul(lp_a0, mr) + q28_mul(lp_b1, lpR)
            ap_l = q28_mul(ap_a, lp_l) + apL
            apL_n = lp_l - q28_mul(ap_a, ap_l)
            ap_r = q28_mul(ap_a, lp_r) + apR
            apR_n = lp_r - q28_mul(ap_a, ap_r)
            return ((lp_l, lp_r, apL_n, apR_n),
                    ((ml - lp_l) + ap_r, (mr - lp_r) + ap_l))

        xf0 = (st.xf_lp[0], st.xf_lp[1], st.xf_ap[0], st.xf_ap[1])
        (lpL, lpR, apL, apR), (bl, br) = lax.scan(
            xf_body, xf0, (bl, br), unroll=unroll)
        st = st._replace(xf_lp=jnp.stack([lpL, lpR]),
                         xf_ap=jnp.stack([apL, apR]))

    # ---- PASS 4: matrix (usb_audio.c:1075-1100) ----
    bufs = []
    for o in range(nout):
        if not static.output_enabled[o]:
            bufs.append(jnp.zeros_like(bl))
            continue
        gl, gr = p.matrix_gain[0, o], p.matrix_gain[1, o]
        both = q15_mul(bl, gl) + q15_mul(br, gr)
        dst = jnp.where(
            (gl != 0) & (gr != 0), both,
            jnp.where(gl != 0, q15_mul(bl, gl),
                      jnp.where(gr != 0, q15_mul(br, gr), 0)))
        bufs.append(dst)

    # ---- PASS 5: per-output EQ ----
    if out_bands and eq_kern:
        st, bufs = _q28_kernel_outeq(static, p, st, bufs, out_bands)
    elif out_bands:
        def scan_b(eqs, xt):
            eqs_n = list(eqs)
            outs = list(xt)
            for i, (ch, band, kind) in enumerate(out_bands):
                o = ch - C.CH_OUT_1
                outs[o], eqs_n[i] = _band_step_q28(
                    p.eq_q28[ch, band], eqs[i], outs[o])
            return tuple(eqs_n), tuple(outs)

        eqs0b = _gather_states(static, st, out_bands)
        eqsFb, outs = lax.scan(scan_b, eqs0b, tuple(bufs), unroll=unroll)
        st = _scatter_states(static, st, out_bands, eqsFb)
        bufs = list(outs)

    # output gains (usb_audio.c:1203-1212): float multiply then Q15 apply
    for o in range(nout):
        if not static.output_enabled[o]:
            continue
        if static.output_mute[o]:
            bufs[o] = jnp.zeros_like(bufs[o])
            continue
        gain = _f32_to_i32(p.out_gain[o]
                           * vol_mul_master.astype(jnp.float32))
        gain_t = _per_packet(gain, sched, Ttot)          # [Ttot, 1|B]
        bufs[o] = jnp.where(gain_t == 0, 0, q15_mul(bufs[o], gain_t))

    # delay lines
    if static.delayed_outputs:
        D = static.delay_ring
        rows = []
        for k, o in enumerate(static.delayed_outputs):
            bufs[o], ring_k = _delay_apply(st.delay[k], bufs[o],
                                           p.delay_samples[k], Ttot, D)
            rows.append(ring_k)
        st = st._replace(delay=jnp.stack(rows))

    # peaks / clips (Q28: u16 = peak >> 13, usb_audio.c:1239)
    peaks = [peak_ml, peak_mr]
    for o in range(ns2):
        peaks.append(jnp.max(jnp.abs(bufs[o]), axis=0))
    if static.output_enabled[nout - 1]:
        peaks.append(jnp.max(jnp.abs(bufs[nout - 1]), axis=0))
    else:
        peaks.append(jnp.zeros_like(peak_ml))
    peaks = jnp.stack(peaks)
    clip = st.clip_flags
    for chi in range(peaks.shape[0]):
        ch_bit = chi if chi < 2 + ns2 else static.n_channels - 1
        clip = clip | jnp.where(peaks[chi] > C.CLIP_THRESH_Q28,
                                jnp.int32(1 << ch_bit), 0)
    st = st._replace(clip_flags=clip)

    # S/PDIF conversion (usb_audio.c:1244-1257)
    s24 = []
    for pair in range(static.n_spdif):
        lch, rch = pair * 2, pair * 2 + 1
        on = static.output_enabled[lch] or static.output_enabled[rch]
        for chn in (lch, rch):
            if on:
                s24.append(q28_to_s24(bufs[chn]))
            else:
                s24.append(jnp.zeros(bufs[chn].shape, jnp.int32))
    outputs = {}
    outputs["peaks"] = (peaks >> 13) & 0xFFFF
    if static.emit == "full":
        s24 = jnp.stack(s24)                             # [ns2, Ttot, B]
        if static.schedule:
            outputs["out"] = jnp.stack(bufs)
            outputs["s24"] = s24
        else:
            outputs["out"] = _unflatten(jnp.stack(bufs), Npkt,
                                        static.block_size)
            outputs["s24"] = _unflatten(s24, Npkt, static.block_size)
    else:
        outputs["s24_sum"] = jnp.stack(
            [jnp.sum(v, axis=0) for v in s24])

    if static.wire:
        st = _wire_stage(static, st, s24, Ttot, outputs)

    if static.pdm_on:
        st, words = pdm_segment(st, bufs[nout - 1])
        if static.emit == "full":
            outputs["pdm"] = words
        else:
            outputs["pdm_sum"] = jnp.sum(words, axis=(0, 1), dtype=jnp.uint32)

    return st, outputs
