"""MXU block-state-space lowering of the float chain's LTI passes.

The firmware's recurrent float passes — ISO 226 loudness shelves + master
EQ (usb_audio.c:689-718, dsp_pipeline.c:282-365), BS2B crossfeed
(crossfeed.c:131-156), and the per-output EQ (usb_audio.c:873-894) — are
linear time-invariant maps between parameter updates.  Over one emulated
USB packet of T samples, any LTI pass is exactly a matrix:

    [y_0..y_{T-1}; s_out]  =  M @ [x_0..x_{T-1}; s_in]

with M in R^[(n_out*T + S) x (n_in*T + S)].  This module builds M by the
impulse method — it feeds one-hot basis vectors through the *same*
per-sample step code the sequential scan path uses (pipeline._band_step_f32
/ _svf_general_f32 / the crossfeed+matrix math), so every structural
semantic (SVF vs TDF2 kinds, loudness runtime bypass freeze, the matrix
mixer's 0/1-input specialization, disabled-output zeroing) is inherited by
construction — and then applies it per packet as one MXU matmul over the
whole stream batch, scanning only the tiny state carry across packets.

Numerics: the matmul superposition re-rounds what the firmware computes
sequentially, so this path is *not* bit-identical to the golden model; it
is held to the BASELINE fidelity budget instead (<=1e-6 relative RMS vs
the firmware float path; measured ~1e-7, see tests/test_mxu.py).  All
matmuls run at Precision.HIGHEST (f32-accurate on the MXU).  The Q28 path
never uses this lowering — integer bit-exactness does not survive
reassociation.

Throughput: the sequential scans run ~1,100 dependent VPU ops per sample;
as block matmuls the same math rides the MXU at >100k x RT, leaving the
VPU free for the delta-sigma PDM kernel.

Variable-packet schedules (the 44.1 kHz 44/45 cadence) are supported: the
schedule is static, so one matrix is built per distinct packet size,
embedded into the max-size padded frame (padding rows/cols zero; padded
input samples are masked to zero so they contribute nothing and the state
does not advance through them), and gathered per packet into the scan.

Restrictions: homogeneous (non-per-stream) parameters; callers needing
per-stream coefficients use the scan path.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np

import jax.numpy as jnp
from jax import lax

from ..core import constants as C
from .pack import TDF2

# HIGHEST = 6-pass bf16 decomposition, fully f32-accurate products.
# Measured on v5e: Precision.HIGH (3-pass) degrades chain fidelity to
# 2.8e-5 relative RMS (28x over the 1e-6 firmware budget) for only +2.5%
# throughput — the matmuls are not the bottleneck; no trade to make.
_HI = lax.Precision.HIGHEST
F = np.float32


class _Layout(NamedTuple):
    """Static packet geometry (all numpy, compiled into the program)."""

    sched: np.ndarray       # [Npkt] per-packet sample counts
    tmax: int
    uniform: bool
    pad_idx: np.ndarray     # [Npkt, Tmax] flat gather indices (padded view)
    pad_mask: np.ndarray    # [Npkt, Tmax] True on real samples
    tt: np.ndarray          # [Ttot] within-packet index per flat sample
    kk: np.ndarray          # [Ttot] packet index per flat sample
    period: int | None      # repeating-pattern length (None: aperiodic)


def _lti_block(ttot: int) -> int | None:
    """SMALLEST divisor of ``ttot`` in [32, 192] — the uniform LTI
    re-blocking size (None if ttot has no divisor in range).

    Per-sample MXU work in the blocked apply scales linearly with the
    block size T (the [T, T] x-response matrix), so smaller blocks win
    until the per-packet scan turns latency-bound.  Measured on v5e,
    44.1 kHz cadence chain (13x441 samples, B=8192), round 4:
    T=147: 8,861x / 117: 9,502x / 91: 9,848x / 63: 9,964x / 49: 9,932x /
    T=39: 10,418x / 21: 9,583x (the latency cliff).  Round 3 shipped
    the LARGEST divisor on a claim the re-block "tracks the 48 kHz
    chain" — the measurement above corrects it; the floor of 32 keeps a
    margin above the measured cliff at 21.

    A ttot whose ONLY in-range divisors sit in [24, 32) (e.g.
    841 = 29x29) still re-blocks — a slightly-past-the-cliff block beats
    silently losing the LTI lowering entirely (the per-packet scan path
    it would fall back to measured 6.7k x vs ~10k re-blocked)."""
    for t in range(32, 193):
        if ttot % t == 0:
            return t
    for t in range(31, 23, -1):                 # fallback: largest in [24,32)
        if ttot % t == 0:
            return t
    return None


def _sched_layout(static, Npkt, lti: bool = False) -> _Layout:
    """``lti=True``: layout for a pass that is linear and time-invariant
    over the whole segment.  LTI state evolution is blocking-invariant —
    only the leveller's packet-rate gain staircase and envelope reads
    actually depend on the firmware's 44/45-sample USB packet boundaries
    (leveller.c:147-262) — so the block matmuls of a scheduled chain are
    free to re-block the flat sample stream uniformly (pure reshapes, no
    pad/stack choreography, one shared matrix).  Measured on v5e: the
    44.1 kHz cadence chain ran 6.7k x with per-packet 44/45 blocks and
    the periodic pack/unpack; re-blocked uniform it tracks the 48 kHz
    chain.  (The Q28 path's Mosaic kernels already time-block
    independently of the packet grid — eq_pallas.py kt — which is why
    scheduled Q28 never paid this tax.)"""
    from .pipeline import _pattern_len, _ramp_indices

    if static.schedule:
        sched = np.asarray(static.schedule, np.int64)
        if lti and not bool((sched == sched.max()).all()):
            T = _lti_block(int(sched.sum()))
            if T:
                sched = np.full(int(sched.sum()) // T, T, np.int64)
    else:
        sched = np.full(Npkt, static.block_size, np.int64)
    Tmax = int(sched.max())
    starts = np.concatenate([[0], np.cumsum(sched)[:-1]])
    pad_idx = np.minimum(starts[:, None] + np.arange(Tmax)[None, :],
                         int(sched.sum()) - 1)
    pad_mask = (np.arange(Tmax)[None, :] < sched[:, None])
    tt, kk = _ramp_indices(sched)
    return _Layout(sched, Tmax, bool((sched == Tmax).all()),
                   pad_idx, pad_mask, tt, kk, _pattern_len(sched))


def _to_packets(x_flat, layout: _Layout):
    """[Ttot, B] -> [Npkt, Tmax, B]; padded samples forced to zero.

    Periodic schedules use pure reshapes + static slices (a period of
    sum(pattern) samples repeats, so each pattern position is a strided
    slice) — no gathers; aperiodic schedules keep the gather+mask."""
    if layout.uniform:
        return x_flat.reshape(len(layout.sched), layout.tmax,
                              x_flat.shape[-1])
    if layout.period:
        p, Tmax = layout.period, layout.tmax
        pat = layout.sched[:p]
        nper = len(layout.sched) // p
        xg = x_flat.reshape(nper, int(pat.sum()), x_flat.shape[-1])
        offs = np.concatenate([[0], np.cumsum(pat)[:-1]])
        cols = []
        for j in range(p):
            s = int(pat[j])
            blk = xg[:, int(offs[j]):int(offs[j]) + s]
            if s < Tmax:
                blk = jnp.pad(blk, [(0, 0), (0, Tmax - s), (0, 0)])
            cols.append(blk)
        return jnp.stack(cols, axis=1).reshape(-1, Tmax, x_flat.shape[-1])
    return (x_flat[layout.pad_idx]
            * layout.pad_mask[:, :, None].astype(x_flat.dtype))


def _to_flat(y_pkts, layout: _Layout):
    """[Npkt, Tmax, B] -> [Ttot, B], dropping padded rows."""
    if layout.uniform:
        n, t, b = y_pkts.shape
        return y_pkts.reshape(n * t, b)
    if layout.period:
        p = layout.period
        pat = layout.sched[:p]
        nper = len(layout.sched) // p
        yg = y_pkts.reshape((nper, p) + y_pkts.shape[1:])
        parts = [yg[:, j, :int(pat[j])] for j in range(p)]
        flat = jnp.concatenate(parts, axis=1)
        return flat.reshape((-1,) + y_pkts.shape[2:])
    return y_pkts[layout.kk, layout.tt]


def _embed(M_s, s, S, Tmax, n_io):
    """Embed a size-s block matrix into the padded Tmax frame.

    Row/col layout is [io0(T); io1(T); ...; states]; padded sample rows and
    columns are zero, so masked (zero) padded inputs neither produce output
    nor advance the state."""
    if s == Tmax:
        return M_s
    R = n_io * Tmax + S
    out = jnp.zeros((R, R), M_s.dtype)
    for bi in range(n_io):
        for bj in range(n_io):
            out = out.at[bi * Tmax:bi * Tmax + s,
                         bj * Tmax:bj * Tmax + s].set(
                M_s[bi * s:(bi + 1) * s, bj * s:(bj + 1) * s])
        out = out.at[bi * Tmax:bi * Tmax + s, n_io * Tmax:].set(
            M_s[bi * s:(bi + 1) * s, n_io * s:])
        out = out.at[n_io * Tmax:, bi * Tmax:bi * Tmax + s].set(
            M_s[n_io * s:, bi * s:(bi + 1) * s])
    return out.at[n_io * Tmax:, n_io * Tmax:].set(M_s[n_io * s:, n_io * s:])


class _PatM(NamedTuple):
    """Block matrices per pattern position ([p, ...]) for periodic
    schedules: the hoisted input matmuls run with p SHARED matrices over
    nper-packet groups (p=2 for 44/45 — two full-width MXU matmuls)
    instead of Npkt per-packet matrices."""

    M: jnp.ndarray


def _build_seq(build_for_size, layout, S, n_io):
    """One padded matrix per distinct packet size, gathered per packet.

    ``build_for_size(s) -> M_s [(n_io*s+S), (n_io*s+S)]``.  Returns a
    single matrix (uniform), per-pattern-position matrices (periodic,
    wrapped in _PatM), or [Npkt, R, R] (aperiodic)."""
    if layout.uniform:
        return build_for_size(layout.tmax)
    mats = {s: _embed(build_for_size(s), s, S, layout.tmax, n_io)
            for s in sorted({int(v) for v in layout.sched})}
    if layout.period:
        return _PatM(jnp.stack(
            [mats[int(s)] for s in layout.sched[:layout.period]]))
    return jnp.stack([mats[int(s)] for s in layout.sched])


def _linearize(step, T: int, n_in: int, S: int, unroll: int = 8):
    """Build the impulse responses of ``step`` over a T-sample block.

    ``step(s, x_t) -> (s', y_t)`` with state ``s`` [S, C] and per-sample
    input ``x_t`` [n_in, C] (squeezed to [C] when n_in == 1), evaluated on
    C = n_in*T + S basis columns: one per input sample slot (z layout
    [in0(T); in1(T); ...; s]) and one per state slot.

    Returns (Y, sF): Y [T, ...out..., C] stacked per-sample outputs and the
    final state sF [S, C] — the caller assembles M from them.
    """
    Cc = n_in * T + S
    X = np.zeros((T, n_in, Cc), F)
    for t in range(T):
        for i in range(n_in):
            X[t, i, i * T + t] = 1.0
    S0 = np.zeros((S, Cc), F)
    for k in range(S):
        S0[k, n_in * T + k] = 1.0
    xs = jnp.asarray(X[:, 0] if n_in == 1 else X)
    sF, Y = lax.scan(lambda s, x: step(s, x), jnp.asarray(S0), xs,
                     unroll=unroll)
    return Y, sF


def _pick_xchunk(n: int, per_pkt_bytes: int) -> int:
    """Packet-chunk length for the hoisted x-response matmuls.

    The input responses (yx [.., Ry, B], vx [.., S, B]) are consumed
    packet-by-packet by the state scan, so only a chunk of them needs to
    be live at once: at the 96 kHz 128x96 segment geometry the
    whole-segment hoist alone was 2 x 6.75 GB and pushed the program past
    HBM (18.72 needed vs 15.75 GB, RESULTS_r04.md probe_96k).  Chunking
    bounds the hoist at chunk x per-packet bytes while keeping every
    input matmul MXU-batched over the chunk; the state recurrence is
    unchanged (an outer scan over chunks around the same inner scan).

    Returns the largest divisor of ``n`` whose yx+vx footprint fits the
    budget (``DSPI_MXU_XRESP_MB``, default 1536 MB) — ``n`` itself when
    the whole segment fits, which keeps the headline 48 kHz shapes on the
    exact single-level code path.  ``DSPI_MXU_XCHUNK`` forces a chunk
    length (clamped to the largest divisor <= the forced value; probes
    use it to measure chunking's neutrality at non-OOM shapes)."""
    force = os.environ.get("DSPI_MXU_XCHUNK")
    if force:
        c = max(1, min(int(force), n))
        while n % c:
            c -= 1
        return c
    budget = int(os.environ.get("DSPI_MXU_XRESP_MB", "1536")) << 20
    if n * per_pkt_bytes <= budget:
        return n
    best = 1
    for c in range(2, n):
        if n % c == 0 and c * per_pkt_bytes <= budget:
            best = c
    return best


def _apply_blocked(M, Ry, S, x_pkts, s0):
    """Apply a block matrix per packet with the input part hoisted.

    ``w_k = M @ [x_k; s_k]`` would re-run the big input matmul inside the
    packet scan; instead the input responses run as large batched matmuls
    up front — whole-segment when they fit, in bounded packet CHUNKS when
    they would not (_pick_xchunk) — and the scan carries only the [S, B]
    state through tiny state matmuls; the per-packet data choreography
    (slice/update of [Npkt, ...] buffers inside a while loop) drops away.

    M [Ry+S, Cx+S] (shared), _PatM([p, Ry+S, Cx+S]) (periodic schedule),
    or [Npkt, Ry+S, Cx+S] (per-packet, aperiodic schedule);
    x_pkts [Npkt, Cx, B]; s0 [S, B].
    Returns (sF [S, B], y [Npkt, Ry, B])."""
    B = x_pkts.shape[-1]
    if isinstance(M, _PatM):
        Mp = M.M                                    # [p, R, C]
        p = Mp.shape[0]
        Npkt = x_pkts.shape[0]
        Cx = Mp.shape[-1] - S
        Tx, U = Mp[:, :Ry, :Cx], Mp[:, :Ry, Cx:]
        V, W = Mp[:, Ry:, :Cx], Mp[:, Ry:, Cx:]
        n_g = Npkt // p

        # scan over pattern GROUPS: the p state matmuls unroll inside the
        # body with U[j]/W[j] as constants — p x fewer scan steps, no
        # per-packet tiling of the state matrices.
        def gbody(s, xk):
            yx_g, vx_g = xk                          # [p, Ry|S, B]
            ys = []
            for j in range(p):
                ys.append(yx_g[j] + jnp.matmul(U[j], s, precision=_HI))
                s = vx_g[j] + jnp.matmul(W[j], s, precision=_HI)
            return s, jnp.stack(ys)

        def resp(xg):                                # [.., p, Cx, B]
            return (jnp.einsum("qij,nqjb->nqib", Tx, xg, precision=_HI),
                    jnp.einsum("qsj,nqjb->nqsb", V, xg, precision=_HI))

        cg = _pick_xchunk(n_g, p * (Ry + S) * B * 4)
        if cg == n_g:
            sF, y = lax.scan(gbody, s0,
                             resp(x_pkts.reshape(n_g, p, Cx, B)))
        else:
            def cbody(s, x_c):
                return lax.scan(gbody, s, resp(x_c))

            sF, y = lax.scan(cbody, s0,
                             x_pkts.reshape(n_g // cg, cg, p, Cx, B))
        return sF, y.reshape(Npkt, Ry, B)

    seq = M.ndim == 3
    Cx = M.shape[-1] - S
    Tx, U = M[..., :Ry, :Cx], M[..., :Ry, Cx:]
    V, W = M[..., Ry:, :Cx], M[..., Ry:, Cx:]
    N = x_pkts.shape[0]
    cn = _pick_xchunk(N, (Ry + S) * B * 4)

    def body_shared(s, xk):
        yx_k, vx_k = xk
        y = yx_k + jnp.matmul(U, s, precision=_HI)
        return vx_k + jnp.matmul(W, s, precision=_HI), y

    def body_seq(s, xk):
        yx_k, vx_k, U_k, W_k = xk
        y = yx_k + jnp.matmul(U_k, s, precision=_HI)
        return vx_k + jnp.matmul(W_k, s, precision=_HI), y

    if seq:
        def resp(x_c, Tx_c, V_c):                    # per-packet matrices
            return (jnp.einsum("pij,pjb->pib", Tx_c, x_c, precision=_HI),
                    jnp.einsum("psj,pjb->psb", V_c, x_c, precision=_HI))

        if cn == N:
            yx, vx = resp(x_pkts, Tx, V)
            return lax.scan(body_seq, s0, (yx, vx, U, W))

        def cbody(s, xk):
            x_c, Tx_c, V_c, U_c, W_c = xk
            yx, vx = resp(x_c, Tx_c, V_c)
            return lax.scan(body_seq, s, (yx, vx, U_c, W_c))

        xs = tuple(v.reshape((N // cn, cn) + v.shape[1:])
                   for v in (x_pkts, Tx, V, U, W))
        sF, y = lax.scan(cbody, s0, xs)
        return sF, y.reshape((N,) + y.shape[2:])

    def resp(x_c):
        return (jnp.einsum("ij,pjb->pib", Tx, x_c, precision=_HI),
                jnp.einsum("sj,pjb->psb", V, x_c, precision=_HI))

    if cn == N:
        return lax.scan(body_shared, s0, resp(x_pkts))

    def cbody(s, x_c):
        return lax.scan(body_shared, s, resp(x_c))

    sF, y = lax.scan(cbody, s0,
                     x_pkts.reshape((N // cn, cn) + x_pkts.shape[1:]))
    return sF, y.reshape((N,) + y.shape[2:])


def _apply_blocked_batched(M, Ry, S, x_pkts, s0):
    """Batched _apply_blocked over a leading group axis.

    M [G, Ry+S, Cx+S], _PatM([p, G, Ry+S, Cx+S]) (periodic schedule), or
    per-packet [Npkt, G, Ry+S, Cx+S];
    x_pkts [Npkt, G, Cx, B]; s0 [G, S, B].
    Returns (sF [G, S, B], y [Npkt, G, Ry, B]).

    The x-response hoist chunks exactly like _apply_blocked — this is
    the variant that OOMed the 96 kHz 128x96 geometry (its yx/vx were
    the [128, 9, 96, 16384] 2 x 6.75 GB buffers)."""
    B = x_pkts.shape[-1]
    G = x_pkts.shape[1]
    if isinstance(M, _PatM):
        Mp = M.M                                    # [p, G, R, C]
        p = Mp.shape[0]
        Npkt = x_pkts.shape[0]
        Cx = Mp.shape[-1] - S
        Tx, U = Mp[..., :Ry, :Cx], Mp[..., :Ry, Cx:]
        V, W = Mp[..., Ry:, :Cx], Mp[..., Ry:, Cx:]
        n_g = Npkt // p

        def gbody(s, xk):
            yx_g, vx_g = xk                          # [p, G, Ry|S, B]
            ys = []
            for j in range(p):
                ys.append(yx_g[j] + jnp.einsum(
                    "gis,gsb->gib", U[j], s, precision=_HI))
                s = vx_g[j] + jnp.einsum(
                    "gst,gtb->gsb", W[j], s, precision=_HI)
            return s, jnp.stack(ys)

        def resp(xg):                                # [.., p, G, Cx, B]
            return (jnp.einsum("qgij,nqgjb->nqgib", Tx, xg,
                               precision=_HI),
                    jnp.einsum("qgsj,nqgjb->nqgsb", V, xg,
                               precision=_HI))

        cg = _pick_xchunk(n_g, p * G * (Ry + S) * B * 4)
        if cg == n_g:
            sF, y = lax.scan(
                gbody, s0,
                resp(x_pkts.reshape((n_g, p) + x_pkts.shape[1:])))
        else:
            def cbody(s, x_c):
                return lax.scan(gbody, s, resp(x_c))

            sF, y = lax.scan(
                cbody, s0,
                x_pkts.reshape((n_g // cg, cg, p) + x_pkts.shape[1:]))
        return sF, y.reshape((Npkt, G, Ry, B))

    seq = M.ndim == 4
    Cx = M.shape[-1] - S
    Tx, U = M[..., :Ry, :Cx], M[..., :Ry, Cx:]
    V, W = M[..., Ry:, :Cx], M[..., Ry:, Cx:]
    N = x_pkts.shape[0]
    cn = _pick_xchunk(N, G * (Ry + S) * B * 4)

    def body_shared(s, xk):
        yx_k, vx_k = xk
        y = yx_k + jnp.einsum("gis,gsb->gib", U, s, precision=_HI)
        return vx_k + jnp.einsum("gst,gtb->gsb", W, s, precision=_HI), y

    def body_seq(s, xk):
        yx_k, vx_k, U_k, W_k = xk
        y = yx_k + jnp.einsum("gis,gsb->gib", U_k, s, precision=_HI)
        return (vx_k + jnp.einsum("gst,gtb->gsb", W_k, s, precision=_HI),
                y)

    if seq:
        def resp(x_c, Tx_c, V_c):
            return (jnp.einsum("pgij,pgjb->pgib", Tx_c, x_c,
                               precision=_HI),
                    jnp.einsum("pgsj,pgjb->pgsb", V_c, x_c,
                               precision=_HI))

        if cn == N:
            yx, vx = resp(x_pkts, Tx, V)
            return lax.scan(body_seq, s0, (yx, vx, U, W))

        def cbody(s, xk):
            x_c, Tx_c, V_c, U_c, W_c = xk
            yx, vx = resp(x_c, Tx_c, V_c)
            return lax.scan(body_seq, s, (yx, vx, U_c, W_c))

        xs = tuple(v.reshape((N // cn, cn) + v.shape[1:])
                   for v in (x_pkts, Tx, V, U, W))
        sF, y = lax.scan(cbody, s0, xs)
        return sF, y.reshape((N,) + y.shape[2:])

    def resp(x_c):
        return (jnp.einsum("gij,pgjb->pgib", Tx, x_c, precision=_HI),
                jnp.einsum("gsj,pgjb->pgsb", V, x_c, precision=_HI))

    if cn == N:
        return lax.scan(body_shared, s0, resp(x_pkts))

    def cbody(s, x_c):
        return lax.scan(body_shared, s, resp(x_c))

    sF, y = lax.scan(cbody, s0,
                     x_pkts.reshape((N // cn, cn) + x_pkts.shape[1:]))
    return sF, y.reshape((N,) + y.shape[2:])


# ----------------------------------------------------------------------------
# chain A: loudness shelves + master EQ (per channel SISO)
# ----------------------------------------------------------------------------


def _check_homogeneous(p):
    """The impulse-built block matrices are linearized from homogeneous
    coefficients; a trailing per-stream axis (build_params_multi) would
    broadcast against the impulse basis and produce silently wrong blocks
    when shapes happen to line up.  Guard on ranks (pack.py layouts)."""
    if p.eq_f32 is not None and jnp.ndim(p.eq_f32) != 3:
        raise ValueError(
            "MXU chain requires homogeneous params (eq_f32 [nch, NB, 11]); "
            "per-stream parameters must use the scan path (mxu=False)")
    if jnp.ndim(p.xf) != 1 or jnp.ndim(p.matrix_gain) != 2:
        raise ValueError(
            "MXU chain requires homogeneous params (xf [3], matrix_gain "
            "[2, nout]); per-stream parameters must use the scan path")


def _make_a_step(static, p, ch, ch_bands):
    from .pipeline import _band_step_f32, _svf_general_f32

    loud = static.loudness_on

    def step(s, x):
        cur = x
        new = []
        i = 0
        if loud:
            for j in range(2):
                cur, (sa, sb) = _svf_general_f32(
                    p.loud_sva[j], (s[i], s[i + 1]), cur, p.loud_bypass[j])
                new += [sa, sb]
                i += 2
        for (c, band, kind) in ch_bands:
            cur, (sa, sb) = _band_step_f32(kind, p.eq_f32[c, band],
                                           (s[i], s[i + 1]), cur)
            new += [sa, sb]
            i += 2
        return jnp.stack(new), cur

    return step, (4 if loud else 0) + 2 * len(ch_bands)


def _a_state_get(static, st, ch, ch_bands):
    rows = []
    if static.loudness_on:
        for j in range(2):
            rows += [st.loud_a[ch, j], st.loud_b[ch, j]]
    for (c, band, kind) in ch_bands:
        if kind != TDF2:                             # SVF state
            rows += [st.eq_c[c, band], st.eq_d[c, band]]
        else:
            rows += [st.eq_a[c, band], st.eq_b[c, band]]
    return jnp.stack(rows)


def _scatter_band_states(st, entries):
    """Batch per-band state writebacks into ONE scatter per state array.

    ``entries``: (c, band, kind, sa, sb) rows.  The naive per-band
    ``arr.at[c, band].set(row)`` chain forces XLA through 2*n_bands
    sequential full-array scatters — measured ~8 ms/segment on the
    headline config's 90-band out-EQ writeback.  Grouping by target array
    and scattering all rows at once turns that into <=4 scatters."""
    groups = {}
    for (c, band, kind, sa, sb) in entries:
        fa, fb = ("eq_a", "eq_b") if kind == TDF2 else ("eq_c", "eq_d")
        for f, row in ((fa, sa), (fb, sb)):
            cs, bs, vs = groups.setdefault(f, ([], [], []))
            cs.append(c)
            bs.append(band)
            vs.append(row)
    for f, (cs, bs, vs) in groups.items():
        arr = getattr(st, f).at[np.asarray(cs), np.asarray(bs)].set(
            jnp.stack(vs))
        st = st._replace(**{f: arr})
    return st


def _a_state_set(static, st, ch, ch_bands, vec):
    i = 0
    if static.loudness_on:
        loud_a, loud_b = st.loud_a, st.loud_b
        for j in range(2):
            loud_a = loud_a.at[ch, j].set(vec[i])
            loud_b = loud_b.at[ch, j].set(vec[i + 1])
            i += 2
        st = st._replace(loud_a=loud_a, loud_b=loud_b)
    entries = []
    for (c, band, kind) in ch_bands:
        entries.append((c, band, kind, vec[i], vec[i + 1]))
        i += 2
    return _scatter_band_states(st, entries) if entries else st


def chain_a(static, p, st, bl, br, master_bands, Npkt):
    """Apply loudness + master EQ to both channels as per-packet matmuls.

    bl/br: [Ttot, B] post-preamp samples.  Returns (st', bl', br')."""
    _check_homogeneous(p)
    layout = _sched_layout(static, Npkt, lti=True)
    Tmax = layout.tmax
    outs = [bl, br]
    for ch in (0, 1):
        ch_bands = [t for t in master_bands if t[0] == ch]
        step, S = _make_a_step(static, p, ch, ch_bands)
        if S == 0:
            continue

        def build(s, step=step, S=S):
            Y, sF = _linearize(step, s, 1, S)
            return jnp.concatenate([Y, sF], axis=0)  # [s+S, s+S]

        M = _build_seq(build, layout, S, 1)
        s0 = _a_state_get(static, st, ch, ch_bands)
        sFin, y = _apply_blocked(M, Tmax, S, _to_packets(outs[ch], layout),
                                 s0)
        outs[ch] = _to_flat(y, layout)
        st = _a_state_set(static, st, ch, ch_bands, sFin)
    return st, outs[0], outs[1]


# ----------------------------------------------------------------------------
# leveller RMS envelope at packet ends (closed-form block reduction)
# ----------------------------------------------------------------------------


def env_packet_ends(static, p, st, bl, br, Npkt):
    """Packet-end RMS envelopes (leveller.c:150-156) as weighted block sums.

    env_t = a*env_{t-1} + (1-a)*y_t^2 unrolled over one packet of T_k
    samples: env_end = a^T_k * env_start + sum_j a^(T_k-1-j)*(1-a)*y_j^2,
    with the firmware's denormal flush applied at every packet boundary.
    Scheduled chains get per-packet weight rows (padded samples weigh 0).
    Returns (env_l, env_r) [Npkt, B] — flushed boundary values."""
    layout = _sched_layout(static, Npkt)
    sched, Tmax, uniform = layout.sched, layout.tmax, layout.uniform
    a = p.lev[0]
    pw = jnp.cumprod(jnp.full((Tmax,), a, jnp.float32))       # a^1..a^Tmax

    def w_for(s):
        w = jnp.concatenate([pw[:s - 1][::-1],
                             jnp.ones((1,), jnp.float32)]) * (1.0 - a)
        return jnp.concatenate([w, jnp.zeros((Tmax - s,), jnp.float32)])

    if uniform:
        y2l = _to_packets(bl, layout)
        y2r = _to_packets(br, layout)
        y2l = y2l * y2l
        y2r = y2r * y2r
        w = w_for(Tmax)
        cl = jnp.einsum("t,ptb->pb", w, y2l, precision=_HI)
        cr = jnp.einsum("t,ptb->pb", w, y2r, precision=_HI)
        aT_seq = jnp.broadcast_to(pw[Tmax - 1], (Npkt,))
    elif layout.period:
        # periodic fast path: no pad/stack packing — per-packet weighted
        # sums straight off the flat stream via a [p, P]-row einsum
        # (row j is packet j's a^(s-1-i)*(1-a) weights at its own offsets
        # within the P-sample period, zero elsewhere)
        pp = layout.period
        pat = layout.sched[:pp]
        P = int(pat.sum())
        nper = Npkt // pp
        wflat = jnp.concatenate(
            [w_for(int(s))[:int(s)] for s in pat])            # [P]
        mask = np.zeros((pp, P), np.float32)
        off = 0
        for j, s in enumerate(pat):
            mask[j, off:off + int(s)] = 1.0
            off += int(s)
        W = jnp.asarray(mask) * wflat[None, :]                # [p, P]
        y2l = bl.reshape(nper, P, -1)
        y2r = br.reshape(nper, P, -1)
        y2l = y2l * y2l
        y2r = y2r * y2r
        cl = jnp.einsum("jt,ntb->njb", W, y2l,
                        precision=_HI).reshape(Npkt, -1)
        cr = jnp.einsum("jt,ntb->njb", W, y2r,
                        precision=_HI).reshape(Npkt, -1)
        aT_seq = jnp.stack([pw[int(s) - 1] for s in sched])
    else:
        y2l = _to_packets(bl, layout)
        y2r = _to_packets(br, layout)
        y2l = y2l * y2l
        y2r = y2r * y2r
        ws = {s: w_for(s) for s in sorted({int(v) for v in sched})}
        w_seq = jnp.stack([ws[int(s)] for s in sched])        # [Npkt, Tmax]
        cl = jnp.einsum("pt,ptb->pb", w_seq, y2l, precision=_HI)
        cr = jnp.einsum("pt,ptb->pb", w_seq, y2r, precision=_HI)
        aT_seq = jnp.stack([pw[int(s) - 1] for s in sched])

    def body(env, xk):
        c_l, c_r, aT = xk
        el = aT * env[0] + c_l
        er = aT * env[1] + c_r
        el = jnp.where(el < 1e-30, 0.0, el)
        er = jnp.where(er < 1e-30, 0.0, er)
        return (el, er), (el, er)

    _, (env_l, env_r) = lax.scan(body, (st.lev_env[0], st.lev_env[1]),
                                 (cl, cr, aT_seq))
    return env_l, env_r


# ----------------------------------------------------------------------------
# chain B: crossfeed + matrix mixer + per-output EQ (2-in nout-out MIMO)
# ----------------------------------------------------------------------------


def _make_xf_step(p):
    def step(s, x):
        ml, mr = x[0], x[1]
        lp_a0, lp_b1, ap_a = p.xf[0], p.xf[1], p.xf[2]
        lpL, lpR, apL, apR = s[0], s[1], s[2], s[3]
        lp_l = lp_a0 * ml + lp_b1 * lpL
        lp_r = lp_a0 * mr + lp_b1 * lpR
        ap_l = ap_a * lp_l + apL
        apL_n = lp_l - ap_a * ap_l
        ap_r = ap_a * lp_r + apR
        apR_n = lp_r - ap_a * ap_r
        return (jnp.stack([lp_l, lp_r, apL_n, apR_n]),
                jnp.stack([(ml - lp_l) + ap_r, (mr - lp_r) + ap_l]))

    return step


def _make_out_step(static, p, o_bands, pad):
    """SISO per-output EQ cascade step with ``pad`` pass-through state
    slots appended (so outputs with fewer bands batch into one einsum)."""
    from .pipeline import _band_step_f32

    def step(s, x):
        cur = x
        new = []
        i = 0
        for (ch, band, kind) in o_bands:
            cur, (sa, sb) = _band_step_f32(kind, p.eq_f32[ch, band],
                                           (s[i], s[i + 1]), cur)
            new += [sa, sb]
            i += 2
        for k in range(pad):
            new.append(s[i + k])
        return jnp.stack(new), cur

    return step


def chain_b(static, p, st, bl, br, out_bands, Npkt):
    """Crossfeed + matrix + per-output EQ via structured block matmuls.

    A dense MIMO block matrix for PASS 3-5 would be [(9T+S) x (2T+S)], but
    its state blocks are structurally sparse: output o's samples depend
    only on the crossfeed poles and o's OWN band memories.  So: crossfeed
    runs as its own [2T+4]^2 stereo matmul, the matrix mixer stays
    elementwise (it is memoryless), and the per-output EQ cascades run as
    one BATCHED einsum over [n_live, T+S_max, T+S_max] — 3.3x fewer matmul
    flops than the dense form for the 9x10-band headline config.

    Returns (st', bufs): nout [Ttot, B] arrays — the same values PASS 3-5
    of the scan path produces, to matmul rounding."""
    _check_homogeneous(p)
    nout = static.n_outputs
    layout = _sched_layout(static, Npkt, lti=True)
    sched, Tmax, uniform = layout.sched, layout.tmax, layout.uniform

    if static.crossfeed_on:
        step = _make_xf_step(p)

        def build_xf(s):
            Y, sF = _linearize(step, s, 2, 4)        # Y [s, 2, C]
            return jnp.concatenate(
                [jnp.moveaxis(Y, 1, 0).reshape(2 * s, 2 * s + 4), sF],
                axis=0)

        M = _build_seq(build_xf, layout, 4, 2)
        s0 = jnp.stack([st.xf_lp[0], st.xf_lp[1], st.xf_ap[0], st.xf_ap[1]])
        x2 = jnp.concatenate([_to_packets(bl, layout),
                              _to_packets(br, layout)], axis=1)
        sFin, y = _apply_blocked(M, 2 * Tmax, 4, x2, s0)
        st = st._replace(xf_lp=jnp.stack([sFin[0], sFin[1]]),
                         xf_ap=jnp.stack([sFin[2], sFin[3]]))
        bl = _to_flat(y[:, :Tmax], layout)
        br = _to_flat(y[:, Tmax:], layout)

    # matrix mix (usb_audio.c:751-779) — memoryless, stays elementwise
    bufs = []
    for o in range(nout):
        if not static.output_enabled[o]:
            bufs.append(jnp.zeros_like(bl))
            continue
        gl, gr = p.matrix_gain[0, o], p.matrix_gain[1, o]
        both = bl * gl + br * gr
        bufs.append(jnp.where(
            (gl != 0.0) & (gr != 0.0), both,
            jnp.where(gl != 0.0, bl * gl,
                      jnp.where(gr != 0.0, br * gr, 0.0))))

    if out_bands:
        B = bl.shape[-1]
        live = sorted({ch - C.CH_OUT_1 for (ch, _b, _k) in out_bands})
        per_o = {o: [t for t in out_bands if t[0] - C.CH_OUT_1 == o]
                 for o in live}
        S_max = max(2 * len(b) for b in per_o.values())

        def build_group(s):
            Ms = []
            for o in live:
                pad = S_max - 2 * len(per_o[o])
                step = _make_out_step(static, p, per_o[o], pad)
                Y, sF = _linearize(step, s, 1, S_max)
                Ms.append(jnp.concatenate([Y, sF], axis=0))
            return Ms                                 # G x [s+S, s+S]

        lay_o = layout
        if uniform:
            M_o = jnp.stack(build_group(Tmax))        # [G, T+S, T+S]
        else:
            mats = {s: jnp.stack([_embed(m, s, S_max, Tmax, 1)
                                  for m in build_group(s)])
                    for s in sorted({int(v) for v in sched})}
            if layout.period:
                M_o = _PatM(jnp.stack(
                    [mats[int(s)] for s in sched[:layout.period]]))
            else:
                M_o = jnp.stack([mats[int(s)] for s in sched])

        s_rows = []
        for o in live:
            vec = _b_state_get_out(static, st, per_o[o])
            if vec.shape[0] < S_max:
                vec = jnp.concatenate(
                    [vec, jnp.zeros((S_max - vec.shape[0], B), vec.dtype)])
            s_rows.append(vec)
        s0 = jnp.stack(s_rows)                        # [G, S_max, B]

        x_g = jnp.stack([_to_packets(bufs[o], lay_o) for o in live],
                        axis=1)                       # [Npkt, G, Tmax, B]
        sFin, y = _apply_blocked_batched(M_o, lay_o.tmax, S_max, x_g, s0)
        entries = []
        for gi, o in enumerate(live):
            for j, (c, band, kind) in enumerate(per_o[o]):
                entries.append((c, band, kind,
                                sFin[gi][2 * j], sFin[gi][2 * j + 1]))
            bufs[o] = _to_flat(y[:, gi], lay_o)
        if entries:
            st = _scatter_band_states(st, entries)
    return st, bufs


def _b_state_get_out(static, st, o_bands):
    rows = []
    for (c, band, kind) in o_bands:
        if kind != TDF2:
            rows += [st.eq_c[c, band], st.eq_d[c, band]]
        else:
            rows += [st.eq_a[c, band], st.eq_b[c, band]]
    return jnp.stack(rows)


