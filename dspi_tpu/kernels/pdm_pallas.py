"""Pallas TPU kernel for the PDM delta-sigma modulator.

Same exact semantics as kernels/pdm.py (pdm_generator.c:349-397) but as a
hand-scheduled TPU kernel: the per-stream modulator state lives in VMEM
across the whole segment, the 256-bit inner loop is straight-line vector
code, and the only HBM traffic is the Q28 input stream in and the packed
PDM words out.

Grid: (stream_tiles, time_chunks) — time innermost.  The state block's
index map depends only on the stream tile, so Pallas keeps it resident in
VMEM across consecutive time chunks (the revisiting/accumulator pattern)
and flushes it once per stream tile.

State layout: int32 [16, B] rows:
  0 err, 1 err2, 2 ns_x1, 3 ns_x2, 4 ns_y1, 5 ns_y2, 6 ns_acc,
  7 rng (uint32 bits), 8 fade_in_pos, 9 pdm_enabled, 10 hw_running,
  11 fade_out_pos, 12 fade_base_pcm, 13..15 padding (sublane alignment).

Rows 9-12 are the enable/fade-out machine (pdm_generator.c:217-252,
323-338): segment-start transitions (kernels.pdm.mode_prologue) run
outside the kernel; the per-sample reactions — fade-out countdown from
the held fade_base_pcm, the hardware stop at count 0, frozen modulator
state + silence words while stopped — run in-kernel.  States packed
without the machine get (ena=1, run=1, fout=0, base=0), for which every
mode op selects the original value — bit-identical to the pre-machine
kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import constants as C

_SRL = lax.shift_right_logical
_SRA = lax.shift_right_arithmetic


# np scalar, not jnp: a traced constant would be captured by the kernel
_SILENCE = np.int32(np.uint32(C.PDM_SILENCE_WORD))


def _modulate_sample(x_t, err, err2, x1, x2, y1, y2, acc, rng, fade,
                     ena, run, fout, base):
    """One PCM sample -> 8 words.  Exact firmware arithmetic on int32.

    The bit loop is an 8-op/bit rewrite of pdm_generator.c:367-380 (the
    naive transcription is 11 ops/bit).  With m = (err2+dither) >> 31
    (arithmetic; -1 when the bit is 0) and the substitutions
    f = m & 65535 (= 65535 - fb),  errm = err - 65535,  t65 = target-65535,
    u = word + 1, the reference update

        bit  = (err2 + dither) >= 0;  fb = bit ? 65535 : 0
        word = (word << 1) | bit
        err += target - fb;  err2 += err - fb

    becomes (e2d = err2 + dither carried through the chunk, int32 ops wrap
    mod 2^32 exactly like the firmware's):

        m = e2d >> 31;  f = m & 65535
        errm += t65 + f;  e2d += errm + f;  u = u + u + m

    with word = u - 1 and err2 = e2d - dither recovered at chunk end.
    Bit-exactness vs the scan lowering is asserted by tests/test_pdm_impls.
    """
    # per-sample enable/fade-out machine (pdm_generator.c:320-364);
    # fade_out_pos decrements first, the m == 0 slot stops the hardware
    # without modulating (:327-334), and the target during fade-out ramps
    # the held fade_base_pcm (:326), input ignored (ring drained, :324)
    enab = ena != 0
    fading_out = jnp.logical_and(jnp.logical_not(enab), fout > 0)
    fout = jnp.where(fading_out, fout - 1, fout)
    run = jnp.where(jnp.logical_and(fading_out, fout == 0),
                    jnp.zeros_like(run), run)
    act = jnp.logical_or(enab, jnp.logical_and(fading_out, fout >= 1))
    keep = (err, err2, x1, x2, y1, y2, acc, rng)

    pcm = jnp.clip(_SRA(x_t, 14), -C.PDM_CLIP_THRESH, C.PDM_CLIP_THRESH)
    fading = fade < C.PDM_FADE_IN_SAMPLES
    pcm = jnp.where(fading, _SRA(pcm * fade, C.PDM_FADE_IN_SHIFT), pcm)
    fade = jnp.where(jnp.logical_and(enab, fading), fade + 1, fade)
    base = jnp.where(enab, pcm, base)
    target = jnp.where(enab, pcm + 32768,
                       _SRA(base * fout, C.PDM_FADE_IN_SHIFT) + 32768)
    c65 = jnp.int32(65535)
    t65 = target - c65
    errm = err - c65

    words = []
    for _c in range(C.PDM_CHUNKS):
        # xorshift32 on int32 bits (shifts are bit-identical to uint32)
        rng = rng ^ (rng << 13)
        rng = rng ^ _SRL(rng, 17)
        rng = rng ^ (rng << 5)
        raw = (rng & C.PDM_DITHER_MASK) - (C.PDM_DITHER_MASK >> 1)

        # noise-shaped dither (pdm_generator.c:89-108)
        acc = _SRA(acc * 248, 8) + _SRA(_SRA(err2, 8), 6)
        inp = raw - acc
        total = (C.PDM_NS_B0 * inp + C.PDM_NS_B1 * x1 + C.PDM_NS_B2 * x2
                 + C.PDM_NS_A1 * y1 - C.PDM_NS_A2 * y2)
        dither = _SRA(total, 14)
        x2 = x1
        x1 = inp
        y2 = y1
        y1 = dither

        e2d = err2 + dither
        u = jnp.ones_like(err)
        for _k in range(32):
            m = _SRA(e2d, 31)                # 0 if bit==1 else -1
            f = m & c65                      # 65535 - fb
            errm = errm + (t65 + f)
            e2d = e2d + (errm + f)
            u = u + u + m
        words.append(jnp.where(act, u - 1, _SILENCE))
        err2 = e2d - dither

    err = errm + c65
    err = err - _SRA(err, C.PDM_LEAKAGE_SHIFT)
    err2 = err2 - _SRA(err2, C.PDM_LEAKAGE_SHIFT)
    # inactive samples (stopped hardware / the stop slot) freeze the
    # modulator; the mode rows (run/fout/fade/base) self-manage above
    err, err2, x1, x2, y1, y2, acc, rng = (
        jnp.where(act, n, o)
        for n, o in zip((err, err2, x1, x2, y1, y2, acc, rng), keep))
    return words, (err, err2, x1, x2, y1, y2, acc, rng, fade,
                   ena, run, fout, base)


def _pdm_kernel(x_ref, state_ref, words_ref, state_out_ref, *, tc, t_real):
    """``t_real`` (segments whose length is not a multiple of tc) bounds
    the final block's loop to the real samples — the time axis is padded
    to the tc grid and the modulator state must freeze after the last
    real sample (unlike lanes, time is sequential: letting the state
    advance through pad samples would corrupt the carried recurrence)."""
    t_chunk = pl.program_id(1)

    @pl.when(t_chunk == 0)
    def _():
        state_out_ref[:] = state_ref[:]

    st = tuple(state_out_ref[i] for i in range(13))

    def body(i, carry):
        words, carry = _modulate_sample(x_ref[i], *carry)
        for c, w in enumerate(words):
            words_ref[i, c] = w
        return carry

    if t_real is None:
        n = tc
    else:
        n = jnp.minimum(tc, t_real - t_chunk * tc)
    st = lax.fori_loop(0, n, body, st)
    for i, v in enumerate(st):
        state_out_ref[i] = v


@functools.partial(jax.jit, static_argnames=("tc", "bt", "interpret"))
def pdm_segment_pallas(x, state16, tc: int = 128, bt: int = 1024,
                       interpret: bool = False):
    """x: int32 [Ttot, B]; state16: int32 [16, B].
    Returns (words uint32 [Ttot, 8, B], state16').  B % bt == 0 required;
    Ttot pads up to the tc grid (Mosaic requires sublane-divisible time
    blocks, so tc must stay a multiple of 8 — a dynamic loop bound
    freezes the modulator state after the last real sample and the
    padded word rows are sliced off)."""
    ttot, b = x.shape
    assert b % bt == 0 and tc % 8 == 0, (ttot, tc, b, bt)
    tp = -(-ttot // tc) * tc
    if tp != ttot:
        x = jnp.pad(x, [(0, tp - ttot), (0, 0)])
    grid = (b // bt, tp // tc)

    words, state_out = pl.pallas_call(
        functools.partial(_pdm_kernel, tc=tc,
                          t_real=ttot if tp != ttot else None),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tc, bt), lambda bi, ti: (ti, bi)),
            pl.BlockSpec((16, bt), lambda bi, ti: (0, bi)),
        ],
        out_specs=[
            pl.BlockSpec((tc, 8, bt), lambda bi, ti: (ti, 0, bi)),
            pl.BlockSpec((16, bt), lambda bi, ti: (0, bi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, 8, b), jnp.int32),
            jax.ShapeDtypeStruct((16, b), jnp.int32),
        ],
        interpret=interpret,
    )(x, state16)
    if tp != ttot:
        words = words[:ttot]
    return words.astype(jnp.uint32), state_out


def pack_pdm_state(state) -> jnp.ndarray:
    """ChainState pdm fields -> int32 [16, B] kernel layout.  States
    without the enable machine pack the always-enabled identity
    (ena=1, run=1, fout=0, base=0)."""
    b = state.pdm_err.shape[0]
    dyn = getattr(state, "pdm_ena", None) is not None
    ones = jnp.ones((b,), jnp.int32)
    zero = jnp.zeros((b,), jnp.int32)
    rows = [state.pdm_err, state.pdm_err2,
            state.pdm_ns[0], state.pdm_ns[1], state.pdm_ns[2],
            state.pdm_ns[3], state.pdm_ns[4],
            state.pdm_rng.astype(jnp.int32), state.pdm_fade,
            state.pdm_ena if dyn else ones,
            state.pdm_run if dyn else ones,
            state.pdm_fout if dyn else zero,
            state.pdm_base if dyn else zero]
    z = jnp.zeros((3, b), jnp.int32)
    return jnp.concatenate([jnp.stack(rows), z], axis=0)


def unpack_pdm_state(state, s16):
    upd = dict(pdm_err=s16[0], pdm_err2=s16[1], pdm_ns=s16[2:7],
               pdm_rng=s16[7].astype(jnp.uint32), pdm_fade=s16[8])
    if getattr(state, "pdm_ena", None) is not None:
        upd.update(pdm_ena=s16[9], pdm_run=s16[10],
                   pdm_fout=s16[11], pdm_base=s16[12])
    return state._replace(**upd)


def pdm_segment_fast(state, x, tc: int = 128, bt: int = 1024,
                     interpret: bool = False):
    """Drop-in for kernels.pdm.pdm_segment using the Pallas kernel.
    Returns (state', words uint32 [Ttot, 8, B])."""
    s16 = pack_pdm_state(state)
    words, s16b = pdm_segment_pallas(x, s16, tc=tc, bt=bt,
                                     interpret=interpret)
    return unpack_pdm_state(state, s16b), words


# ------------------- batched / arbitrary-B front door ----------------------
#
# Measured on v5e (48 kHz segment, chained-on-device timing): kernel
# throughput is proportional to the stream-tile width bt and INDEPENDENT
# of tc — at bt=128 each vector op touches one 1/8-filled vreg, at
# bt=8192 eight full vregs pipeline.  So (a) arbitrary B is best served
# by padding the lane axis up to a wide tile and slicing the pad off
# (padding is free relative to running narrow tiles), and (b) a vmapped
# call (GroupedEngine / HeteroServer: K groups x G lanes) must NOT batch
# the grid — it should flatten K into the lane axis and run ONE wide
# kernel.  The custom_vmap rule below does exactly that; the modulator is
# per-lane (no cross-stream coupling and no per-config parameters), so
# flattening is bit-exact.
_BT_RTF = {8192: 36800.0, 4096: 29300.0, 2048: 16800.0, 1024: 9000.0}


def _rtf_est(bt: int) -> float:
    """Kernel throughput vs stream-tile width: measured anchor points
    (_BT_RTF, v5e), linear interpolation between them, and the measured
    -8% penalty flat above 8192 (README "measured-and-rejected")."""
    pts = sorted(_BT_RTF.items())
    if bt <= pts[0][0]:
        return pts[0][1] * bt / pts[0][0]
    if bt > pts[-1][0]:
        return pts[-1][1] * 0.92
    for (b0, r0), (b1, r1) in zip(pts, pts[1:]):
        if bt <= b1:
            return r0 + (r1 - r0) * (bt - b0) / (b1 - b0)
    return pts[-1][1]


def padded_tiles(ttot: int, b: int):
    """(tc, bt, b_pad, eff_rtf) maximizing estimated effective throughput
    rtf(bt) * (real / padded work).

    Lane candidates are the measured power-of-two anchors PLUS fitted
    128-multiple widths ceil(b/k)/128-rounded — hetero bucket flattening
    makes widths just past an anchor (8 x 1085 = 8680 would pad to
    2 x 8192 or 3 x 4096; a fitted 8704 single tile wastes 0.3%).

    tc stays a multiple of 8 (the Mosaic sublane rule); ttot not
    divisible by tc costs <= tc-1 padded samples on the time axis
    (44.1 kHz cadences make odd segment lengths, e.g. 13 x 441 = 5733),
    which the effective-throughput score accounts for.  A divisor tc is
    preferred only through that score, never by relaxing tc below 8 —
    blocks of 4/2/1 samples are illegal on the TPU."""
    cands = set(_BT_RTF)
    for k in (1, 2, 3, 4):
        per_tile = -(-b // k)                        # ceil(b / k)
        cands.add(-(-per_tile // 128) * 128)         # round up to 128
    best = None
    for bt in cands:
        r = _rtf_est(bt)
        b_pad = -(-b // bt) * bt
        # words block <= 4 MB.  No tc exemption: a lane candidate whose
        # minimum-legal tc=8 block would still blow the budget (fitted
        # bt > 16384) is skipped outright — the <=8192 anchors always
        # satisfy the cap at tc=8, so a best candidate always exists.
        cap = max(1, (4 << 20) // (8 * bt * 4))
        for tc in (32, 16, 8):
            if tc > cap:
                continue
            t_pad = -(-ttot // tc) * tc
            eff = r * (b / b_pad) * (ttot / t_pad)
            if best is None or eff > best[3]:
                best = (tc, bt, b_pad, eff)
    return best


from jax.custom_batching import custom_vmap                    # noqa: E402


@custom_vmap
def pdm_words_flat(x, s16):
    """(x [Ttot, B], s16 [16, B]) -> (words uint32 [Ttot, 8, B], s16').

    Pads the lane axis to the best-effective tile (padded lanes run
    garbage that is sliced off; real lanes are untouched — every kernel
    op is lane-wise)."""
    ttot, b = x.shape
    tc, bt, b_pad, _ = padded_tiles(ttot, b)
    if b_pad != b:
        pad = [(0, 0), (0, b_pad - b)]
        x = jnp.pad(x, pad)
        s16 = jnp.pad(s16, pad)
    words, s16b = pdm_segment_pallas(x, s16, tc=tc, bt=bt)
    if b_pad != b:
        words, s16b = words[..., :b], s16b[..., :b]
    return words, s16b


@pdm_words_flat.def_vmap
def _pdm_words_flat_vmap(axis_size, in_batched, x, s16):
    """K groups x G lanes -> one [Ttot, K*G] kernel call (see above)."""
    if not in_batched[0]:
        x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
    if not in_batched[1]:
        s16 = jnp.broadcast_to(s16[None], (axis_size,) + s16.shape)
    k, ttot, g = x.shape
    xf = jnp.moveaxis(x, 0, 1).reshape(ttot, k * g)
    sf = jnp.moveaxis(s16, 0, 1).reshape(16, k * g)
    words, s16b = pdm_words_flat(xf, sf)
    words = jnp.moveaxis(words.reshape(ttot, 8, k, g), 2, 0)
    s16b = jnp.moveaxis(s16b.reshape(16, k, g), 1, 0)
    return (words, s16b), (True, True)
