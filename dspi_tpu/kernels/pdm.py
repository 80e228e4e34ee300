"""PDM delta-sigma modulator: 256x-oversampled 2nd-order error feedback.

Reproduces pdm_processing_loop (pdm_generator.c:349-397) bit-exactly:

  per PCM sample:
    pcm    = sample >> 14, hard-limited to +/-29500 (~90% modulation)
    fade   = 1024-sample linear fade-in after (re)start
    target = pcm + 32768
    8 chunks x 32 bits:
      dither = noise-shaped TPDF (xorshift32 + Q14 Butterworth HP with
               error-feedback accumulator, pdm_generator.c:89-108)
      bit_k: fb = (err2 + dither) >= 0 ? 65535 : 0
             err  += target - fb;   err2 += err - fb
    leaky integrators: err -= err>>16; err2 -= err2>>16

The quantizer feedback is a nonlinear recurrence — inherently sequential in
time.  All throughput comes from the stream axis: every bit step is one
vector op across [B] streams.

Bit-step formulation under XLA (the scan lowerings): EXACTLY the
reference's op shape.  Measured on v5e (pdm_experiments.py, B=8192):

  reference form (compare err2+dither, scalar-const fb select) : 2095x RT
  dither folded into the carry (one add/bit fewer!)             :  932x
  increments as selects of per-sample [B] arrays                : 1038x
  mask-or instead of shift-or word build                        : equal

Fewer ops on paper lost 2x under XLA — both "optimizations" knock its
lowering off the fast path (vector-operand selects cost far more than
scalar-splat selects).  The Pallas kernel is different: with explicit
register-resident state the 8-op/bit sign-mask form wins (see
kernels/pdm_pallas.py).  Change either only with a fresh measurement.

Sample-scope work (clip, fade ramp, target) is closed-form over the whole
segment and computed vectorized outside the scan: the fade counter is
``min(fade0 + t, 1024)`` exactly (pdm_generator.c:351-358).

Three lowerings of the same math:

  * ``pallas``   — the production TPU path (kernels/pdm_pallas.py): a
    Mosaic kernel with the modulator state register/VMEM-resident across
    the whole segment and an 8-op/bit sign-mask bit loop.  Measured
    46,710x RT at B=8192 on v5e vs 2,346x for the XLA scan (the first
    port, before the op diet, measured 30,854x).  Round 1 concluded
    Pallas was *slower* because its per-call walls sat on the ~27 ms
    tunnel-readback floor; chained-on-device timing (segment iterations
    inside one jit, one readback) shows the truth.  Requires
    B % 1024 == 0 and a segment length divisible by a usable time chunk;
    falls back otherwise.
  * ``unrolled`` — all 256 bit steps straight-line inside a lax.scan body;
    the XLA fallback (and the reference the others are tested against).
  * ``fori``     — nested lax.fori_loop over chunks/bits; ~100x faster to
    compile on XLA:CPU, used by the test suite (the unrolled body used to
    cost >2 min of compile per chain variant on CPU hosts).

Layout: x int32 [T, B] Q28 -> words uint32 [T, 8, B].
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

from ..core import constants as C


def _noise_shaper(ns, raw, quant_error):
    """noise_shaped_dither (pdm_generator.c:89-108).

    ns: tuple (x1, x2, y1, y2, acc) of int32 [B]."""
    x1, x2, y1, y2, acc = ns
    acc = ((acc * 248) >> 8) + (quant_error >> 6)
    inp = raw - acc
    out = (C.PDM_NS_B0 * inp + C.PDM_NS_B1 * x1 + C.PDM_NS_B2 * x2
           + C.PDM_NS_A1 * y1 - C.PDM_NS_A2 * y2) >> 14
    return out, (inp, x1, out, y1, acc)


def _xorshift32(rng):
    rng = rng ^ (rng << 13)
    rng = rng ^ (rng >> 17)
    return rng ^ (rng << 5)


def _targets(x, fade0):
    """Vectorized sample prep (pdm_generator.c:351-364): clip, fade, +32768.

    x: int32 [T, B] Q28;  fade0: int32 [B].  Returns (target [T, B],
    fade' [B]) — the fade counter advance is the closed form of the
    firmware's per-sample saturating increment."""
    T = x.shape[0]
    pcm = (x >> 14).clip(-C.PDM_CLIP_THRESH, C.PDM_CLIP_THRESH)
    fade_t = jnp.minimum(fade0[None, :] + jnp.arange(T, dtype=jnp.int32)[:, None],
                         C.PDM_FADE_IN_SAMPLES)
    pcm = jnp.where(fade_t < C.PDM_FADE_IN_SAMPLES,
                    (pcm * fade_t) >> C.PDM_FADE_IN_SHIFT, pcm)
    fade = jnp.minimum(fade0 + T, C.PDM_FADE_IN_SAMPLES)
    return pcm + 32768, fade


def mode_prologue(state):
    """Segment-start enable/fade-out loop reactions, vectorized over [B]
    (pdm_generator.c:225-255; the firmware runs these at the top of the
    core-1 loop, which for the segment model is the segment boundary —
    the control plane only flips ``pdm_ena`` between segments):

      * disable while running -> start the 1024-sample fade-out (:226-229)
      * re-enable mid-fade    -> out-ramp becomes an in-ramp (:233-236)
      * re-enable after stop  -> modulator restart: err/err2/noise shaper/
        fades/base reset; the xorshift32 PRNG is a firmware global and
        persists (:240-252)
    """
    ena = state.pdm_ena != 0
    run = state.pdm_run != 0
    fout = state.pdm_fout
    fout = jnp.where(~ena & run & (fout == 0),
                     jnp.int32(C.PDM_FADE_IN_SAMPLES), fout)
    cancel = ena & (fout > 0)
    fade = jnp.where(cancel, C.PDM_FADE_IN_SAMPLES - fout, state.pdm_fade)
    fout = jnp.where(cancel, 0, fout)
    restart = ena & ~run
    z = jnp.int32(0)
    return state._replace(
        pdm_err=jnp.where(restart, z, state.pdm_err),
        pdm_err2=jnp.where(restart, z, state.pdm_err2),
        pdm_ns=jnp.where(restart[None, :], z, state.pdm_ns),
        pdm_fade=jnp.where(restart, z, fade),
        pdm_base=jnp.where(restart, z, state.pdm_base),
        pdm_fout=jnp.where(restart, z, fout),
        pdm_run=(run | ena).astype(jnp.int32))


def _mode_targets(state, x):
    """Per-sample targets + active mask over a whole segment, closed form
    (the scan-lowering analog of the firmware's per-sample mode machine,
    pdm_generator.c:320-364; ``mode_prologue`` must already have run).

    Enabled streams take the fade-in path exactly as ``_targets``; a
    fading-out stream's sample t modulates target
    ``(base * m) >> 10 + 32768`` with m = fout0-1-t while m >= 1, the
    m == 0 slot stops the hardware without modulating (:327-334), and
    stopped samples are inactive (state frozen, silence words).

    Returns (target [T, B], active bool [T, B], state')."""
    T = x.shape[0]
    ena_b = state.pdm_ena != 0
    ena = ena_b[None, :]
    t = jnp.arange(T, dtype=jnp.int32)[:, None]
    pcm = (x >> 14).clip(-C.PDM_CLIP_THRESH, C.PDM_CLIP_THRESH)
    fade_t = jnp.minimum(state.pdm_fade[None, :] + t, C.PDM_FADE_IN_SAMPLES)
    pcm = jnp.where(fade_t < C.PDM_FADE_IN_SAMPLES,
                    (pcm * fade_t) >> C.PDM_FADE_IN_SHIFT, pcm)
    m = state.pdm_fout[None, :] - 1 - t
    tgt_out = ((state.pdm_base[None, :] * jnp.maximum(m, 0))
               >> C.PDM_FADE_IN_SHIFT) + 32768
    target = jnp.where(ena, pcm + 32768, tgt_out)
    active = ena | ((state.pdm_run != 0)[None, :] & (m >= 1))
    state = state._replace(
        pdm_fade=jnp.where(
            ena_b, jnp.minimum(state.pdm_fade + T, C.PDM_FADE_IN_SAMPLES),
            state.pdm_fade),
        pdm_base=jnp.where(ena_b, pcm[-1], state.pdm_base),
        pdm_fout=jnp.where(ena_b, 0, jnp.maximum(state.pdm_fout - T, 0)),
        pdm_run=jnp.where(
            ena_b, 1,
            ((state.pdm_run != 0) & (state.pdm_fout > T))).astype(jnp.int32))
    return target, active, state


def _chunk_unrolled(err, err2, dither, target):
    """One 32-bit chunk (pdm_generator.c:367-380 op shape).
    Returns (err', err2', word)."""
    word = jnp.zeros(err.shape, jnp.uint32)
    for _k in range(32):
        cond = (err2 + dither) >= 0
        fb = jnp.where(cond, 65535, 0)
        word = (word << 1) | cond.astype(jnp.uint32)
        err = err + (target - fb)
        err2 = err2 + (err - fb)
    return err, err2, word


def _sample_unrolled(carry, xs):
    err, err2, ns, rng = carry
    target = xs
    words = []
    for _ in range(C.PDM_CHUNKS):
        rng = _xorshift32(rng)
        raw = (rng & C.PDM_DITHER_MASK).astype(jnp.int32) \
            - (C.PDM_DITHER_MASK >> 1)
        dither, ns = _noise_shaper(ns, raw, err2 >> 8)
        err, err2, word = _chunk_unrolled(err, err2, dither, target)
        words.append(word)
    err = err - (err >> C.PDM_LEAKAGE_SHIFT)
    err2 = err2 - (err2 >> C.PDM_LEAKAGE_SHIFT)
    return (err, err2, ns, rng), jnp.stack(words)


def _sample_fori(carry, xs):
    """Same math, rolled into fori_loops (fast XLA:CPU compile)."""
    err, err2, ns, rng = carry
    target = xs

    def bit_body(_, st):
        err, err2, word, dither = st
        cond = (err2 + dither) >= 0
        fb = jnp.where(cond, 65535, 0)
        word = (word << 1) | cond.astype(jnp.uint32)
        err = err + (target - fb)
        err2 = err2 + (err - fb)
        return err, err2, word, dither

    def chunk_body(j, st):
        err, err2, ns, rng, words = st
        rng = _xorshift32(rng)
        raw = (rng & C.PDM_DITHER_MASK).astype(jnp.int32) \
            - (C.PDM_DITHER_MASK >> 1)
        dither, ns = _noise_shaper(ns, raw, err2 >> 8)
        word0 = jnp.zeros(err.shape, jnp.uint32)
        err, err2, word, _ = lax.fori_loop(0, 32, bit_body,
                                           (err, err2, word0, dither))
        words = lax.dynamic_update_slice_in_dim(words, word[None], j, axis=0)
        return err, err2, ns, rng, words

    words0 = jnp.zeros((C.PDM_CHUNKS,) + err.shape, jnp.uint32)
    err, err2, ns, rng, words = lax.fori_loop(
        0, C.PDM_CHUNKS, chunk_body, (err, err2, ns, rng, words0))
    err = err - (err >> C.PDM_LEAKAGE_SHIFT)
    err2 = err2 - (err2 >> C.PDM_LEAKAGE_SHIFT)
    return (err, err2, ns, rng), words


def _masked(body):
    """Wrap a sample body with the active mask: inactive samples (hardware
    stopped / the fade-out's final slot) freeze the modulator state and
    emit the stopped-hardware silence word (pdm_generator.c:327-334: the
    stop iteration `continue`s before modulating)."""

    def wrapped(carry, xs):
        target, act = xs
        new, words = body(carry, target)
        err, err2, ns, rng = carry
        nerr, nerr2, nns, nrng = new
        carry2 = (jnp.where(act, nerr, err), jnp.where(act, nerr2, err2),
                  tuple(jnp.where(act, n, o) for n, o in zip(nns, ns)),
                  jnp.where(act, nrng, rng))
        words = jnp.where(act[None, :], words,
                          jnp.uint32(C.PDM_SILENCE_WORD))
        return carry2, words

    return wrapped


def _pallas_worthwhile(ttot: int, b: int) -> bool:
    """Use the Mosaic kernel when its padded-tile effective throughput
    beats the XLA scan lowering (~2.4k x RT, flat in B on v5e).  Small
    lane counts pad to a mostly-idle 1024-wide tile and lose; everything
    serving-sized wins.  See pdm_pallas.padded_tiles."""
    from .pdm_pallas import padded_tiles

    t = padded_tiles(ttot, b)
    return t is not None and t[3] > 2400.0


def resolve_impl(impl: str = "auto") -> str:
    """'auto' picks the fast-compiling fori lowering on XLA:CPU (where the
    256-wide unrolled body costs minutes of compile) and the Pallas kernel
    on TPU.  Override with DSPI_PDM_IMPL."""
    impl = os.environ.get("DSPI_PDM_IMPL", impl)
    if impl == "auto":
        backend = jax.default_backend()
        impl = ("pallas" if backend == "tpu"
                else "fori" if backend == "cpu" else "unrolled")
    return impl


def pdm_segment(state, x, unroll: int = 1, impl: str = "auto"):
    """Run the modulator over a segment.

    ``state`` is a ChainState (only the pdm_* fields are used/updated).
    ``x``: int32 [T, B] Q28 samples.  Returns (state', words uint32 [T,8,B]).

    When the state carries the enable/fade-out machine (``pdm_ena`` is
    not None — every ``init_state`` chain does), the firmware's
    enable/disable state machine runs: segment-start loop reactions
    (``mode_prologue``), per-sample fade-out / stop / restart semantics,
    frozen state + silence words while the hardware is stopped.  States
    without the fields (legacy checkpoints, microbenches) take the
    always-enabled fast path.
    """
    impl = resolve_impl(impl)
    dyn = getattr(state, "pdm_ena", None) is not None
    if dyn:
        state = mode_prologue(state)
    if impl == "pallas":
        if _pallas_worthwhile(x.shape[0], x.shape[1]):
            from .pdm_pallas import (pack_pdm_state, pdm_words_flat,
                                     unpack_pdm_state)
            words, s16 = pdm_words_flat(x, pack_pdm_state(state))
            return unpack_pdm_state(state, s16), words
        impl = "unrolled"
    body = _sample_fori if impl == "fori" else _sample_unrolled
    ns0 = tuple(state.pdm_ns[i] for i in range(5))
    carry0 = (state.pdm_err, state.pdm_err2, ns0, state.pdm_rng)
    if dyn:
        target, active, state = _mode_targets(state, x)
        (err, err2, ns, rng), words = lax.scan(
            _masked(body), carry0, (target, active), unroll=unroll)
    else:
        target, fade = _targets(x, state.pdm_fade)
        (err, err2, ns, rng), words = lax.scan(body, carry0, target,
                                               unroll=unroll)
        state = state._replace(pdm_fade=fade)
    state = state._replace(pdm_err=err, pdm_err2=err2, pdm_ns=jnp.stack(ns),
                           pdm_rng=rng)
    return state, words
