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
vector op across [B] streams.  The inner 256 bits are fully unrolled inside
the scan body so XLA sees straight-line int32 vector code.

Layout: x int32 [T, B] Q28 -> words uint32 [T, 8, B].
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..core import constants as C


def _noise_shaper(ns, raw, quant_error):
    """noise_shaped_dither (pdm_generator.c:89-108).  ns: [5, B] int32."""
    x1, x2, y1, y2, acc = ns[0], ns[1], ns[2], ns[3], ns[4]
    acc = ((acc * 248) >> 8) + (quant_error >> 6)
    inp = raw - acc
    out = (C.PDM_NS_B0 * inp + C.PDM_NS_B1 * x1 + C.PDM_NS_B2 * x2
           + C.PDM_NS_A1 * y1 - C.PDM_NS_A2 * y2) >> 14
    return out, jnp.stack([inp, x1, out, y1, acc])


def pdm_segment(state, x, unroll: int = 1):
    """Run the modulator over a segment.

    ``state`` is a ChainState (only the pdm_* fields are used/updated).
    ``x``: int32 [T, B] Q28 samples.  Returns (state', words uint32 [T,8,B]).
    """

    def sample_body(carry, x_t):
        err, err2, ns, rng, fade = carry

        pcm = (x_t >> 14).clip(-C.PDM_CLIP_THRESH, C.PDM_CLIP_THRESH)
        fading = fade < C.PDM_FADE_IN_SAMPLES
        pcm = jnp.where(fading, (pcm * fade) >> C.PDM_FADE_IN_SHIFT, pcm)
        fade = jnp.where(fading, fade + 1, fade)
        target = pcm + 32768

        words = []
        for _ in range(C.PDM_CHUNKS):
            rng = rng ^ (rng << 13)
            rng = rng ^ (rng >> 17)
            rng = rng ^ (rng << 5)
            raw = (rng & C.PDM_DITHER_MASK).astype(jnp.int32) \
                - (C.PDM_DITHER_MASK >> 1)
            dither, ns = _noise_shaper(ns, raw, err2 >> 8)

            word = jnp.zeros_like(rng)
            for _k in range(32):
                cond = (err2 + dither) >= 0
                fb = jnp.where(cond, 65535, 0)
                word = (word << 1) | cond.astype(jnp.uint32)
                err = err + (target - fb)
                err2 = err2 + (err - fb)
            words.append(word)

        err = err - (err >> C.PDM_LEAKAGE_SHIFT)
        err2 = err2 - (err2 >> C.PDM_LEAKAGE_SHIFT)
        return (err, err2, ns, rng, fade), jnp.stack(words)

    carry0 = (state.pdm_err, state.pdm_err2, state.pdm_ns,
              state.pdm_rng, state.pdm_fade)
    (err, err2, ns, rng, fade), words = lax.scan(
        sample_body, carry0, x, unroll=unroll)
    state = state._replace(pdm_err=err, pdm_err2=err2, pdm_ns=ns,
                           pdm_rng=rng, pdm_fade=fade)
    return state, words
