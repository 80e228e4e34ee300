"""Pallas PDM kernel, variant 2: full-batch tiles for ALU-latency hiding.

The modulator's bit loop is one long dependency chain; with a single
(8,128) register per value the VPU stalls on ALU latency every op.  Keeping
the WHOLE stream batch in each value ([S, 128] with S = B/128 sublanes =
B/1024 native registers) gives the scheduler B/1024-way ILP to hide
latency — the same reason the XLA scan formulation is fast at B=8192.

Grid is time-only; modulator state stays resident in VMEM across all time
chunks (index map constant in the time dimension).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from .pdm_pallas import _modulate_sample, pack_pdm_state, unpack_pdm_state


def _kernel(x_ref, state_ref, words_ref, state_out_ref, *, tc):
    t_chunk = pl.program_id(0)

    @pl.when(t_chunk == 0)
    def _():
        state_out_ref[:] = state_ref[:]

    st = tuple(state_out_ref[i] for i in range(9))

    def body(i, carry):
        words, carry = _modulate_sample(x_ref[i], *carry)
        for c, w in enumerate(words):
            words_ref[i, c] = w
        return carry

    st = lax.fori_loop(0, tc, body, st)
    for i, v in enumerate(st):
        state_out_ref[i] = v


@functools.partial(jax.jit, static_argnames=("tc", "interpret"))
def pdm_pallas2(x, state16, tc: int = 16, interpret: bool = False):
    """x int32 [Ttot, B], state16 [16, B]; B % 1024 == 0, Ttot % tc == 0.
    Returns (words uint32 [Ttot, 8, B], state16')."""
    ttot, b = x.shape
    assert b % 1024 == 0 and ttot % tc == 0
    s = b // 128
    x3 = x.reshape(ttot, s, 128)
    s3 = state16.reshape(16, s, 128)

    words, state_out = pl.pallas_call(
        functools.partial(_kernel, tc=tc),
        grid=(ttot // tc,),
        in_specs=[
            pl.BlockSpec((tc, s, 128), lambda ti: (ti, 0, 0)),
            pl.BlockSpec((16, s, 128), lambda ti: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tc, 8, s, 128), lambda ti: (ti, 0, 0, 0)),
            pl.BlockSpec((16, s, 128), lambda ti: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ttot, 8, s, 128), jnp.int32),
            jax.ShapeDtypeStruct((16, s, 128), jnp.int32),
        ],
        interpret=interpret,
    )(x3, s3)
    words = words.reshape(ttot, 8, b).astype(jnp.uint32)
    return words, state_out.reshape(16, b)


def pdm_segment_fast2(state, x, tc: int = 16, interpret: bool = False):
    s16 = pack_pdm_state(state)
    words, s16b = pdm_pallas2(x, s16, tc=tc, interpret=interpret)
    return unpack_pdm_state(state, s16b), words
