"""Exact fixed-point primitives shared by the golden model and the TPU path.

These reproduce, bit for bit, the firmware's integer semantics:

  - ``q28_mul``  — ``fast_mul_q28`` (dsp_pipeline.c:47-59 and the hand asm in
    dsp_process_rp2040.S:263-365): 16-bit partial products combined as
    ``(high << 4) + ((mid1 + mid2) >> 12)``.  TRUNCATING, not rounding, and
    intermediate sums wrap in int32 exactly as the Cortex-M0+ code does.
  - ``q15_mul``  — ``fast_mul_q15`` (config.h:556-567).
  - ``clip_s24`` / ``q28_to_s24`` — S/PDIF sample conversion
    (config.h:547-551, usb_audio.c:1254-1255).
  - ``f32_to_i32`` — ARM ``vcvt.s32.f32`` float->int conversion
    (truncate toward zero, saturating), used wherever the firmware casts
    ``(int32_t)(float_expr)``.

All functions are written against the array-operator protocol so the same
code runs on NumPy arrays (golden model) and jax.numpy arrays (device path).
int32 add/sub/mul wrap two's-complement in both backends; ``>>`` on signed
dtypes is an arithmetic shift in both.
"""

from __future__ import annotations

import numpy as np

_I32_MIN = -(1 << 31)
_I32_MAX = (1 << 31) - 1


def _u32(x):
    """Reinterpret an int32 array as uint32 (two's-complement preserving)."""
    return x.astype(np.uint32) if isinstance(x, np.ndarray) else x.astype("uint32")


def _i32(x):
    return x.astype(np.int32) if isinstance(x, np.ndarray) else x.astype("int32")


def q28_mul(a, b):
    """Firmware ``fast_mul_q28``: (a*b) >> 28 via 16-bit partial products.

    Exactly (dsp_pipeline.c:47-59)::

        ah = a >> 16;  al = a & 0xFFFF;
        bh = b >> 16;  bl = b & 0xFFFF;
        (ah*bh << 4) + ((ah*bl + al*bh) >> 12)

    Every intermediate is int32 with wrap-around; the >>12 is arithmetic.
    Note the low*low partial product is dropped entirely (truncation).
    """
    ah = a >> 16
    al = a & 0xFFFF
    bh = b >> 16
    bl = b & 0xFFFF
    high = ah * bh
    mid = (ah * bl) + (al * bh)
    return (high << 4) + (mid >> 12)


def q15_mul(sample, gain):
    """Firmware ``fast_mul_q15``: (sample*gain) >> 15 (config.h:556-567).

    ``ll`` is an unsigned 32-bit product shifted logically; the final sum is
    assembled in uint32 and reinterpreted as int32.
    """
    sh = sample >> 16
    sl = sample & 0xFFFF
    gh = gain >> 16
    gl = gain & 0xFFFF
    hh = sh * gh
    mid = sh * gl + sl * gh
    ll = _u32(sl) * _u32(gl)
    total = (_u32(hh) << 17) + (_u32(mid) << 1) + (ll >> 15)
    return _i32(total)


def clip_s24(x):
    """Saturate int32 to signed 24-bit range (config.h:547-551)."""
    return x.clip(-0x800000, 0x7FFFFF)


def q28_to_s24(x):
    """Q28 -> s24 with round-half-up then saturate (usb_audio.c:1254-1255)."""
    return clip_s24((x + (1 << 5)) >> 6)


def f32_to_i32(x):
    """ARM ``vcvt.s32.f32`` semantics: truncate toward zero, saturate.

    The firmware's ``(int32_t)(float)`` casts compile to vcvt on both cores,
    which saturates instead of invoking C UB.  NaN converts to 0.
    """
    xp = np if isinstance(x, np.ndarray) or np.isscalar(x) else _jnp()
    x = xp.asarray(x)
    x = xp.where(xp.isnan(x), xp.zeros_like(x), x)
    # 2**31-1 is not representable in f32; clamp to the largest f32 below
    # 2**31 for the cast, then patch the true saturation values afterwards.
    clamped = x.clip(-2147483648.0, 2147483520.0)
    out = xp.trunc(clamped).astype(np.int32)
    out = xp.where(x >= 2147483648.0, np.int32(_I32_MAX), out)
    return out


def _jnp():
    import jax.numpy as jnp

    return jnp


def xorshift32(state):
    """The PDM dither PRNG (pdm_generator.c:62-68), on uint32 arrays."""
    state = state ^ (state << 13)
    state = state ^ (state >> 17)
    state = state ^ (state << 5)
    return state
