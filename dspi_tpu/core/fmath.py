"""Deterministic float32 transcendentals shared by golden model and device.

The firmware computes the leveller's per-block gain with libm float calls
(log10f / powf, leveller.c:178-206).  Library implementations differ
between ARM ROM routines, host libm, and XLA — bit-identical results
across CPU golden and TPU device therefore require ONE implementation
built only from IEEE-deterministic primitives (f32 add/mul/div and integer
bit manipulation), evaluated in identical operation order everywhere.

These run once per block on [B] vectors, so polynomial cost is irrelevant;
accuracy is a few ulp, comfortably inside the 1e-6 firmware-fidelity
budget (the firmware's own libm differs from any host libm at the same
magnitude).

All functions are generic over numpy / jax.numpy arrays (float32 in,
float32 out).
"""

from __future__ import annotations

import numpy as np

F = np.float32

# log2(m) on m in [sqrt(1/2), sqrt(2)) via z = (m-1)/(m+1):
# log2(m) = z * (c1 + c3 z^2 + c5 z^4 + c7 z^6 + c9 z^8)
# Least-squares fit of 2*atanh(z)/ln(2); f32 |abs err| < 7e-8 over the range.
_LOG2_C1 = F(2.8853900818e0)
_LOG2_C3 = F(9.6179667816e-1)
_LOG2_C5 = F(5.7708263824e-1)
_LOG2_C7 = F(4.1173083373e-1)
_LOG2_C9 = F(3.3963488222e-1)

# 2^f on f in [0, 1): degree-7 least-squares fit, f32 |rel err| < 1e-7
_EXP2_C = tuple(F(c) for c in (
    9.9999999986e-1, 6.9314719079e-1, 2.4022632913e-1, 5.5505401647e-2,
    9.6133378984e-3, 1.3431453553e-3, 1.4294822699e-4, 2.1646947857e-5))

_LOG10_2 = F(0.30102999566398119521)
_LOG2_10 = F(3.3219280948873623478)


def _mods(x):
    """Return (module, is_numpy) for generic numpy/jnp code."""
    if isinstance(x, np.ndarray) or np.isscalar(x):
        return np
    import jax.numpy as jnp

    return jnp


def _bitcast_i32(x, xp):
    if xp is np:
        return np.asarray(x, np.float32).view(np.int32)
    import jax

    return jax.lax.bitcast_convert_type(x, np.int32)


def _bitcast_f32(x, xp):
    if xp is np:
        return np.asarray(x, np.int32).view(np.float32)
    import jax

    return jax.lax.bitcast_convert_type(x, np.float32)


def det_recip(b):
    """Deterministic 1/b built only from mul/sub (exponent-flip seed plus
    three Newton steps).  Hardware / XLA division is NOT correctly rounded
    and differs between backends, so every data-dependent division on an
    exactness-critical path goes through this instead.  Max error ~2 ulp;
    identical bits on numpy, XLA CPU and TPU."""
    xp = _mods(b)
    b = xp.asarray(b, np.float32)
    seed = _bitcast_f32(np.int32(0x7EF311C3) - _bitcast_i32(b, xp), xp)
    r = seed * (F(2.0) - b * seed)
    r = r * (F(2.0) - b * r)
    r = r * (F(2.0) - b * r)
    return r


def det_div(a, b):
    """Deterministic a/b (see det_recip)."""
    xp = _mods(a)
    return xp.asarray(a, np.float32) * det_recip(b)


def log2_f32(x):
    """Deterministic float32 log2 for x > 0 (finite, normal)."""
    xp = _mods(x)
    x = xp.asarray(x, np.float32)
    bits = _bitcast_i32(x, xp)
    e = ((bits >> 23) & 0xFF) - 127
    m = _bitcast_f32((bits & 0x7FFFFF) | (127 << 23), xp)   # [1, 2)
    # fold into [sqrt(1/2), sqrt(2)): if m >= sqrt(2): m /= 2, e += 1
    big = m >= F(1.4142135624)
    m = xp.where(big, m * F(0.5), m)
    e = e + big.astype(np.int32)

    z = (m - F(1.0)) * det_recip(m + F(1.0))
    z2 = z * z
    p = _LOG2_C9
    p = p * z2 + _LOG2_C7
    p = p * z2 + _LOG2_C5
    p = p * z2 + _LOG2_C3
    p = p * z2 + _LOG2_C1
    return e.astype(np.float32) + z * p


def exp2_f32(x):
    """Deterministic float32 2**x for |x| < 126."""
    xp = _mods(x)
    x = xp.asarray(x, np.float32)
    n = xp.floor(x)
    f = x - n
    p = _EXP2_C[7]
    for c in _EXP2_C[6::-1]:
        p = p * f + c
    n_i = n.astype(np.int32)
    n_i = n_i.clip(-126, 127)
    scale = _bitcast_f32((n_i + 127) << 23, xp)
    return p * scale


def log10_f32(x):
    return log2_f32(x) * _LOG10_2


def exp10_f32(x):
    return exp2_f32(x * _LOG2_10)


def pow_f32(a, b):
    """a**b for a > 0 (plus exact handling of a == 0 -> 0, a == 1 -> 1)."""
    xp = _mods(a)
    a = xp.asarray(a, np.float32)
    out = exp2_f32(xp.asarray(b, np.float32) * log2_f32(xp.where(a > 0, a, F(1.0))))
    out = xp.where(a == F(0.0), F(0.0), out)
    return xp.where(a == F(1.0), F(1.0), out)
