"""Deterministic float32 transcendentals shared by golden model and device.

The firmware computes the leveller's per-block gain with libm float calls
(log10f / powf, leveller.c:178-206).  Library implementations differ
between ARM ROM routines, host libm, and XLA — bit-identical results
across CPU golden and TPU device therefore require ONE implementation
that produces the same bits everywhere.

Why the cores are integer fixed-point, not float
------------------------------------------------
Round 2 shipped these as float polynomial chains ("built only from
IEEE-deterministic primitives").  That premise is false on this
toolchain: XLA contracts every float ``a*b + c`` it can see into a fused
multiply-add — inside fusions, inside ``lax.scan`` bodies, on CPU and
TPU — and neither ``optimization_barrier`` nor bitcast round-trips
survive its simplifier (all verified empirically; the round-2 full-suite
Q28 bit-exactness failure was exactly this: ``pow_f32``/``log2_f32``
differed from the numpy golden path by 1-2 ulp, and one packet's
leveller gain landed on an int32 conversion boundary).

int32 arithmetic, by contrast, has no excess-precision concept: add,
multiply, shift, and compare are bit-exact on numpy, XLA:CPU and
XLA:TPU.  So every polynomial and Newton iteration here runs in int32
fixed point via an exact 64-bit-product helper, and float ops appear
only where a SINGLE IEEE operation is fundamentally deterministic:

  * one multiply / one add in isolation (nothing to contract with),
  * multiplies by powers of two (exact, so contraction is identity),
  * int <-> float conversions (correctly rounded everywhere).

These run once per block on [B] vectors, so fixed-point cost is
irrelevant; accuracy is a few ulp, comfortably inside the 1e-6
firmware-fidelity budget (the firmware's own libm differs from any host
libm at the same magnitude).

All functions are generic over numpy / jax.numpy arrays (float32 in,
float32 out).
"""

from __future__ import annotations

import numpy as np

from . import qmath

F = np.float32
_I32 = np.int32
_U32 = np.uint32

# log2(m) on m in [sqrt(1/2), sqrt(2)) via z = (m-1)/(m+1):
# log2(m) = z * (c1 + c3 z^2 + c5 z^4 + c7 z^6 + c9 z^8)
# Least-squares fit of 2*atanh(z)/ln(2); f32 |abs err| < 7e-8 over the range.
# Carried in Q28 (all coefficients < 8).
_LOG2_CQ = tuple(int(round(c * (1 << 28))) for c in (
    2.8853900818e0, 9.6179667816e-1, 5.7708263824e-1,
    4.1173083373e-1, 3.3963488222e-1))                   # c1 c3 c5 c7 c9

# 2^f on f in [0, 1): degree-7 least-squares fit, f32 |rel err| < 1e-7.
# Carried in Q30 (all coefficients <= 1).
_EXP2_CQ = tuple(int(round(c * (1 << 30))) for c in (
    9.9999999986e-1, 6.9314719079e-1, 2.4022632913e-1, 5.5505401647e-2,
    9.6133378984e-3, 1.3431453553e-3, 1.4294822699e-4, 2.1646947857e-5))

_LOG10_2 = F(0.30102999566398119521)
_LOG2_10 = F(3.3219280948873623478)

# m >= sqrt(2) fold threshold for log2, in Q29 (same boundary the round-2
# float compare `m >= f32(1.4142135624)` used).
_SQRT2_Q29 = int(np.float32(1.4142135624) * (1 << 29))

# linear reciprocal seed on [1, 2): 1/v ~= 24/17 - (8/17) v  (max rel err
# 1/17; three exact-arithmetic Newton steps -> ~2e-9)
_RCP_SEED_A = int(round(24 / 17 * (1 << 29)))
_RCP_SEED_B = int(round(8 / 17 * (1 << 29)))


def _nullctx():
    import contextlib

    return contextlib.nullcontext()


def _mods(x):
    """Return the array module (numpy or jax.numpy) for generic code."""
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


# ----------------------------------------------------------------------------
# exact 64-bit products out of int32 ops (the deterministic substrate)
# ----------------------------------------------------------------------------


def _mulhi_lo(a, b, xp):
    """Full 64-bit signed product of int32 a, b as (hi int32, lo uint32).

    Classic 16x16 partial products assembled with explicit carries; every
    intermediate is a uint32 with mod-2^32 wrap (identical on numpy and
    XLA), then the signed correction hi -= (a<0)*b + (b<0)*a maps the
    unsigned product to two's complement."""
    # numpy warns on 0-d scalar integer overflow even though it wraps
    # mod 2^32 exactly as intended (and exactly as XLA does) — silence it.
    ctx = np.errstate(over="ignore") if xp is np else _nullctx()
    with ctx:
        au = a.astype(_U32)
        bu = b.astype(_U32)
        al = au & _U32(0xFFFF)
        ah = au >> 16
        bl = bu & _U32(0xFFFF)
        bh = bu >> 16
        ll = al * bl
        lh = al * bh
        hl = ah * bl
        hh = ah * bh
        mid = lh + hl                             # may wrap
        carry = (mid < lh).astype(_U32)
        lo = ll + (mid << 16)
        carry2 = (lo < ll).astype(_U32)
        hi_u = hh + (mid >> 16) + (carry << 16) + carry2
        z = xp.zeros_like(a)
        hi = (hi_u.astype(_I32)
              - xp.where(a < 0, b, z) - xp.where(b < 0, a, z))
    return hi, lo


def _mul_shift(a, b, sh, xp):
    """floor((int64)a * b >> sh) for int32 a, b; 0 < sh < 32.

    The true 64-bit product arithmetically shifted right; the caller
    guarantees the result fits in int32 (all fixed-point formats in this
    module are chosen so it does)."""
    hi, lo = _mulhi_lo(a, b, xp)
    return ((lo >> _U32(sh)) | (hi.astype(_U32) << _U32(32 - sh))).astype(
        _I32)


def _recip_core(dn, xp):
    """floor-accurate 2^58 / dn for int32 dn in [2^29, 2^30).

    Linear seed + three Newton steps, all in exact Q29 fixed point:
    y' = y * (2 - v*y) with v = dn * 2^-29.  Relative error ~2^-28."""
    y = _I32(_RCP_SEED_A) - _mul_shift(
        xp.full_like(dn, _RCP_SEED_B), dn, 29, xp)
    for _ in range(3):
        t = _mul_shift(dn, y, 29, xp)             # ~2^29
        y = _mul_shift(y, _I32(1 << 30) - t, 29, xp)
    return y


def det_recip(b):
    """Deterministic 1/b for normal, nonzero b.

    Hardware / XLA division is NOT correctly rounded and differs between
    backends, so every data-dependent division on an exactness-critical
    path goes through this instead.  The mantissa reciprocal runs in Q29
    integer Newton ( _recip_core ); the only float ops are one int->f32
    conversion and two exact power-of-two multiplies.  Max error ~1 ulp;
    identical bits on numpy, XLA CPU and TPU by construction."""
    xp = _mods(b)
    bits = _bitcast_i32(b, xp)
    e = ((bits >> 23) & 0xFF) - 127
    m_q29 = ((bits & 0x7FFFFF) << 6) | _I32(1 << 29)     # [2^29, 2^30)
    y = _recip_core(m_q29, xp)                           # (1/m) Q29
    # result = sign(b) * (1/m) * 2^-e ; assemble the power-of-two scale
    # directly from exponent bits (clamped to the normal range).
    sign = (bits >> 31) << 31
    exp_bits = ((127 - e).clip(1, 254) << 23) | sign
    r = y.astype(np.float32) * F(2.0 ** -29)             # (1/m], one rounding
    return r * _bitcast_f32(exp_bits, xp)                # exact pow2 mul


def det_div(a, b):
    """Deterministic a/b (see det_recip): one extra single multiply."""
    xp = _mods(a)
    return xp.asarray(a, np.float32) * det_recip(b)


def log2_f32(x):
    """Deterministic float32 log2 for x > 0 (finite, normal)."""
    xp = _mods(x)
    bits = _bitcast_i32(x, xp)
    e = ((bits >> 23) & 0xFF) - 127
    m_q29 = ((bits & 0x7FFFFF) << 6) | _I32(1 << 29)     # m in [1,2), Q29
    # fold into [sqrt(1/2), sqrt(2)): if m >= sqrt(2): m /= 2, e += 1
    # (low 6 bits of m_q29 are zero, so the halving shift is exact)
    big = m_q29 >= _I32(_SQRT2_Q29)
    m_q29 = xp.where(big, m_q29 >> 1, m_q29)
    e = e + big.astype(_I32)

    num = m_q29 - _I32(1 << 29)                          # m-1, Q29
    den = m_q29 + _I32(1 << 29)                          # m+1, Q29 in [1.7, 2.42)
    hi_den = den >= _I32(1 << 30)
    dn = xp.where(hi_den, den >> 1, den)                 # exact (low bits 0)
    r = _recip_core(dn, xp)
    r = xp.where(hi_den, r >> 1, r)                      # 2^58 / den
    z = _mul_shift(num, r, 28, xp)                       # z = (m-1)/(m+1), Q30

    z2 = _mul_shift(z, z, 30, xp)                        # Q30
    p = xp.full_like(z, _LOG2_CQ[4])                     # Q28
    for c in _LOG2_CQ[3::-1]:
        p = _mul_shift(p, z2, 30, xp) + _I32(c)
    zp = _mul_shift(z, p, 28, xp)                        # z*p, Q30
    # |zp| >= 2^-? * 2^30 when nonzero, so zp*2^-30 never denormalizes:
    # the power-of-two multiply is exact and the trailing add is a single
    # IEEE op — contraction-immune.
    return e.astype(np.float32) + zp.astype(np.float32) * F(2.0 ** -30)


def exp2_f32(x):
    """Deterministic float32 2**x for |x| < 126."""
    xp = _mods(x)
    x = xp.asarray(x, np.float32)
    n = xp.floor(x)
    f = x - n                                            # [0, 1), single op
    f_q30 = qmath.f32_to_i32(f * F(1 << 30))             # exact pow2 mul
    p = xp.full_like(f_q30, _EXP2_CQ[7])                 # Q30
    for c in _EXP2_CQ[6::-1]:
        p = _mul_shift(p, f_q30, 30, xp) + _I32(c)
    n_i = n.astype(_I32).clip(-126, 127)
    scale = _bitcast_f32((n_i + 127) << 23, xp)          # exact pow2
    r = p.astype(np.float32) * F(2.0 ** -30)             # [1,2), one rounding
    return r * scale                                     # exact pow2 mul


def log10_f32(x):
    return log2_f32(x) * _LOG10_2


def exp10_f32(x):
    return exp2_f32(x * _LOG2_10)


def pow_f32(a, b):
    """a**b for a > 0 (plus exact handling of a == 0 -> 0, a == 1 -> 1)."""
    xp = _mods(a)
    a = xp.asarray(a, np.float32)
    out = exp2_f32(xp.asarray(b, np.float32)
                   * log2_f32(xp.where(a > 0, a, F(1.0))))
    out = xp.where(a == F(0.0), F(0.0), out)
    return xp.where(a == F(1.0), F(1.0), out)


def mul_det(a, b):
    """Exact IEEE-754 float32 multiply (round-to-nearest-even), computed
    in integer ops so no backend can contract it into an FMA.

    Semantically identical to a lone ``np.float32(a) * np.float32(b)``
    under FPSCR FZ — same bits — for any FINITE operands: denormal
    operands are flushed to zero on entry and results below the normal
    range flush to a signed zero (the firmware cores run FPSCR FZ|DN,
    main.c:592-600, which flushes both inputs and outputs, so
    flush-to-zero IS the reference semantics); results above the normal
    range clamp to the largest finite float32.  Inf/NaN operands are
    OUTSIDE the contract (they would decode as huge finite values) —
    the leveller/gain paths that call this never produce them.
    Use this wherever a float product feeds an
    add on an exactness-critical path: the product's defining ops are
    integer, so the downstream add has no visible multiply to fuse with."""
    xp = _mods(a)
    abits = _bitcast_i32(a, xp)
    bbits = _bitcast_i32(b, xp)
    sign = ((abits ^ bbits) >> 31) << 31
    ea = (abits >> 23) & 0xFF
    eb = (bbits >> 23) & 0xFF
    ma = (abits & 0x7FFFFF) | _I32(1 << 23)
    mb = (bbits & 0x7FFFFF) | _I32(1 << 23)
    hi, lo = _mulhi_lo(ma, mb, xp)                # product in [2^46, 2^48)
    top = (hi >> 15) & 1                          # 1 iff product >= 2^47
    sh = (top + 23).astype(_U32)                  # renormalizing shift
    keep = ((lo >> sh) | (hi.astype(_U32) << (_U32(32) - sh))).astype(_I32)
    rem = lo & ((_U32(1) << sh) - _U32(1))
    half = _U32(1) << (sh - _U32(1))
    round_up = ((rem > half)
                | ((rem == half) & ((keep & 1) == 1))).astype(_I32)
    mant = keep + round_up                        # may carry to 2^24
    carry = (mant >> 24) & 1
    mant = xp.where(carry == 1, mant >> 1, mant)
    e = ea + eb - 127 + top + carry
    out_bits = xp.where(
        e <= 0, sign,                                     # FTZ underflow
        xp.where(e >= 255, sign | _I32(0x7F7FFFFF),       # clamp overflow
                 sign | (e << 23) | (mant & 0x7FFFFF)))
    # Biased exponent 0 covers +-0 AND denormals: FZ flushes denormal
    # operands on input, so both act as a zero of their own sign, and the
    # product keeps the IEEE sign rule (advisor r3: the old path treated
    # denormal mantissas as normals and returned unsigned +0).
    zero = (ea == 0) | (eb == 0)
    return _bitcast_f32(xp.where(zero, sign, out_bits), xp)


def smooth_det(alpha, prev, target):
    """Deterministic ``alpha*prev + (1-alpha)*target``.

    The leveller's dB-gain smoothing (leveller.c:182-185) is a two-product
    sum — exactly the shape XLA contracts into an FMA, unpredictably per
    backend and fusion context, so writing it as plain float can never be
    golden-exact.  Both products go through mul_det (bit-identical to a
    rounded float32 multiply, integer inside); the trailing subtraction
    and addition are lone IEEE ops with no visible multiply to fuse into.
    Net semantics: exactly the firmware's float expression under
    -ffp-contract=off — two product roundings plus one add rounding."""
    xp = _mods(alpha)
    one = xp.asarray(F(1.0))
    return mul_det(alpha, prev) + mul_det(one - alpha, target)
