"""Exact-integer primitives: scalar reference vs NumPy vs JAX arrays."""

import numpy as np
import pytest

from dspi_tpu.core import qmath
from dspi_tpu.golden import qref


def _rand_i32(rng, n):
    return rng.integers(-(2**31), 2**31, size=n, dtype=np.int64).astype(np.int32)


INTERESTING = np.array(
    [0, 1, -1, 2**28, -(2**28), 2**31 - 1, -(2**31), 0xFFFF, -0xFFFF,
     0x10000, -0x10000, 12345678, -12345678, 2**27, -(2**27) - 1],
    dtype=np.int32)


@pytest.mark.parametrize("fn_np,fn_ref", [
    (qmath.q28_mul, qref.q28_mul),
    (qmath.q15_mul, qref.q15_mul),
])
def test_mul_numpy_matches_scalar_ref(rng, fn_np, fn_ref):
    a = np.concatenate([INTERESTING, _rand_i32(rng, 3000)])
    b = np.concatenate([_rand_i32(rng, len(INTERESTING)), _rand_i32(rng, 3000)])
    with np.errstate(over="ignore"):
        got = fn_np(a, b)
    want = np.array([fn_ref(int(x), int(y)) for x, y in zip(a, b)], dtype=np.int64)
    np.testing.assert_array_equal(got.astype(np.int64), want)


@pytest.mark.parametrize("fn_np,fn_ref", [
    (qmath.q28_mul, qref.q28_mul),
    (qmath.q15_mul, qref.q15_mul),
])
def test_mul_jax_matches_scalar_ref(rng, fn_np, fn_ref):
    import jax.numpy as jnp

    a = _rand_i32(rng, 2000)
    b = _rand_i32(rng, 2000)
    got = np.asarray(fn_np(jnp.asarray(a), jnp.asarray(b)))
    want = np.array([fn_ref(int(x), int(y)) for x, y in zip(a, b)], dtype=np.int64)
    np.testing.assert_array_equal(got.astype(np.int64), want)


def test_q28_unity_is_exact(rng):
    """q28_mul(x, 1.0) == x for all int32 x (identity-coefficient bypass)."""
    x = np.concatenate([INTERESTING, _rand_i32(rng, 5000)])
    one = np.full_like(x, 1 << 28)
    with np.errstate(over="ignore"):
        np.testing.assert_array_equal(qmath.q28_mul(x, one), x)


def test_clip_s24_and_round():
    x = np.array([0, 100, -100, 2**28, -(2**28), 2**31 - 1, -(2**31),
                  (1 << 5) - 1, -(1 << 5), 63, 64], dtype=np.int32)
    got = qmath.q28_to_s24(x)
    want = np.array([qref.q28_to_s24(int(v)) for v in x], dtype=np.int64)
    np.testing.assert_array_equal(got.astype(np.int64), want)


def test_f32_to_i32_saturation():
    x = np.array([0.0, 0.7, -0.7, 1e10, -1e10, 2147483520.0, -2147483648.0,
                  1.9, -1.9, np.nan], dtype=np.float32)
    got = qmath.f32_to_i32(x)
    want = np.array([qref.f32_to_i32(v) for v in x], dtype=np.int64)
    np.testing.assert_array_equal(got.astype(np.int64), want)


def test_xorshift32_sequence():
    """First few outputs of the firmware PRNG from the canonical seed."""
    s = np.uint32(123456789)
    ref = 123456789
    outs_np, outs_ref = [], []
    for _ in range(10):
        s = qmath.xorshift32(s)
        ref = qref.xorshift32(ref)
        outs_np.append(int(s))
        outs_ref.append(ref)
    assert outs_np == outs_ref


def test_xorshift32_jax():
    import jax.numpy as jnp

    s = jnp.asarray(np.array([123456789, 42], dtype=np.uint32))
    ref = [123456789, 42]
    for _ in range(5):
        s = qmath.xorshift32(s)
        ref = [qref.xorshift32(r) for r in ref]
        assert list(np.asarray(s)) == ref


def test_leveller_ramp_division_exact(rng):
    """The uint32-split truncating division in the Q28 leveller gain ramp
    (pipeline.py) must match C's (int64)(diff*i)/(T-1) exactly."""
    import jax.numpy as jnp

    T = 48
    d = np.uint32(T - 1)
    diffs = np.concatenate([
        rng.integers(-(2**31), 2**31, size=500, dtype=np.int64),
        np.array([0, 1, -1, 2**31 - 1, -(2**31), 47, -47], dtype=np.int64),
    ]).astype(np.int32)
    diff = jnp.asarray(diffs)
    neg = diff < 0
    a_u = jnp.where(neg, -diff, diff).astype(jnp.uint32)
    i_vec = jnp.arange(T, dtype=jnp.uint32)[:, None]
    res = (a_u // d) * i_vec + ((a_u % d) * i_vec) // d
    q = res.astype(jnp.int32)
    got = np.asarray(jnp.where(neg[None, :], -q, q))

    for j, dv in enumerate(diffs):
        for i in range(0, T, 7):
            prod = int(dv) * i
            want = abs(prod) // (T - 1)
            want = -want if prod < 0 else want
            want = ((want + 2**31) % 2**32) - 2**31
            assert got[i, j] == want, (dv, i, got[i, j], want)
