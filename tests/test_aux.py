"""Aux subsystems: preset mute envelope, USB feedback controller, fmath."""

import numpy as np
import pytest

from dspi_tpu.control.envelope import PresetMuteEnvelope
from dspi_tpu.control.feedback import (FeedbackController,
                                       nominal_feedback_q16)
from dspi_tpu.core import fmath


def test_envelope_fade_shape():
    env = PresetMuteEnvelope()
    assert env.step(48, 48000) == 1.0

    env.engage(48000, hold_ms=10.0)
    gains = [env.step(48, 48000) for _ in range(30)]
    # 8ms fade at 48 samples per packet: ~8 packets down, hold, then back up
    assert gains[0] < 1.0
    assert min(gains) == 0.0
    assert gains[-1] == 1.0
    # monotone down then monotone up
    k = gains.index(0.0)
    assert all(a >= b for a, b in zip(gains[:k], gains[1:k + 1]))
    idx_up = next(i for i, g in enumerate(gains) if i > k and g > 0.0)
    assert all(a <= b for a, b in zip(gains[idx_up:], gains[idx_up + 1:]))


def test_envelope_rate_aware():
    env48 = PresetMuteEnvelope()
    env96 = PresetMuteEnvelope()
    env48.engage(48000)
    env96.engage(96000)
    g48 = env48.step(48, 48000)
    g96 = env96.step(96, 96000)
    assert g48 == pytest.approx(g96)    # same wall-time step


def test_feedback_controller_converges_to_actual_rate():
    fb = FeedbackController()
    nominal = nominal_feedback_q16(48000)
    fb.reset(nominal)

    # S/PDIF: 4 DMA words per sample frame (2 subframes x 2 words), so
    # rate_shift 12 turns a 4-SOF word delta into Q16.16 samples/frame.
    true_rate = 48.05
    acc = 0.0
    for sof in range(4000):
        acc += true_rate * 4
        fb.sof_update(int(acc), 12, consumer_fill=8)
    got = fb.feedback_out_q16 / 65536.0
    assert got == pytest.approx(true_rate, abs=0.01)


def test_feedback_servo_pulls_toward_target_fill():
    fb = FeedbackController()
    nominal = nominal_feedback_q16(48000)
    fb.reset(nominal)
    total_words = 0
    for _ in range(2000):
        total_words += 48 * 4
        fb.sof_update(total_words, 12, consumer_fill=12)      # overfull
    # overfull -> feedback below pure rate estimate
    assert fb.feedback_out_q16 < fb.rate_estimate_q16
    # clamped to nominal +/- 1.0
    assert abs(int(fb.feedback_out_q16) - nominal) <= 65536


def test_feedback_10_14_serialization():
    fb = FeedbackController()
    fb.reset(48 << 16)
    assert fb.get_10_14() == ((48 << 16) + 2) >> 2
    fb2 = FeedbackController()
    assert fb2.get_10_14() == 0


def test_feedback_stream_stop():
    fb = FeedbackController()
    fb.reset(48 << 16)
    fb.sof_update(100, 12, 8)
    fb.stream_stop()
    assert not fb.stream_active
    assert fb.feedback_out_q16 == 48 << 16


def test_fmath_matches_between_numpy_and_jax(rng):
    import jax.numpy as jnp

    x = np.concatenate([
        np.float32(10) ** rng.uniform(-30, 3, 2000).astype(np.float32),
        rng.uniform(0.5, 2.0, 1000).astype(np.float32)])
    np.testing.assert_array_equal(
        fmath.log2_f32(x), np.asarray(fmath.log2_f32(jnp.asarray(x))))
    y = rng.uniform(-40, 40, 2000).astype(np.float32)
    np.testing.assert_array_equal(
        fmath.exp2_f32(y), np.asarray(fmath.exp2_f32(jnp.asarray(y))))
    a = rng.uniform(0.0, 1.0, 2000).astype(np.float32)
    np.testing.assert_array_equal(
        fmath.pow_f32(a, np.float32(48.0)),
        np.asarray(fmath.pow_f32(jnp.asarray(a), jnp.float32(48.0))))


def test_fmath_accuracy():
    r = np.random.default_rng(1)
    x = np.float32(10) ** r.uniform(-30, 3, 50000).astype(np.float32)
    got = fmath.log10_f32(x).astype(np.float64)
    want = np.log10(x.astype(np.float64))
    # absolute error at the ulp-of-result level (like any f32 libm)
    assert np.abs(got - want).max() < 2e-6

    db = r.uniform(-90, 35, 50000).astype(np.float32)
    got = fmath.exp10_f32(db / np.float32(20)).astype(np.float64)
    want = 10.0 ** (db.astype(np.float64) / 20.0)
    assert np.abs(got / want - 1).max() < 2e-6
