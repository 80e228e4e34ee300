"""Native host library vs the Python golden reference."""

import numpy as np
import pytest

from dspi_tpu import native
from dspi_tpu.core import constants as C
from dspi_tpu.golden import qref
from dspi_tpu.golden.model import GoldenDevice
from dspi_tpu.io import wire
from dspi_tpu.params.design import derive
from dspi_tpu.params.types import DeviceConfig
from dspi_tpu.core.constants import Platform

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_native_q_muls(rng):
    for _ in range(2000):
        a = int(rng.integers(-(2**31), 2**31))
        b = int(rng.integers(-(2**31), 2**31))
        assert native.q28_mul(a, b) == qref.q28_mul(a, b)
        assert native.q15_mul(a, b) == qref.q15_mul(a, b)


def test_native_crc32(rng):
    data = bytes(rng.integers(0, 256, size=5000, dtype=np.uint8))
    assert native.crc32(data) == wire.crc32(data)


def test_native_unpack_pack(rng):
    frames = 480
    s16 = rng.integers(-32768, 32768, size=frames * 2, dtype=np.int16)
    l, r = native.unpack_s16(s16.tobytes())
    np.testing.assert_array_equal(l, s16[0::2])
    np.testing.assert_array_equal(r, s16[1::2])

    s24 = rng.integers(-(2**23), 2**23, size=(frames, 2)).astype(np.int32)
    packed = native.pack_s24(s24[:, 0], s24[:, 1])
    l24, r24 = native.unpack_s24(packed)
    np.testing.assert_array_equal(l24, s24[:, 0])
    np.testing.assert_array_equal(r24, s24[:, 1])

    planar = rng.integers(-1000, 1000, size=(4, 16)).astype(np.int32)
    np.testing.assert_array_equal(native.to_time_major(planar), planar.T)


def test_native_q28_cascade_matches_golden(rng):
    cfg = DeviceConfig(platform=Platform.RP2040)
    from dspi_tpu.params.types import EqBand
    from dspi_tpu.core.constants import FilterType

    for b, (t, f, q, g) in enumerate([
            (FilterType.HIGHPASS, 60.0, 0.9, 0.0),
            (FilterType.PEAKING, 400.0, 2.0, 5.0),
            (FilterType.LOWSHELF, 150.0, 0.707, -4.0),
            (FilterType.HIGHSHELF, 9000.0, 0.707, 3.0)]):
        cfg.eq[0][b] = EqBand(t, f, q, g)
    d = derive(cfg)
    coeffs = np.array([[bq.qb0, bq.qb1, bq.qb2, bq.qa1, bq.qa2]
                       for bq in d.eq[0][:4] if not bq.bypass], np.int32)
    state = np.zeros((len(coeffs), 2), np.int32)
    x = rng.integers(-(2**28), 2**28, size=300).astype(np.int32)

    got = x.copy()
    native.q28_cascade_block(coeffs, state, got)

    # golden scalar path
    want = [int(v) for v in x]
    st = [[0, 0] for _ in coeffs]
    for band, c in enumerate(coeffs):
        b0, b1, b2, a1, a2 = (int(v) for v in c)
        s1, s2 = st[band]
        for i in range(len(want)):
            xv = want[i]
            y = qref.w32(qref.q28_mul(b0, xv) + s1)
            s1 = qref.w32(qref.w32(qref.q28_mul(b1, xv) - qref.q28_mul(a1, y)) + s2)
            s2 = qref.w32(qref.q28_mul(b2, xv) - qref.q28_mul(a2, y))
            want[i] = y
        st[band] = [s1, s2]
    np.testing.assert_array_equal(got.astype(np.int64), np.array(want))
    np.testing.assert_array_equal(state.reshape(-1).astype(np.int64),
                                  np.array(st).reshape(-1))


def test_native_pdm_matches_golden(rng):
    cfg = DeviceConfig(platform=Platform.RP2040)
    g = GoldenDevice(cfg)
    x = rng.integers(-(2**28), 2**28, size=100).astype(np.int32)

    state = np.zeros(9, np.int32)
    state[7] = np.int32(np.uint32(C.PDM_RNG_SEED))
    words = native.pdm_block(state, x)

    want = []
    for v in x:
        want.extend(g._pdm_sample(int(v)))
    np.testing.assert_array_equal(words.astype(np.int64), np.array(want))
    assert state[0] == g.pdm_err and state[1] == g.pdm_err2
    assert np.uint32(state[7]) == g.pdm_rng


@pytest.mark.parametrize("bit_depth", [16, 24])
def test_native_deframe_batch(rng, bit_depth):
    """deframe_batch == per-stream unpack + packetize + lane transpose."""
    B, npkt, block = 70, 3, 48          # non-multiple of the 64-lane tile
    frames = npkt * block
    if bit_depth == 16:
        vals = rng.integers(-32768, 32768,
                            size=(B, frames, 2)).astype(np.int16)
        payloads = np.frombuffer(vals.tobytes(), np.uint8).reshape(B, -1)
    else:
        vals = rng.integers(-(2**23), 2**23,
                            size=(B, frames, 2)).astype(np.int32)
        payloads = np.stack([np.frombuffer(
            native.pack_s24(vals[b, :, 0], vals[b, :, 1]), np.uint8)
            for b in range(B)])
    for n_threads in (1, 4):
        out = native.deframe_batch(payloads, npkt, block,
                                   bit_depth=bit_depth,
                                   n_threads=n_threads)
        assert out.shape == (npkt, 2, block, B)
        want = vals.astype(np.int32).reshape(B, npkt, block, 2)
        want = np.moveaxis(want, (0, 3), (3, 1))       # -> [npkt,2,block,B]
        np.testing.assert_array_equal(out, want)


def test_native_deframe_batch_matches_single_stream_unpack(rng):
    """The batched path and the original one-stream helpers agree."""
    npkt, block = 2, 48
    frames = npkt * block
    s16 = rng.integers(-32768, 32768, size=frames * 2, dtype=np.int16)
    payloads = np.frombuffer(s16.tobytes(), np.uint8).reshape(1, -1)
    out = native.deframe_batch(payloads, npkt, block)
    l, r = native.unpack_s16(s16.tobytes())
    np.testing.assert_array_equal(
        out[:, 0, :, 0].reshape(-1), l)
    np.testing.assert_array_equal(
        out[:, 1, :, 0].reshape(-1), r)
