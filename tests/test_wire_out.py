"""Wire output stage: block-position continuity, I2S/SPDIF type selection."""

import numpy as np

from dspi_tpu import DeviceConfig, Platform
from dspi_tpu.kernels import encoders
from dspi_tpu.runtime.telemetry import EngineTelemetry, LoadMeter
from dspi_tpu.runtime.wire_out import WireEncoder


def _s24(rng, shape):
    return rng.integers(-(2**23), 2**23, size=shape).astype(np.int32)


def test_block_position_tracks_across_segments(rng):
    cfg = DeviceConfig(platform=Platform.RP2350)
    w = WireEncoder(cfg, 48)
    s24 = _s24(rng, (3, 8, 48, 2))          # 144 frames
    out1 = w.encode(s24)
    assert w.frame_pos == 144
    s24b = _s24(rng, (3, 8, 48, 2))
    out2 = w.encode(s24b)
    assert w.frame_pos == (144 + 144) % 192

    # the Z preamble (block start) appears exactly once per 192 frames:
    # segment 2 frames 48..191+ -> Z at global frame 192 = local frame 48
    pre = np.asarray(out2["pair0"][:, 0, 0]) & 0xFF
    z = np.where(pre == 0b00111001)[0]
    assert list(z) == [48]

    # continuity: encoding the concatenation in one shot gives same words
    w2 = WireEncoder(cfg, 48)
    both = np.concatenate([s24, s24b], axis=0)
    ref = w2.encode(both)
    joined = np.concatenate([np.asarray(out1["pair0"]),
                             np.asarray(out2["pair0"])], axis=0)
    np.testing.assert_array_equal(joined, np.asarray(ref["pair0"]))


def test_i2s_type_selection(rng):
    cfg = DeviceConfig(platform=Platform.RP2350)
    cfg.hardware.output_types = [0, 1, 0, 0]
    w = WireEncoder(cfg, 48)
    s24 = _s24(rng, (1, 8, 48, 1))
    out = w.encode(s24)
    assert out["pair0"].shape == (48, 4, 1)     # S/PDIF subframe words
    assert out["pair1"].shape == (48, 2, 1)     # I2S L/R words
    np.testing.assert_array_equal(
        out["pair1"][:, 0, 0], encoders.encode_i2s(s24[0, 2, :, 0]))


def test_load_meter_ema():
    m = LoadMeter()
    for _ in range(60):
        m.update(0.5)
    assert 48 <= m.percent <= 52
    for _ in range(60):
        m.update(0.0)
    assert m.percent <= 1


def test_engine_telemetry_feeds_device():
    class Dev:
        peaks = None
        clip_flags = 0
        cpu_loads = (0, 0)
        counters = {"usb_audio_packets": 0}

    t = EngineTelemetry()
    t.segment_begin()
    rtf = t.segment_end(4, 48, 16)
    assert rtf > 0
    out = {"peaks": np.arange(22).reshape(11, 2)}
    d = Dev()
    t.feed_device(d, out, stream=1)
    assert d.peaks == list(range(1, 22, 2))
    assert d.counters["usb_audio_packets"] == 4


def test_mid_stream_type_switch(rng):
    """SET_OUTPUT_TYPE S/PDIF<->I2S applied mid-run through the control
    plane: word streams switch format and the IEC block position resets
    (process_type_switches, main.c:230-423) — round-1 gap #10."""
    import struct

    from dspi_tpu.control import requests as R
    from dspi_tpu.control.device import VirtualDSPi

    dev = VirtualDSPi(Platform.RP2350)
    w = WireEncoder(dev.cfg, 48)
    s24 = _s24(rng, (2, 8, 48, 1))               # 96 frames
    out1 = w.encode(s24)
    assert out1["pair1"].shape == (96, 4, 1)     # S/PDIF before the switch
    assert w.frame_pos == 96

    # host flips pair 1 to I2S; main loop applies it
    dev.set(R.SET_OUTPUT_TYPE, 1, b"\x01")
    assert dev.get(R.GET_OUTPUT_TYPE, 1) == b"\x01"
    assert w.apply_types(dev.cfg.hardware.output_types)
    assert w.frame_pos == 0                      # synchronized restart

    out2 = w.encode(s24)
    assert out2["pair1"].shape == (96, 2, 1)     # now raw I2S words
    np.testing.assert_array_equal(
        out2["pair1"][:, 0, 0],
        encoders.encode_i2s(s24[:, 2].reshape(-1, 1)[:, 0]))
    # pair 0 stays S/PDIF and restarts at block position 0: Z preamble at
    # frame 0 of the new stream
    pre = np.asarray(out2["pair0"][:, 0, 0]) & 0xFF
    assert pre[0] == 0b00111001

    # switching back restores S/PDIF framing
    dev.set(R.SET_OUTPUT_TYPE, 1, b"\x00")
    assert w.apply_types(dev.cfg.hardware.output_types)
    out3 = w.encode(s24)
    assert out3["pair1"].shape == (96, 4, 1)
    # no-op apply does not reset position
    pos = w.frame_pos
    assert not w.apply_types(dev.cfg.hardware.output_types)
    assert w.frame_pos == pos
