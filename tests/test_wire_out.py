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


# ----------------------------------------------------------------------------
# Device-side wire stage (Engine(wire=True)) — round-2 VERDICT item #2: the
# wire words are produced on-device inside the jitted pipeline, with the
# IEC 60958 block position carried in ChainState.wire_pos.
# ----------------------------------------------------------------------------


def _full_cfg(platform=Platform.RP2350):
    from util import rich_config

    cfg = rich_config(platform, leveller=False, pdm=False)
    return cfg


def test_device_wire_matches_host_encoder(rng):
    """Engine(wire=True) word streams == the host WireEncoder applied to
    the same engine's s24 outputs, segment after segment."""
    from dspi_tpu.chain import Engine

    cfg = _full_cfg()
    cfg.hardware.output_types = [0, 1, 0, 0]    # mixed S/PDIF + I2S slots
    eng = Engine(cfg, n_streams=2, pdm=False, unroll=2, wire=True)
    assert eng.static.wire == (0, 1, 0, 0)
    host = WireEncoder(cfg, 48)

    from util import make_input

    for _ in range(3):
        x = make_input(rng, 4, 48, 2)
        out = eng.process(x)
        want = host.encode(np.asarray(out["s24"]))
        for pair in range(4):
            np.testing.assert_array_equal(
                np.asarray(out[f"wire{pair}"]), want[f"pair{pair}"],
                err_msg=f"pair{pair}")
    assert int(np.asarray(eng.state.wire_pos)) == host.frame_pos


def test_device_wire_z_preamble_continuity(rng):
    """The Z preamble (block start) must land every 192 frames ACROSS
    segment boundaries (audio_spdif.c:384-401 block-position tracking)."""
    from dspi_tpu.chain import Engine
    from util import make_input

    cfg = _full_cfg()
    eng = Engine(cfg, n_streams=1, pdm=False, unroll=2, wire=True)
    pre = []
    for _ in range(5):                           # 5 x 144 = 720 frames
        out = eng.process(make_input(rng, 3, 48, 1))
        pre.append(np.asarray(out["wire0"])[:, 0, 0] & 0xFF)
    pre = np.concatenate(pre)
    z = np.where(pre == 0b00111001)[0]
    np.testing.assert_array_equal(z, np.arange(0, 720, 192))
    # X preamble everywhere else on the left subframe
    assert set(np.unique(pre[pre != 0b00111001])) == {0b11001001}


def test_device_wire_q28_path(rng):
    """The Q28 (RP2040) pipeline emits wire words too; s24 -> words must
    match the host encoder exactly."""
    from dspi_tpu.chain import Engine
    from util import make_input

    cfg = _full_cfg(Platform.RP2040)
    eng = Engine(cfg, n_streams=2, pdm=False, unroll=2, wire=True)
    host = WireEncoder(cfg, 48)
    x = make_input(rng, 4, 48, 2)
    out = eng.process(x)
    want = host.encode(np.asarray(out["s24"]))
    for pair in range(2):
        np.testing.assert_array_equal(np.asarray(out[f"wire{pair}"]),
                                      want[f"pair{pair}"])


def test_device_wire_type_switch_resets_block_pos(rng):
    """Mid-stream S/PDIF<->I2S switch restarts the instances and resets
    the block position (process_type_switches, main.c:230-423)."""
    from dspi_tpu.chain import Engine
    from util import make_input

    cfg = _full_cfg()
    eng = Engine(cfg, n_streams=1, pdm=False, unroll=2, wire=True)
    eng.process(make_input(rng, 3, 48, 1))
    assert int(np.asarray(eng.state.wire_pos)) == 144

    cfg2 = cfg.copy()
    cfg2.hardware.output_types = [0, 1, 0, 0]
    eng.update_config(cfg2)
    assert eng.static.wire == (0, 1, 0, 0)
    assert int(np.asarray(eng.state.wire_pos)) == 0
    out = eng.process(make_input(rng, 3, 48, 1))
    z = np.where((np.asarray(out["wire0"])[:, 0, 0] & 0xFF)
                 == 0b00111001)[0]
    np.testing.assert_array_equal(z, [0])       # fresh block start


def test_device_wire_reduced_mode_folds(rng):
    """emit='reduced' keeps the words out of HBM but still computes them
    (one uint32 fold per pair) — the shape the chained bench consumes."""
    from dspi_tpu.chain import Engine
    from util import make_input

    cfg = _full_cfg()
    eng = Engine(cfg, n_streams=2, pdm=False, unroll=2, wire=True,
                 emit="reduced")
    out = eng.process(make_input(rng, 3, 48, 2))
    assert out["wire_sum"].shape == (4,)
    assert out["wire_sum"].dtype == np.uint32
    assert int(np.asarray(out["wire_sum"])[0]) != 0
