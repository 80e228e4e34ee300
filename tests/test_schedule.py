"""44.1 kHz variable-packet cadence: 44/45-sample packets at 1 kHz
(current_architecture.md:1092), compiled as a static per-packet schedule.

Round-1 gap #2: fixed blocks only.  Here the Q28 path must stay bit-exact
and the float path ulp-faithful against the golden model fed the SAME
mixed-size packet sequence.
"""

import numpy as np

from dspi_tpu import DeviceConfig, Platform
from dspi_tpu.chain import Engine
from dspi_tpu.golden.model import GoldenDevice

from util import rich_config

# one 10 ms cadence group: 9x44 + 1x45 = 441 samples = 10 ms @ 44.1 kHz,
# then a couple more to cross a group boundary mid-segment
SCHEDULE = (44, 44, 44, 44, 44, 44, 44, 44, 44, 45,
            44, 44, 44, 44, 44, 44, 44, 44, 44, 45,
            44, 45, 44)
B = 2


def _golden_scheduled(cfg, x_flat, schedule):
    """Feed the golden device the same variable-size packets."""
    outs = []
    for s in range(x_flat.shape[-1]):
        g = GoldenDevice(cfg.copy())
        per_pkt = []
        off = 0
        for t in schedule:
            frames = np.stack([x_flat[0, off:off + t, s],
                               x_flat[1, off:off + t, s]], axis=1)
            per_pkt.append(g.process_packet(frames, bit_depth=16))
            off += t
        outs.append(per_pkt)
    return outs


def _stack_time(goldens, key):
    """[stream][packet][nout, t] -> [nout, Ttot, B]"""
    per_stream = [np.concatenate([np.asarray(p[key]) for p in pkts], axis=-1)
                  for pkts in goldens]
    return np.stack(per_stream, axis=-1)


def test_q28_44k1_schedule_bitexact(rng):
    cfg = rich_config(Platform.RP2040, sample_rate=44100.0)
    eng = Engine(cfg, n_streams=B, schedule=SCHEDULE, unroll=4)
    assert eng.static.schedule == SCHEDULE
    ttot = sum(SCHEDULE)
    x = rng.integers(-16000, 16000, size=(2, ttot, B)).astype(np.int32)

    out = eng.process(x)
    goldens = _golden_scheduled(cfg, x, SCHEDULE)
    want = _stack_time(goldens, "buf_out")
    np.testing.assert_array_equal(np.asarray(out["out"]), want)

    want_pdm = np.stack(
        [np.array([w for p in pkts for w in p["pdm_words"]],
                  np.uint32).reshape(-1, 8) for pkts in goldens], axis=-1)
    np.testing.assert_array_equal(np.asarray(out["pdm"]), want_pdm)


def test_q28_periodic_cadence_bitexact(rng):
    """The pure repeating cadence (nine 44s then a 45, tiled) takes the
    periodic reshape/slice choreography in _pkts_to_flat/_per_packet
    instead of gathers — hold it bit-exact against the golden device."""
    from dspi_tpu.chain.pipeline import _pattern_len
    sched = ((44,) * 9 + (45,)) * 2
    assert _pattern_len(np.asarray(sched)) == 10
    cfg = rich_config(Platform.RP2040, sample_rate=44100.0)
    eng = Engine(cfg, n_streams=B, schedule=sched, unroll=4)
    x = rng.integers(-16000, 16000,
                     size=(2, sum(sched), B)).astype(np.int32)

    out = eng.process(x)
    goldens = _golden_scheduled(cfg, x, sched)
    want = _stack_time(goldens, "buf_out")
    np.testing.assert_array_equal(np.asarray(out["out"]), want)

    want_pdm = np.stack(
        [np.array([w for p in pkts for w in p["pdm_words"]],
                  np.uint32).reshape(-1, 8) for pkts in goldens], axis=-1)
    np.testing.assert_array_equal(np.asarray(out["pdm"]), want_pdm)


def test_float_44k1_schedule(rng):
    cfg = rich_config(Platform.RP2350, sample_rate=44100.0, pdm=False)
    eng = Engine(cfg, n_streams=B, schedule=SCHEDULE, pdm=False, unroll=4)
    ttot = sum(SCHEDULE)
    x = rng.integers(-16000, 16000, size=(2, ttot, B)).astype(np.int32)

    out = eng.process(x)
    goldens = _golden_scheduled(cfg, x, SCHEDULE)
    want = _stack_time(goldens, "buf_out")
    got = np.asarray(out["out"])
    rms_ref = np.sqrt(np.mean(want.astype(np.float64) ** 2)) + 1e-12
    rms_err = np.sqrt(np.mean((got.astype(np.float64) - want) ** 2))
    assert rms_ref > 1e-5
    assert rms_err / rms_ref < 1e-6, (rms_err, rms_ref)


def test_uniform_schedule_equals_blocked(rng):
    """A uniform schedule must reproduce the fixed-block program exactly
    (same math, different plumbing)."""
    cfg = rich_config(Platform.RP2040, pdm=False)
    npkt, t = 6, 48
    x4 = rng.integers(-16000, 16000, size=(npkt, 2, t, B)).astype(np.int32)

    eng_blocked = Engine(cfg, n_streams=B, block_size=t, pdm=False, unroll=4)
    out_b = eng_blocked.process(x4)

    eng_sched = Engine(cfg, n_streams=B, schedule=(t,) * npkt, pdm=False,
                       unroll=4)
    x_flat = np.moveaxis(x4, 1, 0).reshape(2, npkt * t, B)
    out_s = eng_sched.process(x_flat)

    want = np.moveaxis(np.asarray(out_b["out"]), 0, 1).reshape(
        out_s["out"].shape)
    np.testing.assert_array_equal(np.asarray(out_s["out"]), want)
    np.testing.assert_array_equal(np.asarray(out_s["peaks"]),
                                  np.asarray(out_b["peaks"]))


def test_q28_periodic_cadence_bitexact_regression():
    """Round-2 full-suite failure, pinned: this exact PCG64 state (the
    session rng as the full suite reached this test) produced a leveller
    gain whose exp10 landed on an int32 conversion boundary, exposing
    XLA's FMA contraction inside the then-float fmath (the jitted path
    computed gain 268440768 where the golden model computed 268440800 at
    packet 17).  Fixed by the integer fixed-point fmath cores + the
    fixed-point gain smoothing (core/fmath.py); frozen here so the
    boundary case stays covered regardless of suite order."""
    r = np.random.default_rng(0)
    r.bit_generator.state = {
        "bit_generator": "PCG64",
        "state": {"state": 234602107294857954130408947865853469031,
                  "inc": 129484581604836219575577641766282265439},
        "has_uint32": 0, "uinteger": 3203656545}
    test_q28_periodic_cadence_bitexact(r)
