"""Randomized-config equivalence fuzz: Engine vs golden model.

Seeded random device configurations (band types/frequencies/Q/gains,
output enables/mutes/gains/delays, crosspoint routing with phase inverts,
dynamics toggles, volumes) run through the batched pipeline and the
sample-sequential golden twin.  Q28 must be bit-exact; the float scan
path must be bit-near (shared deterministic math, <=1e-6 rel RMS guard).
"""

import numpy as np
import pytest

from dspi_tpu import DeviceConfig, EqBand, FilterType, Platform
from dspi_tpu.chain import Engine
from dspi_tpu.golden.model import GoldenDevice
from dspi_tpu.params.types import Crosspoint

from util import golden_run, make_input

TYPES = [FilterType.FLAT, FilterType.PEAKING, FilterType.LOWSHELF,
         FilterType.HIGHSHELF, FilterType.LOWPASS, FilterType.HIGHPASS]


def random_config(rng, platform):
    cfg = DeviceConfig(platform=platform)
    nout = cfg.num_outputs
    cfg.preamp_db = [float(rng.uniform(-12, 6)) for _ in range(2)]
    cfg.master_volume_db = float(rng.uniform(-40, 0))
    cfg.host_volume_index = int(rng.integers(30, 61))
    for ch in range(cfg.num_channels):
        for b in range(10):
            cfg.eq[ch][b] = EqBand(
                TYPES[int(rng.integers(len(TYPES)))],
                float(rng.uniform(10, 20000)),
                float(rng.uniform(0.3, 10.0)),
                float(rng.uniform(-10, 10)))
    for o in range(nout):
        cfg.outputs[o].enabled = bool(rng.random() < 0.8)
        cfg.outputs[o].mute = bool(rng.random() < 0.1)
        cfg.outputs[o].gain_db = float(rng.uniform(-12, 3))
        cfg.outputs[o].delay_ms = float(rng.uniform(0, 8))
        for i in range(2):
            cfg.crosspoints[i][o] = Crosspoint(
                bool(rng.random() < 0.8), bool(rng.random() < 0.2),
                float(rng.uniform(-20, 6)))
    cfg.sync_delays()
    cfg.leveller.enabled = bool(rng.random() < 0.7)
    cfg.leveller.amount = float(rng.uniform(10, 100))
    cfg.leveller.speed = int(rng.integers(0, 3))
    cfg.leveller.lookahead = bool(rng.random() < 0.7)
    cfg.crossfeed.enabled = bool(rng.random() < 0.7)
    cfg.crossfeed.preset = int(rng.integers(0, 4))
    if cfg.crossfeed.preset == 3:
        cfg.crossfeed.custom_fc = float(rng.uniform(500, 2000))
        cfg.crossfeed.custom_feed_db = float(rng.uniform(0, 15))
    cfg.loudness.enabled = bool(rng.random() < 0.7)
    cfg.loudness.intensity_pct = float(rng.uniform(0, 100))
    return cfg


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_random_config_q28_bitexact(seed):
    rng = np.random.default_rng(seed)
    cfg = random_config(rng, Platform.RP2040)
    eng = Engine(cfg, n_streams=2, unroll=4)
    x = make_input(rng, 10, 48, 2)
    out = eng.process(x)
    for s in range(2):
        g = GoldenDevice(cfg.copy())
        res = golden_run(g, x[..., s:s + 1])
        want = np.stack([np.asarray(p["buf_out"]) for p in res])
        np.testing.assert_array_equal(
            np.asarray(out["out"])[..., s], want)


@pytest.mark.parametrize("seed", [404, 505])
def test_random_config_float_matches_golden(seed):
    """Float scan path is *ulp-faithful*, not bit-frozen (XLA may contract
    mul+add to FMA inside fusions — see the rounding contract note in
    chain/pipeline.py).  On random high-gain configs the contraction
    differences accumulate to ~1e-6 relative RMS (measured worst 1.001e-6
    at seed 404); bound at 3e-6."""
    rng = np.random.default_rng(seed)
    cfg = random_config(rng, Platform.RP2350)
    eng = Engine(cfg, n_streams=2, unroll=4, mxu=False)
    x = make_input(rng, 10, 48, 2)
    out = eng.process(x)
    got = np.asarray(out["out"], np.float64)
    for s in range(2):
        g = GoldenDevice(cfg.copy())
        res = golden_run(g, x[..., s:s + 1])
        want = np.stack([np.asarray(p["buf_out"]) for p in res])
        num = np.sqrt(np.mean((got[..., s] - want) ** 2))
        den = np.sqrt(np.mean(want.astype(np.float64) ** 2)) + 1e-30
        assert num / den < 3e-6, (seed, s, num / den)


@pytest.mark.parametrize("seed", [606, 707])
def test_random_schedule_q28_bitexact(seed):
    """Random APERIODIC variable-packet schedules — the gather fallback
    in _to_packets/_pkts_to_flat and per-size padded machinery, beyond
    the firmware's own 44/45 cadence — stay bit-exact on random
    configs."""
    rng = np.random.default_rng(seed)
    cfg = random_config(rng, Platform.RP2040)
    sched = tuple(int(v) for v in rng.integers(24, 64, size=9))
    eng = Engine(cfg, n_streams=2, schedule=sched, unroll=4)
    ttot = sum(sched)
    x = rng.integers(-16000, 16000, size=(2, ttot, 2)).astype(np.int32)
    out = eng.process(x)
    for s in range(2):
        g = GoldenDevice(cfg.copy())
        pkts, off = [], 0
        for t in sched:
            frames = np.stack([x[0, off:off + t, s],
                               x[1, off:off + t, s]], axis=1)
            pkts.append(g.process_packet(frames, bit_depth=16))
            off += t
        want = np.concatenate([np.asarray(p["buf_out"]) for p in pkts],
                              axis=-1)
        np.testing.assert_array_equal(np.asarray(out["out"])[..., s], want)
