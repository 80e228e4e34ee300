"""Shared test helpers: configs that exercise every pass, input builders."""

from __future__ import annotations

import numpy as np

from dspi_tpu import DeviceConfig, EqBand, FilterType, Platform
from dspi_tpu.params.types import Crosspoint


def rich_config(platform: Platform, sample_rate=48000.0,
                leveller=True, crossfeed=True, loudness=True,
                delays=True, pdm=True) -> DeviceConfig:
    """A config that lights up every stage of the chain."""
    cfg = DeviceConfig(platform=platform, sample_rate=sample_rate)
    cfg.preamp_db = [1.5, -2.0]
    cfg.master_volume_db = -6.0
    cfg.host_volume_index = 55          # -5 dB host volume
    nout = cfg.num_outputs

    # master EQ: a spread of band types incl. SVF-region and biquad-region
    cfg.eq[0][0] = EqBand(FilterType.PEAKING, 100.0, 1.2, 3.0)
    cfg.eq[0][1] = EqBand(FilterType.LOWSHELF, 250.0, 0.707, -2.5)
    cfg.eq[0][2] = EqBand(FilterType.PEAKING, 9000.0, 2.0, -4.0)   # biquad region
    cfg.eq[0][3] = EqBand(FilterType.HIGHSHELF, 8000.0, 0.707, 1.5)
    cfg.eq[1][0] = EqBand(FilterType.PEAKING, 180.0, 3.0, -3.0)
    cfg.eq[1][1] = EqBand(FilterType.HIGHPASS, 40.0, 0.707, 0.0)
    cfg.eq[1][2] = EqBand(FilterType.LOWPASS, 15000.0, 0.707, 0.0)  # biquad region

    # per-output EQ on a couple of outputs
    cfg.eq[2][1] = EqBand(FilterType.PEAKING, 1000.0, 1.0, 2.0)
    cfg.eq[3][1] = EqBand(FilterType.PEAKING, 2500.0, 4.0, -5.0)
    cfg.eq[2 + nout - 1][1] = EqBand(FilterType.PEAKING, 60.0, 1.5, 2.0)

    # matrix: cross-mix with phase invert
    cfg.crosspoints[0][0] = Crosspoint(True, False, 0.0)
    cfg.crosspoints[1][0] = Crosspoint(True, False, -9.0)
    cfg.crosspoints[1][1] = Crosspoint(True, True, 0.0)
    cfg.crosspoints[0][2] = Crosspoint(True, False, -3.0)
    cfg.crosspoints[1][2] = Crosspoint(True, False, -3.0)
    cfg.crosspoints[0][nout - 1] = Crosspoint(True, False, 2.0)
    cfg.crosspoints[1][nout - 1] = Crosspoint(True, False, 2.0)

    cfg.outputs[0].enabled = True
    cfg.outputs[1].enabled = True
    cfg.outputs[2].enabled = True
    cfg.outputs[2].gain_db = -1.5
    if delays:
        cfg.outputs[0].delay_ms = 2.0
        cfg.outputs[2].delay_ms = 7.5
        cfg.sync_delays()
    if pdm:
        cfg.outputs[nout - 1].enabled = True
        cfg.outputs[nout - 1].gain_db = -2.0

    cfg.leveller.enabled = leveller
    cfg.leveller.amount = 60.0
    cfg.leveller.speed = 2               # fast, so tests see gain movement
    cfg.leveller.lookahead = True
    cfg.leveller.gate_threshold_db = -70.0

    cfg.crossfeed.enabled = crossfeed
    cfg.crossfeed.preset = 1

    cfg.loudness.enabled = loudness
    cfg.loudness.ref_spl = 83.0
    cfg.loudness.intensity_pct = 80.0
    return cfg


def make_input(rng, n_packets, block, n_streams, bit_depth=16, scale=0.5):
    """Random audio input: int32 [n_packets, 2, block, B]."""
    lim = (2 ** (bit_depth - 1) - 1) * scale
    x = rng.integers(-int(lim), int(lim),
                     size=(n_packets, 2, block, n_streams)).astype(np.int32)
    return x


def golden_run(golden, x, bit_depth=16):
    """Feed a [n_packets, 2, block, 1]-style input stream-by-stream through a
    GoldenDevice; returns per-packet result list."""
    results = []
    for pkt in range(x.shape[0]):
        frames = np.stack([x[pkt, 0, :, 0], x[pkt, 1, :, 0]], axis=1)
        results.append(golden.process_packet(frames, bit_depth=bit_depth))
    return results
