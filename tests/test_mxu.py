"""MXU block-state-space float path (chain/mxu.py) vs golden / scan path.

The MXU lowering re-rounds the LTI passes (matmul superposition), so it is
held to the BASELINE fidelity budget — <=1e-6 relative RMS against the
firmware-semantics golden model — rather than bit-exactness.  Measured on
the real v5e MXU (Precision.HIGHEST): ~3-4e-7 across segments.
"""

import numpy as np
import pytest

from dspi_tpu import DeviceConfig, EqBand, FilterType, Platform
from dspi_tpu.chain import Engine
from dspi_tpu.golden.model import GoldenDevice

from util import golden_run, make_input, rich_config

BLOCK = 48
NPKT = 16


def _rel_rms(got, want):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    return (np.sqrt(np.mean((got - want) ** 2))
            / (np.sqrt(np.mean(want ** 2)) + 1e-30))


def test_mxu_vs_golden_full_chain(rng):
    cfg = rich_config(Platform.RP2350)
    eng = Engine(cfg, n_streams=2, block_size=BLOCK, pdm=False, mxu=True,
                 unroll=4)
    assert eng.static.mxu
    x = make_input(rng, NPKT, BLOCK, 2)
    out = eng.process(x)

    goldens = []
    for s in range(2):
        g = GoldenDevice(cfg.copy())
        goldens.append(golden_run(g, x[..., s:s + 1]))
    want = np.stack([np.stack([np.asarray(p["buf_out"]) for p in gs])
                     for gs in goldens], axis=-1)
    got = np.asarray(out["out"])
    assert np.sqrt(np.mean(want.astype(np.float64) ** 2)) > 1e-4
    assert _rel_rms(got, want) < 1e-6


@pytest.mark.parametrize("variant", ["crossfeed_only", "loudness_only",
                                     "leveller_only", "eq_only"])
def test_mxu_vs_scan_variants(rng, variant):
    kw = dict(leveller=False, crossfeed=False, loudness=False, pdm=False)
    if variant == "crossfeed_only":
        kw["crossfeed"] = True
    elif variant == "loudness_only":
        kw["loudness"] = True
    elif variant == "leveller_only":
        kw["leveller"] = True
    cfg = rich_config(Platform.RP2350, **kw)
    if variant == "eq_only":
        for ch in (0, 1):
            for b in range(10):
                cfg.eq[ch][b] = EqBand(FilterType.PEAKING, 80.0 * (b + 1),
                                       1.4, 2.0 if b % 2 else -2.0)
    x = make_input(rng, NPKT, BLOCK, 4)
    outs = {}
    for mxu in (False, True):
        eng = Engine(cfg, n_streams=4, block_size=BLOCK, pdm=False, mxu=mxu,
                     unroll=4)
        # two segments: the second exercises carried state through the
        # matmul form (EQ memories, crossfeed poles, leveller envelope)
        eng.process(x)
        outs[mxu] = np.asarray(eng.process(x)["out"])
    assert _rel_rms(outs[True], outs[False]) < 1e-6


def test_mxu_q28_falls_back():
    cfg = DeviceConfig(platform=Platform.RP2040)
    eng = Engine(cfg, n_streams=2, mxu=True)
    assert not eng.static.mxu                 # Q28 stays bit-exact scans


def test_mxu_variable_schedule_matches_scan(rng):
    """44.1 kHz 44/45 cadence: per-size padded matrices vs the scan path."""
    cfg = rich_config(Platform.RP2350, sample_rate=44100.0, pdm=False)
    sched = (44, 45) * 8
    x = rng.integers(-16000, 16000,
                     size=(2, sum(sched), 3)).astype(np.int32)
    outs = {}
    for mxu in (False, True):
        eng = Engine(cfg, n_streams=3, schedule=sched, pdm=False, mxu=mxu,
                     unroll=4)
        assert eng.static.mxu == mxu
        eng.process(x)
        outs[mxu] = np.asarray(eng.process(x)["out"])
    assert _rel_rms(outs[True], outs[False]) < 1e-6


def test_mxu_firmware_cadence_periodic_matches_scan(rng):
    """The firmware's real 44.1 kHz cadence (nine 44s then a 45, repeating)
    takes the period-10 reshape choreography in _to_packets/_apply_blocked;
    hold it to the scan path like the alternating case above."""
    cfg = rich_config(Platform.RP2350, sample_rate=44100.0, pdm=False)
    sched = ((44,) * 9 + (45,)) * 2
    from dspi_tpu.chain.pipeline import _pattern_len
    assert _pattern_len(np.asarray(sched)) == 10
    x = rng.integers(-16000, 16000,
                     size=(2, sum(sched), 3)).astype(np.int32)
    outs = {}
    for mxu in (False, True):
        eng = Engine(cfg, n_streams=3, schedule=sched, pdm=False, mxu=mxu,
                     unroll=4)
        eng.process(x)
        outs[mxu] = np.asarray(eng.process(x)["out"])
    assert _rel_rms(outs[True], outs[False]) < 1e-6


def test_mxu_survives_update_config(rng):
    cfg = rich_config(Platform.RP2350)
    eng = Engine(cfg, n_streams=2, block_size=BLOCK, pdm=False, mxu=True)
    x = make_input(rng, 4, BLOCK, 2)
    eng.process(x)
    cfg2 = cfg.copy()
    cfg2.eq[0][5] = EqBand(FilterType.PEAKING, 5000.0, 2.0, 3.0)
    eng.update_config(cfg2)
    assert eng.static.mxu                     # flag preserved across rebuild
    eng.process(x)


def test_mxu_adversarial_high_q_bound(rng):
    """Worst-case superposition error: stacked Q=20 cascades at +/-12 dB.

    A 48-term f32 dot re-rounds what the firmware computes sequentially;
    for pathological all-high-Q cascades the relative RMS approaches the
    f32 reassociation floor (~sqrt(T)*2^-24 per band, compounding across
    bands).  Measured worst case ~1.6e-6 — documented bound 4e-6 here; the
    five BASELINE configs measure 3-4e-7 (within the 1e-6 contract), and
    Engine(mxu=False) keeps the bit-exact scan path for anything beyond.
    """
    cfg = DeviceConfig(platform=Platform.RP2350)
    for ch in range(cfg.num_channels):
        for b in range(10):
            cfg.eq[ch][b] = EqBand(FilterType.PEAKING, 10.0 + 3.0 * b, 20.0,
                                   12.0 if b % 2 else -12.0)
    cfg.loudness.enabled = True
    x = make_input(rng, 16, BLOCK, 2)
    outs = {}
    for mxu in (False, True):
        eng = Engine(cfg, n_streams=2, block_size=BLOCK, pdm=False, mxu=mxu,
                     unroll=4)
        eng.process(x)
        outs[mxu] = np.asarray(eng.process(x)["out"])
    assert _rel_rms(outs[True], outs[False]) < 4e-6


def test_mxu_xresponse_chunking_matches_whole_segment(rng, monkeypatch):
    """Chunked x-response hoist (DSPI_MXU_XCHUNK / the HBM budget) is the
    same program: the input matmuls batch over chunks instead of the
    whole segment, the state recurrence is untouched.  Covers the
    uniform, periodic-schedule (44/45 cadence) and batched paths."""
    import os

    cfg = rich_config(Platform.RP2350)
    x = make_input(rng, NPKT, BLOCK, 2)
    sched = ((44,) * 9 + (45,)) * 2                  # periodic _PatM path
    x_sched = make_input(rng, 1, sum(sched), 2)[0]

    def run(chunk, schedule=None):
        if chunk:
            monkeypatch.setenv("DSPI_MXU_XCHUNK", str(chunk))
        else:
            monkeypatch.delenv("DSPI_MXU_XCHUNK", raising=False)
        c = rich_config(Platform.RP2350)
        eng = Engine(c, n_streams=2, block_size=BLOCK, pdm=False,
                     mxu=True, unroll=4, schedule=schedule)
        xs = x if schedule is None else x_sched
        outs = [np.asarray(eng.process(xs)["out"]) for _ in range(2)]
        return outs

    want = run(None)
    got = run(2)
    for w, g in zip(want, got):
        np.testing.assert_allclose(g, w, rtol=2e-6, atol=1e-7)

    want_s = run(None, schedule=sched)
    got_s = run(1, schedule=sched)                   # n_g=2: chunk the
    for w, g in zip(want_s, got_s):                  # group axis in half
        np.testing.assert_allclose(g, w, rtol=2e-6, atol=1e-7)
    assert "DSPI_MXU_XCHUNK" not in os.environ or True
