"""Engine lifecycle: config updates, state resets, checkpointing, vendor
integration, and non-48k rates."""

import struct

import numpy as np
import pytest

from dspi_tpu import DeviceConfig, EqBand, FilterType, Platform
from dspi_tpu.chain import Engine
from dspi_tpu.control import requests as R
from dspi_tpu.control.device import VirtualDSPi
from dspi_tpu.golden.model import GoldenDevice

from util import golden_run, make_input, rich_config

B = 2


def _small_cfg(platform=Platform.RP2040, **kw):
    cfg = DeviceConfig(platform=platform)
    cfg.crossfeed.enabled = kw.get("crossfeed", False)
    cfg.leveller.enabled = kw.get("leveller", False)
    cfg.leveller.lookahead = kw.get("lookahead", True)
    return cfg


def test_crossfeed_change_clears_state(rng):
    cfg = _small_cfg(crossfeed=True)
    eng = Engine(cfg, n_streams=B, pdm=False, unroll=1)
    x = make_input(rng, 2, 48, B)
    eng.process(x)
    assert np.abs(np.asarray(eng.state.xf_lp)).max() > 0

    cfg2 = cfg.copy()
    cfg2.crossfeed.preset = 2
    eng.update_config(cfg2)
    assert np.abs(np.asarray(eng.state.xf_lp)).max() == 0


def test_leveller_enable_resets_state(rng):
    cfg = _small_cfg(leveller=True)
    eng = Engine(cfg, n_streams=B, pdm=False, unroll=1)
    x = make_input(rng, 4, 48, B)
    eng.process(x)
    assert np.abs(np.asarray(eng.state.lev_env)).max() > 0

    # disable then re-enable -> reset on the enable edge
    cfg_off = cfg.copy()
    cfg_off.leveller.enabled = False
    eng.update_config(cfg_off)
    cfg_on = cfg.copy()
    eng.update_config(cfg_on)
    assert np.abs(np.asarray(eng.state.lev_env)).max() == 0
    assert np.asarray(eng.state.lev_gain_db).max() == 0


def test_preset_load_zeroes_delay(rng):
    cfg = _small_cfg()
    cfg.outputs[0].delay_ms = 5.0
    cfg.sync_delays()
    eng = Engine(cfg, n_streams=B, pdm=False, unroll=1)
    x = make_input(rng, 2, 48, B)
    eng.process(x)
    assert np.abs(np.asarray(eng.state.delay)).max() > 0
    eng.update_config(cfg.copy(), preset_load=True)
    assert np.abs(np.asarray(eng.state.delay)).max() == 0


def test_state_checkpoint_roundtrip(tmp_path, rng):
    cfg = rich_config(Platform.RP2040, pdm=False)
    eng = Engine(cfg, n_streams=B, pdm=False, unroll=1)
    x = make_input(rng, 3, 48, B)
    eng.process(x)
    path = str(tmp_path / "state.npz")
    eng.save_state(path)

    eng2 = Engine(cfg, n_streams=B, pdm=False, unroll=1)
    eng2.load_state(path)
    # identical state -> identical continuation
    x2 = make_input(rng, 2, 48, B)
    o1 = eng.process(x2)
    o2 = eng2.process(x2)
    np.testing.assert_array_equal(np.asarray(o1["out"]), np.asarray(o2["out"]))


def test_vendor_commit_drives_engine(rng):
    dev = VirtualDSPi(Platform.RP2040)
    eng = Engine(dev.cfg, n_streams=B, pdm=False, unroll=1)
    dev.set(R.SET_PREAMP, 0, struct.pack("<f", -6.0))
    assert dev.commit(eng)
    assert not dev.commit(eng)          # idempotent until next change

    # engine now matches a golden device with the same config
    x = make_input(rng, 3, 48, B)
    out = eng.process(x)
    goldens = [golden_run(GoldenDevice(dev.cfg.copy()), x[..., s:s + 1])
               for s in range(B)]
    want = np.stack(
        [np.stack([np.asarray(p["buf_out"]) for p in gs]) for gs in goldens],
        axis=-1)
    np.testing.assert_array_equal(np.asarray(out["out"]), want)


@pytest.mark.parametrize("rate,block", [(96000.0, 96), (44100.0, 44)])
def test_q28_other_rates_bitexact(rng, rate, block):
    cfg = rich_config(Platform.RP2040, sample_rate=rate,
                      leveller=False, pdm=False)
    eng = Engine(cfg, n_streams=B, block_size=block, pdm=False, unroll=2)
    x = make_input(rng, 3, block, B)
    out = eng.process(x)
    goldens = [golden_run(GoldenDevice(cfg.copy()), x[..., s:s + 1])
               for s in range(B)]
    want = np.stack(
        [np.stack([np.asarray(p["buf_out"]) for p in gs]) for gs in goldens],
        axis=-1)
    np.testing.assert_array_equal(np.asarray(out["out"]), want)


def test_float_24bit_input(rng):
    cfg = rich_config(Platform.RP2350, leveller=False, loudness=False,
                      pdm=False)
    eng = Engine(cfg, n_streams=B, bit_depth=24, pdm=False, unroll=2)
    x = make_input(rng, 3, 48, B, bit_depth=24)
    out = eng.process(x)
    goldens = [golden_run(GoldenDevice(cfg.copy()), x[..., s:s + 1],
                          bit_depth=24) for s in range(B)]
    want = np.stack(
        [np.stack([np.asarray(p["buf_out"]) for p in gs]) for gs in goldens],
        axis=-1)
    # float path is ulp-faithful, not bit-frozen: XLA may contract mul+add
    # into FMA inside fusions (see pipeline.py rounding-contract note)
    got = np.asarray(out["out"])
    rms_ref = np.sqrt(np.mean(want.astype(np.float64) ** 2)) + 1e-12
    rms_err = np.sqrt(np.mean((got.astype(np.float64) - want) ** 2))
    assert rms_err / rms_ref < 1e-6, (rms_err, rms_ref)
    assert np.abs(got - want).max() < 1e-6


def test_load_state_rejects_rotated_legacy_rings(tmp_path, rng):
    """Pre-time-ordered checkpoints stored circular rings + indices; a
    nonzero index means the ring is rotated relative to the new layout and
    must be refused rather than silently misinterpreted."""
    import numpy as np
    import pytest

    from util import rich_config
    from dspi_tpu import Platform
    from dspi_tpu.chain import Engine

    eng = Engine(rich_config(Platform.RP2350), n_streams=2, unroll=4)
    path = str(tmp_path / "ck.npz")
    eng.save_state(path)
    eng.load_state(path)                       # current format round-trips

    data = dict(np.load(path))
    data["delay_idx"] = np.int32(0)            # aligned legacy ring: fine
    np.savez(str(tmp_path / "ck0.npz"), **data)
    eng.load_state(str(tmp_path / "ck0.npz"))

    data["lev_la_idx"] = np.int32(96)          # rotated: refuse
    np.savez(str(tmp_path / "ck1.npz"), **data)
    with pytest.raises(ValueError, match="time-ordered"):
        eng.load_state(str(tmp_path / "ck1.npz"))
