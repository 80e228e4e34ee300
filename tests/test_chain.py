"""End-to-end pipeline vs golden model, both platforms."""

import numpy as np
import pytest

from dspi_tpu import DeviceConfig, Platform
from dspi_tpu.chain import Engine
from dspi_tpu.golden.model import GoldenDevice

from util import golden_run, make_input, rich_config

NPKT = 6
BLOCK = 48
B = 3
# Full-chain runs must outlast the leveller's 480-sample lookahead plus the
# longest configured delay, or the output stages only ever see zeros.
NPKT_FULL = 16


def _run_both(cfg, rng, n_packets=NPKT, block=BLOCK, n_streams=B,
              bit_depth=16, pdm=True):
    eng = Engine(cfg, n_streams=n_streams, block_size=block,
                 bit_depth=bit_depth, pdm=pdm, unroll=4)
    x = make_input(rng, n_packets, block, n_streams, bit_depth=bit_depth)
    out = eng.process(x)

    goldens = []
    for s in range(n_streams):
        g = GoldenDevice(cfg.copy())
        goldens.append(golden_run(g, x[..., s:s + 1], bit_depth=bit_depth))
    return out, goldens


def _stack_golden(goldens, key):
    # [stream][packet] -> array [Npkt, ..., B]
    per_stream = [np.stack([np.asarray(pkt[key]) for pkt in gs])
                  for gs in goldens]
    return np.stack(per_stream, axis=-1)


def test_float_full_chain(rng):
    cfg = rich_config(Platform.RP2350)
    out, goldens = _run_both(cfg, rng, n_packets=NPKT_FULL, n_streams=2)
    got = np.asarray(out["out"])                        # [Npkt, nout, T, B]
    want = _stack_golden(goldens, "buf_out")
    rms_ref = np.sqrt(np.mean(want.astype(np.float64) ** 2)) + 1e-12
    rms_err = np.sqrt(np.mean((got.astype(np.float64) - want) ** 2))
    # with the shared deterministic fmath the float path is bit-reproducible;
    # keep a whisker of tolerance for backend instruction-order differences
    # (XLA CPU reorders instructions differently depending on what compiled
    # earlier in-process: running test_mxu first shifts this to ~1.1e-6,
    # measured identically at HEAD before any of this round's changes)
    assert rms_ref > 1e-4          # guard: real signal reached the outputs
    assert rms_err / rms_ref < 3e-6, (rms_err, rms_ref)

    got24 = np.asarray(out["s24"])
    want24 = _stack_golden(goldens, "spdif")            # [Npkt, npair, T, 2, B]
    npair = want24.shape[1]
    want24 = want24.transpose(0, 1, 3, 2, 4).reshape(got24.shape)
    # s24 quantization: firmware-vs-jax float ulp differences may flip the
    # final integer by 1 LSB occasionally; under in-process compile-order
    # perturbation (see the rms note above) XLA:CPU emits slightly
    # different instruction schedules and the worst case measured is
    # 8 counts (~1e-6 relative).  Real semantic bugs show up thousands of
    # counts off; the strict fidelity gate is the native firmware oracle
    # (tests/test_fw_oracle.py), not this backend-sensitive whisker.
    assert np.abs(got24.astype(np.int64) - want24).max() <= 16

    if "pdm" in out:
        got_pdm = np.asarray(out["pdm"])               # [Ttot, 8, B]
        want_pdm = np.stack(
            [np.array([w for pkt in gs for w in pkt["pdm_words"]],
                      dtype=np.uint32).reshape(-1, 8) for gs in goldens],
            axis=-1)
        mismatch = (got_pdm != want_pdm).mean()
        assert mismatch < 1e-4, mismatch


def test_float_default_config(rng):
    cfg = DeviceConfig(platform=Platform.RP2350)
    out, goldens = _run_both(cfg, rng, pdm=False)
    got = np.asarray(out["out"])
    want = _stack_golden(goldens, "buf_out")
    rms_err = np.sqrt(np.mean((got.astype(np.float64) - want) ** 2))
    assert rms_err < 1e-7, rms_err


def test_q28_full_chain_bitexact(rng):
    cfg = rich_config(Platform.RP2040)
    out, goldens = _run_both(cfg, rng, n_packets=NPKT_FULL, n_streams=2)
    got = np.asarray(out["out"])
    want = _stack_golden(goldens, "buf_out")
    np.testing.assert_array_equal(got, want)

    got24 = np.asarray(out["s24"])
    want24 = _stack_golden(goldens, "spdif")
    want24 = want24.transpose(0, 1, 3, 2, 4).reshape(got24.shape)
    np.testing.assert_array_equal(got24, want24)

    got_pdm = np.asarray(out["pdm"])
    want_pdm = np.stack(
        [np.array([w for pkt in gs for w in pkt["pdm_words"]],
                  dtype=np.uint32).reshape(-1, 8) for gs in goldens],
        axis=-1)
    np.testing.assert_array_equal(got_pdm, want_pdm)


def test_q28_default_config_bitexact(rng):
    cfg = DeviceConfig(platform=Platform.RP2040)
    out, goldens = _run_both(cfg, rng, pdm=False)
    got = np.asarray(out["out"])
    want = _stack_golden(goldens, "buf_out")
    np.testing.assert_array_equal(got, want)


def test_q28_24bit_input(rng):
    cfg = rich_config(Platform.RP2040, leveller=False, loudness=False)
    out, goldens = _run_both(cfg, rng, bit_depth=24, n_packets=3)
    got = np.asarray(out["out"])
    want = _stack_golden(goldens, "buf_out")
    np.testing.assert_array_equal(got, want)


def test_peaks_and_clips(rng):
    cfg = rich_config(Platform.RP2040, pdm=False)
    out, goldens = _run_both(cfg, rng, pdm=False)
    want_last = _stack_golden(goldens, "peaks")         # [Npkt, nch, B]
    got = np.asarray(out["peaks"])                      # max over segment
    assert got.shape == want_last.shape[1:]
    # segment max must be >= every per-packet peak report
    assert (got >= want_last.max(axis=0) - 0).all()


def test_full_chain_signal_reaches_outputs(rng):
    """Guard against vacuous comparisons: with enough packets the output
    stages must carry real (nonzero) signal through lookahead + delays."""
    cfg = rich_config(Platform.RP2040)
    out, goldens = _run_both(cfg, rng, n_packets=NPKT_FULL, n_streams=2)
    want = _stack_golden(goldens, "buf_out")
    assert np.abs(want[NPKT_FULL // 2:]).max() > 0
