"""Property tests (SURVEY.md §4): spec-level DSP behavior, not just
golden-model equivalence."""

import numpy as np
import pytest

from dspi_tpu import DeviceConfig, EqBand, FilterType, Platform
from dspi_tpu.core import constants as C
from dspi_tpu.params import design
from dspi_tpu.params.types import CrossfeedConfig, LevellerConfig


def _freq_response_biquad(b0, b1, b2, a1, a2, w):
    z = np.exp(-1j * w)
    return (b0 + b1 * z + b2 * z * z) / (1 + a1 * z + a2 * z * z)


def _freq_response_svf(d, w, n=16384):
    """Empirical SVF response: FFT of the impulse response of the exact
    per-sample update (dsp_pipeline.c:298-343)."""
    from dspi_tpu.core.constants import FilterType as FT

    a1, a2, a3 = float(d.sva1), float(d.sva2), float(d.sva3)
    m0, m1, m2 = float(d.svm0), float(d.svm1), float(d.svm2)
    ic1 = ic2 = 0.0
    h = np.zeros(n)
    for i in range(n):
        xin = 1.0 if i == 0 else 0.0
        v3 = xin - ic2
        v1 = a1 * ic1 + a2 * v3
        v2 = ic2 + a2 * ic1 + a3 * v3
        ic1 = 2 * v1 - ic1
        ic2 = 2 * v2 - ic2
        if d.svf_type == FT.LOWPASS:
            h[i] = v2
        elif d.svf_type == FT.HIGHPASS:
            h[i] = xin + m1 * v1 - v2
        elif d.svf_type == FT.PEAKING:
            h[i] = xin + m1 * v1
        else:
            h[i] = m0 * xin + m1 * v1 + m2 * v2
    hf = np.fft.rfft(h)
    freqs = np.arange(len(hf)) / n          # cycles/sample
    return np.interp(np.atleast_1d(w) / (2 * np.pi), freqs, np.abs(hf))


def test_svf_matches_rbj_biquad_at_crossover():
    """SVF and biquad paths must agree in magnitude response near the
    Fs/7.5 crossover (current_architecture.md:353 claims seamlessness)."""
    fs = 48000.0
    fc = fs / 7.5 * 0.999          # just below crossover -> SVF on RP2350
    for typ, gain in [(FilterType.PEAKING, 6.0), (FilterType.LOWSHELF, -4.0),
                      (FilterType.HIGHSHELF, 3.0), (FilterType.LOWPASS, 0.0),
                      (FilterType.HIGHPASS, 0.0)]:
        band = EqBand(typ, fc, 1.0, gain)
        d_svf = design.compute_biquad(band, fs, Platform.RP2350)
        d_bq = design.compute_biquad(band, fs, Platform.RP2040)
        assert d_svf.use_svf
        freqs = np.array([100.0, 1000.0, fc, 10000.0, 20000.0])
        w = 2 * np.pi * freqs / fs
        h_svf = np.abs(_freq_response_svf(d_svf, w))
        h_bq = np.abs(_freq_response_biquad(
            d_bq.qb0 / 2**28, d_bq.qb1 / 2**28, d_bq.qb2 / 2**28,
            d_bq.qa1 / 2**28, d_bq.qa2 / 2**28, w))
        db_diff = 20 * np.log10(h_svf / h_bq)
        assert np.abs(db_diff).max() < 0.1, (typ, db_diff)


def test_peaking_filter_gain_at_center():
    fs = 48000.0
    for gain in (-12.0, -3.0, 3.0, 12.0):
        band = EqBand(FilterType.PEAKING, 1000.0, 2.0, gain)
        d = design.compute_biquad(band, fs, Platform.RP2040)
        w = 2 * np.pi * 1000.0 / fs
        h = np.abs(_freq_response_biquad(
            d.qb0 / 2**28, d.qb1 / 2**28, d.qb2 / 2**28,
            d.qa1 / 2**28, d.qa2 / 2**28, np.array([w])))[0]
        assert 20 * np.log10(h) == pytest.approx(gain, abs=0.05)


def test_flat_filters_are_identity():
    """Flat/0-gain recipes must be flagged bypass (firmware skips them)."""
    fs = 48000.0
    for band in (EqBand(FilterType.FLAT, 1000, 1, 10),
                 EqBand(FilterType.PEAKING, 500, 1, 0.005),
                 EqBand(FilterType.LOWSHELF, 200, 0.7, -0.009),
                 EqBand(FilterType.PEAKING, 0.0, 1, 5)):
        d = design.compute_biquad(band, fs, Platform.RP2350)
        assert d.bypass


def test_crossfeed_mono_unity_at_dc():
    """Complementary design: mono DC passes at unity
    (crossfeed.c:55-66 derivation)."""
    fs = 48000.0
    for preset in (0, 1, 2):
        cfgx = CrossfeedConfig(enabled=True, preset=preset)
        d = design.crossfeed_coefficients(cfgx, fs, Platform.RP2350)
        # DC gains: lowpass H_lp(1) = lp_a0/(1-lp_b1) = G; allpass = 1
        g_lp = float(d.lp_a0) / (1.0 - float(d.lp_b1))
        # out_L = (1 - G) + G = 1 at DC for mono input
        assert (1.0 - g_lp) + g_lp == pytest.approx(1.0, abs=1e-6)
        # and the ITD allpass is unity magnitude everywhere
        a = float(d.ap_a)
        w = 2 * np.pi * 700 / fs
        z = np.exp(-1j * w)
        h_ap = (a + z) / (1 + a * z)
        assert np.abs(h_ap) == pytest.approx(1.0, abs=1e-9)


def test_crossfeed_itd_group_delay():
    """Total crossfeed-path delay at DC ~= 220 us (crossfeed.h:18-23)."""
    fs = 48000.0
    d = design.crossfeed_coefficients(
        CrossfeedConfig(enabled=True, preset=0), fs, Platform.RP2350)
    x = float(d.lp_b1)
    lp_delay = x / ((1 - x) * fs)
    a = float(d.ap_a)
    ap_delay = (1 - a) / (1 + a) / fs
    assert lp_delay + ap_delay == pytest.approx(220e-6, rel=0.02)


def test_loudness_compensation_shape():
    """Lower volume -> more low/high shelf boost; zero at reference."""
    fs = 48000.0
    table = design.loudness_table(83.0, 100.0, fs, Platform.RP2350)
    assert table[60][0].bypass and table[60][1].bypass   # 0 dB: no comp
    # -40 dB should produce an active low shelf with positive gain
    low_40 = table[20][0]
    assert not low_40.bypass
    g20 = design.loudness_compensation_db(*C.ISO226_50HZ, 83.0, 43.0, 100.0)
    g40 = design.loudness_compensation_db(*C.ISO226_50HZ, 83.0, 63.0, 100.0)
    assert g20 > g40 > 0          # deeper attenuation -> more bass boost
    # intensity scales linearly
    half = design.loudness_compensation_db(*C.ISO226_50HZ, 83.0, 43.0, 50.0)
    assert half == pytest.approx(g20 * 0.5, rel=1e-5)


def test_leveller_boosts_quiet_not_loud(rng):
    """Upward compressor: quiet content boosted (bounded by max gain),
    loud content near unity; limiter respects the -3 dBFS ceiling."""
    from dspi_tpu.golden.model import GoldenDevice

    cfg = DeviceConfig(platform=Platform.RP2350)
    cfg.leveller = LevellerConfig(enabled=True, amount=100.0, speed=2,
                                  max_gain_db=20.0, lookahead=False,
                                  gate_threshold_db=-96.0)
    g = GoldenDevice(cfg)
    quiet = (np.sin(2 * np.pi * 997 * np.arange(4800) / 48000)
             * 32767 * 0.01).astype(np.int64)
    pcm = np.stack([quiet, quiet], 1)
    outs = []
    for k in range(0, 4800, 48):
        outs.append(g.process_packet(pcm[k:k + 48]))
    rms_in = np.sqrt(np.mean((quiet[-480:] / 32768) ** 2))
    out_l = np.concatenate([o["master_l"] for o in outs[-10:]])
    rms_out = np.sqrt(np.mean(out_l.astype(np.float64) ** 2))
    boost_db = 20 * np.log10(rms_out / rms_in)
    assert 6.0 < boost_db <= 20.5, boost_db

    g2 = GoldenDevice(cfg.copy())
    loud = (np.sin(2 * np.pi * 997 * np.arange(960) / 48000)
            * 32767 * 0.9).astype(np.int64)
    pcm2 = np.stack([loud, loud], 1)
    outs2 = [g2.process_packet(pcm2[k:k + 48]) for k in range(0, 960, 48)]
    out2 = np.concatenate([o["master_l"] for o in outs2])
    # loud content is never boosted above the -3 dBFS gain ceiling rule:
    # output <= max(input, ceiling)
    assert np.abs(out2).max() <= max(0.9, C.LEVELLER_LIMITER_CEIL) + 1e-3


def test_delay_line_quirk_at_max():
    """delay == MAX_DELAY_SAMPLES aliases to zero via the ring mask
    (config.h:88 MAX_DELAY_MASK semantics)."""
    from dspi_tpu.params.design import gain_design

    cfg = DeviceConfig(platform=Platform.RP2040)
    cfg.outputs[0].delay_ms = 2048 / 48000 * 1000  # exactly MAX samples
    cfg.sync_delays()
    g = gain_design(cfg)
    assert g.delay_samples[0] == 2048
    # packing masks it to 0 => not a delayed output
    from dspi_tpu.chain import build_static
    from dspi_tpu.params.design import derive

    st = build_static(derive(cfg), block_size=48)
    assert 0 not in st.delayed_outputs
