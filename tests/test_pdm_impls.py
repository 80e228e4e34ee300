"""The two PDM lowerings (fori for CPU-compile speed, unrolled for TPU)
must be the same function bit-for-bit, and must match the golden model."""

import numpy as np

from dspi_tpu import Platform
from dspi_tpu.chain.pack import ChainState
from dspi_tpu.golden.model import GoldenDevice
from dspi_tpu.kernels.pdm import pdm_segment
from dspi_tpu.params.types import DeviceConfig


def _state(b):
    st = dict(pdm_err=np.zeros(b, np.int32), pdm_err2=np.zeros(b, np.int32),
              pdm_ns=np.zeros((5, b), np.int32),
              pdm_rng=np.full(b, 123456789, np.uint32),
              pdm_fade=np.zeros(b, np.int32))
    other = {f: None for f in ChainState._fields if f not in st}
    return ChainState(**st, **other)


def _state_dyn(b, fade=None):
    """State carrying the enable/fade-out machine (init_state layout)."""
    st = _state(b)._replace(
        pdm_ena=np.ones(b, np.int32), pdm_run=np.ones(b, np.int32),
        pdm_fout=np.zeros(b, np.int32), pdm_base=np.zeros(b, np.int32))
    if fade is not None:
        st = st._replace(pdm_fade=np.full(b, fade, np.int32))
    return st


def test_fori_equals_unrolled_and_golden(rng):
    T, B = 96, 4
    x = rng.integers(-(1 << 27), 1 << 27, size=(T, B)).astype(np.int32)

    outs = {}
    for impl in ("fori", "unrolled"):
        st, words = pdm_segment(_state(B), x, impl=impl)
        outs[impl] = (np.asarray(words), np.asarray(st.pdm_err),
                      np.asarray(st.pdm_err2), np.asarray(st.pdm_rng),
                      np.asarray(st.pdm_fade))
    for a, b in zip(outs["fori"], outs["unrolled"]):
        np.testing.assert_array_equal(a, b)

    # stream 0 vs the golden modulator (incl. the fade-in ramp)
    g = GoldenDevice(DeviceConfig(platform=Platform.RP2040))
    want = []
    for v in x[:, 0]:
        want.extend(g._pdm_sample(int(v)))
    words = outs["fori"][0]
    np.testing.assert_array_equal(words[:, :, 0].reshape(-1),
                                  np.array(want, np.uint32))
    assert int(outs["fori"][4][0]) == T        # fade counter advanced


def _golden_words(g, x, enables):
    """Drive GoldenDevice through per-segment enable flips; x: [nseg, T]."""
    want = []
    for seg, ena in zip(x, enables):
        g.pdm_set_enabled(bool(ena))
        for v in seg:
            want.extend(g._pdm_sample(int(v)))
    return np.array(want, np.uint32)


def _jit_pdm(impl):
    """Cached jit of pdm_segment so multi-segment tests compile once."""
    import functools

    import jax

    return jax.jit(functools.partial(pdm_segment, impl=impl))


def _run_segments(st, x, enables, fn):
    """pdm_segment over segments with pdm_ena flipped at boundaries —
    the control plane only writes the flag between segments
    (Engine.update_config), exactly like the golden driver above."""
    words = []
    for seg, ena in zip(x, enables):
        st = st._replace(pdm_ena=np.full(np.shape(np.asarray(st.pdm_ena)),
                                         int(ena), np.int32))
        st, w = fn(st, seg)
        words.append(np.asarray(w))
    return st, np.concatenate(words, axis=0)


def test_mode_machine_fori_equals_unrolled():
    """One segment with every machine mode live in different lanes: the
    two scan lowerings must agree bit-for-bit on words AND machine rows.

    The unrolled leg runs on TPU / DSPI_TEST_SLOW only: XLA:CPU takes
    2+ minutes to compile the masked 256-wide body (the fori leg is the
    CPU production lowering anyway, resolve_impl)."""
    import os

    import jax

    from dspi_tpu.core import constants as C

    impls = ("fori", "unrolled") if (
        jax.default_backend() == "tpu"
        or os.environ.get("DSPI_TEST_SLOW")) else ("fori",)

    rng = np.random.default_rng(5)
    T, B = 96, 8
    x = rng.integers(-(1 << 27), 1 << 27, size=(T, B)).astype(np.int32)
    st0 = _state_dyn(B)._replace(
        # lanes: 0 fading in, 1 steady, 2 freshly disabled, 3 short
        # fade-out (completes in-segment), 4 long fade-out, 5 stopped,
        # 6 restart after stop, 7 re-enable mid-fade (cancel)
        pdm_ena=np.array([1, 1, 0, 0, 0, 0, 1, 1], np.int32),
        pdm_run=np.array([1, 1, 1, 1, 1, 0, 0, 1], np.int32),
        pdm_fout=np.array([0, 0, 0, 40, 700, 0, 0, 300], np.int32),
        pdm_base=np.array([0, 0, 1500, 3000, -2500, 0, 0, 777], np.int32),
        pdm_fade=np.array([500, 1024, 1024, 1024, 1024, 1024, 7, 123],
                          np.int32),
        pdm_err=rng.integers(-9000, 9000, B).astype(np.int32),
        pdm_err2=rng.integers(-9000, 9000, B).astype(np.int32))

    outs = {}
    for impl in impls:
        st, words = pdm_segment(st0, x, impl=impl)
        outs[impl] = [np.asarray(words)] + [
            np.asarray(getattr(st, f))
            for f in ("pdm_err", "pdm_err2", "pdm_ns", "pdm_rng", "pdm_fade",
                      "pdm_ena", "pdm_run", "pdm_fout", "pdm_base")]
    if "unrolled" in outs:
        for a, b in zip(outs["fori"], outs["unrolled"]):
            np.testing.assert_array_equal(a, b)

    w, _, _, _, _, fade, _, run, fout, _ = outs["fori"]
    # lane 3: 39 modulated fade samples, stop slot + tail all idle pattern
    assert (w[40:, :, 3] == np.uint32(C.PDM_SILENCE_WORD)).all()
    assert (w[:39, :, 3] != np.uint32(C.PDM_SILENCE_WORD)).any()
    assert run[3] == 0 and fout[3] == 0
    # lane 4: fade continues into the next segment
    assert run[4] == 1 and fout[4] == 700 - T
    # lane 5: stopped all along
    assert (w[:, :, 5] == np.uint32(C.PDM_SILENCE_WORD)).all()
    # lane 6: restart reset the fade-in and advanced it T samples
    assert run[6] == 1 and fade[6] == T
    # lane 7: cancel converted fout=300 into fade-in from 724
    assert fout[7] == 0 and fade[7] == 1024 - 300 + T


def test_fadeout_stop_restart_golden():
    """PDM disable runs the firmware's 1024-sample fade-out, the stop
    slot halts the hardware without modulating, stopped samples emit the
    idle pattern, and a re-enable after the stop restarts the modulator
    with the PRNG persisting (pdm_generator.c:217-252,323-338)."""
    from dspi_tpu.core import constants as C

    rng = np.random.default_rng(7)
    T, B, nseg = 128, 2, 13
    x = rng.integers(-(1 << 27), 1 << 27, size=(nseg, T, B)).astype(np.int32)
    # 2 enabled, 9 disabled (1152 samples: full 1024 fade + stopped
    # silence), 2 re-enabled (restart: fresh fade-in, reset err, live rng)
    enables = [1, 1] + [0] * 9 + [1] * 2

    st, words = _run_segments(_state_dyn(B, fade=C.PDM_FADE_IN_SAMPLES),
                              x, enables, _jit_pdm("fori"))

    g = GoldenDevice(DeviceConfig(platform=Platform.RP2040), pdm_fade=False)
    want = _golden_words(g, x[:, :, 0], enables)
    np.testing.assert_array_equal(words[:, :, 0].reshape(-1), want)

    # fade completed inside the window: the disabled tail is pure idle
    # pattern, state stopped
    tail = words[(2 + 9) * T - T:(2 + 9) * T]            # last disabled seg
    assert (tail[:, :, 0] == np.uint32(C.PDM_SILENCE_WORD)).all()
    # after re-enable: running again, fade-in restarted and advanced 2*T
    assert np.asarray(st.pdm_run).tolist() == [1, 1]
    assert np.asarray(st.pdm_fout).tolist() == [0, 0]
    assert np.asarray(st.pdm_fade).tolist() == [2 * T, 2 * T]
    assert int(np.asarray(st.pdm_err)[0]) == g.pdm_err
    assert int(np.asarray(st.pdm_rng)[0]) == g.pdm_rng


def test_fadeout_midfade_reenable_golden():
    """Re-enabling mid-fade converts the out-ramp into an in-ramp from
    the current attenuation without a modulator reset
    (pdm_generator.c:233-236)."""
    from dspi_tpu.core import constants as C

    rng = np.random.default_rng(9)
    T, B = 64, 2
    nseg = 1 + 5 + 3       # enabled; 5*64=320 samples into the fade; back on
    x = rng.integers(-(1 << 27), 1 << 27, size=(nseg, T, B)).astype(np.int32)
    enables = [1] + [0] * 5 + [1] * 3

    st, words = _run_segments(_state_dyn(B, fade=C.PDM_FADE_IN_SAMPLES),
                              x, enables, _jit_pdm("fori"))
    g = GoldenDevice(DeviceConfig(platform=Platform.RP2040), pdm_fade=False)
    want = _golden_words(g, x[:, :, 0], enables)
    np.testing.assert_array_equal(words[:, :, 0].reshape(-1), want)
    # cancelled at fade_out_pos = 1024-320: fade-in resumed from 320 and
    # ran 3*T more samples; hardware never stopped
    assert np.asarray(st.pdm_run).tolist() == [1, 1]
    assert np.asarray(st.pdm_fade).tolist() == [320 + 3 * T] * 2
    assert int(np.asarray(st.pdm_err)[0]) == g.pdm_err


def test_engine_pdm_disable_keeps_stage_and_fades():
    """A runtime sub-output disable keeps the PDM stage compiled
    (Engine.update_config pdm_keep) and flips pdm_ena so the kernels fade
    out; after the 1024-sample ramp the words are the stopped-hardware
    idle pattern."""
    from dspi_tpu.chain import Engine
    from dspi_tpu.core import constants as C

    cfg = DeviceConfig()
    cfg.outputs[-1].enabled = True                # sub output drives PDM
    eng = Engine(cfg, n_streams=2, pdm_fade=False, mxu=False)
    assert eng.static.pdm_on
    rng = np.random.default_rng(3)
    x = rng.integers(-(1 << 23), 1 << 23,
                     size=(2, 2, eng.static.block_size, 2)).astype(np.int32)
    eng.process(x)

    # the control plane mutates the shared config in place (device.py)
    cfg.outputs[-1].enabled = False
    eng.update_config(cfg)
    assert eng.static.pdm_on                      # stage kept for the fade
    assert (np.asarray(eng.state.pdm_ena) == 0).all()
    # 1024-sample fade-out: run ceil(1024/(2*T)) + 1 segments
    seg_samples = 2 * eng.static.block_size
    for _ in range(C.PDM_FADE_IN_SAMPLES // seg_samples + 2):
        out = eng.process(x)
    assert (np.asarray(out["pdm"]) == np.uint32(
        C.PDM_SILENCE_WORD)).all()
    assert (np.asarray(eng.state.pdm_run) == 0).all()

    # re-enable: restart, real words again
    cfg.outputs[-1].enabled = True
    eng.update_config(cfg)
    out = eng.process(x)
    assert (np.asarray(out["pdm"]) != np.uint32(
        C.PDM_SILENCE_WORD)).any()


def test_pallas_tile_selection():
    from dspi_tpu.kernels.pdm import _pallas_worthwhile
    from dspi_tpu.kernels.pdm_pallas import padded_tiles

    # exact tilings pick the widest tile, no padding
    assert padded_tiles(3072, 8192)[:3] == (16, 8192, 8192)
    assert padded_tiles(2848, 8192)[:3] == (16, 8192, 8192)  # 44.1 kHz 64pkt
    # non-dividing lane counts pad to the best-effective tile: 8672
    # (hetero 8 x 1084) fits one 128-multiple 8704-lane tile: measured
    # 40,375x eff on v5e vs 24,553x for 2 x 8192 / 24,308x for 3 x 4096
    tc, bt, b_pad, eff = padded_tiles(3072, 8672)
    assert (bt, b_pad) == (8704, 8704) and eff > 28000
    # odd segment lengths (13 x 441 = 5733, the 44.1 kHz periodic bench)
    # must still get a legal multiple-of-8 tc — never 4/2/1, which are
    # illegal Mosaic time blocks (r2's sched441 TPU crash)
    tc, bt, b_pad, eff = padded_tiles(5733, 8192)
    assert tc % 8 == 0 and tc >= 8 and eff > 36000
    assert padded_tiles(441, 1024)[0] % 8 == 0
    # tiny lane counts lose to the scan lowering
    assert not _pallas_worthwhile(48, 100)
    assert not _pallas_worthwhile(96, 256)
    assert _pallas_worthwhile(96, 2048)
    assert _pallas_worthwhile(3072, 8672)


def test_pallas_equals_fori():
    """The production TPU kernel (kernels/pdm_pallas.py) must be bit-exact
    vs the scan lowering, including the fade-in ramp.  On the real TPU
    (DSPI_TEST_TPU=1) this compiles the Mosaic kernel; on CPU it uses the
    (slow) Pallas interpreter, so it only runs when DSPI_TEST_SLOW=1."""
    import os

    import jax
    import pytest

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu and not os.environ.get("DSPI_TEST_SLOW"):
        pytest.skip("pallas interpret mode is slow on CPU; set "
                    "DSPI_TEST_SLOW=1 (or DSPI_TEST_TPU=1) to run")
    from dspi_tpu.kernels.pdm_pallas import pdm_segment_fast

    rng = np.random.default_rng(11)
    # odd segment lengths (the 44.1 kHz cadence makes them, e.g.
    # 13 x 441 = 5733) pad the time axis to the tc grid with a dynamic
    # loop bound freezing the state — cover both exact and odd T
    cases = ((96, 2048), (93, 2048)) if on_tpu else ((8, 1024), (11, 1024))
    for T, B in cases:
        x = rng.integers(-(1 << 28), 1 << 28, size=(T, B)).astype(np.int32)

        st0 = _state(B)._replace(pdm_fade=np.full(B, 990, np.int32))
        s1, w1 = pdm_segment(st0, x, impl="fori")
        if on_tpu:
            s2, w2 = pdm_segment(st0, x, impl="pallas")
        else:
            s2, w2 = pdm_segment_fast(st0, x, tc=8, bt=1024, interpret=True)
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
        for f in ("pdm_err", "pdm_err2", "pdm_ns", "pdm_rng", "pdm_fade"):
            np.testing.assert_array_equal(np.asarray(getattr(s1, f)),
                                          np.asarray(getattr(s2, f)),
                                          err_msg=f)


def test_pallas_padded_lanes_and_vmap_flatten():
    """Arbitrary B (lane padding) and the custom_vmap group-flattening
    rule must both be bit-exact vs the scan lowering.  TPU-only: compiles
    the Mosaic kernel at padded width."""
    import jax
    import pytest

    if jax.default_backend() != "tpu":
        pytest.skip("compiles the Mosaic kernel; TPU only")

    rng = np.random.default_rng(13)
    T, B = 96, 1100                 # pads to 2048 inside the kernel wrapper
    x = rng.integers(-(1 << 28), 1 << 28, size=(T, B)).astype(np.int32)
    st0 = _state(B)._replace(pdm_fade=np.full(B, 990, np.int32))
    s1, w1 = pdm_segment(st0, x, impl="fori")
    s2, w2 = pdm_segment(st0, x, impl="pallas")
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    np.testing.assert_array_equal(np.asarray(s1.pdm_rng),
                                  np.asarray(s2.pdm_rng))

    # vmap over K groups flattens into one wide kernel call (grouped /
    # hetero serving shape); must equal per-group sequential calls
    K, G = 3, 900
    xg = rng.integers(-(1 << 28), 1 << 28, size=(K, T, G)).astype(np.int32)
    stg = jax.tree.map(
        lambda v: None if v is None else np.broadcast_to(
            v[:G] if v.ndim == 1 else v[:, :G],
            (K,) + ((G,) if v.ndim == 1 else (v.shape[0], G))).copy(),
        _state(G), is_leaf=lambda v: v is None)
    sv, wv = jax.vmap(lambda s, xx: pdm_segment(s, xx, impl="pallas"))(
        stg, xg)
    for k in range(K):
        sk, wk = pdm_segment(
            jax.tree.map(lambda v: None if v is None else v[k], stg,
                         is_leaf=lambda v: v is None),
            xg[k], impl="fori")
        np.testing.assert_array_equal(np.asarray(wv[k]), np.asarray(wk))
        np.testing.assert_array_equal(np.asarray(sv.pdm_err[k]),
                                      np.asarray(sk.pdm_err))
        np.testing.assert_array_equal(np.asarray(sv.pdm_rng[k]),
                                      np.asarray(sk.pdm_rng))
