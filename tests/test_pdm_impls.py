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
