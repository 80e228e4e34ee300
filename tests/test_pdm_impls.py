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
    from dspi_tpu.kernels.pdm import _pallas_tiles

    assert _pallas_tiles(3072, 8192) == (16, 8192)
    assert _pallas_tiles(96, 2048) == (32, 2048)
    assert _pallas_tiles(2848, 8192) == (16, 8192)   # 44.1 kHz 64-pkt segment
    assert _pallas_tiles(48, 100) is None            # B not tileable
    assert _pallas_tiles(47, 1024) == (1, 1024)


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
    T, B = (96, 2048) if on_tpu else (8, 1024)
    x = rng.integers(-(1 << 28), 1 << 28, size=(T, B)).astype(np.int32)

    st0 = _state(B)._replace(pdm_fade=np.full(B, 990, np.int32))
    s1, w1 = pdm_segment(st0, x, impl="fori")
    if on_tpu:
        s2, w2 = pdm_segment(st0, x, impl="pallas")
    else:
        s2, w2 = pdm_segment_fast(st0, x, tc=4, bt=1024, interpret=True)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    for f in ("pdm_err", "pdm_err2", "pdm_ns", "pdm_rng", "pdm_fade"):
        np.testing.assert_array_equal(np.asarray(getattr(s1, f)),
                                      np.asarray(getattr(s2, f)), err_msg=f)
