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
