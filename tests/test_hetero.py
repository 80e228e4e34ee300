"""Per-stream heterogeneous configs: each stream its own coefficients."""

import numpy as np

from dspi_tpu import Platform
from dspi_tpu.chain import Engine, build_params_multi
from dspi_tpu.golden.model import GoldenDevice
from dspi_tpu.params.design import derive

from util import golden_run, make_input, rich_config


def test_heterogeneous_streams_match_their_goldens(rng):
    """3 streams with different EQ/gains/volumes/delays (same structure)
    must each match a golden device built from their own config."""
    base = rich_config(Platform.RP2040, leveller=True, pdm=False)
    cfgs = []
    for k in range(3):
        c = base.copy()
        c.eq[0][0].freq = 80.0 + 40.0 * k
        c.eq[0][0].gain_db = 2.0 + k
        c.eq[2][1].q = 1.0 + 0.5 * k
        c.preamp_db = [0.5 * k, -0.5 * k]
        c.master_volume_db = -3.0 * (k + 1)
        c.host_volume_index = 60 - 2 * k
        c.outputs[2].gain_db = -1.0 * k
        c.outputs[0].delay_ms = 1.0 + k        # different per-stream delays
        c.sync_delays()
        cfgs.append(c)

    eng = Engine(cfgs[0], n_streams=3, pdm=False, unroll=2)
    deriveds = [derive(c) for c in cfgs]
    eng.params = build_params_multi(deriveds, eng.static)

    x = make_input(rng, 12, 48, 3)
    out = eng.process(x)
    got = np.asarray(out["out"])

    for s, c in enumerate(cfgs):
        g = GoldenDevice(c.copy())
        res = golden_run(g, x[..., s:s + 1])
        want = np.stack([np.asarray(p["buf_out"]) for p in res])
        np.testing.assert_array_equal(got[..., s], want, err_msg=f"stream {s}")


def test_config_ids_mapping(rng):
    base = rich_config(Platform.RP2040, leveller=False, loudness=False,
                       crossfeed=False, delays=False, pdm=False)
    c2 = base.copy()
    c2.preamp_db = [6.0, 6.0]
    deriveds = [derive(base), derive(c2)]

    eng = Engine(base, n_streams=4, pdm=False, unroll=2)
    eng.params = build_params_multi(deriveds, eng.static,
                                    stream_config_ids=[0, 1, 1, 0])
    x = make_input(rng, 2, 48, 4)
    out = np.asarray(eng.process(x)["out"])
    # streams 1,2 share config 2; streams 0,3 share config 1 — and the same
    # input produces identical outputs within each group
    x_same = np.broadcast_to(x[..., :1], x.shape).copy()
    eng2 = Engine(base, n_streams=4, pdm=False, unroll=2)
    eng2.params = build_params_multi(deriveds, eng2.static,
                                     stream_config_ids=[0, 1, 1, 0])
    out2 = np.asarray(eng2.process(x_same)["out"])
    np.testing.assert_array_equal(out2[..., 1], out2[..., 2])
    np.testing.assert_array_equal(out2[..., 0], out2[..., 3])
    assert np.abs(out2[..., 0] - out2[..., 1]).max() > 0
