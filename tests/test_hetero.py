"""Per-stream heterogeneous configs: each stream its own coefficients."""

import numpy as np
import pytest

from dspi_tpu import DeviceConfig, EqBand, FilterType, Platform
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


# ----------------------------------------------------------------------------
# HeteroServer: arbitrary per-stream config mix bucketed onto the grouped
# (vmapped, MXU-capable) path — round-2 VERDICT item #5.
# ----------------------------------------------------------------------------


def _mix_cfgs(platform=Platform.RP2350):
    cfgs = []
    for k in range(3):
        cfg = DeviceConfig(platform=platform)
        for ch in (0, 1):
            cfg.eq[ch][0] = EqBand(FilterType.PEAKING, 200.0 + 150.0 * k,
                                   1.2, [2.0, 1.0, -2.5][k])
        cfg.master_volume_db = -3.0 * k
        cfgs.append(cfg)
    return cfgs


@pytest.mark.parametrize("platform", [Platform.RP2350, Platform.RP2040],
                         ids=["float", "q28"])
def test_hetero_server_matches_per_stream_scan(platform, rng):
    """Scattered config ids through HeteroServer == the per-stream scan
    path (build_params_multi), with outputs back in caller stream order.
    Q28 is integer and must match bit-exactly.  Float runs the same scan
    math, but the vmapped lowering lets XLA make different FMA-contraction
    choices than the plain one, so equality there is to the ulp."""
    from dspi_tpu.chain import Engine
    from dspi_tpu.chain.grouped import HeteroServer
    from dspi_tpu.chain.pack import build_params_multi

    cfgs = _mix_cfgs(platform)
    B = 8
    ids = np.array([2, 0, 1, 0, 2, 2, 1, 0])     # scattered, unequal counts
    x = make_input(rng, 3, 48, B)

    srv = HeteroServer(cfgs, ids, pdm=False, unroll=2, mxu=False)
    out = srv.process(x)

    ref = Engine(cfgs[0], n_streams=B, pdm=False, unroll=2, mxu=False)
    ref.params = build_params_multi(
        [ref.derived] + [derive(c) for c in cfgs[1:]],
        ref.static, stream_config_ids=ids)
    want = ref.process(x)

    if platform is Platform.RP2040:
        np.testing.assert_array_equal(np.asarray(out["out"]),
                                      np.asarray(want["out"]))
        np.testing.assert_array_equal(np.asarray(out["peaks"]),
                                      np.asarray(want["peaks"]))
    else:
        np.testing.assert_allclose(np.asarray(out["out"]),
                                   np.asarray(want["out"]),
                                   rtol=1e-6, atol=1e-7)
        assert np.abs(np.asarray(out["peaks"], np.int64)
                      - np.asarray(want["peaks"])).max() <= 1


def test_hetero_server_state_isolation(rng):
    """A stream's filter state must follow its own data: feeding two
    segments gives the same result as one engine per config subset."""
    from dspi_tpu.chain import Engine
    from dspi_tpu.chain.grouped import HeteroServer

    cfgs = _mix_cfgs()
    ids = np.array([0, 1, 2, 1])
    srv = HeteroServer(cfgs, ids, pdm=False, unroll=2, mxu=False)
    xs = [make_input(rng, 2, 48, 4) for _ in range(2)]
    outs = [np.asarray(srv.process(x)["out"]) for x in xs]

    for b, k in enumerate(ids):
        eng = Engine(cfgs[k], n_streams=1, pdm=False, unroll=2, mxu=False)
        for seg, x in enumerate(xs):
            want = np.asarray(eng.process(x[..., b:b + 1])["out"])[..., 0]
            # ulp tolerance: vmapped vs plain lowering (see above)
            np.testing.assert_allclose(outs[seg][..., b], want,
                                       rtol=1e-6, atol=1e-7,
                                       err_msg=f"stream {b} seg {seg}")


def test_hetero_server_update_group(rng):
    from dspi_tpu.chain.grouped import HeteroServer

    cfgs = _mix_cfgs()
    ids = np.array([0, 1, 2, 0])
    srv = HeteroServer(cfgs, ids, pdm=False, unroll=2, mxu=False)
    x = make_input(rng, 2, 48, 4)
    p0 = np.asarray(srv.process(x)["peaks"])[2, 0]

    new = cfgs[0].copy()
    new.master_volume_db = -60.0
    srv.update_group(0, new)
    p1 = np.asarray(srv.process(x)["peaks"])[2, 0]
    p1_other = np.asarray(srv.process(x)["peaks"])[2, 1]
    assert p1 < max(p0, 1) * 0.1                # group 0 stream got quiet
    assert p1_other > 0                          # group 1 stream unaffected


def test_hetero_server_padding_waste_bounded():
    from dspi_tpu.chain.grouped import HeteroServer

    cfgs = _mix_cfgs()
    ids = np.array([0] * 6 + [1] * 1 + [2] * 1)  # very skewed
    srv = HeteroServer(cfgs, ids, pdm=False, unroll=2, mxu=False)
    assert srv.grouped.streams_per_group == 6
    assert srv.padding_waste == pytest.approx(3 * 6 / 8 - 1.0)

    # above one vreg row the bucket width lane-aligns to a 128 multiple
    # when the padding is cheaper than the ~28%-of-wall misalignment
    # penalty (measured on v5e — see grouped.py)
    ids_big = np.arange(1500) % 3            # counts 500 -> aligns to 512
    srv_big = HeteroServer(cfgs, ids_big, pdm=False, unroll=2, mxu=False)
    assert srv_big.grouped.streams_per_group == 512
    assert srv_big.padding_waste == pytest.approx(3 * 512 / 1500 - 1.0)

    ids_bad = np.arange(402) % 3             # counts 134: 256 too costly
    srv_bad = HeteroServer(cfgs, ids_bad, pdm=False, unroll=2, mxu=False)
    assert srv_bad.grouped.streams_per_group == 134


def test_hetero_server_chained_runner(rng):
    """ChainedRunner drives a HeteroServer through its segment_fn: the
    chained batch must evolve identical state to segment-at-a-time
    process() calls, and a mid-run update_group lands via commit_params."""
    import jax

    from dspi_tpu.chain.grouped import HeteroServer
    from dspi_tpu.runtime.executor import ChainedRunner

    cfgs = _mix_cfgs()
    ids = np.array([2, 0, 1, 0, 2, 2, 1, 0])
    depth, B = 3, len(ids)
    xb = np.stack([make_input(rng, 2, 48, B) for _ in range(depth)])

    ref = HeteroServer(cfgs, ids, pdm=False, unroll=2, mxu=False,
                       emit="reduced")
    for k in range(depth):
        ref.process(xb[k])

    srv = HeteroServer(cfgs, ids, pdm=False, unroll=2, mxu=False,
                       emit="reduced")
    runner = ChainedRunner(srv, depth=depth)
    folds, peaks, clips = runner.feed(xb)
    runner.drain()
    assert np.isfinite(np.asarray(folds)).all()
    for f in ref.state._fields:
        a, b = getattr(ref.state, f), getattr(srv.state, f)
        if a is None:
            assert b is None
            continue
        a, b = np.asarray(a), np.asarray(b)
        if np.issubdtype(a.dtype, np.floating):
            # scan-wrapped vmap may contract FMAs differently: ulp drift
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7,
                                       err_msg=f)
        else:
            np.testing.assert_array_equal(a, b, err_msg=f)

    # live coefficient swap at the batch boundary (update_group ->
    # commit_params), no recompile
    compiled_before = runner._run
    quiet = cfgs[0].copy()
    quiet.master_volume_db = -60.0
    srv.update_group(0, quiet)
    runner.commit_params()
    assert runner._run is compiled_before
    _, p2, _ = runner.feed(xb)
    runner.drain()
    p2 = np.asarray(p2)
    assert p2[2, 1] < max(int(np.asarray(peaks)[2, 1]), 1) * 0.2 + 1
    assert p2[2, 0] > 0                    # config-2 stream unaffected
    jax.block_until_ready(srv.state)
