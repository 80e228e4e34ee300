"""GroupedEngine: K configs x G streams as one vmapped program.

Each group must produce exactly what its own single-config Engine would
(the vmap batches the identical computation), and coefficient swaps must
touch only their group.
"""

import numpy as np
import pytest

from dspi_tpu import EqBand, FilterType, Platform
from dspi_tpu.chain import Engine, GroupedEngine

from util import make_input, rich_config

K, G, NPKT, BLOCK = 3, 4, 8, 48


def _cfgs(platform):
    cfgs = []
    for k in range(K):
        c = rich_config(platform)
        c.master_volume_db = -6.0 - 3 * k
        c.eq[0][0] = EqBand(FilterType.PEAKING, 100.0 + 60 * k, 1.2, 3.0)
        cfgs.append(c)
    return cfgs


@pytest.mark.parametrize("platform", [Platform.RP2040, Platform.RP2350])
def test_groups_match_single_engines(rng, platform):
    cfgs = _cfgs(platform)
    eng = GroupedEngine(cfgs, streams_per_group=G, block_size=BLOCK,
                        unroll=4, mxu=False)
    x = np.stack([make_input(rng, NPKT, BLOCK, G) for _ in range(K)])
    out = eng.process(x)
    for k in range(K):
        single = Engine(cfgs[k], n_streams=G, block_size=BLOCK, unroll=4,
                        mxu=False)
        want = single.process(x[k])
        for key in ("out", "s24", "pdm", "peaks"):
            np.testing.assert_array_equal(
                np.asarray(out[key])[k], np.asarray(want[key]),
                err_msg=f"group {k} {key}")


def test_update_group_touches_only_its_group(rng):
    cfgs = _cfgs(Platform.RP2350)
    eng = GroupedEngine(cfgs, streams_per_group=G, block_size=BLOCK,
                        unroll=4, mxu=False, pdm=False)
    x = np.stack([make_input(rng, NPKT, BLOCK, G) for _ in range(K)])
    base = np.asarray(eng.process(x)["out"])

    c1 = cfgs[1].copy()
    c1.master_volume_db = -30.0
    eng.update_group(1, c1)
    out = np.asarray(eng.process(x)["out"])
    ref = np.asarray(eng.process(x)["out"])  # steady state

    # group 1 got quieter; groups 0/2 evolve exactly as an unmodified
    # engine would (compare against a fresh grouped run replaying segs)
    fresh = GroupedEngine(cfgs, streams_per_group=G, block_size=BLOCK,
                          unroll=4, mxu=False, pdm=False)
    fresh.process(x)
    want = np.asarray(fresh.process(x)["out"])
    np.testing.assert_array_equal(out[0], want[0])
    np.testing.assert_array_equal(out[2], want[2])
    assert np.abs(out[1]).sum() < np.abs(want[1]).sum()
    del base, ref


def test_static_mismatch_rejected():
    cfgs = _cfgs(Platform.RP2350)
    cfgs[1].crossfeed.enabled = False          # structural difference
    with pytest.raises(ValueError, match="static structure"):
        GroupedEngine(cfgs, streams_per_group=G, mxu=False)

    cfgs = _cfgs(Platform.RP2350)
    eng = GroupedEngine(cfgs, streams_per_group=G, block_size=BLOCK,
                        unroll=4, mxu=False, pdm=False)
    bad = cfgs[0].copy()
    bad.leveller.enabled = False
    with pytest.raises(ValueError, match="static structure"):
        eng.update_group(0, bad)


def test_grouped_schedule(rng):
    """Grouped engine over the 44/45 variable-packet cadence."""
    cfgs = _cfgs(Platform.RP2350)
    sched = (44, 45, 44)
    eng = GroupedEngine(cfgs, streams_per_group=G, schedule=sched,
                        unroll=4, mxu=False, pdm=False)
    x = np.stack([
        rng.integers(-16000, 16000, size=(2, sum(sched), G)).astype(np.int32)
        for _ in range(K)])
    out = eng.process(x)
    for k in (0, K - 1):
        single = Engine(cfgs[k], n_streams=G, schedule=sched, unroll=4,
                        mxu=False, pdm=False)
        want = single.process(x[k])
        np.testing.assert_array_equal(np.asarray(out["out"])[k],
                                      np.asarray(want["out"]))


def test_grouped_chained_runner(rng):
    """ChainedRunner over a GroupedEngine (x: [depth, K, npkt, 2, T, G]):
    chained state evolution equals segment-at-a-time process()."""
    from dspi_tpu.runtime.executor import ChainedRunner

    cfgs = _cfgs(Platform.RP2350)
    depth = 2
    xb = np.stack([
        np.stack([make_input(rng, NPKT, BLOCK, G) for _ in range(K)])
        for _ in range(depth)])

    ref = GroupedEngine(cfgs, streams_per_group=G, pdm=False, unroll=2,
                        mxu=False, emit="reduced")
    for d in range(depth):
        ref.process(xb[d])

    eng = GroupedEngine(cfgs, streams_per_group=G, pdm=False, unroll=2,
                        mxu=False, emit="reduced")
    runner = ChainedRunner(eng, depth=depth)
    folds, peaks, clips = runner.feed(xb)
    runner.drain()
    assert np.asarray(folds).shape == (depth,)
    assert np.isfinite(np.asarray(folds)).all()
    assert np.asarray(peaks).shape[0] == K
    for f in ref.state._fields:
        a, b = getattr(ref.state, f), getattr(eng.state, f)
        if a is None:
            assert b is None
            continue
        a, b = np.asarray(a), np.asarray(b)
        if np.issubdtype(a.dtype, np.floating):
            # scan-wrapped vmap lets XLA pick different FMA contractions
            # than the bare vmapped program: ulp-level float drift
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7,
                                       err_msg=f)
        else:
            np.testing.assert_array_equal(a, b, err_msg=f)


@pytest.mark.parametrize("platform", [Platform.RP2040, Platform.RP2350])
def test_flat_layout_matches_vmap(rng, platform):
    """The flat K*G-lane lowering and the vmapped group-axis lowering are
    the same program: word-equal outputs, segment after segment."""
    cfgs = _cfgs(platform)
    x = np.stack([make_input(rng, NPKT, BLOCK, G) for _ in range(K)])
    flat = GroupedEngine(cfgs, streams_per_group=G, block_size=BLOCK,
                         unroll=4, mxu=False, layout="flat")
    vm = GroupedEngine(cfgs, streams_per_group=G, block_size=BLOCK,
                       unroll=4, mxu=False, layout="vmap")
    assert flat.layout == "flat" and vm.layout == "vmap"
    for _seg in range(2):                 # state threads across segments
        of, ov = flat.process(x), vm.process(x)
        for key in ("out", "s24", "pdm", "peaks"):
            if platform is Platform.RP2350 and key != "pdm":
                # float path: the vmapped scan lets XLA pick different
                # FMA contractions (see test_grouped_chained_runner)
                np.testing.assert_allclose(
                    np.asarray(of[key]), np.asarray(ov[key]),
                    rtol=1e-6, atol=1e-5, err_msg=key)
            else:
                np.testing.assert_array_equal(
                    np.asarray(of[key]), np.asarray(ov[key]),
                    err_msg=key)


def test_flat_update_group_touches_only_its_group(rng):
    """Coefficient swap in the flat layout: group k's lane block changes,
    every other lane is word-identical."""
    cfgs = _cfgs(Platform.RP2040)
    x = np.stack([make_input(rng, NPKT, BLOCK, G) for _ in range(K)])
    eng = GroupedEngine(cfgs, streams_per_group=G, block_size=BLOCK,
                        unroll=4, mxu=False, layout="flat")
    fresh = GroupedEngine(cfgs, streams_per_group=G, block_size=BLOCK,
                          unroll=4, mxu=False, layout="flat")
    eng.process(x)
    fresh.process(x)
    c1 = cfgs[1].copy()
    c1.master_volume_db = -30.0
    eng.update_group(1, c1)
    out = np.asarray(eng.process(x)["out"])
    want = np.asarray(fresh.process(x)["out"])
    np.testing.assert_array_equal(out[0], want[0])
    np.testing.assert_array_equal(out[2], want[2])
    assert np.abs(out[1]).sum() < np.abs(want[1]).sum()


def test_auto_layout_policy():
    """auto lowers non-MXU statics flat; per-lane delays and wire+reduced
    emit fall back to the vmapped group axis."""
    cfgs = _cfgs(Platform.RP2040)
    assert GroupedEngine(cfgs, streams_per_group=G, block_size=BLOCK,
                         mxu=False).layout == "flat"
    # a config whose DELAY differs from the others would put the delay
    # ring on the per-lane gather path (27x whole-chain) — keep vmap
    cfgs2 = _cfgs(Platform.RP2040)
    cfgs2[1].outputs[0].delay_ms = 4.0
    cfgs2[1].sync_delays()
    assert GroupedEngine(cfgs2, streams_per_group=G, block_size=BLOCK,
                         mxu=False).layout == "vmap"
    # wire_sum folds over all lanes: per-group folds need the group axis
    cfgs3 = _cfgs(Platform.RP2040)
    assert GroupedEngine(cfgs3, streams_per_group=G, block_size=BLOCK,
                         mxu=False, wire=True,
                         emit="reduced").layout == "vmap"
