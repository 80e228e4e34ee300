"""Multi-device sharded execution on the 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from dspi_tpu import Platform
from dspi_tpu.chain import Engine
from dspi_tpu.runtime.executor import StreamRunner, make_mesh, shard_engine

from util import make_input, rich_config

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_sharded_engine_matches_single_device(rng):
    cfg = rich_config(Platform.RP2040, leveller=False, pdm=False)
    B = 16
    x = make_input(rng, 4, 48, B)

    ref = Engine(cfg, n_streams=B, pdm=False, unroll=2)
    want = np.asarray(ref.process(x)["out"])

    eng = Engine(cfg, n_streams=B, pdm=False, unroll=2)
    mesh = make_mesh()
    shard_engine(eng, mesh)
    runner = StreamRunner(eng, mesh)
    out = runner.feed(x)
    runner.drain()
    got = np.asarray(out["out"])
    np.testing.assert_array_equal(got, want)

    # state stayed sharded across the mesh
    sh = eng.state.eq_a.sharding
    assert len(sh.device_set) == 8


def test_runner_pipelines_segments(rng):
    cfg = rich_config(Platform.RP2040, leveller=False, pdm=False)
    B = 16
    eng = Engine(cfg, n_streams=B, pdm=False, unroll=2)
    mesh = make_mesh()
    shard_engine(eng, mesh)
    runner = StreamRunner(eng, mesh, max_inflight=2)

    ref = Engine(cfg, n_streams=B, pdm=False, unroll=2)
    lasts = []
    for seg in range(5):
        x = make_input(rng, 2, 48, B)
        runner.feed(x)
        lasts.append(np.asarray(ref.process(x)["out"]))
    out = runner.drain()
    np.testing.assert_array_equal(np.asarray(out["out"]), lasts[-1])
