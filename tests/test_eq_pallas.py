"""Mosaic Q28 EQ cascade kernels (kernels/eq_pallas.py) vs the scan path.

The kernels must be BIT-exact: they reuse the pipeline's band-step code,
so any word difference is a harness bug, not rounding."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from dspi_tpu.chain.pipeline import _band_step_q28, _tdf2_q28_bypassable
from dspi_tpu.core.qmath import q28_mul

ON_TPU = jax.default_backend() == "tpu"


def _ref(x, cf, s0, scal, nb, has_loud, has_env, tc):
    """lax.scan reference with the kernel's exact per-sample semantics
    (scal is per-cascade [G, 4])."""
    G = x.shape[0]
    n_loud = 2 if has_loud else 0
    ys, env_ends, sF = [], [], []
    for g in range(G):
        def step(carry, xt, g=g):
            st = list(carry)
            cur = xt
            r = 0
            for j in range(n_loud):
                cur, (sa, sb) = _tdf2_q28_bypassable(
                    cf[g, j], (st[r], st[r + 1]), cur, scal[g, j] != 0)
                st[r], st[r + 1] = sa, sb
                r += 2
            for b in range(nb):
                cur, (sa, sb) = _band_step_q28(
                    cf[g, n_loud + b], (st[r], st[r + 1]), cur)
                st[r], st[r + 1] = sa, sb
                r += 2
            if has_env:
                sq = q28_mul(cur, cur)
                st[r] = q28_mul(scal[g, 2], st[r]) + q28_mul(scal[g, 3], sq)
            out = (cur, st[r]) if has_env else cur
            return tuple(st), out
        carry0 = tuple(s0[g, r] for r in range(s0.shape[1]))
        carryF, out = lax.scan(step, carry0, x[g])
        if has_env:
            y_g, env_g = out
            env_ends.append(env_g[tc - 1::tc])
        else:
            y_g = out
        ys.append(y_g)
        sF.append(jnp.stack(carryF))
    env = jnp.stack(env_ends, axis=0) if has_env else None
    return jnp.stack(ys), env, jnp.stack(sF)


@pytest.mark.parametrize("has_loud,has_env,nb", [
    (False, False, 3), (True, False, 2), (True, True, 4), (False, True, 0),
])
def test_kernel_equals_scan(rng, has_loud, has_env, nb):
    if not ON_TPU and not os.environ.get("DSPI_TEST_SLOW"):
        pytest.skip("pallas interpret mode is slow on CPU; set "
                    "DSPI_TEST_SLOW=1 (or DSPI_TEST_TPU=1) to run")
    from dspi_tpu.kernels.eq_pallas import q28_cascades

    G, tc, nblk = 2, 48, 2
    B, bt = (2048, 1024) if ON_TPU else (256, 128)
    T = tc * nblk
    n_loud = 2 if has_loud else 0
    S = 2 * (n_loud + nb) + (1 if has_env else 0)
    x = jnp.asarray(rng.integers(-(1 << 27), 1 << 27,
                                 size=(G, T, B)).astype(np.int32))
    cf = jnp.asarray(rng.integers(-(1 << 27), 1 << 27,
                                  size=(G, n_loud + nb, 5))
                     .astype(np.int32) >> 2)
    s0 = jnp.asarray(rng.integers(-(1 << 20), 1 << 20,
                                  size=(G, S, B)).astype(np.int32))
    # per-cascade scalars (different bypass flags and alphas per cascade)
    a_rms = np.array([260000000, 250000001], np.int32)[:G]
    scal = jnp.asarray(np.stack(
        [np.array([g % 2, 1 - g % 2, a_rms[g], (1 << 28) - a_rms[g]],
                  np.int32) for g in range(G)]))

    y_r, env_r, sF_r = _ref(x, cf, s0, scal, nb, has_loud, has_env, tc)
    y_k, env_k, sF_k = q28_cascades(
        x, cf, s0, scal, nb=nb, has_loud=has_loud, has_env=has_env,
        tc=tc, bt=bt, interpret=not ON_TPU)
    np.testing.assert_array_equal(np.asarray(y_k), np.asarray(y_r))
    np.testing.assert_array_equal(np.asarray(sF_k), np.asarray(sF_r))
    if has_env:
        np.testing.assert_array_equal(np.asarray(env_k), np.asarray(env_r))


@pytest.mark.parametrize("G,B,bt", [
    (3, 300, 128),      # lanes pad 300 -> 384 over three 128-wide tiles
    (2, 250, None),     # auto tile: one 256-wide block
])
def test_kernel_padding(rng, G, B, bt):
    if not ON_TPU and not os.environ.get("DSPI_TEST_SLOW"):
        pytest.skip("pallas interpret mode is slow on CPU; set "
                    "DSPI_TEST_SLOW=1 (or DSPI_TEST_TPU=1) to run")
    from dspi_tpu.kernels.eq_pallas import q28_cascades

    tc, nblk, nb = 48, 2, 2
    T = tc * nblk
    S = 2 * nb
    x = jnp.asarray(rng.integers(-(1 << 27), 1 << 27,
                                 size=(G, T, B)).astype(np.int32))
    cf = jnp.asarray(rng.integers(-(1 << 27), 1 << 27,
                                  size=(G, nb, 5)).astype(np.int32) >> 2)
    s0 = jnp.asarray(rng.integers(-(1 << 20), 1 << 20,
                                  size=(G, S, B)).astype(np.int32))
    scal = jnp.zeros((G, 4), jnp.int32)
    y_r, _, sF_r = _ref(x, cf, s0, scal, nb, False, False, tc)
    y_k, _, sF_k = q28_cascades(x, cf, s0, scal, nb=nb, tc=tc, bt=bt,
                                interpret=not ON_TPU)
    np.testing.assert_array_equal(np.asarray(y_k), np.asarray(y_r))
    np.testing.assert_array_equal(np.asarray(sF_k), np.asarray(sF_r))


def test_kernel_vmap_flattens_groups(rng):
    """vmap over K groups must equal per-group calls (the custom_vmap
    rule reshapes K into the cascade axis)."""
    if not ON_TPU and not os.environ.get("DSPI_TEST_SLOW"):
        pytest.skip("pallas interpret mode is slow on CPU; set "
                    "DSPI_TEST_SLOW=1 (or DSPI_TEST_TPU=1) to run")
    import jax

    from dspi_tpu.kernels.eq_pallas import q28_cascades

    K, G, tc, nblk, nb = 3, 2, 48, 2, 2
    B, bt = (1024, 512) if ON_TPU else (256, 128)
    T = tc * nblk
    S = 2 * (2 + nb) + 1
    x = jnp.asarray(rng.integers(-(1 << 27), 1 << 27,
                                 size=(K, G, T, B)).astype(np.int32))
    cf = jnp.asarray(rng.integers(-(1 << 27), 1 << 27,
                                  size=(K, G, 2 + nb, 5))
                     .astype(np.int32) >> 2)
    s0 = jnp.asarray(rng.integers(-(1 << 20), 1 << 20,
                                  size=(K, G, S, B)).astype(np.int32))
    scal = jnp.asarray(rng.integers(0, 2, size=(K, G, 4)).astype(np.int32))
    scal = scal.at[:, :, 2].set(260000000)
    scal = scal.at[:, :, 3].set((1 << 28) - 260000000)

    fn = lambda xx, cc, ss, sc: q28_cascades(
        xx, cc, ss, sc, nb=nb, has_loud=True, has_env=True, tc=tc, bt=bt,
        interpret=not ON_TPU)
    yv, envv, sFv = jax.vmap(fn)(x, cf, s0, scal)
    for k in range(K):
        yk, envk, sFk = fn(x[k], cf[k], s0[k], scal[k])
        np.testing.assert_array_equal(np.asarray(yv[k]), np.asarray(yk))
        np.testing.assert_array_equal(np.asarray(envv[k]), np.asarray(envk))
        np.testing.assert_array_equal(np.asarray(sFv[k]), np.asarray(sFk))


def test_grouped_engine_kernel_equals_scan(rng):
    """GroupedEngine RP2040 (vmapped _process_q28): the custom_vmap
    flatten of the cascade kernels must be word-identical to the scan
    path."""
    if not ON_TPU:
        pytest.skip("compiles the Mosaic kernel; TPU only")
    from dspi_tpu.chain.grouped import GroupedEngine
    from dspi_tpu.core.constants import Platform

    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_input, rich_config

    cfgs = [rich_config(Platform.RP2040), rich_config(Platform.RP2040)]
    cfgs[1].master_volume_db = -12.0
    G = 256
    x = np.stack([make_input(rng, 4, 48, G), make_input(rng, 4, 48, G)])

    outs = {}
    for impl in ("scan", "pallas"):
        os.environ["DSPI_EQ_IMPL"] = impl
        try:
            eng = GroupedEngine(cfgs, streams_per_group=G, pdm=True,
                                unroll=4)
            outs[impl] = eng.process(x)
        finally:
            os.environ.pop("DSPI_EQ_IMPL", None)
    for k in outs["scan"]:
        np.testing.assert_array_equal(
            np.asarray(outs["scan"][k]), np.asarray(outs["pallas"][k]),
            err_msg=k)


def test_engine_kernel_equals_scan_scheduled(rng):
    """RP2040 engine with the 44.1 kHz 44/45 variable-packet schedule:
    the kernel's dense-envelope mode (packet ends gathered at static
    indices) must be word-identical to the scan path."""
    if not ON_TPU:
        pytest.skip("engine-level kernel path compiles Mosaic; TPU only")
    from dspi_tpu.chain import Engine
    from dspi_tpu.core.constants import Platform

    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from util import rich_config

    sched = (44, 45) * 4
    cfg = rich_config(Platform.RP2040, sample_rate=44100.0)
    B = 256
    x = rng.integers(-16000, 16000,
                     size=(2, sum(sched), B)).astype(np.int32)

    outs = {}
    for impl in ("scan", "pallas"):
        os.environ["DSPI_EQ_IMPL"] = impl
        try:
            eng = Engine(cfg, n_streams=B, pdm=True, unroll=4,
                         schedule=sched)
            o1 = eng.process(x)
            o2 = eng.process(x)
            outs[impl] = (o1, o2, eng.state)
        finally:
            os.environ.pop("DSPI_EQ_IMPL", None)

    for seg in range(2):
        a, b = outs["scan"][seg], outs["pallas"][seg]
        for k in a:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=f"seg{seg}:{k}")
    sa, sb = outs["scan"][2], outs["pallas"][2]
    for f in sa._fields:
        va, vb = getattr(sa, f), getattr(sb, f)
        if va is None:
            assert vb is None
            continue
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=f)


def test_engine_kernel_equals_scan(rng):
    """Full RP2040 engine: Mosaic cascades vs lax.scan, word-for-word
    (outputs AND carried state after multiple segments)."""
    if not ON_TPU:
        pytest.skip("engine-level kernel path compiles Mosaic; TPU only")
    from dspi_tpu.chain import Engine
    from dspi_tpu.core.constants import Platform

    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_input, rich_config

    cfg = rich_config(Platform.RP2040)
    x1 = make_input(rng, 8, 48, 256)
    x2 = make_input(rng, 8, 48, 256)

    outs = {}
    for impl in ("scan", "pallas"):
        os.environ["DSPI_EQ_IMPL"] = impl
        try:
            eng = Engine(cfg, n_streams=256, pdm=True, unroll=4)
            o1 = eng.process(x1)
            o2 = eng.process(x2)
            outs[impl] = (o1, o2, eng.state)
        finally:
            os.environ.pop("DSPI_EQ_IMPL", None)

    for seg in range(2):
        a, b = outs["scan"][seg], outs["pallas"][seg]
        for k in a:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=f"seg{seg}:{k}")
    sa, sb = outs["scan"][2], outs["pallas"][2]
    for f in sa._fields:
        va, vb = getattr(sa, f), getattr(sb, f)
        if va is None:
            assert vb is None
            continue
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=f)
