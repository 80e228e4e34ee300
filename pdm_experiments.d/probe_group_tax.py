#!/usr/bin/env python
"""Ablate the vmapped-group tax (round-4 VERDICT weak #1).

Round-4 numbers: homogeneous Q28 11,402x vs grouped K=8 G=1024 Q28
9,552x — a 16% loss at perfectly 128-aligned lane widths, so the round-4
misalignment law does not explain it.  Hypotheses:

  A. vmap overhead itself (leading K axis on every non-Pallas op /
     scan carry) — ablated by grouped K=1 G=8192 vs homogeneous;
  B. per-group coefficients blocking fusion — ablated by FLAT per-lane
     params (build_params_multi: same 8 configs tiled 1024x each,
     trailing [B] coefficient axes, NO group axis, homogeneous-path
     _process_q28) vs homogeneous;
  C. the Mosaic lane_cf mode (the custom_vmap flatten already measured
     94% of grouped for the kernel core in round 4).

Usage: python pdm_experiments.d/probe_group_tax.py [homog grouped k1 flat]
"""

from __future__ import annotations

import os
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "")

import jax                                                   # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/dspi_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp                                      # noqa: E402
from jax import lax                                          # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_stages import (B, DEPTH, NPKT, RATE, UNROLL, _fold,   # noqa: E402
                          _hetero_variants, bench_grouped, timeit)
from dspi_tpu.core.constants import Platform                 # noqa: E402

K = 8


def bench_homog():
    """Single-config Q28 chain at B streams (the 11,402x shape)."""
    from bench import full_chain_config
    from dspi_tpu.chain import Engine

    cfg = _hetero_variants(1, Platform.RP2040)[0]
    eng = Engine(cfg, n_streams=B, emit="reduced", pdm=True,
                 unroll=UNROLL, pdm_fade=False)
    # device-resident, like GroupedEngine: a host-side state would be
    # re-uploaded through the tunnel on every call (first probe run
    # measured 2758x for exactly this reason)
    eng.state = jax.device_put(eng.state)
    eng.params = jax.device_put(eng.params)
    rng = np.random.default_rng(5)
    x = jax.device_put(rng.integers(
        -16000, 16000, size=(NPKT, 2, 48, B)).astype(np.int32))
    pm = jnp.ones((NPKT,), jnp.float32)
    raw = eng.segment_fn

    @jax.jit
    def run(params, state, x):
        def body(i, carry):
            st, acc = carry
            st, out = raw(params, st, x ^ i, pm)
            return st, acc + _fold(out)
        _, acc = lax.fori_loop(0, DEPTH, body, (state, jnp.float32(0)))
        return acc

    best = timeit(run, eng.params, eng.state, x)
    return DEPTH * B * NPKT * 48 / RATE / best


def bench_flat():
    """Same 8 configs, but FLAT: per-lane coefficient vectors via
    build_params_multi (each config tiled over B//K contiguous lanes),
    homogeneous-path _process_q28, no vmap, no group axis."""
    import functools

    from dspi_tpu.chain.pack import (build_params_multi, build_static,
                                     init_state)
    from dspi_tpu.chain.pipeline import _process_q28
    from dspi_tpu.params.design import derive

    cfgs = _hetero_variants(K, Platform.RP2040)
    deriveds = [derive(c) for c in cfgs]
    static = build_static(deriveds[0], block_size=48, emit="reduced",
                          pdm=True, unroll=UNROLL)
    ids = np.repeat(np.arange(K), B // K)
    params = jax.device_put(build_params_multi(deriveds, static, ids))
    state = jax.device_put(init_state(static, B, pdm_fade=False))
    raw = functools.partial(_process_q28, static)

    rng = np.random.default_rng(5)
    x = jax.device_put(rng.integers(
        -16000, 16000, size=(NPKT, 2, 48, B)).astype(np.int32))
    pm = jnp.ones((NPKT,), jnp.float32)

    @jax.jit
    def run(params, state, x):
        def body(i, carry):
            st, acc = carry
            st, out = raw(params, st, x ^ i, pm)
            return st, acc + _fold(out)
        _, acc = lax.fori_loop(0, DEPTH, body, (state, jnp.float32(0)))
        return acc

    best = timeit(run, params, state, x)
    return DEPTH * B * NPKT * 48 / RATE / best


def _profile_one(name, builder):
    """One profiled chained run; dump xplane trace to /tmp/tax_<name>."""
    run, args = builder()
    float(np.asarray(run(*args)))                    # compile + warm
    out = f"/tmp/tax_{name}"
    with jax.profiler.trace(out):
        float(np.asarray(run(*args)))
    print(f"  profile -> {out}", flush=True)


def _builder_homog():
    from bench import full_chain_config
    from dspi_tpu.chain import Engine

    cfg = _hetero_variants(1, Platform.RP2040)[0]
    eng = Engine(cfg, n_streams=B, emit="reduced", pdm=True,
                 unroll=UNROLL, pdm_fade=False)
    eng.state = jax.device_put(eng.state)
    eng.params = jax.device_put(eng.params)
    rng = np.random.default_rng(5)
    x = jax.device_put(rng.integers(
        -16000, 16000, size=(NPKT, 2, 48, B)).astype(np.int32))
    pm = jnp.ones((NPKT,), jnp.float32)
    raw = eng.segment_fn

    @jax.jit
    def run(params, state, x):
        def body(i, carry):
            st, acc = carry
            st, out = raw(params, st, x ^ i, pm)
            return st, acc + _fold(out)
        _, acc = lax.fori_loop(0, DEPTH, body, (state, jnp.float32(0)))
        return acc

    return run, (eng.params, eng.state, x)


def _builder_flat():
    import functools

    from dspi_tpu.chain.pack import (build_params_multi, build_static,
                                     init_state)
    from dspi_tpu.chain.pipeline import _process_q28
    from dspi_tpu.params.design import derive

    cfgs = _hetero_variants(K, Platform.RP2040)
    deriveds = [derive(c) for c in cfgs]
    static = build_static(deriveds[0], block_size=48, emit="reduced",
                          pdm=True, unroll=UNROLL)
    ids = np.repeat(np.arange(K), B // K)
    params = jax.device_put(build_params_multi(deriveds, static, ids))
    state = jax.device_put(init_state(static, B, pdm_fade=False))
    raw = functools.partial(_process_q28, static)
    rng = np.random.default_rng(5)
    x = jax.device_put(rng.integers(
        -16000, 16000, size=(NPKT, 2, 48, B)).astype(np.int32))
    pm = jnp.ones((NPKT,), jnp.float32)

    @jax.jit
    def run(params, state, x):
        def body(i, carry):
            st, acc = carry
            st, out = raw(params, st, x ^ i, pm)
            return st, acc + _fold(out)
        _, acc = lax.fori_loop(0, DEPTH, body, (state, jnp.float32(0)))
        return acc

    return run, (params, state, x)


def main():
    stages = sys.argv[1:] or ["homog", "grouped", "k1", "flat"]
    print(f"== group-tax ablation: B={B}, K={K}, NPKT={NPKT}, "
          f"DEPTH={DEPTH} ==", flush=True)
    if "homog" in stages:
        r = bench_homog()
        print(f"  homogeneous 1x{B} Q28      : {r:8.0f}x RT", flush=True)
    if "grouped" in stages:
        r, _ = bench_grouped(k=K, platform=Platform.RP2040)
        print(f"  grouped vmap {K}x{B // K} Q28  : {r:8.0f}x RT",
              flush=True)
    if "k1" in stages:
        r, _ = bench_grouped(k=1, g=B, platform=Platform.RP2040)
        print(f"  grouped vmap 1x{B} Q28    : {r:8.0f}x RT", flush=True)
    if "flat" in stages:
        r = bench_flat()
        print(f"  FLAT per-lane params Q28   : {r:8.0f}x RT", flush=True)
    if "profile" in stages:
        _profile_one("homog", _builder_homog)
        _profile_one("flat", _builder_flat)


if __name__ == "__main__":
    main()
