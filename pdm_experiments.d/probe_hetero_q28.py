#!/usr/bin/env python
"""Where do hetero Q28's missing 30% go? (round-3 VERDICT #5)

Grouped Q28 (8 x 1024 even groups) flattens the EQ-cascade lanes to
8192 -> _pick_bt runs ONE 8192-wide block.  Hetero at B=8192 buckets to
8 x 1085 -> 8680 lanes, where _pick_bt's single-fitted-block candidate
is guarded to B <= 8192, so it falls back to NINE 1024-wide grid steps
(padded 9216).  This probe measures, on the real TPU:

  (a) the lane_cf cascade kernel's throughput at 8680 lanes across bt
      candidates {1024, 2176, 2944, 4352, 8704} plus the 8192-lane
      reference — is the narrow-tile penalty real, and is a fitted
      2-block tile the winner?
  (b) the full hetero_q28 chain with _pick_bt monkeypatched to each
      candidate — does the kernel-level win survive end to end?
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "")

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/dspi_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp                                       # noqa: E402
from jax import lax                                           # noqa: E402

from dspi_tpu.kernels import eq_pallas                        # noqa: E402

ITERS = 4
DEPTH = 8
T = 64 * 48                     # one 64-packet segment


def timeit(fn, *args):
    float(np.asarray(fn(*args)))
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_kernel(B, bt, nb=10, has_loud=True, has_env=True):
    """Time the lane_cf cascade core (the exact hetero lowering) chained
    DEPTH times on device; returns samples*lanes/sec."""
    core = eq_pallas._core(nb, has_loud, has_env, 48, None, bt, False,
                           lane_cf=True)
    G = 2
    n_rows = (2 if has_loud else 0) + nb
    S = 2 * n_rows + (1 if has_env else 0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-(1 << 24), 1 << 24,
                                 size=(G, T, B), dtype=np.int64),
                    jnp.int32)
    cf = jnp.asarray(rng.integers(-(1 << 26), 1 << 26,
                                  size=(G, n_rows * 5, B),
                                  dtype=np.int64), jnp.int32) // 4
    s0 = jnp.zeros((G, S, B), jnp.int32)
    scal = jnp.zeros((G, 4, B), jnp.int32)

    @jax.jit
    def run(x, cf, s0, scal):
        def body(i, carry):
            s, acc = carry
            res = core(x ^ i, cf, s, scal)
            y, s2 = res[0], res[-1]
            return s2, acc + jnp.sum(y[:, -1]).astype(jnp.float32)
        _, acc = lax.fori_loop(0, DEPTH, body, (s0, jnp.float32(0)))
        return acc

    best = timeit(run, x, cf, s0, scal)
    return DEPTH * G * T * B / best


def main():
    stages = sys.argv[1:] or ["kernel", "chain"]

    if "kernel" in stages:
        print("== lane_cf cascade kernel, G=2, T=%d ==" % T, flush=True)
        ref = bench_kernel(8192, 8192)
        print(f"  B=8192 bt=8192 (grouped shape): {ref/1e9:7.2f} G lane-smp/s",
              flush=True)
        for bt in (1024, 2176, 2944, 4352, 8704, None):
            r = bench_kernel(8680, bt)
            tag = bt if bt else "auto"
            print(f"  B=8680 bt={tag}: {r/1e9:7.2f} G lane-smp/s "
                  f"({100*r/ref:.0f}% of grouped)", flush=True)

    if "chain" in stages:
        from bench_stages import bench_hetero
        from dspi_tpu.core.constants import Platform

        orig = eq_pallas._pick_bt
        print("== full hetero_q28 chain, B=8192, 8 cfgs ==", flush=True)
        for bt in (None, 1024, 4352):
            eq_pallas._pick_bt = (orig if bt is None
                                  else (lambda B, bt0=None, _bt=bt:
                                        orig(B, bt0) if B != 8680 else _bt))
            eq_pallas._core.cache_clear()
            rtf, dt, waste = bench_hetero(platform=Platform.RP2040)
            tag = bt if bt else "auto"
            print(f"  _pick_bt(8680)={tag}: {rtf:7.0f}x RT", flush=True)
        eq_pallas._pick_bt = orig


if __name__ == "__main__":
    main()
