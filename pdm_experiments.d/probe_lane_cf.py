#!/usr/bin/env python
"""Isolate the lane_cf kernel tax (round-5, VERDICT #1 follow-up).

probe_group_tax measured FLAT per-lane serving at ~10.2k x vs homogeneous
11.45k x, and the xplane diff splits the gap into three: +17 ms in the
cascade pallas_call (lane_cf mode), +16.6 ms elementwise fusions, +13.3 ms
broadcasts.  This probe times q28_cascades ALONE in both modes at the
serving shape, so kernel-level fixes (pre-split coefficient rows, hoisted
splits) can be measured without the 10-minute full-chain compile.

Measured (v5e, B=8192, nb=10, reps=8; scalar / lane_cf kernel wall):
  round-4 committed (per-mul q28_mul both modes) : 82.4 / 88.4 ms
  full pre-split both modes (hoisted cf rows)    : 77.7 / 91.3 ms
  shared sample/output splits, in-loop cf splits : 79.4 / 91.8 ms
  SHIPPED: pre-split scalar, per-mul lane        : 78.1 / 87.5 ms
Conclusion: hoisting 120 pre-split coefficient vectors (or even sharing
the sample/output splits) stretches [bt]-vector live ranges and loses
more to vreg scheduling than the saved split ops win; the scalar mode's
loop-invariant splits are free scalar-unit work.  Band math is therefore
MODE-DEPENDENT in eq_pallas (_band_step_ps scalar, pipeline per-mul
q28_mul lane) — bit-exactness unchanged (both reassociate only across
the deterministic ah/al split; TPU word-equality tests pin it).

Usage: python pdm_experiments.d/probe_lane_cf.py [B [nb [reps]]]
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "")

import jax                                                    # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/dspi_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp                                       # noqa: E402
from jax import lax                                           # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dspi_tpu.kernels.eq_pallas import q28_cascades           # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
NB = int(sys.argv[2]) if len(sys.argv) > 2 else 10
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
G, TTOT, TC = 2, 64 * 48, 48
RATE = 48000.0


def bench(lane):
    rng = np.random.default_rng(7)
    x = jax.device_put(rng.integers(
        -(1 << 24), 1 << 24, size=(G, TTOT, B)).astype(np.int32))
    cf_sc = rng.integers(-(1 << 26), 1 << 26,
                         size=(G, 2 + NB, 5)).astype(np.int32)
    cf = (np.broadcast_to(cf_sc[..., None], cf_sc.shape + (B,)).copy()
          if lane else cf_sc)
    cf = jax.device_put(cf)
    S = 2 * (2 + NB) + 1
    s0 = jax.device_put(np.zeros((G, S, B), np.int32))
    scal_sc = np.zeros((G, 4), np.int32)
    scal_sc[:, 2] = 1 << 27                     # a_rms ~0.5 in Q28
    scal_sc[:, 3] = (1 << 28) - (1 << 27)
    scal = (np.broadcast_to(scal_sc[..., None], (G, 4, B)).copy()
            if lane else scal_sc)
    scal = jax.device_put(scal)

    @jax.jit
    def run(x, cf, s0, scal):
        def body(i, carry):
            s, acc = carry
            y, env, sf = q28_cascades(x ^ i, cf, s, scal, nb=NB,
                                      has_loud=True, has_env=True, tc=TC)
            return sf, acc + jnp.sum(y[:, -1]).astype(jnp.float32)
        _, acc = lax.fori_loop(0, REPS, body, (s0, jnp.float32(0)))
        return acc

    float(np.asarray(run(x, cf, s0, scal)))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(run(x, cf, s0, scal)))
        best = min(best, time.perf_counter() - t0)
    # per-lane samples processed per wall second, as x RT at 48 kHz
    rtf = REPS * G * TTOT * B / RATE / best
    return rtf, best


if __name__ == "__main__":
    for lane in (False, True):
        rtf, wall = bench(lane)
        print(f"  {'lane_cf' if lane else 'scalar '} cf: {rtf:9.0f}x RT "
              f"({1000 * wall:.1f} ms)", flush=True)
