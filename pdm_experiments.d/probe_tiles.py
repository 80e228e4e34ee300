#!/usr/bin/env python
"""One-off hardware probe: fitted 128-multiple lane tiles vs power-of-two
anchors for the PDM and Q28-EQ Pallas kernels at hetero bucket shapes
(B just past an anchor).  Informs _pick_bt / padded_tiles; results land
in the commit message, then this script's findings go to README's
measured-and-rejected/accepted list.
"""
import os
import time

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/dspi_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

RATE = 48000.0
DEPTH = 8
ITERS = 4


def timeit(fn, *args):
    float(np.asarray(fn(*args)))
    float(np.asarray(fn(*args)))
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        s = [fn(*args) for _ in range(DEPTH)]
        for v in s:
            float(np.asarray(v))
        best = min(best, (time.perf_counter() - t0) / DEPTH)
    return best


def probe_pdm(b, t, bt, tc=16, chain_k=8):
    from dspi_tpu.kernels.pdm_pallas import pdm_segment_pallas

    rng = np.random.default_rng(3)
    bp = -(-b // bt) * bt
    x = jax.device_put(
        rng.integers(-(1 << 27), 1 << 27, size=(t, bp)).astype(np.int32))
    s16 = jnp.zeros((16, bp), jnp.int32).at[7].set(123456789)

    @jax.jit
    def run(s16, x):
        def body(i, carry):
            s, acc = carry
            words, s = pdm_segment_pallas(x ^ i, s, tc=tc, bt=bt)
            return s, acc ^ jnp.sum(words, dtype=jnp.uint32)
        s, acc = lax.fori_loop(0, chain_k, body, (s16, jnp.uint32(0)))
        return (acc ^ jnp.sum(s[7].astype(jnp.uint32))).astype(jnp.float32)

    wall = timeit(run, s16, x)
    rtf = chain_k * b * t / RATE / wall            # REAL lanes only
    print(f"pdm b={b} bt={bt} bp={bp} tc={tc}: {rtf:.0f}x eff "
          f"({chain_k * bp * t / RATE / wall:.0f}x raw)", flush=True)
    return rtf


def probe_eq(b, t, bt, nb=10, g=22, chain_k=8):
    from dspi_tpu.kernels.eq_pallas import q28_cascades

    rng = np.random.default_rng(5)
    x = jax.device_put(rng.integers(
        -(1 << 27), 1 << 27, size=(g, t, b)).astype(np.int32))
    cf = jax.device_put(rng.integers(
        -(1 << 26), 1 << 26, size=(g, nb, 5)).astype(np.int32))
    s0 = jnp.zeros((g, 2 * nb, b), jnp.int32)
    scal = jnp.zeros((g, 4), jnp.int32)

    @jax.jit
    def run(x, cf, s0, scal):
        def body(i, carry):
            s, acc = carry
            y, _, s = q28_cascades(x ^ i, cf, s, scal, nb=nb, tc=48, bt=bt)
            return s, acc + jnp.sum(y[:, -1]).astype(jnp.float32)
        _, acc = lax.fori_loop(0, chain_k, body, (s0, jnp.float32(0)))
        return acc

    wall = timeit(run, x, cf, s0, scal)
    rtf = chain_k * b * t / RATE / wall
    print(f"eq  b={b} bt={bt}: {rtf:.0f}x eff", flush=True)
    return rtf


if __name__ == "__main__":
    T = 3072
    print("== PDM at hetero width 8680 ==")
    for bt in (4096, 4352, 8192, 8704):
        probe_pdm(8680, T, bt)
    print("== PDM anchor sanity 8192 ==")
    probe_pdm(8192, T, 8192)
    print("== EQ q28 cascades at hetero bucket width 1085 ==")
    for bt in (2048, 1152):
        probe_eq(1085, T, bt)
    print("== EQ anchor 1024 ==")
    probe_eq(1024, T, 1024)
