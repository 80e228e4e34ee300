#!/usr/bin/env python
"""PDM kernel formulation experiments on the real TPU.

Each variant is bit-exact (asserted against the production kernel on a
small case before timing).  Honest timing: every call forces a
device->host read.  Usage: python pdm_experiments.py [variant ...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "")

import jax                                                  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/dspi_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp                                     # noqa: E402
from jax import lax                                         # noqa: E402

from dspi_tpu.core import constants as C                    # noqa: E402
from dspi_tpu.kernels.pdm import (_noise_shaper, _targets,  # noqa: E402
                                  _xorshift32)

_BIT_MASKS = tuple(jnp.uint32(1 << (31 - k)) for k in range(32))

B = int(os.environ.get("PDM_B", 8192))
T = int(os.environ.get("PDM_T", 3072))
ITERS = int(os.environ.get("PDM_ITERS", 5))
RATE = 48000.0


def scan_kernel(sample_body, unroll=1):
    @jax.jit
    def run(err, err2, ns, rng, target):
        carry0 = (err, err2, tuple(ns[i] for i in range(5)), rng)
        (err, err2, ns_t, rng), words = lax.scan(sample_body, carry0, target,
                                                 unroll=unroll)
        return err, err2, jnp.stack(ns_t), rng, words

    @jax.jit
    def run_timed(err, err2, ns, rng, target):
        """Single-scalar output: one device->host readback per call (the
        tunnel costs ~30ms per RPC, which would swamp the measurement)."""
        carry0 = (err, err2, tuple(ns[i] for i in range(5)), rng)
        (err, err2, _, rng), words = lax.scan(sample_body, carry0, target,
                                              unroll=unroll)
        return (jnp.sum(words, dtype=jnp.uint32) ^ rng[0]
                ^ err[0].astype(jnp.uint32) ^ err2[0].astype(jnp.uint32))
    return run, run_timed


# --- variant bodies ---------------------------------------------------------

def body_current(carry, target):
    """Production: select-increments, dither folded, mask-or word."""
    err, err2, ns, rng = carry
    tm1 = target - 65535
    tm2 = target - 131070
    words = []
    for _ in range(8):
        rng = _xorshift32(rng)
        raw = (rng & C.PDM_DITHER_MASK).astype(jnp.int32) - (C.PDM_DITHER_MASK >> 1)
        dither, ns = _noise_shaper(ns, raw, err2 >> 8)
        e2d = err2 + dither
        word = jnp.zeros(err.shape, jnp.uint32)
        zero = jnp.uint32(0)
        for k in range(32):
            c = e2d >= 0
            word = word | jnp.where(c, _BIT_MASKS[k], zero)
            d2 = jnp.where(c, tm2, target)
            e2d = e2d + (err + d2)
            err = err + jnp.where(c, tm1, target)
        err2 = e2d - dither
        words.append(word)
    err = err - (err >> 16)
    err2 = err2 - (err2 >> 16)
    return (err, err2, ns, rng), jnp.stack(words)


def body_r1(carry, target):
    """Round-1 formulation: explicit fb, shift-or word."""
    err, err2, ns, rng = carry
    words = []
    for _ in range(8):
        rng = _xorshift32(rng)
        raw = (rng & C.PDM_DITHER_MASK).astype(jnp.int32) - (C.PDM_DITHER_MASK >> 1)
        dither, ns = _noise_shaper(ns, raw, err2 >> 8)
        word = jnp.zeros(err.shape, jnp.uint32)
        for _k in range(32):
            cond = (err2 + dither) >= 0
            fb = jnp.where(cond, 65535, 0)
            word = (word << 1) | cond.astype(jnp.uint32)
            err = err + (target - fb)
            err2 = err2 + (err - fb)
        words.append(word)
    err = err - (err >> 16)
    err2 = err2 - (err2 >> 16)
    return (err, err2, ns, rng), jnp.stack(words)


def body_shiftor(carry, target):
    """Select-increments + shift-or word build."""
    err, err2, ns, rng = carry
    tm1 = target - 65535
    tm2 = target - 131070
    words = []
    for _ in range(8):
        rng = _xorshift32(rng)
        raw = (rng & C.PDM_DITHER_MASK).astype(jnp.int32) - (C.PDM_DITHER_MASK >> 1)
        dither, ns = _noise_shaper(ns, raw, err2 >> 8)
        e2d = err2 + dither
        word = jnp.zeros(err.shape, jnp.uint32)
        for _k in range(32):
            c = e2d >= 0
            word = (word << 1) | c.astype(jnp.uint32)
            d2 = jnp.where(c, tm2, target)
            e2d = e2d + (err + d2)
            err = err + jnp.where(c, tm1, target)
        err2 = e2d - dither
        words.append(word)
    err = err - (err >> 16)
    err2 = err2 - (err2 >> 16)
    return (err, err2, ns, rng), jnp.stack(words)


def body_spec(carry, target):
    """Speculative e2d: both candidate updates computed, one select on the
    critical path (cmp -> select), err chain off-path."""
    err, err2, ns, rng = carry
    tm1 = target - 65535
    tm2 = target - 131070
    words = []
    for _ in range(8):
        rng = _xorshift32(rng)
        raw = (rng & C.PDM_DITHER_MASK).astype(jnp.int32) - (C.PDM_DITHER_MASK >> 1)
        dither, ns = _noise_shaper(ns, raw, err2 >> 8)
        e2d = err2 + dither
        word = jnp.zeros(err.shape, jnp.uint32)
        zero = jnp.uint32(0)
        for k in range(32):
            c = e2d >= 0
            word = word | jnp.where(c, _BIT_MASKS[k], zero)
            cand_t = e2d + (err + tm2)       # off critical path
            cand_f = e2d + (err + target)
            e2d = jnp.where(c, cand_t, cand_f)
            err = err + jnp.where(c, tm1, target)
        err2 = e2d - dither
        words.append(word)
    err = err - (err >> 16)
    err2 = err2 - (err2 >> 16)
    return (err, err2, ns, rng), jnp.stack(words)


def body_r1fold(carry, target):
    """r1 increments + dither folded into the carry (production v2)."""
    err, err2, ns, rng = carry
    words = []
    for _ in range(8):
        rng = _xorshift32(rng)
        raw = (rng & C.PDM_DITHER_MASK).astype(jnp.int32) - (C.PDM_DITHER_MASK >> 1)
        dither, ns = _noise_shaper(ns, raw, err2 >> 8)
        e2d = err2 + dither
        word = jnp.zeros(err.shape, jnp.uint32)
        for _k in range(32):
            c = e2d >= 0
            fb = jnp.where(c, 65535, 0)
            word = (word << 1) | c.astype(jnp.uint32)
            err = err + (target - fb)
            e2d = e2d + (err - fb)
        err2 = e2d - dither
        words.append(word)
    err = err - (err >> 16)
    err2 = err2 - (err2 >> 16)
    return (err, err2, ns, rng), jnp.stack(words)


def body_f32(carry, target):
    """err/err2/target/fb arithmetic in float32 (VPU-native); exact while
    |values| < 2^24 — the DS state is bounded ~2^18 by modulator stability
    (the firmware clips input to 90% FS for exactly this reason).  Int
    semantics (shifts) only at chunk/sample boundaries."""
    err, err2, ns, rng = carry
    errf = err.astype(jnp.float32)
    err2f = err2.astype(jnp.float32)
    targetf = target.astype(jnp.float32)
    words = []
    for _ in range(8):
        rng = _xorshift32(rng)
        raw = (rng & C.PDM_DITHER_MASK).astype(jnp.int32) - (C.PDM_DITHER_MASK >> 1)
        dither, ns = _noise_shaper(ns, raw, err2f.astype(jnp.int32) >> 8)
        ditherf = dither.astype(jnp.float32)
        word = jnp.zeros(err.shape, jnp.uint32)
        for _k in range(32):
            cond = (err2f + ditherf) >= 0.0
            fb = jnp.where(cond, 65535.0, 0.0)
            word = (word << 1) | cond.astype(jnp.uint32)
            errf = errf + (targetf - fb)
            err2f = err2f + (errf - fb)
        words.append(word)
    erri = errf.astype(jnp.int32)
    err2i = err2f.astype(jnp.int32)
    erri = erri - (erri >> 16)
    err2i = err2i - (err2i >> 16)
    return (erri, err2i, ns, rng), jnp.stack(words)


VARIANTS = {
    "current": (body_current, 1),
    "r1": (body_r1, 1),
    "r1fold": (body_r1fold, 1),
    "shiftor": (body_shiftor, 1),
    "spec": (body_spec, 1),
    "r1fold_u4": (body_r1fold, 4),
    "r1_u4": (body_r1, 4),
    "f32": (body_f32, 1),
    "f32_u4": (body_f32, 4),
}


def consume(out):
    return sum(float(np.asarray(x).reshape(-1)[0]) for x in jax.tree.leaves(out))


def main():
    names = sys.argv[1:] or list(VARIANTS)
    rng_np = np.random.default_rng(3)
    x = rng_np.integers(-(1 << 27), 1 << 27, size=(T, B)).astype(np.int32)
    fade = np.full(B, 1024, np.int32)

    class _St:
        pdm_fade = jnp.asarray(fade)
    target, _ = _targets(jnp.asarray(x), _St.pdm_fade)
    target = jax.device_put(np.asarray(target))

    err = jnp.zeros(B, jnp.int32)
    err2 = jnp.zeros(B, jnp.int32)
    ns = jnp.zeros((5, B), jnp.int32)
    rng = jnp.full(B, 123456789, jnp.uint32)

    # bit-exactness cross-check on a small case
    small = target[:64, :64]
    ref = None
    results = {}
    nocheck = bool(os.environ.get("PDM_NOCHECK"))
    for name in names:
        body, unroll = VARIANTS[name]
        run, run_timed = scan_kernel(body, unroll)
        if not nocheck:
            chk = run(err[:64], err2[:64], ns[:, :64], rng[:64], small)
            chk = [np.asarray(v) for v in chk]
            if ref is None:
                ref = chk
            else:
                for a, b in zip(ref, chk):
                    assert np.array_equal(a, b), f"{name} NOT bit-exact"

        consume(run_timed(err, err2, ns, rng, target))
        best = float("inf")
        for _ in range(ITERS):
            t0 = time.perf_counter()
            consume(run_timed(err, err2, ns, rng, target))
            best = min(best, time.perf_counter() - t0)
        rtf = B * T / RATE / best
        results[name] = (rtf, best)
        print(f"{name:12s} B={B} T={T} unroll={unroll}: {rtf:8.0f}x RT"
              f"  ({best*1e3:.1f} ms)", flush=True)

    return results


if __name__ == "__main__":
    main()
