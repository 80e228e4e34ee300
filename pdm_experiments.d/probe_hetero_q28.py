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

    if "perm" in stages:
        print("== permute cost, x [64, 2, 48, 8192] -> 8680 lanes ==",
              flush=True)
        bench_perm()

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

    if "ablate" in stages:
        print("== hetero ablation: even vs random buckets ==", flush=True)
        bench_ablation()

    if "align" in stages:
        print("== hetero with lane-aligned bucket width ==", flush=True)
        bench_align()

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




def bench_perm():
    """Isolate HeteroServer's two permutes: gather cost along the lane
    (minor) axis vs a major-axis row gather + transpose."""
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(5)
    npkt, B, G = 64, 8192, 8680
    x = jnp.asarray(rng.integers(-16000, 16000,
                                 size=(npkt, 2, 48, B), dtype=np.int64),
                    jnp.int32)
    perm = jnp.asarray(rng.integers(0, B, size=G, dtype=np.int64))

    @jax.jit
    def take_minor(x, perm):
        def body(i, acc):
            xg = jnp.take(x ^ i, perm, axis=-1)
            return acc + jnp.sum(xg[..., ::997], dtype=jnp.int32)
        return lax.fori_loop(0, DEPTH, body, jnp.int32(0))

    @jax.jit
    def take_major(x, perm):
        # stream axis moved to -2 first; gather rows of 48, move back
        def body(i, acc):
            xt = jnp.swapaxes(x ^ i, -1, -2)        # [npkt, 2, B, 48]
            xg = jnp.take(xt, perm, axis=-2)        # row gather
            xg = jnp.swapaxes(xg, -1, -2)
            return acc + jnp.sum(xg[..., ::997], dtype=jnp.int32)
        return lax.fori_loop(0, DEPTH, body, jnp.int32(0))

    @jax.jit
    def baseline(x):
        def body(i, acc):
            return acc + jnp.sum((x ^ i)[..., ::997], dtype=jnp.int32)
        return lax.fori_loop(0, DEPTH, body, jnp.int32(0))

    for name, fn, args in [("xor+sum baseline ", baseline, (x,)),
                           ("take minor axis  ", take_minor, (x, perm)),
                           ("take major axis  ", take_major, (x, perm))]:
        best = timeit(fn, *args)
        print(f"  {name}: {best / DEPTH * 1e3:7.2f} ms/segment", flush=True)



def bench_ablation():
    """Decompose hetero-vs-grouped: EVEN bucket ids (G=1024, zero pad,
    same permute plumbing) isolate the permute/moveaxis cost from the
    1085-lane padded geometry."""
    import bench_stages as bs
    from dspi_tpu.core.constants import Platform

    rtf_g, _ = bs.bench_grouped(platform=Platform.RP2040)
    print(f"  grouped (8 x 1024)        : {rtf_g:7.0f}x RT", flush=True)

    orig = np.random.default_rng

    class EvenIds:
        def __init__(self, seed):
            self._r = orig(seed)
        def integers(self, lo, hi, size=None):
            if size == bs.B:                 # the ids draw -> even split
                return np.arange(bs.B, dtype=np.int64) % (hi - lo) + lo
            return self._r.integers(lo, hi, size=size)
    np.random.default_rng = EvenIds
    try:
        rtf_e, _, waste_e = bs.bench_hetero(platform=Platform.RP2040)
    finally:
        np.random.default_rng = orig
    print(f"  hetero EVEN ids (pad {100*waste_e:.0f}%) : {rtf_e:7.0f}x RT",
          flush=True)
    rtf_h, _, waste_h = bs.bench_hetero(platform=Platform.RP2040)
    print(f"  hetero random (pad {100*waste_h:.1f}%): {rtf_h:7.0f}x RT",
          flush=True)



def bench_align():
    """Does lane-aligning the bucket width (G -> next multiple of 128)
    recover the padded-geometry loss?  Monkeypatches HeteroServer's G."""
    import bench_stages as bs
    from dspi_tpu.chain import grouped as gmod
    from dspi_tpu.core.constants import Platform

    orig_init = gmod.HeteroServer.__init__

    def patched(self, cfgs, ids, _align=[128], **kw):
        import numpy as _np
        ids = _np.asarray(ids, _np.int64)
        K = len(cfgs)
        counts = _np.bincount(ids, minlength=K)
        G = int(counts.max())
        Ga = -(-G // _align[0]) * _align[0]
        # pad ids so every bucket has Ga members: append dummies of the
        # rarest configs (their outputs are dropped by inv anyway)
        extra = []
        for k in range(K):
            extra += [k] * (Ga - counts[k])
        ids2 = _np.concatenate([ids, _np.asarray(extra, _np.int64)])
        orig_init(self, cfgs, ids2, **kw)
        self.n_streams = len(ids)      # report real streams only
    for align in (128, 256):
        gmod.HeteroServer.__init__ = lambda s, c, i, **kw: patched(
            s, c, i, _align=[align], **kw)
        try:
            rtf, dt, waste = bs.bench_hetero(platform=Platform.RP2040)
        finally:
            gmod.HeteroServer.__init__ = orig_init
        print(f"  hetero G-aligned to {align}: {rtf:7.0f}x RT "
              f"(pad {100*waste:.1f}%)", flush=True)

if __name__ == "__main__":
    main()
