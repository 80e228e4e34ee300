#!/usr/bin/env python
"""Per-stage microbenchmarks on the real TPU: where does the time go?

Usage:  python bench_stages.py [stage ...]
Stages: pdm chain wire wire_q28 nopdm passthrough peq full96 q28 grouped
        hetero grouped_q28 hetero_q28 sched441 sched441_q28 deframe
        deframe24 sweep
Env:    DSPI_BENCH_STREAMS, DSPI_BENCH_PACKETS, DSPI_BENCH_UNROLL,
        DSPI_PDM_IMPL, DSPI_PDM_UNROLL

Honest methodology (see memory notes): every timed call forces a
device->host read of a scalar from each output, because on tunneled
backends block_until_ready can return early.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "")

import jax                                                   # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/dspi_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp                                      # noqa: E402

from bench import bench_engine, full_chain_config            # noqa: E402

B = int(os.environ.get("DSPI_BENCH_STREAMS", 8192))
NPKT = int(os.environ.get("DSPI_BENCH_PACKETS", 64))
UNROLL = int(os.environ.get("DSPI_BENCH_UNROLL", 48))
ITERS = int(os.environ.get("DSPI_BENCH_ITERS", 6))
RATE = 48000.0


DEPTH = int(os.environ.get("DSPI_BENCH_DEPTH", 8))


def timeit(fn, *args):
    """Pipelined: enqueue DEPTH calls, read every scalar value at the end
    (see bench.bench_engine for the honesty rationale)."""
    float(np.asarray(fn(*args)))
    float(np.asarray(fn(*args)))
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        scalars = [fn(*args) for _ in range(DEPTH)]
        for s in scalars:
            float(np.asarray(s))
        best = min(best, (time.perf_counter() - t0) / DEPTH)
    return best


def bench_pdm(b=B, t=NPKT * 48, unroll=None, impl=None, chain_k=8):
    """PDM modulator alone: [T, B] Q28 -> words, reduced output.

    ``chain_k`` segment iterations run chained on-device inside one jit
    (state threads through; word sums xor-fold into one scalar), so one
    readback forces all of them — kernel walls would otherwise sit on the
    ~27 ms tunnel-readback floor and report falsely-low RTF."""
    from jax import lax

    from dspi_tpu.chain.pack import ChainState
    from dspi_tpu.kernels.pdm import pdm_segment

    unroll = unroll if unroll is not None else int(
        os.environ.get("DSPI_PDM_UNROLL", 1))
    impl = impl or os.environ.get("DSPI_PDM_IMPL", "auto")

    rng = np.random.default_rng(3)
    x = jax.device_put(
        rng.integers(-(1 << 27), 1 << 27, size=(t, b)).astype(np.int32))
    st = dict(
        pdm_err=jnp.zeros(b, jnp.int32), pdm_err2=jnp.zeros(b, jnp.int32),
        pdm_ns=jnp.zeros((5, b), jnp.int32),
        pdm_rng=jnp.full(b, 123456789, jnp.uint32),
        pdm_fade=jnp.full(b, 1024, jnp.int32))
    fields = [f for f in ChainState._fields if f not in st]
    state = ChainState(**st, **{f: None for f in fields})

    @jax.jit
    def run(state, x):
        def body(i, carry):
            s, acc = carry
            # vary the input per iteration (fused elementwise XOR):
            # identical inputs would let XLA hoist input-only work out
            # of the chained loop
            s, words = pdm_segment(s, x ^ i,
                                   unroll=unroll, impl=impl)
            return s, acc ^ jnp.sum(words, dtype=jnp.uint32)
        s, acc = lax.fori_loop(0, chain_k, body, (state, jnp.uint32(0)))
        return (acc ^ s.pdm_rng[0]
                ^ s.pdm_err[0].astype(jnp.uint32)).astype(jnp.float32)

    best = timeit(run, state, x)
    rtf = chain_k * b * t / RATE / best
    return rtf, best


def _hetero_variants(k, platform=None):
    """k full-chain configs sharing static structure (band kinds, enables,
    delays) but with distinct coefficients — the realistic serving mix."""
    from dspi_tpu.core.constants import Platform

    platform = platform or Platform.RP2350
    cfgs = []
    for i in range(k):
        cfg = full_chain_config(platform)
        for ch in range(cfg.num_channels):
            for b_ in range(10):
                e = cfg.eq[ch][b_]
                e.freq = float(e.freq) * (1.0 + 0.02 * i)
                e.gain_db = float(e.gain_db) + (0.2 if i % 2 else -0.2)
        cfg.master_volume_db = -10.0 - 0.5 * i
        cfgs.append(cfg)
    return cfgs


def _fold(out):
    return sum(jnp.sum(v).astype(jnp.float32)
               for v in jax.tree.leaves(out))


def bench_grouped(k=8, g=None, npkt=None, platform=None):
    """Homogeneous-structure grouped serving: K configs x G streams as one
    vmapped program (the reference number for the hetero ratio)."""
    from jax import lax

    from dspi_tpu.chain.grouped import GroupedEngine

    g = g or B // k
    npkt = npkt or NPKT
    eng = GroupedEngine(_hetero_variants(k, platform), streams_per_group=g,
                        emit="reduced", pdm=True, unroll=UNROLL,
                        pdm_fade=False)
    rng = np.random.default_rng(5)
    x = rng.integers(-16000, 16000, size=(k, npkt, 2, 48, g)).astype(np.int32)
    if eng.layout == "flat":
        # the flat engine's native input is one [.., K*G] lane axis
        # (group blocks contiguous) — serving callers hold flat buffers,
        # so the bench feeds them too instead of paying the grouped-
        # contract adapter's per-segment transpose
        x = np.moveaxis(x, 0, -2).reshape(npkt, 2, 48, k * g)
        seg = eng.flat_segment_fn
    else:
        seg = eng._vraw
    x = jax.device_put(x)
    pm = jnp.ones((npkt,), jnp.float32)

    @jax.jit
    def run(params, state, x):
        def body(i, carry):
            st, acc = carry
            st, out = seg(params, st, x ^ i, pm)
            return st, acc + _fold(out)
        _, acc = lax.fori_loop(0, DEPTH, body, (state, jnp.float32(0)))
        return acc

    best = timeit(run, eng.params, eng.state, x)
    rtf = DEPTH * k * g * npkt * 48 / RATE / best
    return rtf, best


def bench_hetero(k=8, b=None, npkt=None, platform=None):
    """ARBITRARY per-stream config mix: k configs scattered across b
    streams, bucketed onto the grouped MXU path by HeteroServer
    (round-2 VERDICT #5: target >=70% of the grouped number)."""
    from jax import lax

    from dspi_tpu.chain.grouped import HeteroServer

    b = b or B
    npkt = npkt or NPKT
    rng = np.random.default_rng(5)
    ids = rng.integers(0, k, size=b)
    srv = HeteroServer(_hetero_variants(k, platform), ids, emit="reduced",
                       pdm=True, unroll=UNROLL, pdm_fade=False)
    x = jax.device_put(rng.integers(
        -16000, 16000, size=(npkt, 2, 48, b)).astype(np.int32))
    pm = jnp.ones((npkt,), jnp.float32)
    perm, inv = srv._perm, srv._inv

    @jax.jit
    def run(params, state, x):
        def body(i, carry):
            st, acc = carry
            st, out = srv._raw(params, st, x ^ i, pm,
                               perm, inv)
            return st, acc + _fold(out)
        _, acc = lax.fori_loop(0, DEPTH, body, (state, jnp.float32(0)))
        return acc

    best = timeit(run, srv.grouped.params, srv.grouped.state, x)
    rtf = DEPTH * b * npkt * 48 / RATE / best
    return rtf, best, srv.padding_waste


def bench_deframe(bit_depth=16, b=None, npkt=None):
    """Marginal ON-CHIP cost of the USB deframe (round-4 VERDICT #3/#6).

    The committed serve_framed numbers measure this environment's
    17-40 MB/s tunnel, not the deframe; here the raw payload is
    device-RESIDENT and the same chained-segment program runs twice —
    once deframing the payload inside the jit (ChainedRunner's pre-hook
    path, kernels/deframe.py), once consuming pre-deframed planes — so
    the upload cancels out and the delta is the unpack's real compute
    cost.  Firmware analog: the hot-path unpack usb_audio.c:591-686
    (float VFP) / :997-1006 (Q28 byte assembly)."""
    import functools

    from jax import lax

    from dspi_tpu.chain import Engine
    from dspi_tpu.chain.pipeline import _process_float
    from dspi_tpu.core.constants import Platform
    from dspi_tpu.kernels.deframe import deframe_s16, deframe_s24

    b = b or B
    npkt = npkt or NPKT
    cfg = full_chain_config(Platform.RP2350)
    eng = Engine(cfg, n_streams=b, emit="reduced", pdm=True,
                 unroll=UNROLL, pdm_fade=False, bit_depth=bit_depth)
    raw = functools.partial(_process_float, eng.static)
    pm = jnp.ones((npkt,), jnp.float32)
    rng = np.random.default_rng(11)
    frames = npkt * 48
    if bit_depth == 24:
        payload = jax.device_put(
            rng.integers(0, 256, size=(b, frames * 6)).astype(np.uint8))

        def pre(p):
            return deframe_s24(p, npkt, 48)

        def vary(p, i):
            return p ^ (i % 251).astype(jnp.uint8)
    else:
        payload = jax.device_put(rng.integers(
            -(1 << 31), 1 << 31, size=(b, frames),
            dtype=np.int64).astype(np.int32))

        def pre(p):
            return deframe_s16(p, npkt, 48)

        def vary(p, i):
            return p ^ i

    x0 = jax.device_put(np.asarray(jax.jit(pre)(payload)))

    params = jax.tree.map(
        lambda v: None if v is None else jax.device_put(v), eng.params)
    state = jax.tree.map(
        lambda v: None if v is None else jax.device_put(v), eng.state)

    def fold(out):
        return sum(jnp.sum(v).astype(jnp.float32)
                   for v in jax.tree.leaves(out))

    @jax.jit
    def run_framed(params, state, p):
        def body(i, carry):
            st, acc = carry
            st, out = raw(params, st, pre(vary(p, i)), pm)
            return st, acc + fold(out)
        _, acc = lax.fori_loop(0, DEPTH, body, (state, jnp.float32(0)))
        return acc

    @jax.jit
    def run_planes(params, state, x):
        def body(i, carry):
            st, acc = carry
            st, out = raw(params, st, x ^ i, pm)
            return st, acc + fold(out)
        _, acc = lax.fori_loop(0, DEPTH, body, (state, jnp.float32(0)))
        return acc

    w_framed = timeit(run_framed, params, state, payload)
    w_planes = timeit(run_planes, params, state, x0)
    delta = w_framed - w_planes
    smp = npkt * 48 * b
    return {
        "bit_depth": bit_depth,
        "wall_deframe_chain": w_framed,
        "wall_chain_alone": w_planes,
        "deframe_ms_per_segment": delta * 1e3,
        "deframe_pct_of_chain": 100.0 * delta / w_planes,
        "deframe_ps_per_sample": delta / smp * 1e12,
    }


def bench_sched441(b=B, n_groups=13, platform=None):
    """Full chain at 44.1 kHz with the firmware's true variable-packet
    cadence — nine 44s then a 45, 441 samples per 10 ms
    (current_architecture.md:1092) — compiled in as a periodic schedule
    (thin wrapper over bench.bench_engine)."""
    from dspi_tpu.core.constants import Platform

    platform = platform or Platform.RP2350
    cfg = full_chain_config(platform, sample_rate=44100.0)
    rtf, _ = bench_engine(cfg, b, None, ITERS, UNROLL,
                          schedule=((44,) * 9 + (45,)) * n_groups)
    print(f"44.1k sched full chain ({platform.value}): {rtf:.0f}x",
          flush=True)
    return rtf


def main():
    stages = sys.argv[1:] or ["pdm", "chain", "nopdm", "passthrough", "peq"]
    from dspi_tpu import DeviceConfig, EqBand, FilterType
    from dspi_tpu.core.constants import Platform

    out = {"B": B, "NPKT": NPKT, "UNROLL": UNROLL,
           "backend": jax.default_backend()}

    for s in stages:
        t0 = time.time()
        if s == "pdm":
            rtf, dt = bench_pdm()
            out["pdm_alone"] = {"rtf": rtf, "wall": dt}
        elif s == "pdm_sweep":
            for b in (8192, 16384, 32768, 65536):
                for u in (1, 4, 8):
                    rtf, dt = bench_pdm(b=b, unroll=u)
                    out[f"pdm_B{b}_u{u}"] = {"rtf": rtf, "wall": dt}
                    print(f"pdm B={b} unroll={u}: {rtf:.0f}x", flush=True)
        elif s == "chain":
            cfg = full_chain_config(Platform.RP2350)
            rtf, dt = bench_engine(cfg, B, NPKT, ITERS, UNROLL)
            out["full_chain"] = {"rtf": rtf, "wall": dt}
        elif s == "wire":
            # full chain INCLUDING the device-side wire-word stage
            # (S/PDIF subframe encode for all four pairs) — VERDICT #2's
            # "quoted RTF including wire encode"
            cfg = full_chain_config(Platform.RP2350)
            rtf, dt = bench_engine(cfg, B, NPKT, ITERS, UNROLL, wire=True)
            out["full_chain_wire"] = {"rtf": rtf, "wall": dt}
        elif s == "wire_q28":
            # Q28 wire-included (round-4 VERDICT #8): the integer chain
            # converts to the same s24 words (q28_to_s24) and feeds the
            # same IEC 60958 / I2S encoders as the float path
            cfg = full_chain_config(Platform.RP2040)
            rtf, dt = bench_engine(cfg, B, NPKT, ITERS, UNROLL, wire=True)
            out["full_chain_wire_q28"] = {"rtf": rtf, "wall": dt}
        elif s == "nopdm":
            cfg = full_chain_config(Platform.RP2350)
            rtf, dt = bench_engine(cfg, B, NPKT, ITERS, UNROLL, pdm=False)
            out["chain_no_pdm"] = {"rtf": rtf, "wall": dt}
        elif s == "passthrough":
            c1 = DeviceConfig(platform=Platform.RP2350)
            c1.eq = None
            c1.__post_init__()
            rtf, dt = bench_engine(c1, B, NPKT, ITERS, UNROLL, pdm=False)
            out["passthrough"] = {"rtf": rtf, "wall": dt}
        elif s == "peq":
            c2 = DeviceConfig(platform=Platform.RP2350)
            for ch in (0, 1):
                for b_ in range(10):
                    c2.eq[ch][b_] = EqBand(FilterType.PEAKING,
                                           100.0 * (b_ + 1), 1.5, 2.0)
            rtf, dt = bench_engine(c2, B, NPKT, ITERS, UNROLL, pdm=False)
            out["peq10"] = {"rtf": rtf, "wall": dt}
        elif s == "full96":
            cfg = full_chain_config(Platform.RP2350, sample_rate=96000.0)
            rtf, dt = bench_engine(cfg, B, NPKT, ITERS, UNROLL)
            out["full_96k"] = {"rtf": rtf, "wall": dt}
        elif s == "q28":
            cfg = full_chain_config(Platform.RP2040)
            rtf, dt = bench_engine(cfg, B, NPKT, ITERS, UNROLL)
            out["full_chain_q28"] = {"rtf": rtf, "wall": dt}
        elif s == "grouped":
            rtf, dt = bench_grouped()
            out["grouped_k8"] = {"rtf": rtf, "wall": dt}
            print(f"grouped 8x{B // 8}: {rtf:.0f}x", flush=True)
        elif s == "hetero":
            rtf, dt, waste = bench_hetero()
            out["hetero_k8_scattered"] = {"rtf": rtf, "wall": dt,
                                          "padding_waste": waste}
            print(f"hetero 8 cfgs across {B}: {rtf:.0f}x "
                  f"(padding {100 * waste:.1f}%)", flush=True)
        elif s == "grouped_q28":
            rtf, dt = bench_grouped(platform=Platform.RP2040)
            out["grouped_k8_q28"] = {"rtf": rtf, "wall": dt}
            print(f"grouped q28 8x{B // 8}: {rtf:.0f}x", flush=True)
        elif s == "hetero_q28":
            rtf, dt, waste = bench_hetero(platform=Platform.RP2040)
            out["hetero_k8_q28"] = {"rtf": rtf, "wall": dt,
                                    "padding_waste": waste}
            print(f"hetero q28 8 cfgs across {B}: {rtf:.0f}x "
                  f"(padding {100 * waste:.1f}%)", flush=True)
        elif s == "deframe":
            out["deframe_dev_resident"] = bench_deframe(16)
            d = out["deframe_dev_resident"]
            print(f"deframe s16 on-chip: {d['deframe_ms_per_segment']:.2f} "
                  f"ms/segment = {d['deframe_pct_of_chain']:.1f}% of chain",
                  flush=True)
        elif s == "deframe24":
            out["deframe_dev_resident_s24"] = bench_deframe(24)
            d = out["deframe_dev_resident_s24"]
            print(f"deframe s24 on-chip: {d['deframe_ms_per_segment']:.2f} "
                  f"ms/segment = {d['deframe_pct_of_chain']:.1f}% of chain",
                  flush=True)
        elif s == "sched441":
            out["full_44k1_sched"] = {"rtf": bench_sched441()}
        elif s == "sched441_q28":
            out["full_44k1_sched_q28"] = {
                "rtf": bench_sched441(platform=Platform.RP2040)}
        else:
            print(f"unknown stage {s}", file=sys.stderr)
            continue
        print(f"[{s}] done in {time.time()-t0:.0f}s", flush=True)

    print(json.dumps(out, indent=2))

    if os.environ.get("DSPI_BENCH_COMMIT"):
        # merge this run's entries into the committed machine-readable
        # record (BENCH_DETAILS.json) so every README number is traceable
        # to a committed JSON entry (round-3 VERDICT #6).  Atomic +
        # corrupt-file-aborting (bench.merge_bench_details).
        from bench import merge_bench_details

        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_DETAILS.json")
        entries = {k: v for k, v in out.items()
                   if k not in ("B", "NPKT", "UNROLL", "backend")}
        merge_bench_details(path, entries)
        print(f"merged {len(entries)} entries into {path}", flush=True)


if __name__ == "__main__":
    main()
