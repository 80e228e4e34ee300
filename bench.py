#!/usr/bin/env python
"""Benchmark: aggregate real-time factor of the full DSPi chain on one chip.

Headline metric (BASELINE.md): audio-seconds processed per wall second per
chip for the full 11-channel chain at 48 kHz — 10-band PEQ on all channels,
ISO 226 loudness, volume leveller (10 ms lookahead), BS2B crossfeed, 2x9
matrix, per-output EQ + gains + time-alignment delays, s24 conversion, and
the 256x-oversampled delta-sigma PDM sub.  The reference firmware runs this
at RTF 1.0 by construction; the target is >= 10,000x on one TPU v5e chip.

Prints ONE JSON line.  Extra per-config results land in BENCH_DETAILS.json
when DSPI_BENCH_FULL=1.

Env knobs: DSPI_BENCH_STREAMS (default 16384), DSPI_BENCH_PACKETS (128),
DSPI_BENCH_ITERS (8), DSPI_BENCH_UNROLL (48), DSPI_BENCH_PLATFORM (rp2350).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def full_chain_config(platform, sample_rate=48000.0, pdm=True):
    """All 11 channels live: the baseline's headline configuration."""
    from dspi_tpu import DeviceConfig, EqBand, FilterType
    from dspi_tpu.params.types import Crosspoint

    cfg = DeviceConfig(platform=platform, sample_rate=sample_rate)
    nout = cfg.num_outputs
    cfg.preamp_db = [1.0, 1.0]
    cfg.master_volume_db = -10.0
    cfg.host_volume_index = 57

    # 10 active bands on every channel, mixed types/regions
    types = [FilterType.HIGHPASS, FilterType.PEAKING, FilterType.PEAKING,
             FilterType.LOWSHELF, FilterType.PEAKING, FilterType.PEAKING,
             FilterType.PEAKING, FilterType.HIGHSHELF, FilterType.PEAKING,
             FilterType.PEAKING]
    freqs = [35, 80, 200, 350, 900, 2200, 4500, 8000, 11000, 15000]
    for ch in range(cfg.num_channels):
        for b in range(10):
            gain = 1.5 if (ch + b) % 2 else -2.0
            cfg.eq[ch][b] = EqBand(types[b], float(freqs[b]), 1.1, gain)

    for o in range(nout):
        cfg.outputs[o].enabled = True
        cfg.outputs[o].gain_db = -1.0
        cfg.outputs[o].delay_ms = 0.5 * o
        left = o % 2 == 0
        cfg.crosspoints[0][o] = Crosspoint(True, False, 0.0 if left else -6.0)
        cfg.crosspoints[1][o] = Crosspoint(True, o == 3, -6.0 if left else 0.0)
    if not pdm:
        cfg.outputs[nout - 1].enabled = False
    cfg.sync_delays()

    cfg.loudness.enabled = True
    cfg.crossfeed.enabled = True
    cfg.leveller.enabled = True
    cfg.leveller.lookahead = True
    return cfg


def bench_engine(cfg, n_streams, n_packets, iters, unroll, pdm=True,
                 block=None, depth=None, schedule=None, wire=False):
    """Chained-throughput measurement.

    Honesty rules (tunneled backends lie in two ways):
      * never trust bare block_until_ready — execution is forced by
        READING a device-computed scalar VALUE that depends on every
        segment's outputs (a fabricated ack cannot produce the value);
      * the tunnel costs ~27 ms PER device->host readback and readbacks
        serialize on the host, so any per-call wall sits on that floor no
        matter how deep the dispatch pipeline is.  Serving-irrelevant
        (real serving chains segments on device); so ``depth`` segments
        run chained inside ONE jit — state threads through, each
        segment's reduced outputs accumulate into one scalar — and a
        single readback forces all of them.  RTF = depth*audio_sec/wall.
      * each chained segment processes a DIFFERENT input (the buffer
        XORed with the iteration index): with identical inputs XLA's
        while-loop invariant code motion could hoist every input-only
        computation (unpack, the MXU x-response matmuls) out of the loop
        and count it once instead of ``depth`` times — serving always
        sees fresh data, so that hoist would be a lie.  The variation is
        an elementwise XOR (fuses into the unpack read) rather than a
        packet rotation: jnp.roll cost a measured 5.7 ms/segment device
        copy (7% of wall) that real serving — which receives fresh
        buffers by host DMA, not device compute — never pays.
    """
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    from dspi_tpu.chain import Engine
    from dspi_tpu.chain.pipeline import _process_float, _process_q28

    depth = depth or int(os.environ.get("DSPI_BENCH_DEPTH", 8))
    block = block or (96 if cfg.sample_rate == 96000 else 48)
    eng = Engine(cfg, n_streams=n_streams, block_size=block, emit="reduced",
                 pdm=pdm, unroll=unroll, pdm_fade=False, schedule=schedule,
                 wire=wire)
    rng = np.random.default_rng(7)
    if schedule:
        n_packets = len(schedule)
        n_samples = sum(schedule)
        x = rng.integers(-16000, 16000,
                         size=(2, n_samples, n_streams)).astype(np.int32)
        roll_axis = 1
    else:
        n_samples = n_packets * block
        x = rng.integers(
            -16000, 16000,
            size=(n_packets, 2, block, n_streams)).astype(np.int32)
        roll_axis = 0
    x = jax.device_put(x)
    del roll_axis
    pm = jnp.ones((n_packets,), jnp.float32)
    raw = functools.partial(
        _process_float if eng.static.is_float else _process_q28, eng.static)

    @jax.jit
    def run(params, state, x):
        def body(i, carry):
            st, acc = carry
            st, out = raw(params, st, x ^ i, pm)
            return st, acc + sum(jnp.sum(leaf).astype(jnp.float32)
                                 for leaf in jax.tree.leaves(out))
        _, acc = lax.fori_loop(0, depth, body, (state, jnp.float32(0)))
        return acc

    dev_params = jax.tree.map(
        lambda v: None if v is None else jax.device_put(v), eng.params)
    dev_state = jax.tree.map(
        lambda v: None if v is None else jax.device_put(v), eng.state)

    def chained():
        return float(np.asarray(run(dev_params, dev_state, x)))

    v = chained()                          # compile + warm
    assert v == v                          # NaN gate
    audio_sec = n_streams * n_samples / cfg.sample_rate
    best = float("inf")
    for _ in range(max(iters, 2)):
        t0 = time.perf_counter()
        assert chained() == v
        best = min(best, (time.perf_counter() - t0) / depth)

    # single-segment latency, fully synchronous (secondary metric; includes
    # one ~27 ms tunnel readback)
    reduce_out = jax.jit(lambda out: sum(
        jnp.sum(leaf).astype(jnp.float32) for leaf in jax.tree.leaves(out)))
    float(np.asarray(reduce_out(eng.process(x))))     # compile + warm
    t0 = time.perf_counter()
    float(np.asarray(reduce_out(eng.process(x))))
    latency = time.perf_counter() - t0

    return audio_sec / best, latency


def main():
    os.environ.setdefault("JAX_PLATFORMS", "")
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/dspi_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from dspi_tpu.core.constants import Platform

    platform = {"rp2350": Platform.RP2350, "rp2040": Platform.RP2040}[
        os.environ.get("DSPI_BENCH_PLATFORM", "rp2350")]
    B = int(os.environ.get("DSPI_BENCH_STREAMS", 16384))
    NPKT = int(os.environ.get("DSPI_BENCH_PACKETS", 128))
    ITERS = int(os.environ.get("DSPI_BENCH_ITERS", 8))
    UNROLL = int(os.environ.get("DSPI_BENCH_UNROLL", 48))

    cfg = full_chain_config(platform)
    rtf, dt = bench_engine(cfg, B, NPKT, ITERS, UNROLL)

    details = {"full_chain_48k": {
        "rtf": rtf, "streams": B, "packets": NPKT, "seg_wall_s": dt,
        "platform": platform.value}}

    if os.environ.get("DSPI_BENCH_FULL"):
        # BASELINE.json config sweep
        from dspi_tpu import DeviceConfig

        c1 = DeviceConfig(platform=platform)          # passthrough + defaults
        c1.eq = None; c1.__post_init__()
        rtf1, _ = bench_engine(c1, B, NPKT, ITERS, UNROLL, pdm=False)
        details["cfg1_passthrough"] = {"rtf": rtf1}

        c2 = DeviceConfig(platform=platform)
        from dspi_tpu import EqBand, FilterType
        for ch in (0, 1):
            for b in range(10):
                c2.eq[ch][b] = EqBand(FilterType.PEAKING, 100.0 * (b + 1),
                                      1.5, 2.0)
        rtf2, _ = bench_engine(c2, B, NPKT, ITERS, UNROLL, pdm=False)
        details["cfg2_peq10"] = {
            "rtf": rtf2,
            "peq_bands_per_sec": rtf2 * 2 * 10 * 48000}

        # block=96 doubles the segment length; halve the packet count to
        # keep the on-chip footprint equal to the 48 kHz configs
        c5 = full_chain_config(platform, sample_rate=96000.0)
        rtf5, _ = bench_engine(c5, B, max(NPKT // 2, 1), ITERS, UNROLL)
        details["cfg5_full_96k"] = {"rtf": rtf5}

        cq = full_chain_config(Platform.RP2040)
        rtfq, _ = bench_engine(cq, B, NPKT, ITERS, UNROLL)
        details["full_chain_48k_q28"] = {"rtf": rtfq}

        # merge (never clobber): BENCH_DETAILS.json is the committed
        # superset of published numbers; bench_stages.py contributes the
        # per-stage entries under DSPI_BENCH_COMMIT=1
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_DETAILS.json")
        merge_bench_details(path, details)

    print(json.dumps({
        "metric": "full 11-channel chain RTF @48kHz (audio-sec/sec/chip)",
        "value": round(rtf, 1),
        "unit": "x realtime",
        "vs_baseline": round(rtf, 1),       # reference firmware RTF == 1.0
    }))


def merge_bench_details(path: str, entries: dict) -> None:
    """Merge entries into the committed record ATOMICALLY.

    A corrupt existing file aborts instead of silently resetting the
    record (a truncated file from a killed run must be restored from
    git, not papered over); the write goes through a temp file +
    os.replace so a killed run can never leave a half-written file."""
    try:
        with open(path) as f:
            merged = json.load(f)
    except FileNotFoundError:
        merged = {}
    except ValueError as e:
        raise RuntimeError(
            f"{path} exists but is not valid JSON ({e}); restore it "
            "(git checkout) before merging new benchmark entries") from e
    merged.update(entries)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(merged, f, indent=2)
    os.replace(tmp, path)


if __name__ == "__main__":
    main()
