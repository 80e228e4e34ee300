#!/usr/bin/env python
"""Commit the roofline arithmetic for the headline chain (round-5 #5).

Round 4 claimed "the remaining float headline ceiling is the
bandwidth/op envelope" without numbers.  This probe makes the claim
falsifiable: it compiles the EXACT headline program (bench.py shape —
full 11-channel RP2350 chain, B=16384 streams, 128x48-sample segment,
depth-8 on-device chaining) and reads XLA's own post-fusion cost model
(``compiled.cost_analysis()``: bytes accessed, flops, transcendentals),
then divides by the measured wall to state achieved GB/s and FLOP/s
against the chip's peaks.

Peaks used (TPU v5e / "v5 lite", public spec):
  HBM bandwidth  819 GB/s
  MXU            197 TFLOP/s bf16; fp32 via Precision.HIGHEST runs
                 6 bf16 passes -> ~33 TFLOP/s effective fp32 ceiling

Caveats stated with the numbers:
  * bytes-accessed is XLA's post-fusion operand+output count — VMEM
    reuse inside a fusion is counted once, so it is a good (slightly
    conservative-high) proxy for HBM traffic;
  * the Pallas PDM kernel is a custom call XLA costs as ~0 flops and
    only its operand bytes; its true traffic is tiny (state + one
    [T, B] input + [T*8, B] word output) and is included in the bytes
    via operands, but its 256x/sample integer ALU work is invisible to
    the flop count — quoted flops are therefore the XLA-visible chain
    only.  A -pdm variant isolates that wedge.

Usage: python pdm_experiments.d/probe_roofline.py [B [NPKT [DEPTH]]]
"""

from __future__ import annotations

import functools
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

from bench import full_chain_config                           # noqa: E402
from dspi_tpu.chain import Engine                             # noqa: E402
from dspi_tpu.chain.pipeline import _process_float            # noqa: E402
from dspi_tpu.core.constants import Platform                  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
NPKT = int(sys.argv[2]) if len(sys.argv) > 2 else 128
DEPTH = int(sys.argv[3]) if len(sys.argv) > 3 else 8
UNROLL = 48
RATE = 48000.0

HBM_PEAK_GBS = 819.0          # v5e public spec
MXU_BF16_TFLOPS = 197.0
FP32_PASSES = 6               # Precision.HIGHEST on TPU


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return ca


def build(pdm: bool):
    cfg = full_chain_config(Platform.RP2350, pdm=pdm)
    eng = Engine(cfg, n_streams=B, block_size=48, emit="reduced",
                 pdm=pdm, unroll=UNROLL, pdm_fade=False)
    raw = functools.partial(_process_float, eng.static)
    pm = jnp.ones((NPKT,), jnp.float32)

    def run(params, state, x):
        def body(i, carry):
            st, acc = carry
            st, out = raw(params, st, x ^ i, pm)
            return st, acc + sum(jnp.sum(v).astype(jnp.float32)
                                 for v in jax.tree.leaves(out))
        _, acc = lax.fori_loop(0, DEPTH, body, (state, jnp.float32(0)))
        return acc

    rng = np.random.default_rng(7)
    x = jax.device_put(rng.integers(
        -16000, 16000, size=(NPKT, 2, 48, B)).astype(np.int32))
    params = jax.tree.map(
        lambda v: None if v is None else jax.device_put(v), eng.params)
    state = jax.tree.map(
        lambda v: None if v is None else jax.device_put(v), eng.state)
    compiled = jax.jit(run).lower(params, state, x).compile()
    return compiled, params, state, x


def measure(tag: str, pdm: bool):
    compiled, params, state, x = build(pdm)
    ca = _cost(compiled)
    run = lambda: float(np.asarray(compiled(params, state, x)))  # noqa: E731
    v = run()
    assert v == v, "NaN"
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        assert run() == v
        best = min(best, time.perf_counter() - t0)

    smp = DEPTH * NPKT * 48 * B                    # stream-samples / call
    byt = float(ca.get("bytes accessed", 0.0))
    flops = float(ca.get("flops", 0.0))
    trans = float(ca.get("transcendentals", 0.0))
    gbs = byt / best / 1e9
    tflops = flops / best / 1e12
    rtf = smp / B / RATE * B / best                # audio-sec/s aggregate
    print(f"== {tag} ==")
    print(f"  wall/call       : {best * 1e3:9.2f} ms   "
          f"({rtf:,.0f}x RT aggregate)")
    print(f"  samples/s       : {smp / best / 1e6:9.1f} M stream-samples/s")
    print(f"  bytes accessed  : {byt / 1e9:9.3f} GB/call   "
          f"{byt / smp:7.1f} B/sample")
    print(f"  flops (XLA-vis) : {flops / 1e9:9.2f} Gflop/call   "
          f"{flops / smp:7.1f} flop/sample   trans {trans / smp:.2f}/smp")
    print(f"  achieved BW     : {gbs:9.1f} GB/s  = "
          f"{gbs / HBM_PEAK_GBS * 100:5.1f}% of {HBM_PEAK_GBS:.0f} GB/s HBM")
    print(f"  achieved FLOP/s : {tflops:9.2f} Tflop/s = "
          f"{tflops / (MXU_BF16_TFLOPS / FP32_PASSES) * 100:5.1f}% of "
          f"~{MXU_BF16_TFLOPS / FP32_PASSES:.0f} Tflop/s fp32-HIGHEST MXU "
          f"({tflops / MXU_BF16_TFLOPS * 100:.1f}% of bf16 peak)")
    return dict(tag=tag, wall=best, bytes=byt, flops=flops, smp=smp)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    full = measure("full chain +pdm (headline shape)", pdm=True)
    nop = measure("chain -pdm (XLA-visible only)", pdm=False)
    dw = full["wall"] - nop["wall"]
    print("== roofline verdict ==")
    print(f"  pdm wedge (pallas, flops invisible to XLA): "
          f"{dw * 1e3:.2f} ms/call = {dw / full['wall'] * 100:.1f}% of wall")
    bw_frac = full["bytes"] / full["wall"] / 1e9 / HBM_PEAK_GBS
    print(f"  headline program moves {full['bytes'] / full['smp']:.0f} "
          f"B/sample at {bw_frac * 100:.1f}% of HBM peak")


if __name__ == "__main__":
    main()
