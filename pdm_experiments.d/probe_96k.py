#!/usr/bin/env python
"""96 kHz headroom probe (round-2 VERDICT #6): is the 96k full chain
sample-rate-normalized at the 48k chain's samples/sec envelope, and does
any block-size / segment-depth choice buy more?
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/dspi_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, "/root/repo")

from bench import bench_engine, full_chain_config  # noqa: E402
from dspi_tpu.core.constants import Platform       # noqa: E402

B = int(os.environ.get("DSPI_BENCH_STREAMS", 16384))
ITERS = 4
UNROLL = 48

cfg = full_chain_config(Platform.RP2350, sample_rate=96000.0)

for name, block, npkt in [
    ("block96  npkt64 ", 96, 64),
    ("block48  npkt128", 48, 128),
    ("block192 npkt32 ", 192, 32),
    ("block96  npkt128", 96, 128),
]:
    try:
        rtf, wall = bench_engine(cfg, B, npkt, ITERS, UNROLL, block=block)
    except Exception as e:                  # HBM OOM at the big segment
        print(f"{name}: failed ({str(e).splitlines()[0][:90]})", flush=True)
        continue
    sps = rtf * 96000.0 / 1e6
    print(f"{name}: {rtf:8.0f}x RT  ({sps:.0f} M samples/s)", flush=True)

cfg48 = full_chain_config(Platform.RP2350, sample_rate=48000.0)
rtf, _ = bench_engine(cfg48, B, 64, ITERS, UNROLL)
print(f"48k reference    : {rtf:8.0f}x RT  "
      f"({rtf * 48000.0 / 1e6:.0f} M samples/s)", flush=True)
