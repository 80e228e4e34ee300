#!/usr/bin/env python
"""Where does the 44.1 kHz float scheduled chain lose vs uniform 48 kHz?

Decomposition probe: the same full chain benched under schedules that
isolate (a) the PDM kernel at odd segment lengths, (b) the period-10
pattern choreography, (c) small-packet (44/45 vs 48) matmul efficiency.
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

B = int(os.environ.get("DSPI_BENCH_STREAMS", 8192))
ITERS = 4
UNROLL = 48

CAD = ((44,) * 9 + (45,)) * 13        # the real firmware cadence, p=10
UNI45 = (45,) * 128                   # uniform 45 blocks (pure reshape)
PER2 = (44, 45) * 64                  # period-2 pattern, same sizes

cfg = full_chain_config(Platform.RP2350, sample_rate=44100.0)

for name, sched, pdm in [
    ("cadence  +pdm", CAD, True),
    ("cadence  -pdm", CAD, False),
    ("uniform45+pdm", UNI45, True),
    ("uniform45-pdm", UNI45, False),
    ("period2  +pdm", PER2, True),
    ("period2  -pdm", PER2, False),
]:
    rtf, wall = bench_engine(cfg, B, None, ITERS, UNROLL,
                             schedule=sched, pdm=pdm)
    print(f"{name}: {rtf:8.0f}x  wall {wall*1e3:7.2f} ms", flush=True)
