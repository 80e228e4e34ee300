#!/usr/bin/env python
"""Does the uniform 48 kHz chain want a smaller LTI re-block too?

The 44.1 kHz fix (round 4, _lti_block) showed blocked-apply MACs per
sample scale with the block size T.  The uniform chain runs its LTI
passes at the packet size (48) because _sched_layout only re-blocks
non-uniform schedules; this probe forces uniform re-blocking at
candidate T and benches the headline config.  The leveller staircase
keeps its 48-sample packet geometry either way (env_packet_ends uses
the non-lti layout).
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "")

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/dspi_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, "/root/repo")

from bench import bench_engine, full_chain_config   # noqa: E402
from dspi_tpu.chain import mxu                      # noqa: E402
from dspi_tpu.core.constants import Platform        # noqa: E402

B = int(os.environ.get("DSPI_BENCH_STREAMS", 16384))
NPKT = int(os.environ.get("DSPI_BENCH_PACKETS", 128))
ITERS = 4
UNROLL = 48

orig = mxu._sched_layout
cfg = full_chain_config(Platform.RP2350)

for T in (None, 32, 64, 96):     # divisors of 128*48 = 6144
    if T is None:
        mxu._sched_layout = orig
        tag = "48 (current)"
    else:
        def patched(static, Npkt, lti=False, _T=T):
            lay = orig(static, Npkt, lti=lti)
            if not lti or not lay.uniform:
                return lay
            ttot = int(lay.sched.sum())
            if ttot % _T:
                return lay
            sched = np.full(ttot // _T, _T, np.int64)
            from dspi_tpu.chain.pipeline import _pattern_len, _ramp_indices
            starts = np.concatenate([[0], np.cumsum(sched)[:-1]])
            pad_idx = np.minimum(
                starts[:, None] + np.arange(_T)[None, :], ttot - 1)
            pad_mask = np.ones((len(sched), _T), bool)
            tt, kk = _ramp_indices(sched)
            return mxu._Layout(sched, _T, True, pad_idx, pad_mask, tt, kk,
                               _pattern_len(sched))
        mxu._sched_layout = patched
        tag = str(T)
    rtf, _ = bench_engine(cfg, B, NPKT, ITERS, UNROLL)
    print(f"  lti T={tag}: {rtf:7.0f}x RT", flush=True)
mxu._sched_layout = orig
