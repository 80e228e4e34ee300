#!/usr/bin/env python
"""Device-time profile of the 44.1 kHz cadence chain vs uniform45:
where do the +25 ms/segment go?  (RESULTS_r04.md decomposition)

Captures a jax.profiler trace of each chain and prints the top device
ops by self time, grouped by source line.
"""
import glob
import gzip
import os
import sys
from collections import defaultdict

os.environ.setdefault("JAX_PLATFORMS", "")

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/dspi_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp                                       # noqa: E402
from jax import lax                                           # noqa: E402

from bench import bench_engine, full_chain_config             # noqa: E402
from dspi_tpu.core.constants import Platform                  # noqa: E402

B = 8192
UNROLL = 48
CAD = ((44,) * 9 + (45,)) * 13
UNI45 = (45,) * 128


def run_once(sched, pdm, trace_dir):
    import functools

    from dspi_tpu.chain import Engine
    from dspi_tpu.chain.pipeline import _process_float

    cfg = full_chain_config(Platform.RP2350, sample_rate=44100.0)
    eng = Engine(cfg, n_streams=B, emit="reduced", pdm=pdm,
                 unroll=UNROLL, pdm_fade=False, schedule=sched)
    rng = np.random.default_rng(7)
    n_samples = sum(sched)
    x = jax.device_put(rng.integers(
        -16000, 16000, size=(2, n_samples, B)).astype(np.int32))
    pm = jnp.ones((len(sched),), jnp.float32)
    raw = functools.partial(_process_float, eng.static)

    @jax.jit
    def run(params, state, x):
        def body(i, carry):
            st, acc = carry
            st, out = raw(params, st, x ^ i, pm)
            return st, acc + sum(jnp.sum(v).astype(jnp.float32)
                                 for v in jax.tree.leaves(out))
        _, acc = lax.fori_loop(0, 8, body, (state, jnp.float32(0)))
        return acc

    params = jax.device_put(jax.tree.map(
        lambda v: None if v is None else v, eng.params))
    state = jax.device_put(jax.tree.map(
        lambda v: None if v is None else v, eng.state))
    float(np.asarray(run(params, state, x)))       # compile + warm
    with jax.profiler.trace(trace_dir):
        float(np.asarray(run(params, state, x)))


def top_ops(trace_dir, n=25):
    """Parse the xplane proto for TPU op self-times."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    xspaces = glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.xplane.pb"))
    assert xspaces, f"no xplane under {trace_dir}"
    data, _ = rtd.xspace_to_tool_data(xspaces, "framework_op_stats", {})
    import csv
    import io
    if isinstance(data, bytes):
        data = data.decode()
    rows = list(csv.DictReader(io.StringIO(data)))
    return rows


def main():
    which = sys.argv[1:] or ["cad", "uni"]
    for name, sched in [("cad", CAD), ("uni", UNI45)]:
        if name not in which:
            continue
        d = f"/tmp/prof_{name}"
        os.system(f"rm -rf {d}")
        run_once(sched, True, d)
        print(f"== {name}: top device ops ==", flush=True)
        try:
            rows = top_ops(d)
        except Exception as e:
            print("  (framework_op_stats failed: %s)" % e, flush=True)
            continue
        for r in rows[:22]:
            print("  ", {k: r[k] for k in list(r)[:8]}, flush=True)


if __name__ == "__main__":
    main()
