"""Grouped heterogeneous serving: K configs x G streams as one program.

The firmware serves exactly one configuration; batched serving wants many.
Two lowerings exist, selected by ``layout``:

  * ``"flat"`` (default for non-MXU statics): the K groups flatten into
    one K*G-wide lane axis — coefficients become per-lane [B] vectors
    (``build_params_multi``) and the HOMOGENEOUS pipeline processes all
    lanes in one call.  No vmapped group axis exists at all, so none of
    its overheads do either: round-4's grouped Q28 ran 9,552x against
    homogeneous 11,402x, and the round-5 ablation (probe_group_tax)
    measured the flat lowering at 10,215x with the identical kernel —
    the "vmapped-group tax" was the K-axis itself (leading-axis
    broadcasts and un-fused elementwise stages), not the lane math.
  * ``"vmap"`` (default for MXU statics): params and state get a leading
    group axis and the segment processor is ``jax.vmap``-ed over it, so
    the block-state-space matmuls (chain/mxu.py) batch across groups —
    per-lane float coefficients would force the scan path, much slower
    than a vmapped MXU program.

``layout="auto"`` also keeps vmap for two flat-hostile corners: per-lane
DELAYS (a delay that differs across configs turns the delay ring into a
[D+T, B] gather per output — measured 27x whole-chain), and
wire+reduced emit (``wire_sum`` folds over all lanes, so per-group folds
need the group axis).

All configs must share static structure (band kinds, enables, dynamics
toggles — everything ``build_static`` compiles in); coefficient-level
differences (frequencies, gains, volumes, delays, routing weights) are
free.  Mirrors how a fleet would shard customers over one compiled
program.
"""

from __future__ import annotations

import functools

import numpy as np

from ..core import constants as C
from ..params.design import derive
from .pack import (build_params, build_params_multi, build_static,
                   init_state)


def _stack_trees(trees):
    import jax

    def stack(*vs):
        if vs[0] is None:
            return None
        return np.stack([np.asarray(v) for v in vs])

    return jax.tree.map(stack, *trees, is_leaf=lambda v: v is None)


class GroupedEngine:
    """K device configs, one vmapped pipeline, K x streams_per_group streams.

    >>> eng = GroupedEngine([cfg_a, cfg_b], streams_per_group=4096)
    >>> out = eng.process(x)   # x: int32 [K, n_packets, 2, block, G]
    """

    def __init__(self, cfgs, streams_per_group: int, block_size: int = 48,
                 bit_depth: int = 16, emit: str = "full", pdm: bool = True,
                 unroll: int = 8, pdm_fade: bool = True,
                 pdm_seed=C.PDM_RNG_SEED, schedule=None, mxu="auto",
                 wire: bool = False, layout: str = "auto"):
        import jax

        from .pipeline import _process_float, _process_q28

        if mxu == "auto":
            mxu = jax.default_backend() == "tpu"
        self.cfgs = list(cfgs)
        self.n_groups = len(self.cfgs)
        self.streams_per_group = streams_per_group
        self.deriveds = [derive(c) for c in self.cfgs]
        statics = [build_static(d, block_size=block_size,
                                bit_depth=bit_depth, emit=emit, pdm=pdm,
                                unroll=unroll, schedule=schedule, mxu=mxu,
                                wire=wire)
                   for d in self.deriveds]
        if any(s != statics[0] for s in statics):
            raise ValueError(
                "grouped configs must share static structure (band kinds, "
                "enables, dynamics toggles); use one Engine per structure "
                "or build_params_multi for per-stream coefficients")
        self.static = statics[0]
        if layout == "auto":
            layout = "vmap" if self.static.mxu else "flat"
            if layout == "flat" and self.static.wire and emit == "reduced":
                layout = "vmap"       # wire_sum folds need the group axis
            if layout == "flat":
                # uniformity probe (1 lane per config, cheap): a delay
                # that differs across configs would turn the delay ring
                # into a [D+T, B] per-output gather — measured 27x
                # whole-chain (probe_group_tax) — so per-lane delays
                # keep the vmapped lowering
                probe = build_params_multi(
                    self.deriveds, self.static, np.arange(self.n_groups))
                if getattr(probe.delay_samples, "ndim", 0) > 1:
                    layout = "vmap"
        self.layout = layout
        K, G = self.n_groups, streams_per_group
        if layout == "flat":
            # one K*G lane axis; per-lane coefficients, homogeneous chain.
            # device-resident like the vmap path (tunnel re-upload costs)
            ids = np.repeat(np.arange(K), G)
            self.params = jax.device_put(
                build_params_multi(self.deriveds, self.static, ids))
            # uniform per-stream fills, so init_state(K*G) is leaf-for-leaf
            # the lane-axis concatenation of K per-group init_state(G)s
            self.state = jax.device_put(
                init_state(self.static, K * G, pdm_seed=pdm_seed,
                           pdm_fade=pdm_fade))
            raw = functools.partial(
                _process_float if self.static.is_float else _process_q28,
                self.static)
            # the engine's native segment processor: x [..., K*G] flat
            # (group lane-blocks contiguous), outputs flat — zero-copy for
            # callers that hold flat buffers (HeteroServer, benches)
            self._flat_raw = raw
            jnp = jax.numpy

            def vraw(params, state, x, pm):
                """Grouped-contract adapter: x [K, ..., G] in, leading-K
                outputs — one input transpose + tiny output reshapes."""
                xf = jnp.moveaxis(x, 0, -2)
                xf = xf.reshape(xf.shape[:-2] + (K * G,))
                state, out = raw(params, state, xf, pm)

                def togrp(v):
                    v = v.reshape(v.shape[:-1] + (K, G))
                    return jnp.moveaxis(v, -2, 0)

                return state, {k: togrp(v) for k, v in out.items()}

            self._vraw = vraw
        else:
            self._flat_raw = None
            # device-resident: steady-state process() calls must not
            # re-upload the stacked tree every segment
            self.params = jax.device_put(_stack_trees(
                [build_params(d, self.static) for d in self.deriveds]))
            # state is device-resident too: it is far larger than the
            # params (delay/lookahead rings and PDM state for every
            # stream), and a host-side copy would be re-uploaded on every
            # process() call — measured 5x wall on a tunneled v5e at
            # 8x2048 streams
            self.state = jax.device_put(_stack_trees(
                [init_state(self.static, streams_per_group,
                            pdm_seed=pdm_seed, pdm_fade=pdm_fade)
                 for _ in range(self.n_groups)]))
            raw = functools.partial(
                _process_float if self.static.is_float else _process_q28,
                self.static)
            # _vraw is exposed (pre-jit) so benchmarks can chain segments
            # on-device inside one outer jit (bench.py methodology)
            self._vraw = jax.vmap(raw, in_axes=(0, 0, 0, None))
        self._fn = jax.jit(self._vraw, donate_argnums=(1,))
        self._jnp = jax.numpy

    def update_group(self, k: int, cfg) -> None:
        """Swap group ``k``'s coefficients (no recompile; the new config
        must keep the shared static structure)."""
        import jax

        d = derive(cfg)
        s = build_static(d, block_size=self.static.block_size,
                         bit_depth=self.static.bit_depth,
                         emit=self.static.emit, pdm=self.static.pdm_on,
                         unroll=self.static.unroll,
                         schedule=self.static.schedule, mxu=self.static.mxu,
                         wire=bool(self.static.wire))
        if s != self.static:
            raise ValueError("new config changes the static structure")
        if self.layout == "flat":
            self.cfgs[k] = cfg
            self.deriveds[k] = d
            # rebuild the per-lane tree: leaves that stay config-uniform
            # keep their collapsed homogeneous shape (a leaf going
            # uniform<->per-lane retraces the jit once, which is the
            # correct price — e.g. the first delay divergence pays the
            # per-lane gather path knowingly)
            ids = np.repeat(np.arange(self.n_groups), self.streams_per_group)
            self.params = jax.device_put(
                build_params_multi(self.deriveds, self.static, ids))
            return
        new = build_params(d, self.static)

        def put(stacked, leaf):
            if stacked is None:
                return None
            arr = np.asarray(stacked).copy()
            arr[k] = np.asarray(leaf)
            return arr

        self.params = jax.device_put(
            jax.tree.map(put, self.params, new, is_leaf=lambda v: v is None))
        self.cfgs[k] = cfg
        self.deriveds[k] = d

    def process(self, x, preset_mute=None):
        """x: int32 [K, n_packets, 2, block, G] (scheduled chains:
        [K, 2, sum(schedule), G]) -> output dict with a leading group
        axis on every entry."""
        if preset_mute is None:
            npkt = (len(self.static.schedule) if self.static.schedule
                    else x.shape[1])
            preset_mute = self._jnp.ones((npkt,), self._jnp.float32)
        self.state, out = self._fn(self.params, self.state, x, preset_mute)
        return out

    @property
    def segment_fn(self):
        """Pre-jit segment processor — same contract as
        ``Engine.segment_fn`` with x carrying the leading group axis
        (both layouts; the flat layout adapts at one input transpose)."""
        return self._vraw

    @property
    def flat_segment_fn(self):
        """Pre-jit FLAT segment processor (layout='flat' only):
        x [..., K*G] with group lane-blocks contiguous, flat outputs —
        the engine's native layout, zero group transposes."""
        if self._flat_raw is None:
            raise ValueError(
                "flat_segment_fn requires layout='flat' (this engine "
                f"lowered as {self.layout!r})")
        return self._flat_raw


class HeteroServer:
    """Arbitrary per-stream heterogeneous serving at grouped-engine speed.

    The realistic serving shape is "K distinct configs scattered across B
    streams in arbitrary order".  Round 1 served that through
    ``build_params_multi``'s per-stream scan path (~10x slower than the
    MXU path: per-stream coefficient axes block the block-matrix
    lowering).  This dispatcher instead *buckets* the streams: a stable
    permutation gathers each config's streams into its own contiguous
    group, the GroupedEngine processes the groups (flat per-lane layout
    for non-MXU statics — the bucket permutation already produces it —
    or the vmapped MXU-capable layout for float block-matrix chains),
    and the inverse permutation scatters the outputs back to the caller's
    stream order.  Both permutations are single device gathers per
    segment, fused into the same jit as the pipeline.

    Because a stream's config assignment is fixed at build time, the
    per-stream STATE lives permanently in grouped layout — only inputs
    and outputs permute.  Unequal bucket sizes are padded to the largest
    (padding slots recompute some stream; their outputs are dropped by
    the inverse permutation).

    ``update_group(k, cfg)`` swaps one config's coefficients live;
    re-assigning streams to different configs is a rebuild (the firmware
    analog: re-flashing a different preset set).
    """

    def __init__(self, cfgs, stream_config_ids, lane_multiple: int = 1,
                 **kw):
        """``lane_multiple``: force the bucket width to a multiple of
        this (on top of the 128-lane vreg alignment below) — pass the
        mesh device count when the fleet shards over a mesh, since each
        bucket's lane axis splits across chips."""
        import jax
        import jax.numpy as jnp

        ids = np.asarray(stream_config_ids, np.int64)
        K = len(cfgs)
        if ids.min() < 0 or ids.max() >= K:
            raise ValueError("stream_config_ids out of range")
        self.n_streams = len(ids)
        counts = np.bincount(ids, minlength=K)
        G = int(counts.max())
        # Lane-align the bucket width: a G that is not a multiple of the
        # 128-lane vreg width drags a misaligned minor dimension through
        # EVERY lane-axis op of the vmapped chain — measured 28% of the
        # full Q28 chain's wall at G=1085 vs 1152 on v5e (round-4 probe
        # `probe_hetero_q28.py ablate/align`: grouped 9545x, hetero even
        # 8840x, hetero G=1085 6171x, hetero G=1152 7921x), far more than
        # the 6% extra padded lanes cost.  Padded slots recompute some
        # real stream and are dropped by the inverse permutation exactly
        # like ordinary bucket padding.  G <= 128 occupies a single
        # (partial) vreg row — no cross-row misalignment to fix — and
        # alignment only pays while the extra padded lanes cost less
        # than the ~28% misalignment penalty they remove (G=134 -> 256
        # would nearly double the work), so both keep the exact width.
        if G > 128:
            g_aligned = -(-G // 128) * 128
            if g_aligned <= G * 1.25:
                G = g_aligned
        if lane_multiple > 1:
            G = -(-G // lane_multiple) * lane_multiple
        perm = np.zeros((K, G), np.int64)
        valid = np.zeros((K, G), bool)
        for k in range(K):
            idx = np.where(ids == k)[0]
            perm[k, :len(idx)] = idx
            perm[k, len(idx):] = idx[0] if len(idx) else 0
            valid[k, :len(idx)] = True
        inv = np.zeros(self.n_streams, np.int64)
        flat, vmask = perm.reshape(-1), valid.reshape(-1)
        inv[flat[vmask]] = np.where(vmask)[0]
        self._perm = jnp.asarray(perm.reshape(-1))
        self._inv = jnp.asarray(inv)
        self.grouped = GroupedEngine(cfgs, streams_per_group=G, **kw)
        self.padding_waste = float(K * G) / max(self.n_streams, 1) - 1.0

        import functools

        from .pipeline import _process_float, _process_q28

        Kp, Gp = K, G
        if self.grouped.layout == "flat":
            # flat engine: the bucket permutation ALREADY produces the
            # flat [K*G] lane layout (group blocks contiguous), so the
            # hetero data path is two gathers around the homogeneous
            # chain — no group transpose/reshape at all
            flat_raw = self.grouped._flat_raw

            def run(params, state, x, pm, perm, inv):
                xg = jnp.take(x, perm, axis=-1)          # [..., K*G]
                state, out = flat_raw(params, state, xg, pm)
                return state, {k2: jnp.take(v, inv, axis=-1)
                               for k2, v in out.items()}
        else:
            raw = functools.partial(
                _process_float if self.grouped.static.is_float
                else _process_q28, self.grouped.static)
            vmapped = jax.vmap(raw, in_axes=(0, 0, 0, None))

            def run(params, state, x, pm, perm, inv):
                xg = jnp.take(x, perm, axis=-1)
                xg = jnp.moveaxis(
                    xg.reshape(x.shape[:-1] + (Kp, Gp)), -2, 0)
                state, out = vmapped(params, state, xg, pm)

                def unperm(v):
                    v = jnp.moveaxis(v, 0, -2)           # [..., K, G]
                    v = v.reshape(v.shape[:-2] + (Kp * Gp,))
                    return jnp.take(v, inv, axis=-1)

                return state, {k2: unperm(v) for k2, v in out.items()}

        self._raw = run                # pre-jit, for chained benchmarks
        self._fn = jax.jit(run, donate_argnums=(1,))
        self._jnp = jnp

    @property
    def static(self):
        return self.grouped.static

    # params/state live on the wrapped GroupedEngine; proxied so runners
    # (ChainedRunner) drive a HeteroServer exactly like an Engine.
    @property
    def params(self):
        return self.grouped.params

    @params.setter
    def params(self, v):
        self.grouped.params = v

    @property
    def state(self):
        return self.grouped.state

    @state.setter
    def state(self, v):
        self.grouped.state = v

    @property
    def segment_fn(self):
        """Pre-jit segment processor with the caller-order permutation
        baked in — x/outputs in the CALLER's stream order, state grouped."""
        raw, perm, inv = self._raw, self._perm, self._inv

        def fn(params, state, x, pm):
            return raw(params, state, x, pm, perm, inv)

        return fn

    def update_group(self, k: int, cfg) -> None:
        self.grouped.update_group(k, cfg)

    def process(self, x, preset_mute=None):
        """x: int32 [n_packets, 2, block, B] in the CALLER's stream order
        -> output dict, trailing axes back in the caller's order."""
        if preset_mute is None:
            npkt = (len(self.static.schedule) if self.static.schedule
                    else x.shape[0])
            preset_mute = self._jnp.ones((npkt,), self._jnp.float32)
        self.grouped.state, out = self._fn(
            self.grouped.params, self.grouped.state, x, preset_mute,
            self._perm, self._inv)
        return out
