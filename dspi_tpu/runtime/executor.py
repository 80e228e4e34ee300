"""Multi-stream execution: sharding over device meshes and host feed.

The stream axis is embarrassingly parallel (SURVEY.md §2.3): every per-
sample recurrence is independent across streams, so multi-chip scaling is
pure SPMD over a 1-D ``streams`` mesh with zero cross-stream collectives —
the only communication is host feed/drain.  This module provides:

  * ``make_mesh``       — 1-D device mesh over the stream axis
  * ``shard_engine``    — place an Engine's state/params on the mesh so the
                          jitted pipeline partitions across chips
  * ``StreamRunner``    — asynchronous segment pump (double-buffered host
                          feed riding JAX's async dispatch)

The firmware analog of this layer is the core-1 work dispatch + DMA feed
machinery (usb_audio.c:782-871, pdm_generator.c:427-667); on TPU none of
the handshake exists — XLA dataflow replaces SEV/WFE.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), axis_names=("streams",))


def _shard_last(mesh: Mesh):
    """Shard the trailing [B] axis over the mesh; replicate scalars."""

    def spec_for(x):
        x = np.asarray(x) if not hasattr(x, "ndim") else x
        if x.ndim == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + ["streams"])))

    return spec_for


def shard_engine(engine, mesh: Mesh | None = None):
    """Move an engine's state onto a mesh, sharded over streams.

    Parameters stay replicated (they are small and shared); every state
    array whose trailing axis is the stream/lane axis is split on it.
    Because the pipeline has no cross-stream operations XLA partitions it
    with no collectives at all — per-chip programs run independently over
    ICI-less data parallelism.

    Serves ``Engine`` (state leaves end in ``n_streams``) and
    ``GroupedEngine``/``HeteroServer`` (grouped leaves end in
    ``streams_per_group``).  Lane leaves are identified BY FIELD NAME
    (every ChainState field except the scalar ``wire_pos`` is
    lane-trailing), not by shape coincidence — a per-group [K] leaf can
    never shard on the wrong axis even when K happens to equal the lane
    width.  The lane width must be divisible by the mesh size or this
    raises: HeteroServer's automatic 128-lane bucket alignment usually
    provides that, but it skips alignment when padding would exceed 25%
    (e.g. G=134 stays 134) — build the server with
    ``lane_multiple=len(mesh.devices)`` to make it unconditional."""
    if mesh is None:
        mesh = make_mesh()
    grouped = getattr(engine, "grouped", None)          # HeteroServer
    width = getattr(grouped or engine, "streams_per_group",
                    getattr(engine, "n_streams", None))
    if width is not None and width % mesh.size != 0:
        raise ValueError(
            f"lane width {width} is not divisible by the {mesh.size}-chip "
            f"mesh; rebuild with lane_multiple={mesh.size} "
            "(HeteroServer) or pad n_streams to a mesh multiple")
    spec = _shard_last(mesh)
    repl = NamedSharding(mesh, P())
    state = engine.state
    non_lane = {"wire_pos"}

    def place(x, lanes):
        if x is None:
            return None
        return jax.device_put(x, spec(x) if lanes else repl)

    if hasattr(state, "_fields"):                        # ChainState
        engine.state = type(state)(**{
            f: place(getattr(state, f),
                     f not in non_lane
                     and getattr(getattr(state, f), "ndim", 0) >= 1)
            for f in state._fields})
    else:                                                # generic pytree
        engine.state = jax.tree.map(
            lambda x: place(x, getattr(x, "ndim", 0) >= 1
                            and x.shape[-1] == width), state)
    engine.params = jax.tree.map(
        lambda x: jax.device_put(x, repl) if x is not None else None,
        engine.params)
    engine.mesh = mesh
    return engine


def shard_input(x, mesh: Mesh):
    """Place an input batch [n_packets, 2, T, B] sharded over B."""
    return jax.device_put(
        x, NamedSharding(mesh, P(*([None] * (x.ndim - 1) + ["streams"]))))


class RunnerStats:
    """Observable runtime health — the TPU analog of the firmware's buffer
    statistics and starvation counters (config.h:492-519,
    audio_spdif.c:361-379).  Fill level is the in-flight segment depth
    against ``max_inflight``; a *starvation* is a missed feed deadline: the
    host failed to enqueue the next segment within one segment's worth of
    audio time, which on the device would have forced silence-buffer
    substitution on every active output slot."""

    USB_ERROR_KINDS = ("crc", "bitstuff", "rx_overflow", "rx_timeout",
                       "data_seq")

    def __init__(self, n_slots: int = 4, max_inflight: int = 2):
        self.n_slots = n_slots
        self.max_inflight = max_inflight
        self.segments = 0
        self.silence_segments = 0
        self.starvations_total = 0
        self.starvations_slot = [0, 0, 0, 0]
        self.starvations_suppressed = 0
        self.fill_pct = 0
        self.min_fill_pct = 100
        self.max_fill_pct = 0
        # Host data-plane framing errors, shaped like the firmware's PHY
        # counters (usb_device.c:46-52) so GET_USB_ERROR_STATS reads real
        # events: de-framed segments land in data_seq, truncated transfers
        # in rx_timeout, oversize in rx_overflow.
        self.usb_errors = dict.fromkeys(("total",) + self.USB_ERROR_KINDS, 0)

    def record_fill(self, depth: int):
        self.fill_pct = min(100, int(100 * depth / max(self.max_inflight, 1)))
        self.min_fill_pct = min(self.min_fill_pct, self.fill_pct)
        self.max_fill_pct = max(self.max_fill_pct, self.fill_pct)

    def record_starvation(self, suppressed: bool = False):
        """One missed feed deadline starves every active slot at once, so
        each slot's counter AND the global total advance per slot — the
        firmware increments spdif_dma_starvations alongside each
        per-instance counter inside every instance's DMA handler
        (audio_spdif.c:368-372), so its total is likewise the sum over
        instances, n_slots per simultaneous event.

        ``suppressed``: the miss happened during an intentional disruption
        (a preset/flash operation) — the firmware masks the counters for
        that window (audio_spdif.c:375-378 gates on ``preset_loading``,
        set around every flash op: flash_storage.c:348,776,875,
        main.c:456; the gap-detected underruns are gated the same way,
        usb_audio.c:1358).  Suppressed events are still observable in
        ``starvations_suppressed`` (one per event, not per slot) so the
        disruption isn't silently invisible — but GET_STATUS totals
        match firmware behavior."""
        if suppressed:
            self.starvations_suppressed += 1
            return
        for i in range(min(self.n_slots, 4)):
            self.starvations_slot[i] += 1
            self.starvations_total += 1

    def record_usb_error(self, kind: str):
        assert kind in self.USB_ERROR_KINDS
        self.usb_errors["total"] += 1
        self.usb_errors[kind] += 1

    def reset_watermarks(self):
        """REQ_RESET_BUFFER_STATS wValue&1 (usb_audio.c:2208-2217)."""
        self.min_fill_pct = 100
        self.max_fill_pct = 0

    def reset_usb_errors(self):
        """REQ_RESET_USB_ERROR_STATS (usb_audio.c:2946-2960)."""
        for k in self.usb_errors:
            self.usb_errors[k] = 0


class StreamRunner:
    """Asynchronous segment pump over an Engine.

    JAX dispatch is async: ``feed`` enqueues device work and returns
    immediately, so host-side packetization of segment N+1 overlaps device
    compute of segment N — the TPU analog of the firmware's SPSC-ring
    producer/consumer decoupling (usb_audio_ring.h:31-131), with XLA's
    stream ordering standing in for the memory barriers.

    ``deadline_s`` (optional) turns on real-time accounting: when the gap
    between consecutive feeds exceeds it, the device side would have
    starved — every active output slot's starvation counter increments
    AND a silence segment is substituted into the output stream
    (audio_spdif.c:361-379: the DMA plays the instance silence buffer,
    not the late data), so a consumer draining the runner actually
    receives the zeros the firmware would have played.  ``stats`` feeds
    the vendor buffer statistics through ``VirtualDSPi.attach_runner``.
    """

    def __init__(self, engine, mesh: Mesh | None = None, max_inflight: int = 2,
                 deadline_s: float | None = None, n_slots: int | None = None):
        self.engine = engine
        self.mesh = mesh
        self.max_inflight = max_inflight
        self.deadline_s = deadline_s
        if n_slots is None:
            st = getattr(engine, "static", None)
            n_slots = st.n_spdif if st is not None else 4
        self.stats = RunnerStats(n_slots=n_slots, max_inflight=max_inflight)
        self._inflight: list = []
        self._t_last_feed: float | None = None
        self._silence_template = None
        self._template_static = getattr(engine, "static", None)
        # ``preset_loading`` analog: a callable returning True while an
        # intentional disruption (preset/flash op) is in flight —
        # VirtualDSPi.attach_runner wires it to its mute envelope.
        # Starvations in that window are suppressed, not counted
        # (audio_spdif.c:375-378).
        self.disruption_source = None

    def note_disruption(self):
        """Reset the feed-deadline clock across an intentional stall (a
        structural commit's drain+rebuild, a preset load) — the analog of
        the firmware zeroing its gap-detection timestamp on stream
        lifecycle transitions (usb_audio.c as_set_alternate:
        ``audio_ring_last_push_us = 0``)."""
        self._t_last_feed = None

    def _disrupted(self) -> bool:
        return bool(self.disruption_source and self.disruption_source())

    def _silence_out(self):
        """A zeroed output segment shaped like the last real one — the
        analog of the firmware's per-instance silence buffer.  A
        structural engine commit (new static) re-shapes the outputs, so
        the template resets with it."""
        cur = getattr(self.engine, "static", None)
        if cur is not self._template_static:
            self._silence_template = None
            self._template_static = cur
        if self._silence_template is None:
            return None
        return jax.tree.map(np.zeros_like, self._silence_template)

    def _expected_shape(self, x) -> bool:
        st = getattr(self.engine, "static", None)
        if st is None:
            return True
        if st.schedule:                      # [2, sum(schedule), B]
            return (x.ndim == 3 and x.shape[0] == 2
                    and x.shape[1] == sum(st.schedule))
        return (x.ndim == 4 and x.shape[1] == 2       # [npkt, 2, T, B]
                and x.shape[2] == st.block_size)

    def feed(self, x: np.ndarray, preset_mute=None):
        """Enqueue one segment; returns the (lazy) output dict."""
        import time

        now = time.perf_counter()
        if (self.deadline_s is not None and self._t_last_feed is not None
                and now - self._t_last_feed > self.deadline_s):
            # silence is substituted regardless — the DMA plays the
            # silence buffer whether or not a preset op is in flight;
            # only the COUNTERS are gated on preset_loading
            # (audio_spdif.c:361-378)
            self.stats.record_starvation(suppressed=self._disrupted())
            sil = self._silence_out()
            if sil is not None:
                self._inflight.append(sil)
                self.stats.silence_segments += 1
        self._t_last_feed = now

        x = np.asarray(x)
        if not self._expected_shape(x):
            # de-framed segment: the firmware's USB SIE would flag this
            # as a sequence/framing error and drop the packet
            self.stats.record_usb_error("data_seq")
            raise ValueError(
                f"segment shape {x.shape} does not frame as "
                "[n_packets, 2, block, B]")
        if self.mesh is not None:
            x = shard_input(x, self.mesh)
        out = self.engine.process(x, preset_mute)
        if self._silence_template is None:
            self._silence_template = jax.tree.map(
                lambda v: np.zeros(v.shape, v.dtype), out)
        self._inflight.append(out)
        self.stats.segments += 1
        self.stats.record_fill(len(self._inflight))
        if len(self._inflight) > self.max_inflight:
            done = self._inflight.pop(0)
            jax.block_until_ready(done)
            return done
        return out

    def drain(self):
        """Wait for all enqueued segments; returns the last output."""
        last = None
        for out in self._inflight:
            jax.block_until_ready(out)
            last = out
        self._inflight.clear()
        self.stats.record_fill(0)
        return last


class ChainedRunner:
    """Production-shaped serving loop: ``depth`` segments chained on device
    inside ONE jit per batch.

    ``StreamRunner.feed`` dispatches one segment per call, so sustained
    throughput sits on the per-call readback floor (~27 ms on tunneled
    backends) — fine for latency-bound interactive use, 100-1000x below
    what the chip delivers.  This runner uses the same shape the benchmark
    proved honest (bench.py): state threads through ``depth`` segments
    inside one compiled ``lax.scan``, each segment's outputs fold into a
    per-segment scalar ack, and ONE host readback forces the whole batch.
    Telemetry (peaks, clip flags) rides out with the last segment.

    Control-plane commits apply at batch boundaries: ``params`` is a jit
    argument, so ``VirtualDSPi.commit(engine)`` between ``feed`` calls
    swaps coefficients with no recompile — the analog of the firmware's
    deferred main-loop updates landing between USB packets.

    Real-time accounting matches StreamRunner: a feed gap exceeding the
    batch's audio duration counts starvations on every active slot.

    Serves any engine exposing the ``segment_fn`` contract: ``Engine``
    (xb [depth, npkt, 2, T, B]), ``GroupedEngine`` (leading K group axis)
    and ``HeteroServer`` (caller stream order; ``update_group`` +
    ``commit_params`` swaps one tenant's coefficients live).
    """

    def __init__(self, engine, depth: int = 8, deadline_s: float | None = None,
                 n_slots: int | None = None, mesh: Mesh | None = None,
                 pre=None):
        """``mesh``: optional 1-D ``streams`` mesh — shard the engine first
        (``shard_engine(engine, mesh)``) and every batch partitions across
        chips with zero collectives, exactly like the single-segment path;
        the chained program is jitted once and XLA SPMD-partitions it.

        ``pre``: optional traced per-segment input transform applied
        INSIDE the jitted chain — e.g. ``kernels.deframe.make_pre`` to
        feed raw USB payload bytes and unpack on device (the firmware
        unpacks on-device too, usb_audio.c:591-686).  With ``pre`` set,
        ``feed`` takes xb of shape [depth, *pre_input] and the shape
        check moves behind the transform."""
        self.engine = engine
        self.depth = depth
        self.deadline_s = deadline_s
        self.mesh = mesh
        self.pre = pre
        if n_slots is None:
            n_slots = engine.static.n_spdif
        self.stats = RunnerStats(n_slots=n_slots, max_inflight=2)
        self._inflight: list = []
        self._t_last_feed: float | None = None
        self.disruption_source = None     # see StreamRunner.disruption_source
        self._build()

    note_disruption = StreamRunner.note_disruption
    _disrupted = StreamRunner._disrupted

    def _build(self):
        """(Re)compile the chained batch program against the engine's
        CURRENT static structure."""
        import jax.numpy as jnp
        from jax import lax

        engine = self.engine
        # Engine, GroupedEngine and HeteroServer all expose the same
        # pre-jit segment contract, so one runner serves homogeneous,
        # K-config grouped, and arbitrary per-stream heterogeneous fleets.
        raw = engine.segment_fn
        pre = self.pre

        def run(params, state, xb, pm):
            def body(st, seg):
                x_seg, pm_seg = seg
                if pre is not None:
                    x_seg = pre(x_seg)
                st, out = raw(params, st, x_seg, pm_seg)
                fold = sum(jnp.sum(v).astype(jnp.float32)
                           for v in jax.tree.leaves(out))
                return st, (fold, out["peaks"], st.clip_flags)
            st, (folds, peaks, clips) = lax.scan(body, state, (xb, pm))
            return st, folds, peaks[-1], clips[-1]

        self._static = engine.static
        self._run = jax.jit(run, donate_argnums=(1,))
        self._put_params()

    def _put_params(self):
        """Upload the engine's params — replicated over the mesh when one
        is attached, so the SPMD-partitioned program reads them locally."""
        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            self._params_dev = jax.tree.map(
                lambda v: None if v is None else jax.device_put(v, repl),
                self.engine.params)
        else:
            self._params_dev = jax.device_put(jax.tree.map(
                lambda v: None if v is None else v, self.engine.params))

    def commit_params(self):
        """Sync with the engine after a control-plane commit
        (VirtualDSPi.commit).  Coefficient-only commits re-upload params
        (no recompile — the next batch serves the new values); a
        STRUCTURAL commit (band enables, output enables, a sample-rate
        change) replaced ``engine.static``, so the chained program —
        which closed over the old structure — rebuilds.  The analog of
        the firmware's pipeline reset around structural updates
        (prepare/complete_pipeline_reset, main.c:230-528): in-flight
        batches are drained first, since their results belong to the old
        program."""
        if self.engine.static is not self._static:
            self.drain()
            self._build()
            # the drain+rebuild stall is intentional — don't let the next
            # feed's gap read as a starvation (the firmware's pipeline
            # reset runs under preset_loading, main.c:456)
            self.note_disruption()
        else:
            self._put_params()

    def feed(self, xb: np.ndarray, preset_mute=None):
        """xb: int32 [depth, n_packets, 2, T, B] (one batch of chained
        segments).  preset_mute: optional [depth, n_packets] staircase.
        Returns (folds [depth], peaks, clips) — lazy until read."""
        import time

        import jax.numpy as jnp

        now = time.perf_counter()
        if (self.deadline_s is not None and self._t_last_feed is not None
                and now - self._t_last_feed > self.deadline_s):
            self.stats.record_starvation(suppressed=self._disrupted())
        self._t_last_feed = now

        if preset_mute is None:
            # [depth, npkt, 2, T, B] homogeneous / [depth, K, npkt, 2, T, G]
            # grouped: npkt sits at -4 either way; scheduled chains carry
            # it in the static; a ``pre`` hook must carry its own as an
            # ``npkt`` attribute (kernels.deframe.make_pre does) — the
            # fed payload shape no longer frames packets, so guessing
            # from it would build a wrong-shaped mute staircase.
            if self.engine.static.schedule:
                npkt = len(self.engine.static.schedule)
            elif self.pre is not None:
                npkt = getattr(self.pre, "npkt", None)
                if npkt is None:
                    raise ValueError(
                        "a custom pre hook must expose .npkt (packets "
                        "per segment) or preset_mute must be passed "
                        "explicitly — the payload shape cannot frame it")
            else:
                npkt = xb.shape[-4]
            preset_mute = jnp.ones((self.depth, npkt), jnp.float32)
        if self.mesh is not None:
            sh = getattr(xb, "sharding", None)
            if getattr(sh, "mesh", None) != self.mesh:
                # auto-sharding assumes the trailing stream axis of framed
                # planes; a ``pre`` input's stream axis is its own business
                # (e.g. payload words carry it at -2), so the caller
                # device_puts with the right spec (a hard error, not an
                # assert: under python -O a silent fall-through would
                # shard the wrong axis)
                if self.pre is not None:
                    raise ValueError(
                        "with pre=, device_put the batch with its "
                        "stream-axis sharding before feeding")
                xb = shard_input(np.asarray(xb), self.mesh)
        self.engine.state, folds, peaks, clips = self._run(
            self._params_dev, self.engine.state, xb, preset_mute)
        out = (folds, peaks, clips)
        self._inflight.append(out)
        self.stats.segments += self.depth
        self.stats.record_fill(len(self._inflight))
        if len(self._inflight) > 1:
            done = self._inflight.pop(0)
            # force by VALUE (tunneled block_until_ready can ack early)
            float(np.asarray(done[0])[-1])
            return done
        return out

    def drain(self):
        last = None
        for out in self._inflight:
            float(np.asarray(out[0])[-1])
            last = out
        self._inflight.clear()
        self.stats.record_fill(0)
        return last
