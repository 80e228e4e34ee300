"""Batched pipeline package: pack + pipeline + a convenience Engine."""

from __future__ import annotations

import numpy as np

from ..core import constants as C
from ..params.design import derive
from ..params.types import DeviceConfig
from .grouped import GroupedEngine
from .pack import (ChainParams, ChainState, StaticChain, build_params,
                   build_params_multi,
                   build_static, init_state)
from .pipeline import make_process

__all__ = ["Engine", "GroupedEngine", "StaticChain", "ChainParams",
           "ChainState", "build_static", "build_params",
           "build_params_multi", "init_state", "make_process",
           "packet_geometry"]


def packet_geometry(sample_rate, n_packets: int = 10):
    """Canonical USB packet geometry for a sample rate.

    The host delivers one isochronous packet per millisecond
    (current_architecture.md:1092): 48/96 samples at 48/96 kHz, and the
    44/45 cadence at 44.1 kHz (nine 44s then a 45 — 441 samples per
    10 ms).  Returns ``(block_size, schedule)``: uniform rates get
    ``schedule=None`` (packet count stays a per-call choice); 44.1 kHz
    gets the cadence tiled to ``n_packets`` rounded up to whole 10 ms
    groups (the periodic fast path wants complete pattern repeats).
    """
    rate = int(sample_rate)
    if rate == 44100:
        groups = max(1, -(-int(n_packets) // 10))
        return 45, ((44,) * 9 + (45,)) * groups
    if rate not in (48000, 96000):
        raise ValueError(f"unsupported sample rate {sample_rate}")
    return rate // 1000, None


class Engine:
    """Stateful wrapper: one device config, B parallel streams.

    >>> eng = Engine(DeviceConfig(), n_streams=1024)
    >>> out = eng.process(x)        # x: int32 [n_packets, 2, block, B]
    """

    def __init__(self, cfg: DeviceConfig, n_streams: int, block_size: int = 48,
                 bit_depth: int = 16, emit: str = "full", pdm: bool = True,
                 unroll: int = 8, outer_unroll: int = 1,
                 pdm_fade: bool = True, pdm_seed=C.PDM_RNG_SEED,
                 schedule=None, mxu="auto", wire: bool = False):
        """``schedule``: optional per-packet sample counts compiled into the
        program (44.1 kHz delivers 44/45-sample packets at 1 kHz cadence,
        current_architecture.md:1092).  With a schedule, ``process`` takes
        x as [2, sum(schedule), B] and emit='full' outputs are time-flat.

        ``mxu``: lower the float chain's LTI passes to MXU block matmuls
        (chain/mxu.py; <=1e-6 RMS firmware budget instead of golden
        bit-exactness).  Supports uniform and variable (44.1 kHz 44/45)
        schedules.  'auto' enables it on the TPU backend; the scan path —
        bit-identical to the golden model — is the default elsewhere and
        always for Q28 chains.

        ``wire``: emit the wire-format word streams on-device — S/PDIF
        IEC 60958 subframe pairs / I2S words per configured slot type —
        with the 192-frame block position carried in state.  The host
        WireEncoder (runtime/wire_out.py) remains the fallback for
        engines built without it."""
        if mxu == "auto":
            import jax

            mxu = jax.default_backend() == "tpu"
        self.cfg = cfg
        self.n_streams = n_streams
        self._rate = float(cfg.sample_rate)
        # Tracked copy of the sub-output enable (the config object is
        # typically shared with the control plane and mutated in place,
        # so cfg is no witness at update_config time).
        self._pdm_out_on = bool(pdm and cfg.outputs[-1].enabled)
        self.derived = derive(cfg)
        self.static = build_static(self.derived, block_size=block_size,
                                   bit_depth=bit_depth, emit=emit, pdm=pdm,
                                   unroll=unroll, outer_unroll=outer_unroll,
                                   schedule=schedule, mxu=mxu, wire=wire)
        self.params = build_params(self.derived, self.static)
        self.state = init_state(self.static, n_streams, pdm_seed=pdm_seed,
                                pdm_fade=pdm_fade)
        self._fn = make_process(self.static)

    def update_config(self, cfg: DeviceConfig, preset_load: bool = False,
                      bit_depth: int | None = None):
        """Apply a new config with the firmware's state-reset semantics.

        Coefficient-only changes reuse the compiled program; structural
        changes (enables, band types) recompile and migrate the state.
        Mirrors the main-loop deferred updates (main.c:826-976):

          * per-band SVF<->biquad path flips zero that band's state
            (dsp_compute_coefficients, dsp_pipeline.c:87-92)
          * any crossfeed change clears its filter state
            (crossfeed_compute_coefficients, crossfeed.c:122-126)
          * leveller enable / lookahead toggles reset the leveller
            (leveller_reset_state; usb_audio.c leveller_reset_pending)
          * preset load zeroes the delay lines and resets the leveller
            (flash_storage.c:822-842)
          * a sample-rate change (perform_rate_change, main.c:132-171)
            recomputes every coefficient at the new Fs — derive() does —
            AND re-packetizes: the USB host's packet geometry follows the
            rate (48/96 uniform, 44/45 cadence at 44.1 kHz), so the
            engine's block size / schedule rebuild via packet_geometry()
            and callers must re-frame their segments.  Filter state
            persists across the rate change, as in the firmware.
          * ``bit_depth`` (16|24, None = keep) is the UAC alt-setting
            analog: the host selecting AS alt1 (16-bit) / alt2 (24-bit)
            changes only the per-packet unpack format
            (usb_descriptors.c:64-235, usb_audio.c:591-686/997-1006) —
            the chain recompiles with the new unpack, every other pass
            and all DSP state carry over untouched.
        """
        import dataclasses as _dc

        old_cfg, old_d, old_static = self.cfg, self.derived, self.static
        self.cfg = cfg
        self.derived = derive(cfg)
        block_size, schedule = old_static.block_size, old_static.schedule
        # Rate changes are detected against the geometry the engine was
        # built at (the config object is typically shared with the control
        # plane and mutated in place, so old_cfg is no witness).
        if float(cfg.sample_rate) != self._rate:
            block_size, schedule = packet_geometry(
                cfg.sample_rate,
                len(old_static.schedule) if old_static.schedule else 10)
            self._rate = float(cfg.sample_rate)
        new_static = build_static(
            self.derived, block_size=block_size,
            bit_depth=(old_static.bit_depth if bit_depth is None
                       else int(bit_depth)), emit=old_static.emit,
            pdm=old_static.pdm_on or cfg.outputs[-1].enabled,
            unroll=old_static.unroll, outer_unroll=old_static.outer_unroll,
            schedule=schedule, mxu=old_static.mxu,
            wire=bool(old_static.wire), pdm_keep=old_static.pdm_on)
        structural = new_static != old_static
        if structural:
            self.static = new_static
            self._fn = make_process(self.static)
            self.state = self._migrate_state(self.state, old_static, new_static)
        self.params = build_params(self.derived, self.static)

        st = self.state
        # SVF<->biquad path flips
        if self.static.is_float:
            for ch in range(cfg.num_channels):
                for b in range(min(len(old_d.eq[ch]), len(self.derived.eq[ch]))):
                    o, n = old_d.eq[ch][b], self.derived.eq[ch][b]
                    if o.use_svf != n.use_svf and not n.bypass:
                        for f in ("eq_a", "eq_b", "eq_c", "eq_d"):
                            arr = getattr(st, f)
                            st = st._replace(**{f: arr.at[ch, b].set(0)
                                                if hasattr(arr, "at")
                                                else _zero_np(arr, ch, b)})
        # crossfeed change
        if _dc.asdict(old_cfg.crossfeed) != _dc.asdict(cfg.crossfeed):
            st = st._replace(xf_lp=_zeros_like(st.xf_lp),
                             xf_ap=_zeros_like(st.xf_ap))
        # leveller resets
        lev_reset = (preset_load
                     or (cfg.leveller.enabled and not old_cfg.leveller.enabled)
                     or cfg.leveller.lookahead != old_cfg.leveller.lookahead)
        if lev_reset:
            st = self._reset_leveller(st)
        if preset_load and st.delay is not None:
            st = st._replace(delay=_zeros_like(st.delay))
        # S/PDIF<->I2S slot type switch tears down and restarts the
        # instances cycle-synchronized, resetting the IEC 60958 block
        # position (process_type_switches, main.c:230-423)
        if old_static.wire and new_static.wire != old_static.wire:
            st = st._replace(wire_pos=np.int32(0))
        # PDM (sub output) enable transition: flip the control-plane flag
        # in state; the kernels run the firmware's core-1 loop reactions —
        # disable starts the 1024-sample fade-out, re-enable mid-fade
        # converts it to a fade-in, re-enable after a completed stop does
        # a full modulator restart (pdm_generator.c:217-252).  The stage
        # stays compiled across a runtime disable (pdm_keep above) so the
        # fade-out actually runs.
        new_pdm_out = bool(cfg.outputs[-1].enabled)
        if (self.static.pdm_on and st.pdm_ena is not None
                and new_pdm_out != self._pdm_out_on):
            st = st._replace(pdm_ena=np.full(
                np.shape(st.pdm_ena), int(new_pdm_out), np.int32))
        self._pdm_out_on = new_pdm_out
        self.state = st

    def _reset_leveller(self, st):
        """leveller_reset_state (leveller.c:95-105)."""
        unity = (np.float32(1.0) if self.static.is_float
                 else np.int32(C.Q28_ONE))
        B = self.n_streams
        one = np.full(B, unity)
        return st._replace(
            lev_env=_zeros_like(st.lev_env),
            lev_gain_db=np.zeros(B, np.float32),
            lev_gain=one.copy(), lev_gain_prev=one.copy(),
            lev_la=None if st.lev_la is None else _zeros_like(st.lev_la))

    def _migrate_state(self, st: ChainState, old, new) -> ChainState:
        """Carry state across a structural recompile; geometry-dependent
        buffers (delay rings, lookahead) are rebuilt when shapes change."""
        fresh = init_state(new, self.n_streams)
        updates = {}
        for f in st._fields:
            ov, nv = getattr(st, f), getattr(fresh, f)
            if ov is None or nv is None:
                updates[f] = nv
            elif np.shape(ov) != np.shape(nv):
                updates[f] = nv
            else:
                updates[f] = ov
        return ChainState(**updates)

    def process(self, x: np.ndarray, preset_mute=None):
        """x: int32 [n_packets, 2, block_size, B] -> output dict."""
        self.state, out = self._fn(self.params, self.state, x, preset_mute)
        return out

    @property
    def segment_fn(self):
        """Pre-jit segment processor ``(params, state, x, preset_mute) ->
        (state', out)`` — the building block chained runners and benches
        compose inside ONE outer jit (bench.py methodology).  Derived from
        the CURRENT static, so it tracks structural recompiles."""
        import functools

        from .pipeline import _process_float, _process_q28

        return functools.partial(
            _process_float if self.static.is_float else _process_q28,
            self.static)

    # -- checkpoint / resume of runtime state ------------------------------
    def save_state(self, path: str) -> None:
        """Snapshot all per-stream runtime state (filter memories,
        envelopes, delay rings, modulator state) to an .npz file."""
        arrays = {}
        for f in self.state._fields:
            v = getattr(self.state, f)
            if v is not None:
                arrays[f] = np.asarray(v)
        np.savez_compressed(path, **arrays)

    def load_state(self, path: str) -> None:
        data = np.load(path)
        # Pre-time-ordered-ring checkpoints stored circular rings plus
        # their indices.  Index 0 means the circular layout coincides with
        # the time-ordered one (oldest-first) and loads fine; a nonzero
        # index would silently load a rotated ring, so refuse it.
        for legacy in ("delay_idx", "lev_la_idx"):
            if legacy in data.files and int(np.asarray(data[legacy])) != 0:
                raise ValueError(
                    f"checkpoint {path} was saved with a circular "
                    f"{legacy.split('_idx')[0]} ring at offset "
                    f"{int(np.asarray(data[legacy]))}; rings are now "
                    "stored time-ordered — re-save the state with this "
                    "version (or resume from a segment boundary where "
                    "the index was 0)")
        updates = {}
        for f in self.state._fields:
            cur = getattr(self.state, f)
            if f in data.files:
                loaded = data[f]
                if cur is not None and np.shape(cur) != loaded.shape:
                    raise ValueError(
                        f"state field {f}: shape {loaded.shape} != "
                        f"{np.shape(cur)}")
                updates[f] = loaded
            else:
                updates[f] = cur
        self.state = ChainState(**updates)


def _zeros_like(x):
    return np.zeros(np.shape(x), np.asarray(x).dtype)


def _zero_np(arr, ch, b):
    arr = np.array(arr)
    arr[ch, b] = 0
    return arr
