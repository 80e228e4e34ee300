"""Batched pipeline package: pack + pipeline + a convenience Engine."""

from __future__ import annotations

import numpy as np

from ..core import constants as C
from ..params.design import derive
from ..params.types import DeviceConfig
from .pack import (ChainParams, ChainState, StaticChain, build_params,
                   build_static, init_state)
from .pipeline import make_process

__all__ = ["Engine", "StaticChain", "ChainParams", "ChainState",
           "build_static", "build_params", "init_state", "make_process"]


class Engine:
    """Stateful wrapper: one device config, B parallel streams.

    >>> eng = Engine(DeviceConfig(), n_streams=1024)
    >>> out = eng.process(x)        # x: int32 [n_packets, 2, block, B]
    """

    def __init__(self, cfg: DeviceConfig, n_streams: int, block_size: int = 48,
                 bit_depth: int = 16, emit: str = "full", pdm: bool = True,
                 unroll: int = 8, pdm_fade: bool = True,
                 pdm_seed=C.PDM_RNG_SEED):
        self.cfg = cfg
        self.n_streams = n_streams
        self.derived = derive(cfg)
        self.static = build_static(self.derived, block_size=block_size,
                                   bit_depth=bit_depth, emit=emit, pdm=pdm,
                                   unroll=unroll)
        self.params = build_params(self.derived, self.static)
        self.state = init_state(self.static, n_streams, pdm_seed=pdm_seed,
                                pdm_fade=pdm_fade)
        self._fn = make_process(self.static)

    def update_config(self, cfg: DeviceConfig):
        """Apply a new config.  Coefficient-only changes reuse the compiled
        program; structural changes (enables, band types) recompile."""
        self.cfg = cfg
        self.derived = derive(cfg)
        new_static = build_static(
            self.derived, block_size=self.static.block_size,
            bit_depth=self.static.bit_depth, emit=self.static.emit,
            pdm=self.static.pdm_on, unroll=self.static.unroll)
        if new_static != self.static:
            self.static = new_static
            self._fn = make_process(self.static)
        self.params = build_params(self.derived, self.static)

    def process(self, x: np.ndarray, preset_mute=None):
        """x: int32 [n_packets, 2, block_size, B] -> output dict."""
        self.state, out = self._fn(self.params, self.state, x, preset_mute)
        return out
