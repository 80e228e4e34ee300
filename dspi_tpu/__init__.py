"""dspi_tpu — a TPU-native batched rebuild of the DSPi audio DSP engine.

The reference (WeebLabs/DSPi) is a dual-core RP2040/RP2350 USB sound-card
firmware.  This package re-implements its complete signal chain as a batched
JAX/XLA/Pallas pipeline over [stream, channel, time] tensors, reproducing
both firmware math paths:

  * float path (RP2350 semantics)  — matched to <= 1e-6 RMS
  * Q28 path   (RP2040 semantics)  — bit-exact

Throughput comes from processing thousands of independent streams per chip
instead of one real-time stream.

Layout:
  core/     numerics substrate (constants, exact Q28/Q15 math)
  params/   control-plane model + coefficient design (firmware float32 math)
  golden/   sample-sequential oracle used by the tests
  chain/    the batched JAX pipeline (PASS 1-5)
  kernels/  Pallas TPU kernels (PDM delta-sigma, fused EQ, encoders)
  io/       preset/bulk wire codecs (flash_storage.c / bulk_params.c compat)
  control/  vendor-protocol-level device API
  runtime/  multi-stream execution, sharding, host feed
"""

from .core.constants import FilterType, Platform
from .params.types import (
    CrossfeedConfig,
    DeviceConfig,
    EqBand,
    LevellerConfig,
    LoudnessConfig,
    OutputChannel,
)

__version__ = "0.1.0"

__all__ = [
    "DeviceConfig", "EqBand", "CrossfeedConfig", "LevellerConfig",
    "LoudnessConfig", "OutputChannel", "FilterType", "Platform",
]
