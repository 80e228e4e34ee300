#!/usr/bin/env python
"""End-to-end serving demo: many virtual DSPi devices on one chip.

Shows the full production loop:
  1. boot a vendor-protocol device from a flash preset image
  2. spin up the batched engine for N streams
  3. stream segments through with async host feed + telemetry
  4. live control change (master volume) applied between segments with
     the firmware's deferred-update semantics
  5. emit real S/PDIF wire words for the first pair

Run: python examples/serve.py [n_streams] [segments]
"""

import struct
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from dspi_tpu import Platform
from dspi_tpu.chain import Engine
from dspi_tpu.control import requests as R
from dspi_tpu.control.device import VirtualDSPi
from dspi_tpu.runtime.telemetry import EngineTelemetry
from dspi_tpu.runtime.wire_out import WireEncoder


def main():
    n_streams = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_segments = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    npkt, block = 16, 48

    dev = VirtualDSPi(Platform.RP2350)
    dev.set(R.SET_LOUDNESS, 0, b"\x01")
    dev.set(R.SET_LEVELLER_ENABLE, 0, b"\x01")
    dev.set(R.SET_MASTER_VOLUME, 0, struct.pack("<f", -12.0))

    eng = Engine(dev.cfg, n_streams=n_streams, block_size=block,
                 emit="full", pdm=False)
    dev.dirty = False                      # engine built from current cfg
    wire = WireEncoder(dev.cfg, block)
    tele = EngineTelemetry(sample_rate=dev.cfg.sample_rate)

    # real-time accounting: starvation counters + buffer stats are fed by
    # the runner (GET_STATUS 17-21, GET_BUFFER_STATS)
    from dspi_tpu.runtime.executor import StreamRunner
    runner = StreamRunner(eng, max_inflight=2,
                          deadline_s=npkt * block / dev.cfg.sample_rate)
    dev.attach_runner(runner)

    rng = np.random.default_rng(0)
    print(f"serving {n_streams} streams, {n_segments} segments of "
          f"{npkt * block / 48:.0f} ms")

    for seg in range(n_segments):
        x = rng.integers(-20000, 20000,
                         size=(npkt, 2, block, n_streams)).astype(np.int32)
        tele.segment_begin()
        # preset-mute envelope gains (unity unless a preset op is pending)
        out = runner.feed(x, preset_mute=dev.packet_gains(npkt, block))
        import jax
        jax.block_until_ready(out)
        rtf = tele.segment_end(npkt, block, n_streams)
        tele.feed_device(dev, out)

        if seg == n_segments // 2:
            # live volume change, applied like the firmware main loop
            dev.set(R.SET_MASTER_VOLUME, 0, struct.pack("<f", -6.0))
            dev.commit(eng)
            print("  [mid-run] master volume -> -6 dB (no recompile)")
        if seg == n_segments // 2 + 1:
            # preset save: arms the firmware's 8 ms anti-pop fade
            dev.set(R.PRESET_SAVE, 1)
            dev.commit(eng)
            print("  [mid-run] preset save -> 8 ms mute envelope armed")

        if seg % 5 == 0:
            words = wire.encode(out["s24"])
            status = dev.get(R.GET_STATUS, 9)
            peaks = struct.unpack("<11H", status[:22])
            print(f"  seg {seg:3d}: {rtf:9.0f}x RT  load {dev.cpu_loads[0]}%"
                  f"  peak L/R {peaks[0]}/{peaks[1]}"
                  f"  spdif words {words['pair0'].shape}")

    runner.drain()
    print(f"done: {tele.packets_processed} packets, mean load "
          f"{dev.cpu_loads[0]}%, starvations "
          f"{struct.unpack('<I', dev.get(R.GET_STATUS, 17))[0]}")


if __name__ == "__main__":
    main()
