"""Device-side payload deframing vs the native host deframer and the
engine input contract (kernels/deframe.py)."""

import numpy as np
import pytest

from dspi_tpu import native
from dspi_tpu.kernels import deframe


def _payloads(rng, B, frames, bit_depth):
    if bit_depth == 16:
        vals = rng.integers(-32768, 32768, size=(B, frames, 2)).astype(
            np.int16)
        payloads = np.frombuffer(vals.tobytes(), np.uint8).reshape(B, -1)
    else:
        vals = rng.integers(-(2 ** 23), 2 ** 23,
                            size=(B, frames, 2)).astype(np.int32)
        rows = []
        for b in range(B):
            buf = bytearray()
            for i in range(frames):
                for v in (int(vals[b, i, 0]), int(vals[b, i, 1])):
                    u = v & 0xFFFFFF
                    buf += bytes((u & 0xFF, (u >> 8) & 0xFF, u >> 16))
            rows.append(np.frombuffer(bytes(buf), np.uint8))
        payloads = np.stack(rows)
    want = np.moveaxis(vals.astype(np.int32).reshape(
        B, frames // 48, 48, 2), (0, 3), (3, 1))
    return payloads, want


@pytest.mark.parametrize("bit_depth", [16, 24])
def test_device_deframe_matches_reference(rng, bit_depth):
    B, npkt, block = 37, 4, 48
    payloads, want = _payloads(rng, B, npkt * block, bit_depth)
    if bit_depth == 16:
        fed = payloads.view(np.int32)          # zero-copy host view
    else:
        fed = payloads
    got = np.asarray(deframe.make_pre(npkt, block, bit_depth)(fed))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("bit_depth", [16, 24])
@pytest.mark.skipif(not native.available(),
                    reason="native toolchain unavailable")
def test_device_deframe_matches_native(rng, bit_depth):
    B, npkt, block = 70, 3, 48
    payloads, _ = _payloads(rng, B, npkt * block, bit_depth)
    host = native.deframe_batch(payloads, npkt, block, bit_depth=bit_depth)
    fed = payloads.view(np.int32) if bit_depth == 16 else payloads
    dev = np.asarray(deframe.make_pre(npkt, block, bit_depth)(fed))
    np.testing.assert_array_equal(dev, host)


def test_chained_runner_pre_deframe(rng):
    """A ChainedRunner fed raw s16 payload words produces the same outputs
    as one fed pre-deframed planes."""
    import jax

    from bench import full_chain_config
    from dspi_tpu.chain import Engine
    from dspi_tpu.core.constants import Platform
    from dspi_tpu.runtime.executor import ChainedRunner

    B, npkt, block, depth = 64, 3, 48, 2
    cfg = full_chain_config(Platform.RP2350)
    payloads, planes = zip(*[
        _payloads(rng, B, npkt * block, 16) for _ in range(depth)])
    xb_words = np.stack([p.view(np.int32) for p in payloads])
    xb_planes = np.stack(planes)

    def run(pre, xb):
        eng = Engine(cfg, n_streams=B, block_size=block, emit="reduced",
                     pdm=True, unroll=2, pdm_fade=False)
        r = ChainedRunner(eng, depth=depth, pre=pre)
        out = r.feed(xb)
        r.drain()
        return np.asarray(out[0])

    from dspi_tpu.kernels.deframe import make_pre

    folds_framed = run(make_pre(npkt, block), xb_words)
    folds_planes = run(None, xb_planes)
    np.testing.assert_array_equal(folds_framed, folds_planes)
