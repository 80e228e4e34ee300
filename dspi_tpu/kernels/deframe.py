"""On-device USB payload deframing: raw byte streams -> engine input.

The firmware unpacks USB payload bytes on-device (usb_audio.c:591-686
float / :997-1006 Q28 byte assembly); the TPU analog is to upload the RAW
bytes and let the VPU do the unpack — elementwise shifts plus an XLA
transpose — instead of deframing on the host.  That halves (s16) or
two-thirds (s24) the host->device transfer relative to shipping unpacked
int32 planes, and the unpack itself is vectorized over every lane.

The host-side twin (native/dspi_host.cpp::dspi_deframe_*_batch via
``dspi_tpu.native.deframe_batch``) produces identical planes; tests pin
the two against each other.  Use this path for serving (feed bytes,
deframe inside the jitted chain via ``ChainedRunner(pre=...)``); use the
native path when the host must inspect or route the planes.

s16 payloads travel as int32 views of the byte stream (one int32 per
frame: low half = L, high half = R, both little-endian — a zero-copy
``payload.view(np.int32)`` on the host); s24 payloads travel as uint8.
"""

from __future__ import annotations

import jax.numpy as jnp


def deframe_s16(payload, npkt: int, block: int):
    """int32 [B, npkt*block] (byte-stream view; frame i in word i) ->
    int32 [npkt, 2, block, B].

    Little-endian s16 LRLR: word = (r << 16) | (l & 0xFFFF), so
    l = sign-extended low half, r = arithmetic high shift — the exact
    inverse of the interleave in usb_audio.c:591-594."""
    v = payload.astype(jnp.int32)
    l = (v << 16) >> 16
    r = v >> 16
    lr = jnp.stack([l, r])                      # [2, B, frames]
    lr = lr.reshape(2, v.shape[0], npkt, block)
    return lr.transpose(2, 0, 3, 1)             # [npkt, 2, block, B]


def deframe_s24(payload, npkt: int, block: int):
    """uint8 [B, npkt*block*6] (packed s24 LRLR) ->
    int32 [npkt, 2, block, B], sign-extended (usb_audio.c:997-1006
    byte assembly, pre-Q28-shift)."""
    b = payload.shape[0]
    p = payload.reshape(b, npkt * block, 6).astype(jnp.int32)

    def s24(b0, b1, b2):
        return ((b2 << 24) | (b1 << 16) | (b0 << 8)) >> 8

    lr = jnp.stack([s24(p[..., 0], p[..., 1], p[..., 2]),
                    s24(p[..., 3], p[..., 4], p[..., 5])])
    lr = lr.reshape(2, b, npkt, block)
    return lr.transpose(2, 0, 3, 1)


def make_pre(npkt: int, block: int, bit_depth: int = 16):
    """A ``ChainedRunner(pre=...)`` hook deframing one fed segment.
    Carries ``npkt`` so the runner can default the preset-mute staircase
    without seeing framed input shapes."""
    if bit_depth == 24:
        def fn(payload):
            return deframe_s24(payload, npkt, block)
    else:
        def fn(payload):
            return deframe_s16(payload, npkt, block)
    fn.npkt = npkt
    return fn
