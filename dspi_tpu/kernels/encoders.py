"""Output encoders: IEC 60958 (S/PDIF) subframe encoding and I2S packing.

The firmware offloads serialization to PIO state machines fed by DMA:

  * S/PDIF: BMC (biphase-mark) encoding via a 256-entry lookup table plus
    preamble/channel-status/parity stamping
    (audio_spdif.c:140-153, sample_encoding.h:27-49, audio_spdif.c:77-114).
  * I2S: 24-in-32 left-justified, sample << 8 (audio_i2s_multi.c:223-226).
  * PDM: 1-bit stream, packed 32 bits/word (the modulator emits words).

On TPU the same wire words are produced as closed-form vectorized bit math —
the BMC table is replaced by a Morton bit-spread so there is no gather in
the hot path.  Output layout matches the PIO wire format exactly: each
subframe is two uint32 words (l, h) shifted out LSB-first.
"""

from __future__ import annotations

import numpy as np

from ..core import constants as C


def _xp(x):
    if isinstance(x, np.ndarray):
        return np
    import jax.numpy as jnp

    return jnp


def bmc_encode_byte(b):
    """BMC-encode one byte: the closed form of the spdif_lookup table
    (audio_spdif.c:140-153).

    Returns uint32: bits [15:0] = biphase cell pattern, bit 16 = parity.
    ``b`` may be any uint32 array; only the low 8 bits are used.
    """
    xp = _xp(b)
    b = b & 0xFF
    # Morton spread: bit j -> bit 2j
    m = (b | (b << 4)) & 0x0F0F
    m = (m | (m << 2)) & 0x3333
    m = (m | (m << 1)) & 0x5555
    v = 0x5555 | (m << 1)
    # parity of the byte
    p = b ^ (b >> 4)
    p = p ^ (p >> 2)
    p = p ^ (p >> 1)
    return (v | ((p & 1) << 16)).astype(xp.uint32) if hasattr(v, "astype") else v


def spdif_update_subframe(l, h, sample):
    """Encode a 24-bit sample into an (l, h) subframe word pair —
    spdif_update_subframe (sample_encoding.h:27-49), vectorized.

    ``l``/``h`` carry the preamble (l[7:0]) and the channel-status /
    user / validity bits (h[31:24]); those are preserved exactly as the
    firmware does.  ``sample`` is int32; bits [23:0] are encoded.
    """
    xp = _xp(sample)
    s = sample.astype(xp.uint32)
    s0 = bmc_encode_byte(s)
    s1 = bmc_encode_byte(s >> 8)
    s2 = bmc_encode_byte(s >> 16)

    l = (l & xp.uint32(0xFF)) | ((s0 & xp.uint32(0xFFFF)) << 8) | (s1 << 24)
    ph = h >> 24
    hh = ((s1 & xp.uint32(0xFFFF)) >> 8) | ((s2 & xp.uint32(0xFFFF)) << 8)
    p = (s0 >> 16) ^ (s1 >> 16) ^ (s2 >> 16)
    # parity of the aux/status bits already present in the subframe header:
    # ((ph & 0x2a) * 0x2a) >> 6 & 1  (sample_encoding.h:46)
    p = p ^ ((((ph & xp.uint32(0x2A)) * xp.uint32(0x2A)) >> 6) & xp.uint32(1))
    h = hh | ((ph & xp.uint32(0x7F)) << 24) | ((p & xp.uint32(1)) << 31)
    return l, h


def channel_status_bits(sample_rate: int = 48000) -> np.ndarray:
    """IEC 60958-3 consumer channel status bits for one 192-frame block
    (audio_spdif.c:77-94); byte 3 carries the rate code."""
    rate_byte = {44100: 0x00, 48000: 0x02, 96000: 0x0A}.get(int(sample_rate), 0x02)
    status = list(C.SPDIF_CHANNEL_STATUS)
    status[3] = rate_byte
    bits = np.zeros(192, np.uint32)
    for i in range(40):
        bits[i] = (status[i // 8] >> (i % 8)) & 1
    return bits


def spdif_frame_headers(block_pos, sample_rate: int = 48000):
    """Pristine (l, h) header words for frames at the given block positions
    (init_spdif_buffer, audio_spdif.c:101-114).

    block_pos: int array of frame indices modulo 192.
    Returns (l_L, h_L, l_R, h_R) uint32 arrays.
    """
    xp = _xp(block_pos) if not np.isscalar(block_pos) else np
    bits = channel_status_bits(sample_rate)
    if xp is not np:
        import jax.numpy as jnp

        bits = jnp.asarray(bits)
    c_bit = bits[block_pos % 192]
    l_L = xp.where(block_pos % 192 == 0,
                   np.uint32(C.SPDIF_PREAMBLE_Z),
                   np.uint32(C.SPDIF_PREAMBLE_X)).astype(xp.uint32)
    h = (np.uint32(0x55000000) | (c_bit << 29)).astype(xp.uint32)
    l_R = xp.full_like(l_L, np.uint32(C.SPDIF_PREAMBLE_Y))
    return l_L, h, l_R, h


def encode_spdif_block(s24_l, s24_r, start_frame=0, sample_rate: int = 48000):
    """Encode stereo s24 samples into S/PDIF wire words.

    s24_l/s24_r: int32 [T, ...] (trailing batch axes fine)
    Returns uint32 [T, 4, ...]: per frame the L-subframe (l, h) then the
    R-subframe (l, h), exactly the DMA word stream the PIO consumes.
    """
    xp = _xp(s24_l)
    T = s24_l.shape[0]
    if xp is np:
        pos = (np.arange(T) + start_frame) % 192
    else:
        import jax.numpy as jnp

        pos = (jnp.arange(T) + start_frame) % 192
    l_L, h_L, l_R, h_R = spdif_frame_headers(pos, sample_rate)
    extra = (1,) * (s24_l.ndim - 1)
    l_L = l_L.reshape((T,) + extra)
    h_L = h_L.reshape((T,) + extra)
    l_R = l_R.reshape((T,) + extra)
    h_R = h_R.reshape((T,) + extra)
    lL, hL = spdif_update_subframe(l_L + xp.zeros_like(s24_l, dtype=xp.uint32),
                                   h_L + xp.zeros_like(s24_l, dtype=xp.uint32),
                                   s24_l)
    lR, hR = spdif_update_subframe(l_R + xp.zeros_like(s24_r, dtype=xp.uint32),
                                   h_R + xp.zeros_like(s24_r, dtype=xp.uint32),
                                   s24_r)
    return xp.stack([lL, hL, lR, hR], axis=1)


def encode_i2s(s24):
    """I2S 24-in-32 left-justified encode: sample << 8
    (audio_i2s_multi.c:223-226)."""
    return (s24.astype(_xp(s24).uint32) << 8)


# ----------------------------------------------------------------------------
# Literal table builder — used only by tests to validate the closed form
# ----------------------------------------------------------------------------


def build_spdif_lookup_reference() -> np.ndarray:
    """The firmware's table build loop (audio_spdif.c:140-153), literal."""
    table = np.zeros(256, np.uint32)
    for i in range(256):
        v = 0x5555
        p = 0
        for j in range(8):
            if i & (1 << j):
                p ^= 1
                v |= 2 << (j * 2)
        table[i] = v | (p << 16)
    return table
