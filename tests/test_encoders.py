"""S/PDIF BMC encoding: closed form vs the firmware's literal table/loop."""

import numpy as np

from dspi_tpu.kernels import encoders


def _ref_update_subframe(l, h, sample, table):
    """Literal scalar transliteration of spdif_update_subframe
    (sample_encoding.h:27-49)."""
    s0 = int(table[sample & 0xFF])
    s1 = int(table[(sample >> 8) & 0xFF])
    s2 = int(table[(sample >> 16) & 0xFF])
    l = ((l & 0xFF) | ((s0 & 0xFFFF) << 8) | (s1 << 24)) & 0xFFFFFFFF
    ph = (h >> 24) & 0xFF
    hh = ((s1 & 0xFFFF) >> 8) | ((s2 & 0xFFFF) << 8)
    p = ((s0 >> 16) ^ (s1 >> 16) ^ (s2 >> 16)) & 0xFFFFFFFF
    p = p ^ ((((ph & 0x2A) * 0x2A) >> 6) & 1)
    h = (hh | ((ph & 0x7F) << 24) | ((p & 1) << 31)) & 0xFFFFFFFF
    return l, h


def test_bmc_closed_form_matches_table():
    table = encoders.build_spdif_lookup_reference()
    got = encoders.bmc_encode_byte(np.arange(256, dtype=np.uint32))
    np.testing.assert_array_equal(got, table)


def test_subframe_encode_matches_reference(rng):
    table = encoders.build_spdif_lookup_reference()
    samples = rng.integers(-(2**23), 2**23, size=500).astype(np.int32)
    pos = rng.integers(0, 192, size=500)
    status = encoders.channel_status_bits(48000)

    # build headers like init_spdif_buffer (audio_spdif.c:101-114)
    l0 = np.where(pos % 192 == 0, 0b00111001, 0b11001001).astype(np.uint32)
    h0 = (0x55000000 | (status[pos % 192] << 29)).astype(np.uint32)

    got_l, got_h = encoders.spdif_update_subframe(l0.copy(), h0.copy(), samples)
    for i in range(len(samples)):
        wl, wh = _ref_update_subframe(int(l0[i]), int(h0[i]),
                                      int(samples[i]) & 0xFFFFFFFF, table)
        assert int(got_l[i]) == wl and int(got_h[i]) == wh, i


def test_encode_block_shapes(rng):
    T, B = 48, 4
    sl = rng.integers(-(2**23), 2**23, size=(T, B)).astype(np.int32)
    sr = rng.integers(-(2**23), 2**23, size=(T, B)).astype(np.int32)
    words = encoders.encode_spdif_block(sl, sr, start_frame=190)
    assert words.shape == (T, 4, B)
    assert words.dtype == np.uint32
    # frame at block position 192-190=2 wraps: frame index 2 has preamble Z
    # start 190 -> positions 190, 191, 0 ... frame idx 2 is block start
    assert (words[2, 0] & 0xFF).max() == 0b00111001
    assert (words[0, 0] & 0xFF).min() == 0b11001001

    i2s = encoders.encode_i2s(sl)
    np.testing.assert_array_equal(i2s, (sl.astype(np.uint32) << 8))
