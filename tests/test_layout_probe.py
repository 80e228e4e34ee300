"""Byte-layout cross-validation against the reference's packed C structs.

Round-1 asserted preset/bulk byte-compatibility only against this repo's
own codec round-trips.  This test makes "a firmware image loads unchanged"
a *measurement*: it compiles a tiny host probe that #includes the
reference's own headers (config.h, bulk_params.h) plus the packed flash
structs extracted verbatim from flash_storage.c at test time, dumps
sizeof/offsetof for every field, and compares them against the offsets
implied by dspi_tpu/io/wire.py's encoders for both platforms.

Skipped when /root/reference or a C compiler is unavailable — the repo
itself never ships or depends on reference code (the structs are read
from the reference tree at test runtime, not vendored).
"""

import shutil
import struct
import subprocess
from pathlib import Path

import pytest

REF = Path("/root/reference/firmware/DSPi")

pytestmark = pytest.mark.skipif(
    not REF.exists() or shutil.which("gcc") is None,
    reason="reference tree or gcc unavailable")


PROBE_MAIN = r"""
#include <stdio.h>
#include <stddef.h>
#include "config.h"

/* flash_structs.h: packed structs extracted from flash_storage.c */
#include "flash_structs.h"
#include "bulk_params.h"

#define P(name, val) printf("%s=%zu\n", name, (size_t)(val))
#define OFF(st, f) P(#st "." #f, offsetof(st, f))

int main(void) {
    P("sizeof.EqParamPacket", sizeof(EqParamPacket));
    P("sizeof.FlashMatrixCrosspoint", sizeof(FlashMatrixCrosspoint));
    P("sizeof.FlashOutputChannel", sizeof(FlashOutputChannel));
    P("sizeof.PresetSlot", sizeof(PresetSlot));
    P("sizeof.PresetDirectory", sizeof(PresetDirectory));
    P("sizeof.WireBulkParams", sizeof(WireBulkParams));

    OFF(EqParamPacket, channel); OFF(EqParamPacket, band);
    OFF(EqParamPacket, type); OFF(EqParamPacket, freq);
    OFF(EqParamPacket, Q); OFF(EqParamPacket, gain_db);

    OFF(PresetSlot, magic); OFF(PresetSlot, version);
    OFF(PresetSlot, slot_index); OFF(PresetSlot, crc32);
    OFF(PresetSlot, filter_recipes); OFF(PresetSlot, preamp_db);
    OFF(PresetSlot, bypass); OFF(PresetSlot, delays_ms);
    OFF(PresetSlot, channel_gain_db); OFF(PresetSlot, channel_mute);
    OFF(PresetSlot, loudness_enabled); OFF(PresetSlot, loudness_ref_spl);
    OFF(PresetSlot, loudness_intensity_pct);
    OFF(PresetSlot, crossfeed_enabled); OFF(PresetSlot, crossfeed_preset);
    OFF(PresetSlot, crossfeed_itd_enabled);
    OFF(PresetSlot, crossfeed_custom_fc);
    OFF(PresetSlot, crossfeed_custom_feed_db);
    OFF(PresetSlot, matrix_crosspoints); OFF(PresetSlot, matrix_outputs);
    OFF(PresetSlot, output_pins); OFF(PresetSlot, channel_names);
    OFF(PresetSlot, output_types); OFF(PresetSlot, i2s_bck_pin);
    OFF(PresetSlot, i2s_mck_pin); OFF(PresetSlot, i2s_mck_enabled);
    OFF(PresetSlot, i2s_mck_multiplier);
    OFF(PresetSlot, leveller_enabled); OFF(PresetSlot, leveller_speed);
    OFF(PresetSlot, leveller_lookahead); OFF(PresetSlot, leveller_amount);
    OFF(PresetSlot, leveller_max_gain_db);
    OFF(PresetSlot, leveller_gate_threshold_db);
    OFF(PresetSlot, preamp_db_per_ch); OFF(PresetSlot, master_volume_db);

    OFF(PresetDirectory, magic); OFF(PresetDirectory, version);
    OFF(PresetDirectory, crc32); OFF(PresetDirectory, startup_mode);
    OFF(PresetDirectory, default_slot);
    OFF(PresetDirectory, last_active_slot);
    OFF(PresetDirectory, include_pins); OFF(PresetDirectory, slot_occupied);
    OFF(PresetDirectory, master_volume_mode);
    OFF(PresetDirectory, master_volume_db); OFF(PresetDirectory, slot_names);

    OFF(WireBulkParams, header); OFF(WireBulkParams, global);
    OFF(WireBulkParams, crossfeed); OFF(WireBulkParams, legacy);
    OFF(WireBulkParams, delays); OFF(WireBulkParams, crosspoints);
    OFF(WireBulkParams, outputs); OFF(WireBulkParams, pins);
    OFF(WireBulkParams, eq); OFF(WireBulkParams, channel_names);
    OFF(WireBulkParams, i2s_config); OFF(WireBulkParams, leveller);
    OFF(WireBulkParams, preamp); OFF(WireBulkParams, master_volume);

    P("val.SLOT_DATA_VERSION", SLOT_DATA_VERSION);
    P("val.DIR_VERSION_CURRENT", DIR_VERSION_CURRENT);
    P("val.WIRE_FORMAT_VERSION", WIRE_FORMAT_VERSION);
    P("val.NUM_CHANNELS", NUM_CHANNELS);
    P("val.NUM_OUTPUT_CHANNELS", NUM_OUTPUT_CHANNELS);
    P("val.NUM_PIN_OUTPUTS", NUM_PIN_OUTPUTS);
    return 0;
}
"""


def _extract_flash_structs() -> str:
    """Pull the packed struct definitions + version macros out of
    flash_storage.c (they live in the .c, not a header).  Extracted
    verbatim at test time so the probe always reflects the reference."""
    src = (REF / "flash_storage.c").read_text()
    start = src.index("typedef struct")
    end = src.index("} LegacyFlashStorage;") + len("} LegacyFlashStorage;")
    structs = src[start:end]
    macros = "\n".join(
        line for line in src.splitlines()
        if line.startswith("#define SLOT_DATA_VERSION")
        or line.startswith("#define DIR_VERSION_CURRENT"))
    # DIR_VERSION_CURRENT is defined between the structs in the .c;
    # drop duplicates by guarding
    return ("#ifndef FLASH_STRUCTS_H\n#define FLASH_STRUCTS_H\n"
            + macros + "\n" + structs + "\n#endif\n")


def _run_probe(tmp_path: Path, rp2350: bool) -> dict:
    d = tmp_path / ("rp2350" if rp2350 else "rp2040")
    d.mkdir()
    # (an identical duplicate #define from the extracted region is legal C)
    (d / "flash_structs.h").write_text(_extract_flash_structs())
    (d / "probe.c").write_text(PROBE_MAIN)
    exe = d / "probe"
    subprocess.run(
        ["gcc", "-o", str(exe), str(d / "probe.c"),
         f"-I{d}", f"-I{REF}", f"-DPICO_RP2350={1 if rp2350 else 0}"],
        check=True, capture_output=True)
    out = subprocess.run([str(exe)], check=True, capture_output=True,
                         text=True).stdout
    return {k: int(v) for k, v in
            (line.split("=") for line in out.strip().splitlines())}


class SlotWalk:
    """Mirror of encode_slot's pack sequence as cumulative offsets —
    the repo's *claimed* slot layout, to be measured against the C."""

    def __init__(self, nch, nout, npin):
        self.off = 12                      # magic/version/slot_index/crc32
        self.map = {"filter_recipes": 12}
        self.add("filter_recipes", nch * 12 * 16, at=12)
        self.add("preamp_db", 4)
        self.add("bypass", 1)
        self.add("_pad", 3)
        self.add("delays_ms", nch * 4)
        self.add("channel_gain_db", 12)
        self.add("channel_mute", 3)
        self.add("_pad2", 1)
        self.add("loudness_enabled", 1)
        self.add("_pad3", 3)
        self.add("loudness_ref_spl", 4)
        self.add("loudness_intensity_pct", 4)
        self.add("crossfeed_enabled", 1)
        self.add("crossfeed_preset", 1)
        self.add("crossfeed_itd_enabled", 1)
        self.add("_pad4", 1)
        self.add("crossfeed_custom_fc", 4)
        self.add("crossfeed_custom_feed_db", 4)
        self.add("matrix_crosspoints", 2 * nout * 8)
        self.add("matrix_outputs", nout * 12)
        self.add("output_pins", npin)
        self.add("_pinpad", 8 - npin)
        self.add("channel_names", nch * 32)
        self.add("output_types", 4)
        self.add("i2s_bck_pin", 1)
        self.add("i2s_mck_pin", 1)
        self.add("i2s_mck_enabled", 1)
        self.add("i2s_mck_multiplier", 1)
        self.add("leveller_enabled", 1)
        self.add("leveller_speed", 1)
        self.add("leveller_lookahead", 1)
        self.add("_lpad", 1)
        self.add("leveller_amount", 4)
        self.add("leveller_max_gain_db", 4)
        self.add("leveller_gate_threshold_db", 4)
        self.add("preamp_db_per_ch", 8)
        self.add("master_volume_db", 4)

    def add(self, name, size, at=None):
        if at is not None:
            self.off = at
        self.map[name] = self.off
        self.off += size


@pytest.mark.parametrize("rp2350", [True, False],
                         ids=["rp2350", "rp2040"])
def test_slot_and_dir_layout_matches_reference_structs(tmp_path, rp2350):
    from dspi_tpu.core import constants as C
    from dspi_tpu.core.constants import Platform
    from dspi_tpu.io import wire

    got = _run_probe(tmp_path, rp2350)
    plat = Platform.RP2350 if rp2350 else Platform.RP2040
    nch = C.NUM_CHANNELS[plat]
    nout = C.NUM_OUTPUT_CHANNELS[plat]
    npin = {Platform.RP2350: 5, Platform.RP2040: 3}[plat]

    assert got["val.NUM_CHANNELS"] == nch
    assert got["val.NUM_OUTPUT_CHANNELS"] == nout
    assert got["val.NUM_PIN_OUTPUTS"] == npin
    assert got["val.SLOT_DATA_VERSION"] == C.PRESET_SLOT_VERSION
    assert got["val.DIR_VERSION_CURRENT"] == C.PRESET_DIR_VERSION
    assert got["val.WIRE_FORMAT_VERSION"] == C.BULK_WIRE_VERSION

    # EqParamPacket: the repo's _EQ_FMT "<BBBBfff"
    assert got["sizeof.EqParamPacket"] == struct.calcsize(wire._EQ_FMT) == 16
    assert got["EqParamPacket.freq"] == 4
    assert got["EqParamPacket.Q"] == 8
    assert got["EqParamPacket.gain_db"] == 12
    assert got["sizeof.FlashMatrixCrosspoint"] == \
        struct.calcsize(wire._XP_FMT) == 8
    assert got["sizeof.FlashOutputChannel"] == \
        struct.calcsize(wire._OUT_FMT) == 12

    # PresetSlot: every field offset vs the encode_slot pack walk
    assert got["sizeof.PresetSlot"] == 12 + wire.slot_data_size(plat)
    walk = SlotWalk(nch, nout, npin)
    assert walk.off == got["sizeof.PresetSlot"]   # walk covers the struct
    for name, off in walk.map.items():
        if name.startswith("_"):
            continue
        assert got[f"PresetSlot.{name}"] == off, name

    # PresetDirectory v2: header 12 + _DIR_BODY_V2 + names
    assert got["PresetDirectory.startup_mode"] == 12
    assert got["PresetDirectory.default_slot"] == 13
    assert got["PresetDirectory.last_active_slot"] == 14
    assert got["PresetDirectory.include_pins"] == 15
    assert got["PresetDirectory.slot_occupied"] == 16
    assert got["PresetDirectory.master_volume_mode"] == 18
    assert got["PresetDirectory.master_volume_db"] == 20
    assert got["PresetDirectory.slot_names"] == \
        12 + struct.calcsize(wire._DIR_BODY_V2)
    assert got["sizeof.PresetDirectory"] == \
        12 + struct.calcsize(wire._DIR_BODY_V2) \
        + C.PRESET_SLOTS * C.PRESET_NAME_LEN


@pytest.mark.parametrize("rp2350", [True], ids=["any"])
def test_bulk_wire_layout_matches_reference_structs(tmp_path, rp2350):
    """WireBulkParams section offsets vs encode_bulk's pack walk (the
    bulk format is platform-independent, padded to RP2350 maxima)."""
    from dspi_tpu.io import wire

    got = _run_probe(tmp_path, rp2350)
    assert got["sizeof.WireBulkParams"] == wire.WIRE_SIZE == 2896

    # section offsets implied by encode_bulk's sequence of packs
    off = {}
    o = 0
    for name, size in [
            ("header", 16), ("global", 16), ("crossfeed", 16),
            ("legacy", 16), ("delays", 4 * wire.WIRE_MAX_CHANNELS),
            ("crosspoints", 2 * wire.WIRE_MAX_OUTPUTS * 8),
            ("outputs", wire.WIRE_MAX_OUTPUTS * 12), ("pins", 8),
            ("eq", wire.WIRE_MAX_CHANNELS * wire.WIRE_MAX_BANDS * 16),
            ("channel_names", wire.WIRE_MAX_CHANNELS * 32),
            ("i2s_config", 16), ("leveller", 16), ("preamp", 16),
            ("master_volume", 16)]:
        off[name] = o
        o += size
    assert o == wire.WIRE_SIZE
    for name, o in off.items():
        assert got[f"WireBulkParams.{name}"] == o, name
