"""Preset/bulk wire codecs: sizes, round trips, CRC, migration."""

import struct

import numpy as np
import pytest

from dspi_tpu import DeviceConfig, Platform
from dspi_tpu.core import constants as C
from dspi_tpu.io import presets, wire

from util import rich_config


def test_crc32_matches_firmware_algorithm():
    # literal bit-by-bit implementation of flash_storage.c:282-291
    def ref_crc(data):
        crc = 0xFFFFFFFF
        for byte in data:
            crc ^= byte
            for _ in range(8):
                crc = (crc >> 1) ^ (0xEDB88320 & (0xFFFFFFFF if crc & 1 else 0))
        return crc ^ 0xFFFFFFFF

    data = bytes(range(256)) + b"DSPi"
    assert wire.crc32(data) == ref_crc(data)


@pytest.mark.parametrize("platform", [Platform.RP2350, Platform.RP2040])
def test_slot_roundtrip(platform):
    cfg = rich_config(platform)
    cfg.channel_names[0] = "Front L"
    cfg.master_volume_db = -12.0
    raw = wire.encode_slot(cfg, 3)
    s = wire.decode_slot(raw, platform, 3)
    assert s is not None and s.version == C.PRESET_SLOT_VERSION

    cfg2 = DeviceConfig(platform=platform)
    wire.apply_slot(cfg2, s, include_pins=True)
    assert cfg2.preamp_db == pytest.approx(cfg.preamp_db)
    assert cfg2.master_volume_db is not None
    assert cfg2.leveller.amount == pytest.approx(cfg.leveller.amount)
    assert cfg2.crossfeed.preset == cfg.crossfeed.preset
    assert cfg2.channel_names[0] == "Front L"
    for o in range(cfg.num_outputs):
        assert cfg2.outputs[o].enabled == cfg.outputs[o].enabled
        assert cfg2.outputs[o].gain_db == pytest.approx(cfg.outputs[o].gain_db)
        assert cfg2.outputs[o].delay_ms == pytest.approx(cfg.outputs[o].delay_ms)
    for ch in range(cfg.num_channels):
        for b in range(C.MAX_BANDS):
            assert cfg2.eq[ch][b].type == cfg.eq[ch][b].type
            assert cfg2.eq[ch][b].freq == pytest.approx(cfg.eq[ch][b].freq)


def test_slot_crc_rejects_corruption():
    cfg = rich_config(Platform.RP2350)
    raw = bytearray(wire.encode_slot(cfg, 0))
    raw[100] ^= 0xFF
    assert wire.decode_slot(bytes(raw), Platform.RP2350, 0) is None


def test_slot_wrong_index_rejected():
    cfg = rich_config(Platform.RP2350)
    raw = wire.encode_slot(cfg, 2)
    assert wire.decode_slot(raw, Platform.RP2350, 3) is None
    assert wire.decode_slot(raw, Platform.RP2350, 2) is not None


def test_directory_roundtrip_and_v1_migration():
    d = wire.Directory(startup_mode=1, default_slot=2, last_active_slot=5,
                       include_pins=0, slot_occupied=0b1010101,
                       master_volume_mode=1, master_volume_db=-14.5)
    d.slot_names[5] = "Movie night"
    raw = wire.encode_directory(d)
    d2 = wire.decode_directory(raw)
    assert d2.slot_occupied == d.slot_occupied
    assert d2.slot_names[5] == "Movie night"
    assert d2.master_volume_db == pytest.approx(-14.5)

    # Build a v1 directory image (flash_storage.c:96-110)
    body = struct.pack("<BBBBHBB", 0, 1, 4, 1, 0x0012, 1, 0)
    names = b""
    for i in range(C.PRESET_SLOTS):
        nm = (f"slot{i}".encode() + b"\x00" * 32)[:32]
        names += nm
    body += names
    v1 = struct.pack("<IHHI", C.PRESET_MAGIC_DIR, 1, 0, wire.crc32(body)) + body
    d3 = wire.decode_directory(v1)
    assert d3 is not None
    assert d3.master_volume_mode == C.MASTER_VOLUME_MODE_WITH_PRESET
    assert d3.master_volume_db == pytest.approx(C.MASTER_VOL_DEFAULT_DB)
    assert d3.slot_names[4] == "slot4"


@pytest.mark.parametrize("platform", [Platform.RP2350, Platform.RP2040])
def test_bulk_roundtrip(platform):
    cfg = rich_config(platform)
    raw = wire.encode_bulk(cfg)
    assert len(raw) == 2896

    cfg2 = DeviceConfig(platform=platform)
    assert wire.apply_bulk(cfg2, raw) == 0
    assert cfg2.preamp_db == pytest.approx(cfg.preamp_db)
    assert cfg2.crossfeed.preset == cfg.crossfeed.preset
    assert cfg2.leveller.speed == cfg.leveller.speed
    for o in range(cfg.num_outputs):
        assert cfg2.outputs[o].gain_db == pytest.approx(cfg.outputs[o].gain_db)
    # Taylor quirk: linear gain differs from powf beyond ~10 dB
    assert cfg2.outputs[2].gain_linear == pytest.approx(
        wire.db_to_linear_taylor(cfg.outputs[2].gain_db))


def test_bulk_platform_mismatch_rejected():
    cfg = rich_config(Platform.RP2350)
    raw = wire.encode_bulk(cfg)
    cfg2 = DeviceConfig(platform=Platform.RP2040)
    assert wire.apply_bulk(cfg2, raw) != 0


def test_preset_store_save_load_delete():
    store = presets.PresetStore(Platform.RP2350)
    cfg = rich_config(Platform.RP2350)
    assert store.save(4, cfg) == presets.PRESET_OK
    assert store.set_name(4, "Reference") == presets.PRESET_OK
    assert store.get_active() == 4

    cfg2 = DeviceConfig(platform=Platform.RP2350)
    assert store.load(4, cfg2) == presets.PRESET_OK
    assert cfg2.leveller.amount == pytest.approx(cfg.leveller.amount)
    assert store.get_name(4) == "Reference"

    # load of an empty slot applies factory defaults
    cfg3 = rich_config(Platform.RP2350)
    assert store.load(7, cfg3) == presets.PRESET_OK
    assert cfg3.leveller.enabled is False
    assert cfg3.outputs[2].enabled is False

    # deleting the active slot restores factory defaults
    store.load(4, cfg2)
    assert store.delete(4, cfg2) == presets.PRESET_OK
    assert cfg2.crossfeed.enabled is False


def test_preset_store_boot_and_image_roundtrip():
    store = presets.PresetStore(Platform.RP2040)
    cfg = rich_config(Platform.RP2040)
    store.save(2, cfg)
    store.set_startup(0, 2)
    image = bytes(store.image)

    # a fresh store over the same image boots into slot 2
    store2 = presets.PresetStore(Platform.RP2040, image=image)
    cfg2 = DeviceConfig(platform=Platform.RP2040)
    store2.boot_load(cfg2)
    assert cfg2.leveller.amount == pytest.approx(cfg.leveller.amount)
    assert store2.get_active() == 2


def test_legacy_migration():
    """A DSP1 legacy sector is migrated into slot 0 at boot."""
    platform = Platform.RP2040
    cfg = rich_config(platform, leveller=False)
    # Build legacy sector: header + data section (same layout prefix)
    full = wire.encode_slot(cfg, 0)
    nch, nout, npin, _ = wire._geom(platform)
    legacy_len = (nch * C.MAX_BANDS * 16 + 8 + nch * 4 + 16 + 12 + 12
                  + 2 * nout * 8 + nout * 12 + 8)
    data = full[12:12 + legacy_len]
    legacy = struct.pack("<IHHI", C.PRESET_MAGIC_LEGACY, 6, 0,
                         wire.crc32(data)) + data

    store = presets.PresetStore(platform)
    store.image[11 * wire.SECTOR_SIZE:11 * wire.SECTOR_SIZE + len(legacy)] = legacy
    cfg2 = DeviceConfig(platform=platform)
    store.boot_load(cfg2)
    assert store.dir.slot_occupied == 1
    assert store.get_name(0) == "Migrated"
    # v6 slot: leveller falls back to defaults, names to defaults
    assert cfg2.leveller.enabled is False
    assert cfg2.crossfeed.preset == cfg.crossfeed.preset
    assert cfg2.outputs[2].gain_db == pytest.approx(cfg.outputs[2].gain_db)
