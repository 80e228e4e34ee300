"""ctypes binding for the native host library (native/dspi_host.cpp).

Builds the shared library on first use (g++ via make), then exposes the
packet (de)framing and the fast exact oracle.  All entry points degrade
gracefully: ``available()`` is False if no toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

# repo-relative by default; DSPI_NATIVE_DIR points installed packages at
# a checkout of native/ (the library is the test oracle + host framing
# helpers — optional at runtime by design)
_NATIVE_DIR = Path(os.environ.get(
    "DSPI_NATIVE_DIR",
    Path(__file__).resolve().parent.parent / "native"))
_LIB_PATH = _NATIVE_DIR / "libdspi_host.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB_PATH.exists() or (
                _LIB_PATH.stat().st_mtime
                < (_NATIVE_DIR / "dspi_host.cpp").stat().st_mtime):
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
    except (OSError, subprocess.CalledProcessError):
        return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.dspi_q28_mul.restype = ctypes.c_int32
    lib.dspi_q28_mul.argtypes = [ctypes.c_int32, ctypes.c_int32]
    lib.dspi_q15_mul.restype = ctypes.c_int32
    lib.dspi_q15_mul.argtypes = [ctypes.c_int32, ctypes.c_int32]
    lib.dspi_crc32.restype = ctypes.c_uint32
    lib.dspi_crc32.argtypes = [u8p, ctypes.c_uint64]
    lib.dspi_unpack_s16.argtypes = [u8p, ctypes.c_int64, i32p, i32p]
    lib.dspi_unpack_s24.argtypes = [u8p, ctypes.c_int64, i32p, i32p]
    lib.dspi_pack_s24.argtypes = [i32p, i32p, ctypes.c_int64, u8p]
    lib.dspi_to_time_major.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64, i32p]
    lib.dspi_deframe_s16_batch.argtypes = [u8p, ctypes.c_int64,
                                           ctypes.c_int64, ctypes.c_int64,
                                           i32p, ctypes.c_int32]
    lib.dspi_deframe_s24_batch.argtypes = [u8p, ctypes.c_int64,
                                           ctypes.c_int64, ctypes.c_int64,
                                           i32p, ctypes.c_int32]
    lib.dspi_q28_cascade_block.argtypes = [i32p, i32p, ctypes.c_int32, i32p,
                                           ctypes.c_int64]
    lib.dspi_pdm_block.argtypes = [i32p, i32p, ctypes.c_int64, u32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _u8p(a):
    return (ctypes.c_uint8 * len(a)).from_buffer_copy(a)


def unpack_s16(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Interleaved s16 LRLR bytes -> (left, right) int32 arrays."""
    lib = _load()
    frames = len(data) // 4
    out_l = np.empty(frames, np.int32)
    out_r = np.empty(frames, np.int32)
    lib.dspi_unpack_s16(_u8p(data), frames, _i32p(out_l), _i32p(out_r))
    return out_l, out_r


def unpack_s24(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Packed s24 LRLR bytes (6 B/frame) -> (left, right) int32 arrays."""
    lib = _load()
    frames = len(data) // 6
    out_l = np.empty(frames, np.int32)
    out_r = np.empty(frames, np.int32)
    lib.dspi_unpack_s24(_u8p(data), frames, _i32p(out_l), _i32p(out_r))
    return out_l, out_r


def pack_s24(left: np.ndarray, right: np.ndarray) -> bytes:
    lib = _load()
    left = np.ascontiguousarray(left, np.int32)
    right = np.ascontiguousarray(right, np.int32)
    out = np.empty(len(left) * 6, np.uint8)
    lib.dspi_pack_s24(_i32p(left), _i32p(right), len(left),
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.tobytes()


def deframe_batch(payloads: np.ndarray, npkt: int, block: int,
                  bit_depth: int = 16, n_threads: int = 0) -> np.ndarray:
    """Batched USB-byte deframe straight into the engine's input layout.

    ``payloads``: uint8 [B, npkt*block*bpf] — each row one stream's raw
    USB payload byte stream (bpf = 4 for interleaved s16 LRLR, 6 for
    packed s24 LRLR; unpack semantics usb_audio.c:591-594 / 997-1006).
    Returns int32 [npkt, 2, block, B] ready for ``Engine.process`` /
    ``device_put`` — deframe, channel split, packetization and the lane
    transpose fused in one multithreaded native pass.

    ``n_threads`` 0 = DSPI_NATIVE_THREADS env or all cores."""
    lib = _load()
    bpf = 6 if bit_depth == 24 else 4
    payloads = np.ascontiguousarray(payloads, np.uint8)
    b, nbytes = payloads.shape
    if nbytes != npkt * block * bpf:
        raise ValueError(f"payload rows carry {nbytes} bytes; "
                         f"npkt*block*bpf = {npkt * block * bpf}")
    if not n_threads:
        n_threads = int(os.environ.get("DSPI_NATIVE_THREADS", 0)) \
            or (os.cpu_count() or 1)
    out = np.empty((npkt, 2, block, b), np.int32)
    fn = (lib.dspi_deframe_s24_batch if bit_depth == 24
          else lib.dspi_deframe_s16_batch)
    fn(payloads.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
       b, npkt, block, _i32p(out), n_threads)
    return out


def to_time_major(planar: np.ndarray) -> np.ndarray:
    """[B, T] int32 -> [T, B] int32 via the native transpose."""
    lib = _load()
    planar = np.ascontiguousarray(planar, np.int32)
    b, t = planar.shape
    out = np.empty((t, b), np.int32)
    lib.dspi_to_time_major(_i32p(planar), b, t, _i32p(out))
    return out


def q28_mul(a: int, b: int) -> int:
    return _load().dspi_q28_mul(a, b)


def q15_mul(a: int, b: int) -> int:
    return _load().dspi_q15_mul(a, b)


def crc32(data: bytes) -> int:
    return _load().dspi_crc32(_u8p(data), len(data))


def q28_cascade_block(coeffs: np.ndarray, state: np.ndarray,
                      samples: np.ndarray) -> None:
    """In-place Q28 TDF2 cascade. coeffs [bands,5], state [bands,2] (updated),
    samples [count] (updated)."""
    lib = _load()
    coeffs = np.ascontiguousarray(coeffs, np.int32)
    assert state.dtype == np.int32 and samples.dtype == np.int32
    lib.dspi_q28_cascade_block(_i32p(coeffs), _i32p(state), coeffs.shape[0],
                               _i32p(samples), len(samples))


def pdm_block(state: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Delta-sigma modulate a block.  state: int32[9]
    [err, err2, x1, x2, y1, y2, err_acc, rng, fade] (updated in place);
    x: int32 [count] Q28.  Returns uint32 [count*8] PDM words."""
    lib = _load()
    assert state.dtype == np.int32 and len(state) == 9
    x = np.ascontiguousarray(x, np.int32)
    out = np.empty(len(x) * 8, np.uint32)
    lib.dspi_pdm_block(_i32p(state), _i32p(x), len(x),
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return out


# ---------------------------------------------------------------------------
# firmware-float oracle binding
# ---------------------------------------------------------------------------


def _bind_fw(lib):
    if getattr(lib, "_fw_bound", False):
        return
    import ctypes as ct

    f32p = ct.POINTER(ct.c_float)
    i32p = ct.POINTER(ct.c_int32)
    u8p = ct.POINTER(ct.c_uint8)
    u32p = ct.POINTER(ct.c_uint32)
    lib.dspi_fw_new.restype = ct.c_void_p
    lib.dspi_fw_new.argtypes = [ct.c_float, ct.c_int, ct.c_int, ct.c_int,
                                ct.c_int]
    lib.dspi_fw_free.argtypes = [ct.c_void_p]
    lib.dspi_fw_set_eq.argtypes = [ct.c_void_p, i32p, f32p, ct.c_int]
    lib.dspi_fw_set_loudness.argtypes = [ct.c_void_p, ct.c_int, f32p, i32p]
    lib.dspi_fw_set_gains.argtypes = [ct.c_void_p, f32p, ct.c_float,
                                      ct.c_int, ct.c_int, f32p, u8p, u8p,
                                      f32p, u8p, u8p, i32p]
    lib.dspi_fw_set_gains_raw.argtypes = [ct.c_void_p, f32p, ct.c_float,
                                          ct.c_int, ct.c_int, f32p, f32p,
                                          u8p, u8p, i32p]
    lib.dspi_fw_set_leveller.argtypes = [ct.c_void_p, ct.c_int, ct.c_float,
                                         ct.c_int, ct.c_float, ct.c_float,
                                         ct.c_int]
    lib.dspi_fw_set_leveller_raw.argtypes = [ct.c_void_p, ct.c_int, ct.c_int] \
        + [ct.c_float] * 9
    lib.dspi_fw_set_crossfeed.argtypes = [ct.c_void_p, ct.c_int, ct.c_int,
                                          ct.c_float, ct.c_float, ct.c_int]
    lib.dspi_fw_set_crossfeed_raw.argtypes = [ct.c_void_p, ct.c_int,
                                              ct.c_float, ct.c_float,
                                              ct.c_float]
    lib.dspi_fw_enable_pdm.argtypes = [ct.c_void_p, ct.c_int, ct.c_int]
    lib.dspi_fw_process.argtypes = [ct.c_void_p, i32p, ct.c_int, ct.c_int,
                                    ct.c_int, f32p, u32p]
    lib.dspi_fw_db_to_linear.restype = ct.c_float
    lib.dspi_fw_db_to_linear.argtypes = [ct.c_float]
    lib.dspi_fw_compute_alpha.restype = ct.c_float
    lib.dspi_fw_compute_alpha.argtypes = [ct.c_float, ct.c_float]
    lib._fw_bound = True


def _f32p(a):
    import ctypes as ct

    return a.ctypes.data_as(ct.POINTER(ct.c_float))


def _u8arr(a):
    import ctypes as ct

    a = np.ascontiguousarray(a, np.uint8)
    return a, a.ctypes.data_as(ct.POINTER(ct.c_uint8))


class FirmwareFloat:
    """The RP2350 float chain with the firmware's own math classes (libm
    transcendentals, hardware division) — the measured side of the <=1e-6
    RMS fidelity gate.  ``coeff_source='design'`` (default) loads the same
    coefficient values the golden model uses so the comparison isolates
    runtime signal-path math; ``coeff_source='native'`` re-derives
    leveller/crossfeed/gain coefficients with libm (firmware derivation
    path) for coefficient-fidelity measurement."""

    def __init__(self, cfg, pdm: bool = True, pdm_fade: bool = True,
                 coeff_source: str = "design"):
        from .chain.pack import build_params, build_static
        from .params.design import derive

        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        _bind_fw(lib)
        self._lib = lib
        d = derive(cfg)
        static = build_static(d, block_size=48)  # block size irrelevant here
        params = build_params(d, static)
        nch, nb = static.n_channels, params.eq_f32.shape[1]
        nout = static.n_outputs
        self.nout = nout
        self._p = lib.dspi_fw_new(float(cfg.sample_rate), nout,
                                  static.n_spdif, nch, nb)

        kinds = np.zeros((nch, nb), np.int32)
        for ch in range(nch):
            for b, k in enumerate(static.band_kinds[ch]):
                kinds[ch, b] = k
        coef = np.ascontiguousarray(params.eq_f32, np.float32)
        lib.dspi_fw_set_eq(self._p, _i32p(kinds), _f32p(coef),
                           int(static.bypass_master_eq))

        if static.loudness_on:
            lc = np.ascontiguousarray(params.loud_sva, np.float32)
            lb = np.ascontiguousarray(params.loud_bypass, np.int32)
            lib.dspi_fw_set_loudness(self._p, 1, _f32p(lc), _i32p(lb))

        g = d.gains
        out_en = np.array(g.output_enabled, np.uint8)
        out_mute = np.array(g.output_mute, np.uint8)
        dly = np.ascontiguousarray(g.delay_samples, np.int32)
        if coeff_source == "design":
            pre = np.ascontiguousarray(g.preamp_linear, np.float32)
            mat = np.ascontiguousarray(g.matrix_gain, np.float32)
            og = np.ascontiguousarray(g.output_gain_linear, np.float32)
            _, en_p = _u8arr(out_en)
            _, mu_p = _u8arr(out_mute)
            lib.dspi_fw_set_gains_raw(
                self._p, _f32p(pre), float(g.master_volume_linear),
                int(g.host_vol_mul), int(bool(cfg.host_mute)),
                _f32p(mat), _f32p(og), en_p, mu_p, _i32p(dly))
            lv = d.leveller
            lib.dspi_fw_set_leveller_raw(
                self._p, int(cfg.leveller.enabled), int(cfg.leveller.lookahead),
                float(lv.alpha_rms), float(lv.alpha_attack),
                float(lv.alpha_release), float(lv.threshold_db),
                float(lv.knee_width_db), float(lv.gate_threshold_db),
                float(lv.ratio), float(lv.max_gain_db), float(lv.makeup_db))
            xf = d.crossfeed
            lib.dspi_fw_set_crossfeed_raw(
                self._p, int(xf.enabled), float(xf.lp_a0), float(xf.lp_b1),
                float(xf.ap_a))
        else:
            pre_db = np.array(cfg.preamp_db, np.float32)
            mat_db = np.zeros((2, nout), np.float32)
            mat_en = np.zeros((2, nout), np.uint8)
            mat_inv = np.zeros((2, nout), np.uint8)
            for i in range(2):
                for o in range(nout):
                    xp = cfg.crosspoints[i][o]
                    mat_db[i, o] = xp.gain_db
                    mat_en[i, o] = xp.enabled
                    mat_inv[i, o] = xp.phase_invert
            og_db = np.array([o.gain_db for o in cfg.outputs], np.float32)
            _, en_p = _u8arr(out_en)
            _, mu_p = _u8arr(out_mute)
            me, me_p = _u8arr(mat_en)
            mi, mi_p = _u8arr(mat_inv)
            lib.dspi_fw_set_gains(
                self._p, _f32p(pre_db), float(cfg.master_volume_db),
                int(g.host_vol_mul), int(bool(cfg.host_mute)),
                _f32p(mat_db), me_p, mi_p, _f32p(og_db), en_p, mu_p,
                _i32p(dly))
            lib.dspi_fw_set_leveller(
                self._p, int(cfg.leveller.enabled), float(cfg.leveller.amount),
                int(cfg.leveller.speed), float(cfg.leveller.gate_threshold_db),
                float(cfg.leveller.max_gain_db), int(cfg.leveller.lookahead))
            lib.dspi_fw_set_crossfeed(
                self._p, int(cfg.crossfeed.enabled), int(cfg.crossfeed.preset),
                float(cfg.crossfeed.custom_fc),
                float(cfg.crossfeed.custom_feed_db),
                int(cfg.crossfeed.itd_enabled))

        self.pdm_on = bool(pdm and g.output_enabled[nout - 1])
        lib.dspi_fw_enable_pdm(self._p, int(self.pdm_on), int(pdm_fade))

    def process(self, x: np.ndarray, bit_depth: int = 16):
        """x: int32 [npkt, 2, T] one stream.  Returns (out float32
        [npkt, nout, T], pdm_words uint32 [npkt*T, 8] or None)."""
        import ctypes as ct

        npkt, _, T = x.shape
        x = np.ascontiguousarray(x, np.int32)
        out = np.empty((npkt, self.nout, T), np.float32)
        words = (np.empty((npkt * T, 8), np.uint32) if self.pdm_on else None)
        wp = (words.ctypes.data_as(ct.POINTER(ct.c_uint32))
              if words is not None else None)
        self._lib.dspi_fw_process(self._p, _i32p(x), npkt, T,
                                  int(bit_depth == 24), _f32p(out), wp)
        return out, words

    def __del__(self):
        try:
            self._lib.dspi_fw_free(self._p)
        except Exception:
            pass


def _bind_fwq(lib):
    if getattr(lib, "_fwq_bound", False):
        return
    import ctypes as ct

    f32p = ct.POINTER(ct.c_float)
    i32p = ct.POINTER(ct.c_int32)
    u8p = ct.POINTER(ct.c_uint8)
    u32p = ct.POINTER(ct.c_uint32)
    lib.dspi_fwq_new.restype = ct.c_void_p
    lib.dspi_fwq_new.argtypes = [ct.c_float] + [ct.c_int] * 4
    lib.dspi_fwq_free.argtypes = [ct.c_void_p]
    lib.dspi_fwq_set_eq.argtypes = [ct.c_void_p, i32p, i32p, ct.c_int, u8p]
    lib.dspi_fwq_set_loudness.argtypes = [ct.c_void_p, ct.c_int, i32p, i32p]
    lib.dspi_fwq_set_gains.argtypes = [ct.c_void_p, i32p, ct.c_int, ct.c_int,
                                       ct.c_int, i32p, f32p, u8p, u8p, i32p]
    lib.dspi_fwq_set_leveller_raw.argtypes = \
        [ct.c_void_p, ct.c_int, ct.c_int] + [ct.c_float] * 9
    lib.dspi_fwq_set_crossfeed.argtypes = [ct.c_void_p, ct.c_int,
                                           ct.c_int32, ct.c_int32,
                                           ct.c_int32]
    lib.dspi_fwq_enable_pdm.argtypes = [ct.c_void_p, ct.c_int, ct.c_int]
    lib.dspi_fwq_process.argtypes = [ct.c_void_p, i32p, ct.c_int, ct.c_int,
                                     ct.c_int, f32p, i32p, u32p]
    lib._fwq_bound = True


class FirmwareQ28:
    """The FULL RP2040 Q28 chain with the firmware's exact arithmetic:
    integer Q28/Q15 signal path, *libm* log10f/powf and hardware float
    division in the leveller's gain computer and limiter
    (leveller.c:264-389).  The measured side of the "Q28 path bit-exact"
    gate — unlike the golden twin, this does NOT share the repo's
    deterministic fmath, so a libm-ulp-induced Q28 gain LSB flip shows up
    as a word difference (tests/test_fw_oracle.py reports the rate).

    Coefficients are the same quantized integers ChainParams carries, so
    the comparison isolates the runtime signal path."""

    def __init__(self, cfg, pdm: bool = True, pdm_fade: bool = True):
        from .chain.pack import build_params, build_static
        from .core import constants as C
        from .params.design import derive

        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        _bind_fwq(lib)
        self._lib = lib
        d = derive(cfg)
        static = build_static(d, block_size=48)
        assert not static.is_float, "FirmwareQ28 is the RP2040 oracle"
        params = build_params(d, static)
        nch, nb = static.n_channels, params.eq_q28.shape[1]
        nout = static.n_outputs
        self.nout = nout
        self._p = lib.dspi_fwq_new(float(cfg.sample_rate), nout,
                                   static.n_spdif, nch, nb)

        kinds = np.zeros((nch, nb), np.int32)
        for ch in range(nch):
            for b, k in enumerate(static.band_kinds[ch]):
                kinds[ch, b] = k
        coef = np.ascontiguousarray(params.eq_q28, np.int32)
        chb = np.array(static.channel_bypassed, np.uint8)
        _, chb_p = _u8arr(chb)
        lib.dspi_fwq_set_eq(self._p, _i32p(kinds), _i32p(coef),
                            int(static.bypass_master_eq), chb_p)

        if static.loudness_on:
            lc = np.ascontiguousarray(params.loud_qbq, np.int32)
            lb = np.ascontiguousarray(params.loud_bypass, np.int32)
            lib.dspi_fwq_set_loudness(self._p, 1, _i32p(lc), _i32p(lb))

        g = d.gains
        pre = np.ascontiguousarray(params.unpack_gain, np.int32)
        mat = np.ascontiguousarray(params.matrix_gain, np.int32)
        og = np.ascontiguousarray(params.out_gain, np.float32)
        out_en = np.array(g.output_enabled, np.uint8)
        out_mute = np.array(g.output_mute, np.uint8)
        _, en_p = _u8arr(out_en)
        _, mu_p = _u8arr(out_mute)
        mask = C.MAX_DELAY_SAMPLES[cfg.platform] - 1
        dly = np.array([int(s) & mask for s in g.delay_samples], np.int32)
        lib.dspi_fwq_set_gains(
            self._p, _i32p(pre), int(g.master_volume_q15),
            int(g.host_vol_mul), int(bool(cfg.host_mute)), _i32p(mat),
            _f32p(og), en_p, mu_p, _i32p(dly))

        lv = d.leveller
        lib.dspi_fwq_set_leveller_raw(
            self._p, int(cfg.leveller.enabled), int(cfg.leveller.lookahead),
            float(lv.alpha_rms), float(lv.alpha_attack),
            float(lv.alpha_release), float(lv.threshold_db),
            float(lv.knee_width_db), float(lv.gate_threshold_db),
            float(lv.ratio), float(lv.max_gain_db), float(lv.makeup_db))

        if d.crossfeed.enabled:
            xf = np.asarray(params.xf, np.int32)
            lib.dspi_fwq_set_crossfeed(self._p, 1, int(xf[0]), int(xf[1]),
                                       int(xf[2]))

        self.pdm_on = bool(pdm and g.output_enabled[nout - 1])
        lib.dspi_fwq_enable_pdm(self._p, int(self.pdm_on), int(pdm_fade))

    def process(self, x: np.ndarray, bit_depth: int = 16,
                preset_mute: np.ndarray | None = None):
        """x: int32 [npkt, 2, T] one stream.  Returns (out int32 Q28
        [npkt, nout, T], pdm_words uint32 [npkt*T, 8] or None)."""
        import ctypes as ct

        npkt, _, T = x.shape
        x = np.ascontiguousarray(x, np.int32)
        out = np.empty((npkt, self.nout, T), np.int32)
        words = (np.empty((npkt * T, 8), np.uint32) if self.pdm_on else None)
        wp = (words.ctypes.data_as(ct.POINTER(ct.c_uint32))
              if words is not None else None)
        pm = (np.ascontiguousarray(preset_mute, np.float32)
              if preset_mute is not None else None)
        self._lib.dspi_fwq_process(
            self._p, _i32p(x), npkt, T, int(bit_depth == 24),
            _f32p(pm) if pm is not None else None, _i32p(out), wp)
        return out, words

    def __del__(self):
        try:
            self._lib.dspi_fwq_free(self._p)
        except Exception:
            pass


def fw_db_to_linear(db: float) -> float:
    lib = _load()
    _bind_fw(lib)
    return lib.dspi_fw_db_to_linear(np.float32(db))


def fw_compute_alpha(rate: float, t: float) -> float:
    lib = _load()
    _bind_fw(lib)
    return lib.dspi_fw_compute_alpha(np.float32(rate), np.float32(t))
