// dspi_host — native host-side data plane + fast exact oracle for dspi_tpu.
//
// The reference firmware's native layers are its hot DSP loops (ARM asm) and
// its IO machinery (USB stack, DMA drivers).  On the TPU rebuild the DSP hot
// path lives on the accelerator; the native layer here covers what remains on
// the host:
//
//   * USB-style packet (de)framing: interleaved s16 / packed s24 byte streams
//     <-> planar time-major int32 planes for device upload, batched across
//     streams (semantics of usb_audio.c:590-686 / 996-1015 unpack).
//   * A fast bit-exact Q28 oracle (biquad cascade block, fast_mul_q28/q15,
//     delta-sigma PDM modulator) used by large-scale fuzz tests where the
//     Python golden model is too slow.  Semantics: dsp_pipeline.c:47-59,
//     dsp_process_rp2040.S:263-365, pdm_generator.c:62-108,349-397.
//   * CRC32 (poly 0xEDB88320) for flash-image scans (flash_storage.c:282-291).
//
// Exposed as a plain C ABI for ctypes.  Everything is int32 two's-complement
// wrap-around arithmetic, matching the Cortex-M cores exactly.

#include <cstdint>
#include <cstring>

#define API extern "C" __attribute__((visibility("default")))

static inline int32_t wrap_add(int32_t a, int32_t b) {
    return (int32_t)((uint32_t)a + (uint32_t)b);
}
static inline int32_t wrap_sub(int32_t a, int32_t b) {
    return (int32_t)((uint32_t)a - (uint32_t)b);
}
static inline int32_t wrap_mul(int32_t a, int32_t b) {
    return (int32_t)((uint32_t)a * (uint32_t)b);
}

// ---------------------------------------------------------------------------
// exact fixed-point primitives
// ---------------------------------------------------------------------------

API int32_t dspi_q28_mul(int32_t a, int32_t b) {
    int32_t ah = a >> 16;
    uint32_t al = (uint32_t)(a & 0xFFFF);
    int32_t bh = b >> 16;
    uint32_t bl = (uint32_t)(b & 0xFFFF);
    int32_t high = (int32_t)((uint32_t)ah * (uint32_t)bh);
    int32_t mid = wrap_add((int32_t)((uint32_t)ah * bl),
                           (int32_t)(al * (uint32_t)bh));
    return wrap_add((int32_t)((uint32_t)high << 4), mid >> 12);
}

API int32_t dspi_q15_mul(int32_t s, int32_t g) {
    int32_t sh = s >> 16;
    uint32_t sl = (uint16_t)s;
    int32_t gh = g >> 16;
    uint32_t gl = (uint16_t)g;
    int32_t hh = (int32_t)((uint32_t)sh * (uint32_t)gh);
    int32_t mid = wrap_add((int32_t)((uint32_t)sh * gl),
                           (int32_t)(sl * (uint32_t)gh));
    uint32_t ll = sl * gl;
    return (int32_t)(((uint32_t)hh << 17) + ((uint32_t)mid << 1) + (ll >> 15));
}

API int32_t dspi_clip_s24(int32_t x) {
    if (x > 0x7FFFFF) return 0x7FFFFF;
    if (x < -0x800000) return -0x800000;
    return x;
}

// ---------------------------------------------------------------------------
// CRC32 (flash_storage.c:282-291 semantics; table-driven for speed)
// ---------------------------------------------------------------------------

API uint32_t dspi_crc32(const uint8_t* data, uint64_t len) {
    static uint32_t table[256];
    static bool init = false;
    if (!init) {
        for (uint32_t i = 0; i < 256; i++) {
            uint32_t c = i;
            for (int k = 0; k < 8; k++)
                c = (c >> 1) ^ (0xEDB88320u & (0u - (c & 1u)));
            table[i] = c;
        }
        init = true;
    }
    uint32_t crc = 0xFFFFFFFFu;
    for (uint64_t i = 0; i < len; i++)
        crc = (crc >> 8) ^ table[(crc ^ data[i]) & 0xFF];
    return ~crc;
}

// ---------------------------------------------------------------------------
// packet (de)framing
// ---------------------------------------------------------------------------

// Interleaved little-endian s16 byte stream -> planar int32 L/R planes.
// One stream: frames = sample frames, bytes = 4*frames.
API void dspi_unpack_s16(const uint8_t* bytes, int64_t frames,
                         int32_t* out_l, int32_t* out_r) {
    const int16_t* in = (const int16_t*)bytes;
    for (int64_t i = 0; i < frames; i++) {
        out_l[i] = in[i * 2];
        out_r[i] = in[i * 2 + 1];
    }
}

// Packed little-endian s24 (3 bytes/sample, LRLR) -> sign-extended int32.
// Matches the byte assembly of usb_audio.c:997-1006 before the Q28 shift.
API void dspi_unpack_s24(const uint8_t* bytes, int64_t frames,
                         int32_t* out_l, int32_t* out_r) {
    const uint8_t* p = bytes;
    for (int64_t i = 0; i < frames; i++) {
        int32_t l = (int32_t)((uint32_t)p[2] << 24 | (uint32_t)p[1] << 16 |
                              (uint32_t)p[0] << 8) >> 8;
        int32_t r = (int32_t)((uint32_t)p[5] << 24 | (uint32_t)p[4] << 16 |
                              (uint32_t)p[3] << 8) >> 8;
        out_l[i] = l;
        out_r[i] = r;
        p += 6;
    }
}

// Batch transpose: per-stream planar [B][T] -> time-major [T][B] (the device
// layout with streams on vector lanes).
API void dspi_to_time_major(const int32_t* in, int64_t n_streams, int64_t t,
                            int32_t* out) {
    for (int64_t b = 0; b < n_streams; b++)
        for (int64_t i = 0; i < t; i++)
            out[i * n_streams + b] = in[b * t + i];
}

// s24 planes -> interleaved packed s24 bytes (device drain path).
API void dspi_pack_s24(const int32_t* in_l, const int32_t* in_r,
                       int64_t frames, uint8_t* bytes) {
    uint8_t* p = bytes;
    for (int64_t i = 0; i < frames; i++) {
        uint32_t l = (uint32_t)in_l[i], r = (uint32_t)in_r[i];
        p[0] = l & 0xFF; p[1] = (l >> 8) & 0xFF; p[2] = (l >> 16) & 0xFF;
        p[3] = r & 0xFF; p[4] = (r >> 8) & 0xFF; p[5] = (r >> 16) & 0xFF;
        p += 6;
    }
}

// ---------------------------------------------------------------------------
// fast Q28 oracle: biquad cascade block
// coeffs: [bands][5] = b0,b1,b2,a1,a2; state: [bands][2] = s1,s2 (updated)
// TDF2 per dsp_process_rp2040.S:263-365.
// ---------------------------------------------------------------------------

API void dspi_q28_cascade_block(const int32_t* coeffs, int32_t* state,
                                int32_t n_bands, int32_t* samples,
                                int64_t count) {
    for (int32_t band = 0; band < n_bands; band++) {
        const int32_t* c = coeffs + band * 5;
        int32_t s1 = state[band * 2], s2 = state[band * 2 + 1];
        for (int64_t i = 0; i < count; i++) {
            int32_t x = samples[i];
            int32_t y = wrap_add(dspi_q28_mul(c[0], x), s1);
            s1 = wrap_add(wrap_sub(dspi_q28_mul(c[1], x),
                                   dspi_q28_mul(c[3], y)), s2);
            s2 = wrap_sub(dspi_q28_mul(c[2], x), dspi_q28_mul(c[4], y));
            samples[i] = y;
        }
        state[band * 2] = s1;
        state[band * 2 + 1] = s2;
    }
}

// ---------------------------------------------------------------------------
// fast PDM oracle: delta-sigma modulator (pdm_generator.c:349-397)
// state: [err, err2, x1, x2, y1, y2, err_acc, rng, fade_pos] (9 x int32,
// rng reinterpreted as uint32).  x: [count] Q28, words_out: [count*8].
// ---------------------------------------------------------------------------

API void dspi_pdm_block(int32_t* state, const int32_t* x, int64_t count,
                        uint32_t* words_out) {
    int32_t err = state[0], err2 = state[1];
    int32_t x1 = state[2], x2 = state[3], y1 = state[4], y2 = state[5];
    int32_t acc = state[6];
    uint32_t rng = (uint32_t)state[7];
    int32_t fade = state[8];

    for (int64_t n = 0; n < count; n++) {
        int32_t pcm = x[n] >> 14;
        if (pcm > 29500) pcm = 29500;
        if (pcm < -29500) pcm = -29500;
        if (fade < 1024) {
            pcm = wrap_mul(pcm, fade) >> 10;
            fade++;
        }
        int32_t target = wrap_add(pcm, 32768);

        for (int chunk = 0; chunk < 8; chunk++) {
            rng ^= rng << 13;
            rng ^= rng >> 17;
            rng ^= rng << 5;
            int32_t raw = (int32_t)(rng & 0x1FF) - 0xFF;
            // noise-shaped dither (pdm_generator.c:89-108), int32 wrap
            acc = wrap_add(wrap_mul(acc, 248) >> 8, (err2 >> 8) >> 6);
            int32_t input = wrap_sub(raw, acc);
            int32_t total = wrap_sub(
                wrap_add(wrap_add(wrap_mul(15778, input),
                                  wrap_mul(-31556, x1)),
                         wrap_add(wrap_mul(15778, x2),
                                  wrap_mul(31531, y1))),
                wrap_mul(15580, y2));
            int32_t dither = total >> 14;
            x2 = x1; x1 = input; y2 = y1; y1 = dither;

            uint32_t word = 0;
            for (int k = 0; k < 32; k++) {
                int32_t u = wrap_add(err2, dither);
                uint32_t bit = u >= 0 ? 1u : 0u;
                word = (word << 1) | bit;
                int32_t fb = bit ? 65535 : 0;
                err = wrap_add(err, wrap_sub(target, fb));
                err2 = wrap_add(err2, wrap_sub(err, fb));
            }
            words_out[n * 8 + chunk] = word;
        }
        err = wrap_sub(err, err >> 16);
        err2 = wrap_sub(err2, err2 >> 16);
    }

    state[0] = err; state[1] = err2;
    state[2] = x1; state[3] = x2; state[4] = y1; state[5] = y2;
    state[6] = acc; state[7] = (int32_t)rng; state[8] = fade;
}
