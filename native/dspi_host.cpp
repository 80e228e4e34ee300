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

//   * A firmware-float oracle: the RP2350 float packet chain exactly as the
//     firmware computes it — libm log10f/powf/expf, hardware float division,
//     float SVF/TDF2 block kernels (usb_audio.c:560-960, leveller.c:124-262,
//     crossfeed.c:35-156, dsp_pipeline.c:255-365).  This is what converts
//     the rebuild's "<=1e-6 RMS vs firmware" gate from an assertion into a
//     measurement: golden (deterministic fmath) and this oracle (libm) are
//     compared by tests/test_fw_oracle.py on the BASELINE configs.
//     NB: the host libm differs from the ARM ROM routines by ulps, and gcc
//     for cortex-m33 may contract mul+add into VFMA — both effects are of
//     the same magnitude the gate budgets for.

#include <cmath>
#include <cstdint>
#include <cstdlib>
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

// Batched deframe: B streams' raw USB payload byte rows -> the engine's
// device input layout int32 [npkt][2][block][B] in ONE pass (deframe +
// channel split + packetize + lane transpose fused).  bytes is row-major
// [B][npkt*block*bpf] with bpf = 4 (interleaved s16 LRLR,
// usb_audio.c:591-594) or 6 (packed s24 LRLR, usb_audio.c:997-1006 byte
// assembly, sign-extended, pre-Q28-shift).  Cache-blocked over
// (frame, stream) tiles: a tile's reads are contiguous per-stream chunks
// and its writes are contiguous [tile_b] lane runs, so both sides stay
// inside L1.  Multithreaded over stream tiles (each thread owns disjoint
// lane ranges of every output row, no false sharing at tile_b >= 16).
#include <thread>
#include <vector>

namespace {

template <int BPF>
static void deframe_tile(const uint8_t* bytes, int64_t stride,
                         int64_t frames, int64_t block, int64_t B,
                         int64_t b0, int64_t b1, int32_t* out) {
    constexpr int64_t TI = 64;
    for (int64_t i0 = 0; i0 < frames; i0 += TI) {
        int64_t i1 = i0 + TI < frames ? i0 + TI : frames;
        for (int64_t b = b0; b < b1; b++) {
            const uint8_t* p = bytes + b * stride + i0 * BPF;
            for (int64_t i = i0; i < i1; i++, p += BPF) {
                int32_t l, r;
                if (BPF == 4) {
                    l = (int16_t)(p[0] | (p[1] << 8));
                    r = (int16_t)(p[2] | (p[3] << 8));
                } else {
                    l = (int32_t)((uint32_t)p[2] << 24 |
                                  (uint32_t)p[1] << 16 |
                                  (uint32_t)p[0] << 8) >> 8;
                    r = (int32_t)((uint32_t)p[5] << 24 |
                                  (uint32_t)p[4] << 16 |
                                  (uint32_t)p[3] << 8) >> 8;
                }
                int64_t pkt = i / block, t = i % block;
                int32_t* row = out + ((pkt * 2) * block + t) * B;
                row[b] = l;
                row[block * B + b] = r;
            }
        }
    }
}

template <int BPF>
static void deframe_batch(const uint8_t* bytes, int64_t n_streams,
                          int64_t npkt, int64_t block, int32_t* out,
                          int n_threads) {
    const int64_t frames = npkt * block;
    const int64_t stride = frames * BPF;
    constexpr int64_t TB = 64;
    int64_t n_tiles = (n_streams + TB - 1) / TB;
    if (n_threads < 1) n_threads = 1;
    if ((int64_t)n_threads > n_tiles) n_threads = (int)n_tiles;
    if (n_threads == 1) {
        deframe_tile<BPF>(bytes, stride, frames, block, n_streams,
                          0, n_streams, out);
        return;
    }
    std::vector<std::thread> ths;
    ths.reserve(n_threads);
    for (int t = 0; t < n_threads; t++) {
        int64_t tile_lo = n_tiles * t / n_threads;
        int64_t tile_hi = n_tiles * (t + 1) / n_threads;
        int64_t b0 = tile_lo * TB;
        int64_t b1 = tile_hi * TB < n_streams ? tile_hi * TB : n_streams;
        if (b0 >= b1) continue;
        ths.emplace_back([=] {
            for (int64_t bb = b0; bb < b1; bb += TB) {
                int64_t be = bb + TB < b1 ? bb + TB : b1;
                deframe_tile<BPF>(bytes, stride, frames, block,
                                  n_streams, bb, be, out);
            }
        });
    }
    for (auto& th : ths) th.join();
}

}  // namespace

API void dspi_deframe_s16_batch(const uint8_t* bytes, int64_t n_streams,
                                int64_t npkt, int64_t block, int32_t* out,
                                int32_t n_threads) {
    deframe_batch<4>(bytes, n_streams, npkt, block, out, n_threads);
}

API void dspi_deframe_s24_batch(const uint8_t* bytes, int64_t n_streams,
                                int64_t npkt, int64_t block, int32_t* out,
                                int32_t n_threads) {
    deframe_batch<6>(bytes, n_streams, npkt, block, out, n_threads);
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

// ===========================================================================
// Firmware-float oracle: the RP2350 float packet chain with the firmware's
// own math classes (libm transcendentals, hardware float division).
// One stream, sample-sequential — an oracle, not a data plane.
// ===========================================================================

namespace fwf {

enum BandKind { SKIP = 0, TDF2 = 1, SVF_LP = 2, SVF_HP = 3, SVF_PEAK = 4,
                SVF_SHELF = 5 };

constexpr int MAXCH = 16;
constexpr int MAXB = 16;
constexpr int DELAY_MASK = 4095;            // config.h:83 (RP2350)
constexpr int LA_SAMPLES = 480;             // leveller.h:34
constexpr float LIMITER_CEIL = 0.70795f;    // leveller.h:53 (-3 dBFS)

struct FwFloat {
    float rate;
    int nout, nspdif, nch, nb;
    // EQ (master channels 0-1, per-output channels 2..)
    int32_t kinds[MAXCH][MAXB];
    float coef[MAXCH][MAXB][11];   // sva1..svm2, b0,b1,b2,a1,a2
    float eq_a[MAXCH][MAXB], eq_b[MAXCH][MAXB];   // SVF ic1/ic2 | TDF2 s1/s2
    int bypass_master;
    // loudness (usb_audio.c:689-718)
    int loud_on;
    float loud_c[2][6];
    int32_t loud_byp[2];
    float loud_ic1[2][2], loud_ic2[2][2];
    // gains
    float preamp_lin[2];
    float master_vol_lin;
    float vol_mul;                 // host volume, mute folded in
    float matrix_gain[2][MAXCH];   // signed linear, 0 when disabled
    uint8_t out_en[MAXCH], out_mute[MAXCH];
    float out_gain_lin[MAXCH];
    int32_t delay_samples[MAXCH];
    float* delay_lines;            // [nout][DELAY_MASK+1]
    uint32_t delay_widx;
    // leveller (leveller.c)
    int lev_on, lev_lookahead;
    float alpha_rms, alpha_attack, alpha_release;
    float threshold_db, knee_db, gate_db, ratio, max_gain_db, makeup_db;
    float env_l, env_r, gain_smooth_db, gain_lin, gain_prev_lin;
    float la_buf[2][LA_SAMPLES];
    uint32_t la_idx;
    // crossfeed (crossfeed.c)
    int xf_on;
    float lp_a0, lp_b1, ap_a;
    float lp_L, lp_R, ap_L, ap_R;
    // PDM modulator (shared with dspi_pdm_block: 9-word state)
    int pdm_on;
    int32_t pdm_state[9];
};

// flash_storage.c:302-306
static float db_to_linear(float db) {
    if (db <= -120.0f) return 0.0f;
    if (db >= +80.0f) db = 80.0f;
    return powf(10.0f, db / 20.0f);
}

// leveller.c:37-40
static float compute_alpha(float sample_rate, float time_sec) {
    if (time_sec <= 0.0f || sample_rate <= 0.0f) return 0.0f;
    return expf(-logf(10.0f) / (sample_rate * time_sec));
}

// leveller.c:124-139
static inline float gain_computer(float x_db, float threshold, float ratio,
                                  float knee_width) {
    float half_knee = knee_width * 0.5f;
    if (x_db > (threshold + half_knee)) {
        return 0.0f;
    } else if (x_db >= (threshold - half_knee)) {
        float d = threshold + half_knee - x_db;
        return (1.0f - 1.0f / ratio) * d * d / (2.0f * knee_width);
    } else {
        return (threshold - x_db) * (1.0f - 1.0f / ratio);
    }
}

// dsp_pipeline.c:282-365 (band-major block kernel, per-kind inner loops)
static void eq_block(FwFloat* p, int ch, float* samples, int count) {
    for (int band = 0; band < p->nb; band++) {
        int kind = p->kinds[ch][band];
        if (kind == SKIP) continue;
        const float* c = p->coef[ch][band];
        if (kind == TDF2) {
            float b0 = c[6], b1 = c[7], b2 = c[8], a1 = c[9], a2 = c[10];
            float s1 = p->eq_a[ch][band], s2 = p->eq_b[ch][band];
            for (int i = 0; i < count; i++) {
                float in = samples[i];
                float out = b0 * in + s1;
                s1 = b1 * in - a1 * out + s2;
                s2 = b2 * in - a2 * out;
                samples[i] = out;
            }
            p->eq_a[ch][band] = s1;
            p->eq_b[ch][band] = s2;
        } else {
            float a1 = c[0], a2 = c[1], a3 = c[2];
            float m0 = c[3], m1 = c[4], m2 = c[5];
            float ic1 = p->eq_a[ch][band], ic2 = p->eq_b[ch][band];
            for (int i = 0; i < count; i++) {
                float in = samples[i];
                float v3 = in - ic2;
                float v1 = a1 * ic1 + a2 * v3;
                float v2 = ic2 + a2 * ic1 + a3 * v3;
                ic1 = 2.0f * v1 - ic1;
                ic2 = 2.0f * v2 - ic2;
                float out;
                switch (kind) {
                    case SVF_LP:   out = v2; break;
                    case SVF_HP:   out = in + m1 * v1 - v2; break;
                    case SVF_PEAK: out = in + m1 * v1; break;
                    default:       out = m0 * in + m1 * v1 + m2 * v2; break;
                }
                samples[i] = out;
            }
            p->eq_a[ch][band] = ic1;
            p->eq_b[ch][band] = ic2;
        }
    }
}

// leveller.c:147-262, verbatim semantics
static void leveller_block(FwFloat* p, float* buf_l, float* buf_r,
                           int count) {
    if (count == 0) return;
    float env_l = p->env_l, env_r = p->env_r;
    const float a_rms = p->alpha_rms;
    const float one_minus = 1.0f - a_rms;
    for (int i = 0; i < count; i++) {
        float sl = buf_l[i], sr = buf_r[i];
        env_l = a_rms * env_l + one_minus * (sl * sl);
        env_r = a_rms * env_r + one_minus * (sr * sr);
    }
    if (env_l < 1e-30f) env_l = 0.0f;
    if (env_r < 1e-30f) env_r = 0.0f;
    p->env_l = env_l;
    p->env_r = env_r;

    float rms_sq = (env_l > env_r) ? env_l : env_r;
    float rms_db = 10.0f * log10f(rms_sq + 1e-30f);
    float gc_db;
    if (rms_db < p->gate_db) {
        gc_db = 0.0f;
    } else {
        gc_db = gain_computer(rms_db, p->threshold_db, p->ratio, p->knee_db);
        gc_db += p->makeup_db;
        if (gc_db > p->max_gain_db) gc_db = p->max_gain_db;
    }

    float alpha_sample = (gc_db < p->gain_smooth_db) ? p->alpha_attack
                                                     : p->alpha_release;
    float alpha = powf(alpha_sample, (float)count);
    p->gain_smooth_db = alpha * p->gain_smooth_db + (1.0f - alpha) * gc_db;
    p->gain_prev_lin = p->gain_lin;
    p->gain_lin = powf(10.0f, p->gain_smooth_db / 20.0f);

    float gain_prev = p->gain_prev_lin;
    float gain_cur = p->gain_lin;
    float gain, gain_step;
    if (count == 1) {
        gain = gain_cur;
        gain_step = 0.0f;
    } else {
        gain_step = (gain_cur - gain_prev) / (float)(count - 1);
        gain = gain_prev;
    }

    const float ceilv = LIMITER_CEIL;
    bool use_la = p->lev_lookahead;
    uint32_t la_idx = p->la_idx;
    for (int i = 0; i < count; i++) {
        float out_l, out_r;
        if (use_la) {
            out_l = p->la_buf[0][la_idx];
            out_r = p->la_buf[1][la_idx];
            p->la_buf[0][la_idx] = buf_l[i];
            p->la_buf[1][la_idx] = buf_r[i];
            la_idx++;
            if (la_idx >= LA_SAMPLES) la_idx = 0;
        } else {
            out_l = buf_l[i];
            out_r = buf_r[i];
        }
        float peak = fabsf(out_l);
        float pr = fabsf(out_r);
        if (pr > peak) peak = pr;
        float g = gain;
        if (peak > 0.0f && g > 1.0f) {
            float max_g = ceilv / peak;
            if (max_g < g) g = (max_g > 1.0f) ? max_g : 1.0f;
        }
        buf_l[i] = out_l * g;
        buf_r[i] = out_r * g;
        gain += gain_step;
    }
    p->la_idx = la_idx;
}

// crossfeed.c:131-156
static inline void crossfeed_stereo(FwFloat* p, float* left, float* right) {
    float in_L = *left, in_R = *right;
    float lp_out_L = p->lp_a0 * in_L + p->lp_b1 * p->lp_L;
    float lp_out_R = p->lp_a0 * in_R + p->lp_b1 * p->lp_R;
    p->lp_L = lp_out_L;
    p->lp_R = lp_out_R;
    float ap_out_L = p->ap_a * lp_out_L + p->ap_L;
    p->ap_L = lp_out_L - p->ap_a * ap_out_L;
    float ap_out_R = p->ap_a * lp_out_R + p->ap_R;
    p->ap_R = lp_out_R - p->ap_a * ap_out_R;
    *left = (in_L - lp_out_L) + ap_out_R;
    *right = (in_R - lp_out_R) + ap_out_L;
}

// pdm_generator.c:349-397 one sample (reuses the 9-word state layout of
// dspi_pdm_block)
static void pdm_sample(int32_t* st, int32_t x_q28, uint32_t* words8) {
    int32_t err = st[0], err2 = st[1];
    int32_t x1 = st[2], x2 = st[3], y1 = st[4], y2 = st[5];
    int32_t acc = st[6];
    uint32_t rng = (uint32_t)st[7];
    int32_t fade = st[8];

    int32_t pcm = x_q28 >> 14;
    if (pcm > 29500) pcm = 29500;
    if (pcm < -29500) pcm = -29500;
    if (fade < 1024) {
        pcm = (int32_t)((uint32_t)pcm * (uint32_t)fade) >> 10;
        fade++;
    }
    int32_t target = (int32_t)((uint32_t)pcm + 32768u);

    for (int chunk = 0; chunk < 8; chunk++) {
        rng ^= rng << 13;
        rng ^= rng >> 17;
        rng ^= rng << 5;
        int32_t raw = (int32_t)(rng & 0x1FF) - 0xFF;
        acc = (int32_t)(((uint32_t)acc * 248u)) >> 8;
        // NB: the two shifts (err2>>8)>>6 match pdm_generator.c:97 feeding
        // quant_error = err2 >> 8 into (qe >> 6)
        acc = (int32_t)((uint32_t)acc + (uint32_t)((err2 >> 8) >> 6));
        int32_t input = (int32_t)((uint32_t)raw - (uint32_t)acc);
        int32_t total = (int32_t)(
            (uint32_t)((int32_t)(15778u * (uint32_t)input))
            + (uint32_t)((int32_t)((uint32_t)-31556 * (uint32_t)x1))
            + (uint32_t)((int32_t)(15778u * (uint32_t)x2))
            + (uint32_t)((int32_t)(31531u * (uint32_t)y1))
            - (uint32_t)((int32_t)(15580u * (uint32_t)y2)));
        int32_t dither = total >> 14;
        x2 = x1; x1 = input; y2 = y1; y1 = dither;

        uint32_t word = 0;
        for (int k = 0; k < 32; k++) {
            int32_t u = (int32_t)((uint32_t)err2 + (uint32_t)dither);
            uint32_t bit = u >= 0 ? 1u : 0u;
            word = (word << 1) | bit;
            int32_t fb = bit ? 65535 : 0;
            err = (int32_t)((uint32_t)err + (uint32_t)(target - fb));
            err2 = (int32_t)((uint32_t)err2 + (uint32_t)(err - fb));
        }
        words8[chunk] = word;
    }
    err = (int32_t)((uint32_t)err - (uint32_t)(err >> 16));
    err2 = (int32_t)((uint32_t)err2 - (uint32_t)(err2 >> 16));

    st[0] = err; st[1] = err2;
    st[2] = x1; st[3] = x2; st[4] = y1; st[5] = y2;
    st[6] = acc; st[7] = (int32_t)rng; st[8] = fade;
}

}  // namespace fwf

using fwf::FwFloat;

API FwFloat* dspi_fw_new(float rate, int nout, int nspdif, int nch, int nb) {
    FwFloat* p = (FwFloat*)calloc(1, sizeof(FwFloat));
    p->rate = rate;
    p->nout = nout;
    p->nspdif = nspdif;
    p->nch = nch;
    p->nb = nb;
    p->delay_lines =
        (float*)calloc((size_t)nout * (fwf::DELAY_MASK + 1), sizeof(float));
    p->master_vol_lin = 1.0f;
    p->vol_mul = 1.0f;
    p->gain_lin = 1.0f;
    p->gain_prev_lin = 1.0f;
    p->preamp_lin[0] = p->preamp_lin[1] = 1.0f;
    return p;
}

API void dspi_fw_free(FwFloat* p) {
    if (p) {
        free(p->delay_lines);
        free(p);
    }
}

API void dspi_fw_set_eq(FwFloat* p, const int32_t* kinds, const float* coef,
                        int bypass_master) {
    for (int ch = 0; ch < p->nch; ch++)
        for (int b = 0; b < p->nb; b++) {
            p->kinds[ch][b] = kinds[ch * p->nb + b];
            memcpy(p->coef[ch][b], coef + (ch * p->nb + b) * 11,
                   11 * sizeof(float));
        }
    p->bypass_master = bypass_master;
}

API void dspi_fw_set_loudness(FwFloat* p, int enabled, const float* coef,
                              const int32_t* bypass) {
    p->loud_on = enabled;
    if (enabled) {
        memcpy(p->loud_c, coef, sizeof(p->loud_c));
        p->loud_byp[0] = bypass[0];
        p->loud_byp[1] = bypass[1];
    }
}

// Gains from dB exactly as the firmware derives them: powf(10, db/20)
// (usb_audio.c:1881,1928; flash_storage.c:302-306); master volume uses the
// -128 mute sentinel (config.h:236-239); host volume is the Q15 table value
// scaled by 1/32768 (usb_audio.c:569).
API void dspi_fw_set_gains(FwFloat* p, const float* preamp_db,
                           float master_vol_db, int host_vol_q15,
                           int host_mute, const float* matrix_db,
                           const uint8_t* mat_en, const uint8_t* mat_inv,
                           const float* out_gain_db, const uint8_t* out_en,
                           const uint8_t* out_mute,
                           const int32_t* delay_samples) {
    p->preamp_lin[0] = powf(10.0f, preamp_db[0] / 20.0f);
    p->preamp_lin[1] = powf(10.0f, preamp_db[1] / 20.0f);
    p->master_vol_lin =
        (master_vol_db <= -128.0f) ? 0.0f : fwf::db_to_linear(master_vol_db);
    p->vol_mul =
        host_mute ? 0.0f : (float)host_vol_q15 * (1.0f / 32768.0f);
    for (int in = 0; in < 2; in++)
        for (int o = 0; o < p->nout; o++) {
            float g = 0.0f;
            if (mat_en[in * p->nout + o]) {
                g = powf(10.0f, matrix_db[in * p->nout + o] / 20.0f);
                if (mat_inv[in * p->nout + o]) g = -g;
            }
            p->matrix_gain[in][o] = g;
        }
    for (int o = 0; o < p->nout; o++) {
        p->out_gain_lin[o] = powf(10.0f, out_gain_db[o] / 20.0f);
        p->out_en[o] = out_en[o];
        p->out_mute[o] = out_mute[o];
        p->delay_samples[o] = delay_samples[o] & fwf::DELAY_MASK;
    }
}

// leveller_compute_coefficients (leveller.c:43-90), native expf/logf
API void dspi_fw_set_leveller(FwFloat* p, int enabled, float amount,
                              int speed, float gate_db, float max_gain_db,
                              int lookahead) {
    static const float presets[3][3] = {
        {0.100f, 2.000f, 0.400f},
        {0.050f, 1.000f, 0.200f},
        {0.020f, 0.500f, 0.100f},
    };
    p->lev_on = enabled;
    p->lev_lookahead = lookahead;
    if (!enabled) return;
    float rate = p->rate < 1.0f ? 48000.0f : p->rate;
    int spd = (speed < 0 || speed > 2) ? 1 : speed;
    p->alpha_attack = fwf::compute_alpha(rate, presets[spd][0]);
    p->alpha_release = fwf::compute_alpha(rate, presets[spd][1]);
    p->alpha_rms = fwf::compute_alpha(rate, presets[spd][2]);
    p->threshold_db = -20.0f;        // leveller.h:51
    p->knee_db = 6.0f;               // leveller.h:52
    if (gate_db < -90.0f) gate_db = -90.0f;
    if (gate_db > -20.0f) gate_db = -20.0f;
    p->gate_db = gate_db;
    if (amount < 0.0f) amount = 0.0f;
    if (amount > 100.0f) amount = 100.0f;
    p->ratio = 1.0f + (amount / 100.0f) * 19.0f;
    if (max_gain_db < 0.0f) max_gain_db = 0.0f;
    if (max_gain_db > 30.0f) max_gain_db = 30.0f;
    p->max_gain_db = max_gain_db;
    p->makeup_db = 0.0f;
}

// crossfeed_compute_coefficients (crossfeed.c:36-130), native expf/powf and
// hardware division
API void dspi_fw_set_crossfeed(FwFloat* p, int enabled, int preset,
                               float custom_fc, float custom_feed_db,
                               int itd_enabled) {
    p->xf_on = enabled;
    p->lp_L = p->lp_R = p->ap_L = p->ap_R = 0.0f;
    if (!enabled) return;
    static const float presets[3][2] = {
        {700.0f, 4.5f}, {700.0f, 6.0f}, {650.0f, 9.5f}};
    float fc, feed_db;
    if (preset < 3) {
        fc = presets[preset][0];
        feed_db = presets[preset][1];
    } else {
        fc = custom_fc;
        feed_db = custom_feed_db;
        if (fc < 500.0f) fc = 500.0f;
        if (fc > 2000.0f) fc = 2000.0f;
        if (feed_db < 0.0f) feed_db = 0.0f;
        if (feed_db > 15.0f) feed_db = 15.0f;
    }
    float level_ratio = powf(10.0f, feed_db / 20.0f);
    float G = 1.0f / (1.0f + level_ratio);
    float x = expf(-2.0f * 3.1415926535f * fc / p->rate);
    p->lp_a0 = G * (1.0f - x);
    p->lp_b1 = x;
    if (itd_enabled) {
        float lp_delay_sec = x / ((1.0f - x) * p->rate);
        float remaining_sec = 220e-6f - lp_delay_sec;   // crossfeed.h:23
        if (remaining_sec > 0.0f) {
            float D = remaining_sec * p->rate;
            p->ap_a = (1.0f - D) / (1.0f + D);
        } else {
            p->ap_a = 1.0f;
        }
    } else {
        p->ap_a = 1.0f;
    }
}

API void dspi_fw_enable_pdm(FwFloat* p, int enabled, int fade) {
    p->pdm_on = enabled;
    memset(p->pdm_state, 0, sizeof(p->pdm_state));
    p->pdm_state[7] = 123456789;            // xorshift32 seed
    p->pdm_state[8] = fade ? 0 : 1024;      // fade-in position
}

// process_audio_packet float path (usb_audio.c:560-960), one packet per
// iteration.  x: int32 [npkt][2][T] (s16 or s24 sample values);
// out: float [npkt][nout][T] (post-delay buf_out);
// pdm_words: uint32 [npkt*T*8] or NULL.
API void dspi_fw_process(FwFloat* p, const int32_t* x, int npkt, int T,
                         int bit24, float* out, uint32_t* pdm_words) {
    const float inv_32768 = 1.0f / 32768.0f;
    const float inv_8388608 = 1.0f / 8388608.0f;
    const float pdm_scale = (float)(1 << 28);
    float buf_l[512], buf_r[512];
    float buf_out[fwf::MAXCH][512];

    float vol_mul_master = p->vol_mul * p->master_vol_lin;

    for (int pkt = 0; pkt < npkt; pkt++) {
        const int32_t* in_l = x + ((size_t)pkt * 2) * T;
        const int32_t* in_r = in_l + T;

        // PASS 1: unpack + preamp
        float gain_l = (bit24 ? inv_8388608 : inv_32768) * p->preamp_lin[0];
        float gain_r = (bit24 ? inv_8388608 : inv_32768) * p->preamp_lin[1];
        for (int i = 0; i < T; i++) {
            buf_l[i] = (float)in_l[i] * gain_l;
            buf_r[i] = (float)in_r[i] * gain_r;
        }

        // loudness shelves (usb_audio.c:689-718)
        if (p->loud_on) {
            for (int i = 0; i < T; i++) {
                float rl = buf_l[i], rr = buf_r[i];
                for (int j = 0; j < 2; j++) {
                    if (p->loud_byp[j]) continue;
                    const float* lc = p->loud_c[j];
                    float v3 = rl - p->loud_ic2[0][j];
                    float v1 = lc[0] * p->loud_ic1[0][j] + lc[1] * v3;
                    float v2 = p->loud_ic2[0][j] + lc[1] * p->loud_ic1[0][j]
                               + lc[2] * v3;
                    p->loud_ic1[0][j] = 2.0f * v1 - p->loud_ic1[0][j];
                    p->loud_ic2[0][j] = 2.0f * v2 - p->loud_ic2[0][j];
                    rl = lc[3] * rl + lc[4] * v1 + lc[5] * v2;
                }
                for (int j = 0; j < 2; j++) {
                    if (p->loud_byp[j]) continue;
                    const float* lc = p->loud_c[j];
                    float v3 = rr - p->loud_ic2[1][j];
                    float v1 = lc[0] * p->loud_ic1[1][j] + lc[1] * v3;
                    float v2 = p->loud_ic2[1][j] + lc[1] * p->loud_ic1[1][j]
                               + lc[2] * v3;
                    p->loud_ic1[1][j] = 2.0f * v1 - p->loud_ic1[1][j];
                    p->loud_ic2[1][j] = 2.0f * v2 - p->loud_ic2[1][j];
                    rr = lc[3] * rr + lc[4] * v1 + lc[5] * v2;
                }
                buf_l[i] = rl;
                buf_r[i] = rr;
            }
        }

        // PASS 2: master EQ
        if (!p->bypass_master) {
            fwf::eq_block(p, 0, buf_l, T);
            fwf::eq_block(p, 1, buf_r, T);
        }

        // PASS 2.5: leveller
        if (p->lev_on) fwf::leveller_block(p, buf_l, buf_r, T);

        // PASS 3: crossfeed
        if (p->xf_on)
            for (int i = 0; i < T; i++)
                crossfeed_stereo(p, &buf_l[i], &buf_r[i]);

        // PASS 4: matrix, output-major (usb_audio.c:751-779)
        for (int o = 0; o < p->nout; o++) {
            if (!p->out_en[o]) {
                memset(buf_out[o], 0, T * sizeof(float));
                continue;
            }
            float gl = p->matrix_gain[0][o], gr = p->matrix_gain[1][o];
            float* dst = buf_out[o];
            if (gl != 0.0f && gr != 0.0f) {
                for (int i = 0; i < T; i++)
                    dst[i] = buf_l[i] * gl + buf_r[i] * gr;
            } else if (gl != 0.0f) {
                for (int i = 0; i < T; i++) dst[i] = buf_l[i] * gl;
            } else if (gr != 0.0f) {
                for (int i = 0; i < T; i++) dst[i] = buf_r[i] * gr;
            } else {
                memset(dst, 0, T * sizeof(float));
            }
        }

        // PASS 5: per-output EQ + gain (usb_audio.c:877-895)
        for (int o = 0; o < p->nout; o++) {
            if (!p->out_en[o]) continue;
            if (!p->out_mute[o]) fwf::eq_block(p, 2 + o, buf_out[o], T);
            float gain =
                p->out_mute[o] ? 0.0f : p->out_gain_lin[o] * vol_mul_master;
            if (gain == 0.0f) {
                memset(buf_out[o], 0, T * sizeof(float));
            } else if (gain != 1.0f) {
                for (int i = 0; i < T; i++) buf_out[o][i] *= gain;
            }
        }

        // delay lines (usb_audio.c:897-912): write-then-read, shared index
        for (int o = 0; o < p->nout; o++) {
            int32_t dly = p->delay_samples[o];
            if (dly <= 0) continue;
            float* dst = buf_out[o];
            float* dline = p->delay_lines + (size_t)o * (fwf::DELAY_MASK + 1);
            uint32_t widx = p->delay_widx;
            for (int i = 0; i < T; i++) {
                dline[widx] = dst[i];
                dst[i] = dline[(widx - dly) & fwf::DELAY_MASK];
                widx = (widx + 1) & fwf::DELAY_MASK;
            }
        }
        p->delay_widx = (p->delay_widx + T) & fwf::DELAY_MASK;

        // PDM sub (usb_audio.c:944-955)
        if (p->pdm_on && p->out_en[p->nout - 1] && pdm_words) {
            const float* sub = buf_out[p->nout - 1];
            for (int i = 0; i < T; i++) {
                int32_t q28 = (int32_t)(sub[i] * pdm_scale);
                fwf::pdm_sample(p->pdm_state, q28,
                                pdm_words + ((size_t)pkt * T + i) * 8);
            }
        }

        for (int o = 0; o < p->nout; o++)
            memcpy(out + ((size_t)pkt * p->nout + o) * T, buf_out[o],
                   T * sizeof(float));
    }
}

// ---------------------------------------------------------------------------
// Raw-coefficient setters: load the SAME coefficient values the golden model
// uses, so tests isolate *runtime signal-path* math (libm log10f/powf in the
// gain computer, hardware division in the limiter) from coefficient
// derivation.  Coefficient derivation fidelity is measured separately (the
// dB-based setters above recompute natively with libm) because a 1-ulp
// difference in e.g. alpha_rms lawfully amplifies through the envelope
// recurrence far beyond the signal-path budget.
// ---------------------------------------------------------------------------

API void dspi_fw_set_leveller_raw(FwFloat* p, int enabled, int lookahead,
                                  float a_rms, float a_att, float a_rel,
                                  float thresh, float knee, float gate,
                                  float ratio, float max_gain, float makeup) {
    p->lev_on = enabled;
    p->lev_lookahead = lookahead;
    p->alpha_rms = a_rms;
    p->alpha_attack = a_att;
    p->alpha_release = a_rel;
    p->threshold_db = thresh;
    p->knee_db = knee;
    p->gate_db = gate;
    p->ratio = ratio;
    p->max_gain_db = max_gain;
    p->makeup_db = makeup;
}

API void dspi_fw_set_crossfeed_raw(FwFloat* p, int enabled, float lp_a0,
                                   float lp_b1, float ap_a) {
    p->xf_on = enabled;
    p->lp_a0 = lp_a0;
    p->lp_b1 = lp_b1;
    p->ap_a = ap_a;
    p->lp_L = p->lp_R = p->ap_L = p->ap_R = 0.0f;
}

API void dspi_fw_set_gains_raw(FwFloat* p, const float* preamp_lin,
                               float master_vol_lin, int host_vol_q15,
                               int host_mute, const float* matrix_lin,
                               const float* out_gain_lin,
                               const uint8_t* out_en, const uint8_t* out_mute,
                               const int32_t* delay_samples) {
    p->preamp_lin[0] = preamp_lin[0];
    p->preamp_lin[1] = preamp_lin[1];
    p->master_vol_lin = master_vol_lin;
    p->vol_mul = host_mute ? 0.0f : (float)host_vol_q15 * (1.0f / 32768.0f);
    for (int in = 0; in < 2; in++)
        for (int o = 0; o < p->nout; o++)
            p->matrix_gain[in][o] = matrix_lin[in * p->nout + o];
    for (int o = 0; o < p->nout; o++) {
        p->out_gain_lin[o] = out_gain_lin[o];
        p->out_en[o] = out_en[o];
        p->out_mute[o] = out_mute[o];
        p->delay_samples[o] = delay_samples[o] & fwf::DELAY_MASK;
    }
}

// Coefficient-derivation probes (native libm), for ulp-level comparison
// against the Python design path.
API float dspi_fw_db_to_linear(float db) { return fwf::db_to_linear(db); }
API float dspi_fw_compute_alpha(float rate, float t) {
    return fwf::compute_alpha(rate, t);
}

// ===========================================================================
// Firmware-Q28 oracle: the FULL RP2040 fixed-point packet chain with the
// firmware's exact arithmetic — Q28/Q15 integer signal path everywhere, and
// *libm floats with hardware division* in the leveller's once-per-block gain
// computer and per-sample limiter (leveller.c:264-389).  This is the piece
// round 1 lacked: the repo's Q28 device path was proven bit-exact only
// against a golden twin sharing deterministic fmath; a 1-ulp libm difference
// in log10f/powf can flip the quantized Q28 gain LSB.  This oracle makes the
// Q28 word-flip rate a measurement (tests/test_fw_oracle.py).
// One stream, sample-sequential — an oracle, not a data plane.
// Semantics: usb_audio.c:968-1283 (single-core ordering; the EQ-worker
// split is value-identical), leveller.c:264-389, crossfeed.c:158-180,
// dsp_process_rp2040.S:225-394, pdm_generator.c:349-397.
// ===========================================================================

namespace fwq {

constexpr int MAXCH = 8;                    // RP2040: 7 channels
constexpr int MAXB = 16;
constexpr int DELAY_MASK = 2047;            // config.h:87 (RP2040: 2048)
constexpr int LA_SAMPLES = 480;             // leveller.h:34
constexpr float LIMITER_CEIL = 0.70795f;    // leveller.h:53 (-3 dBFS)

struct FwQ28 {
    float rate;
    int nout, nspdif, nch, nb;
    // EQ (master channels 0-1, per-output channels 2..): TDF2 cascades
    int32_t kinds[MAXCH][MAXB];             // 0 = skip, nonzero = active
    int32_t coef[MAXCH][MAXB][5];           // b0,b1,b2,a1,a2 Q28
    int32_t eq_s1[MAXCH][MAXB], eq_s2[MAXCH][MAXB];
    int bypass_master;
    uint8_t ch_bypassed[MAXCH];
    // loudness (usb_audio.c:1017-1046)
    int loud_on;
    int32_t loud_c[2][5];
    int32_t loud_byp[2];
    int32_t loud_s1[2][2], loud_s2[2][2];   // [ch 0/1][biquad j]
    // gains
    int32_t preamp_q28[2];
    int32_t master_vol_q15;
    int32_t host_vol_q15;
    int host_mute;
    int32_t matrix_q15[2][MAXCH];           // signed Q15, 0 when disabled
    uint8_t out_en[MAXCH], out_mute[MAXCH];
    float out_gain_lin[MAXCH];
    int32_t delay_samples[MAXCH];
    int32_t* delay_lines;                   // [nout][DELAY_MASK+1]
    uint32_t delay_widx;
    // leveller (leveller.c RP2040 branch)
    int lev_on, lev_lookahead;
    float alpha_rms, alpha_attack, alpha_release;
    float threshold_db, knee_db, gate_db, ratio, max_gain_db, makeup_db;
    int32_t env_l, env_r;
    float gain_smooth_db;
    int32_t gain_q28, gain_prev_q28;
    int32_t la_buf[2][LA_SAMPLES];
    uint32_t la_idx;
    // crossfeed (Q28)
    int xf_on;
    int32_t lp_a0, lp_b1, ap_a;
    int32_t lp_L, lp_R, ap_L, ap_R;
    // PDM modulator (9-word state shared with dspi_pdm_block)
    int pdm_on;
    int32_t pdm_state[9];
};

// Saturating float->int32, the conversion the firmware actually performs:
// the RP2040 bootrom/AEABI float-to-int routines saturate out-of-range
// values, as does the RP2350 FPU's VCVT — unlike x86 cvttss2si (INT_MIN).
// Matters in the limiter: ceil/peak for quiet signals overflows Q28.
static inline int32_t f2i_sat(float x) {
    if (x >= 2147483648.0f) return INT32_MAX;
    if (x < -2147483648.0f) return INT32_MIN;
    return (int32_t)x;
}

// dsp_process_channel_block (dsp_process_rp2040.S:225-394): band-major TDF2
// cascade over the enabled bands of one channel.
static void eq_block(FwQ28* p, int ch, int32_t* samples, int count) {
    for (int band = 0; band < p->nb; band++) {
        if (p->kinds[ch][band] == 0) continue;
        const int32_t* c = p->coef[ch][band];
        int32_t s1 = p->eq_s1[ch][band], s2 = p->eq_s2[ch][band];
        for (int i = 0; i < count; i++) {
            int32_t x = samples[i];
            int32_t y = wrap_add(dspi_q28_mul(c[0], x), s1);
            s1 = wrap_add(wrap_sub(dspi_q28_mul(c[1], x),
                                   dspi_q28_mul(c[3], y)), s2);
            s2 = wrap_sub(dspi_q28_mul(c[2], x), dspi_q28_mul(c[4], y));
            samples[i] = y;
        }
        p->eq_s1[ch][band] = s1;
        p->eq_s2[ch][band] = s2;
    }
}

// leveller.c:275-389 verbatim: Q28 envelopes and gain application, float
// gain computer with libm log10f/powf, int64 gain interpolation, float
// division in the per-sample limiter.
static void leveller_block(FwQ28* p, int32_t* buf_l, int32_t* buf_r,
                           int count) {
    if (count == 0) return;

    int32_t a_rms_q28 = (int32_t)(p->alpha_rms * (float)(1 << 28));
    int32_t one_minus_a_q28 = (1 << 28) - a_rms_q28;
    int32_t env_l = p->env_l, env_r = p->env_r;
    for (int i = 0; i < count; i++) {
        int32_t sl = buf_l[i], sr = buf_r[i];
        int32_t sq_l = dspi_q28_mul(sl, sl);
        int32_t sq_r = dspi_q28_mul(sr, sr);
        env_l = wrap_add(dspi_q28_mul(a_rms_q28, env_l),
                         dspi_q28_mul(one_minus_a_q28, sq_l));
        env_r = wrap_add(dspi_q28_mul(a_rms_q28, env_r),
                         dspi_q28_mul(one_minus_a_q28, sq_r));
    }
    p->env_l = env_l;
    p->env_r = env_r;

    // per-block float gain computation (libm)
    const float inv_q28 = 1.0f / (float)(1 << 28);
    float env_l_f = (float)env_l * inv_q28;
    float env_r_f = (float)env_r * inv_q28;
    float rms_sq = (env_l_f > env_r_f) ? env_l_f : env_r_f;
    float rms_db = 10.0f * log10f(rms_sq + 1e-30f);

    float gc_db;
    if (rms_db < p->gate_db) {
        gc_db = 0.0f;
    } else {
        gc_db = fwf::gain_computer(rms_db, p->threshold_db, p->ratio,
                                   p->knee_db);
        gc_db += p->makeup_db;
        if (gc_db > p->max_gain_db) gc_db = p->max_gain_db;
    }

    float alpha_sample = (gc_db < p->gain_smooth_db) ? p->alpha_attack
                                                     : p->alpha_release;
    float alpha = powf(alpha_sample, (float)count);
    p->gain_smooth_db = alpha * p->gain_smooth_db + (1.0f - alpha) * gc_db;

    float gain_linear = powf(10.0f, p->gain_smooth_db / 20.0f);
    p->gain_prev_q28 = p->gain_q28;
    p->gain_q28 = f2i_sat(gain_linear * (float)(1 << 28));

    int32_t g_prev = p->gain_prev_q28;
    int32_t g_cur = p->gain_q28;
    const int32_t unity_q28 = (1 << 28);
    const float ceilv = LIMITER_CEIL;
    bool use_la = p->lev_lookahead;
    uint32_t la_idx = p->la_idx;

    for (int i = 0; i < count; i++) {
        int32_t gain;
        if (count == 1) {
            gain = g_cur;
        } else {
            gain = wrap_add(g_prev,
                            (int32_t)(((int64_t)wrap_sub(g_cur, g_prev) * i)
                                      / (int32_t)(count - 1)));
        }

        int32_t out_l, out_r;
        if (use_la) {
            out_l = p->la_buf[0][la_idx];
            out_r = p->la_buf[1][la_idx];
            p->la_buf[0][la_idx] = buf_l[i];
            p->la_buf[1][la_idx] = buf_r[i];
            la_idx++;
            if (la_idx >= LA_SAMPLES) la_idx = 0;
        } else {
            out_l = buf_l[i];
            out_r = buf_r[i];
        }

        if (gain > unity_q28) {
            float peak = fabsf((float)out_l * inv_q28);
            float pr = fabsf((float)out_r * inv_q28);
            if (pr > peak) peak = pr;
            if (peak > 0.0f) {
                float max_g_f = ceilv / peak;
                int32_t max_g_q28 = f2i_sat(max_g_f * (float)unity_q28);
                if (max_g_q28 < gain)
                    gain = (max_g_q28 > unity_q28) ? max_g_q28 : unity_q28;
            }
        }

        buf_l[i] = dspi_q28_mul(out_l, gain);
        buf_r[i] = dspi_q28_mul(out_r, gain);
    }
    p->la_idx = la_idx;
}

// crossfeed.c:161-180 (Q28)
static inline void crossfeed_stereo(FwQ28* p, int32_t* left, int32_t* right) {
    int32_t in_L = *left, in_R = *right;
    int32_t lp_out_L = wrap_add(dspi_q28_mul(p->lp_a0, in_L),
                                dspi_q28_mul(p->lp_b1, p->lp_L));
    int32_t lp_out_R = wrap_add(dspi_q28_mul(p->lp_a0, in_R),
                                dspi_q28_mul(p->lp_b1, p->lp_R));
    p->lp_L = lp_out_L;
    p->lp_R = lp_out_R;
    int32_t ap_out_L = wrap_add(dspi_q28_mul(p->ap_a, lp_out_L), p->ap_L);
    p->ap_L = wrap_sub(lp_out_L, dspi_q28_mul(p->ap_a, ap_out_L));
    int32_t ap_out_R = wrap_add(dspi_q28_mul(p->ap_a, lp_out_R), p->ap_R);
    p->ap_R = wrap_sub(lp_out_R, dspi_q28_mul(p->ap_a, ap_out_R));
    *left = wrap_add(wrap_sub(in_L, lp_out_L), ap_out_R);
    *right = wrap_add(wrap_sub(in_R, lp_out_R), ap_out_L);
}

}  // namespace fwq

using fwq::FwQ28;

API FwQ28* dspi_fwq_new(float rate, int nout, int nspdif, int nch, int nb) {
    FwQ28* p = (FwQ28*)calloc(1, sizeof(FwQ28));
    p->rate = rate;
    p->nout = nout;
    p->nspdif = nspdif;
    p->nch = nch;
    p->nb = nb;
    p->delay_lines =
        (int32_t*)calloc((size_t)nout * (fwq::DELAY_MASK + 1),
                         sizeof(int32_t));
    p->master_vol_q15 = 32768;
    p->host_vol_q15 = 32768;
    p->gain_q28 = (1 << 28);
    p->gain_prev_q28 = (1 << 28);
    p->preamp_q28[0] = p->preamp_q28[1] = (1 << 28);
    return p;
}

API void dspi_fwq_free(FwQ28* p) {
    if (p) {
        free(p->delay_lines);
        free(p);
    }
}

API void dspi_fwq_set_eq(FwQ28* p, const int32_t* kinds, const int32_t* coef,
                         int bypass_master, const uint8_t* ch_bypassed) {
    for (int ch = 0; ch < p->nch; ch++) {
        p->ch_bypassed[ch] = ch_bypassed[ch];
        for (int b = 0; b < p->nb; b++) {
            p->kinds[ch][b] = kinds[ch * p->nb + b];
            memcpy(p->coef[ch][b], coef + (ch * p->nb + b) * 5,
                   5 * sizeof(int32_t));
        }
    }
    p->bypass_master = bypass_master;
}

API void dspi_fwq_set_loudness(FwQ28* p, int enabled, const int32_t* coef,
                               const int32_t* bypass) {
    p->loud_on = enabled;
    if (enabled) {
        memcpy(p->loud_c, coef, sizeof(p->loud_c));
        p->loud_byp[0] = bypass[0];
        p->loud_byp[1] = bypass[1];
    }
}

// Raw quantized gains — the same ints ChainParams carries, so the test
// isolates the runtime signal path (the Q28/Q15 derivations are exact
// integer quantizations measured by the layout/design tests).
API void dspi_fwq_set_gains(FwQ28* p, const int32_t* preamp_q28,
                            int master_vol_q15, int host_vol_q15,
                            int host_mute, const int32_t* matrix_q15,
                            const float* out_gain_lin, const uint8_t* out_en,
                            const uint8_t* out_mute,
                            const int32_t* delay_samples) {
    p->preamp_q28[0] = preamp_q28[0];
    p->preamp_q28[1] = preamp_q28[1];
    p->master_vol_q15 = master_vol_q15;
    p->host_vol_q15 = host_vol_q15;
    p->host_mute = host_mute;
    for (int in = 0; in < 2; in++)
        for (int o = 0; o < p->nout; o++)
            p->matrix_q15[in][o] = matrix_q15[in * p->nout + o];
    for (int o = 0; o < p->nout; o++) {
        p->out_gain_lin[o] = out_gain_lin[o];
        p->out_en[o] = out_en[o];
        p->out_mute[o] = out_mute[o];
        p->delay_samples[o] = delay_samples[o] & fwq::DELAY_MASK;
    }
}

API void dspi_fwq_set_leveller_raw(FwQ28* p, int enabled, int lookahead,
                                   float a_rms, float a_att, float a_rel,
                                   float thresh, float knee, float gate,
                                   float ratio, float max_gain, float makeup) {
    p->lev_on = enabled;
    p->lev_lookahead = lookahead;
    p->alpha_rms = a_rms;
    p->alpha_attack = a_att;
    p->alpha_release = a_rel;
    p->threshold_db = thresh;
    p->knee_db = knee;
    p->gate_db = gate;
    p->ratio = ratio;
    p->max_gain_db = max_gain;
    p->makeup_db = makeup;
}

API void dspi_fwq_set_crossfeed(FwQ28* p, int enabled, int32_t lp_a0,
                                int32_t lp_b1, int32_t ap_a) {
    p->xf_on = enabled;
    p->lp_a0 = lp_a0;
    p->lp_b1 = lp_b1;
    p->ap_a = ap_a;
    p->lp_L = p->lp_R = p->ap_L = p->ap_R = 0;
}

API void dspi_fwq_enable_pdm(FwQ28* p, int enabled, int fade) {
    p->pdm_on = enabled;
    memset(p->pdm_state, 0, sizeof(p->pdm_state));
    p->pdm_state[7] = 123456789;            // xorshift32 seed
    p->pdm_state[8] = fade ? 0 : 1024;
}

// diagnostic: leveller internals (env Q28, gains Q28, smoothed dB bits)
API void dspi_fwq_get_lev(FwQ28* p, int32_t* out5) {
    out5[0] = p->env_l;
    out5[1] = p->env_r;
    out5[2] = p->gain_q28;
    out5[3] = p->gain_prev_q28;
    float g = p->gain_smooth_db;
    memcpy(&out5[4], &g, 4);
}

// process_audio_packet Q28 path (usb_audio.c:968-1283), single-core
// ordering.  x: int32 [npkt][2][T] (s16 values, or sign-extended s24);
// preset_mute: float [npkt] (1.0 = no envelope);
// out: int32 [npkt][nout][T] post-delay Q28 buf_out;
// pdm_words: uint32 [npkt*T*8] or NULL.
API void dspi_fwq_process(FwQ28* p, const int32_t* x, int npkt, int T,
                          int bit24, const float* preset_mute, int32_t* out,
                          uint32_t* pdm_words) {
    int32_t buf_l[512], buf_r[512];
    int32_t buf_out[fwq::MAXCH][512];

    for (int pkt = 0; pkt < npkt; pkt++) {
        const int32_t* in_l = x + ((size_t)pkt * 2) * T;
        const int32_t* in_r = in_l + T;

        // per-packet volume staging (usb_audio.c:975-980)
        int32_t vol_mul = p->host_mute ? 0 : p->host_vol_q15;
        float pm = preset_mute ? preset_mute[pkt] : 1.0f;
        int32_t pm_q15 = (int32_t)(pm * 32768.0f + 0.5f);
        if (pm_q15 < 0) pm_q15 = 0;
        if (pm_q15 > 32768) pm_q15 = 32768;
        vol_mul = dspi_q15_mul(vol_mul, pm_q15);
        int32_t vol_mul_master = dspi_q15_mul(vol_mul, p->master_vol_q15);

        // PASS 1: unpack + preamp (usb_audio.c:996-1015)
        for (int i = 0; i < T; i++) {
            int32_t raw_l, raw_r;
            if (bit24) {
                raw_l = (int32_t)((uint32_t)in_l[i] << 8) >> 2;
                raw_r = (int32_t)((uint32_t)in_r[i] << 8) >> 2;
            } else {
                raw_l = in_l[i] << 14;
                raw_r = in_r[i] << 14;
            }
            buf_l[i] = dspi_q28_mul(raw_l, p->preamp_q28[0]);
            buf_r[i] = dspi_q28_mul(raw_r, p->preamp_q28[1]);
        }

        // loudness biquads (usb_audio.c:1017-1046)
        if (p->loud_on) {
            for (int i = 0; i < T; i++) {
                int32_t rl = buf_l[i], rr = buf_r[i];
                for (int j = 0; j < 2; j++) {
                    if (p->loud_byp[j]) continue;
                    const int32_t* lc = p->loud_c[j];
                    int32_t res = wrap_add(dspi_q28_mul(lc[0], rl),
                                           p->loud_s1[0][j]);
                    p->loud_s1[0][j] =
                        wrap_add(wrap_sub(dspi_q28_mul(lc[1], rl),
                                          dspi_q28_mul(lc[3], res)),
                                 p->loud_s2[0][j]);
                    p->loud_s2[0][j] = wrap_sub(dspi_q28_mul(lc[2], rl),
                                                dspi_q28_mul(lc[4], res));
                    rl = res;
                }
                for (int j = 0; j < 2; j++) {
                    if (p->loud_byp[j]) continue;
                    const int32_t* lc = p->loud_c[j];
                    int32_t res = wrap_add(dspi_q28_mul(lc[0], rr),
                                           p->loud_s1[1][j]);
                    p->loud_s1[1][j] =
                        wrap_add(wrap_sub(dspi_q28_mul(lc[1], rr),
                                          dspi_q28_mul(lc[3], res)),
                                 p->loud_s2[1][j]);
                    p->loud_s2[1][j] = wrap_sub(dspi_q28_mul(lc[2], rr),
                                                dspi_q28_mul(lc[4], res));
                    rr = res;
                }
                buf_l[i] = rl;
                buf_r[i] = rr;
            }
        }

        // PASS 2: master EQ
        if (!p->bypass_master) {
            if (!p->ch_bypassed[0]) fwq::eq_block(p, 0, buf_l, T);
            if (!p->ch_bypassed[1]) fwq::eq_block(p, 1, buf_r, T);
        }

        // PASS 2.5: leveller
        if (p->lev_on) fwq::leveller_block(p, buf_l, buf_r, T);

        // PASS 3: crossfeed (peaks are telemetry, not signal — skipped)
        if (p->xf_on)
            for (int i = 0; i < T; i++)
                fwq::crossfeed_stereo(p, &buf_l[i], &buf_r[i]);

        // PASS 4: matrix (usb_audio.c:1075-1100), output-major Q15
        for (int o = 0; o < p->nout; o++) {
            int32_t* dst = buf_out[o];
            if (!p->out_en[o]) {
                memset(dst, 0, T * sizeof(int32_t));
                continue;
            }
            int32_t gl = p->matrix_q15[0][o], gr = p->matrix_q15[1][o];
            if (gl != 0 && gr != 0) {
                for (int i = 0; i < T; i++)
                    dst[i] = wrap_add(dspi_q15_mul(buf_l[i], gl),
                                      dspi_q15_mul(buf_r[i], gr));
            } else if (gl != 0) {
                for (int i = 0; i < T; i++)
                    dst[i] = dspi_q15_mul(buf_l[i], gl);
            } else if (gr != 0) {
                for (int i = 0; i < T; i++)
                    dst[i] = dspi_q15_mul(buf_r[i], gr);
            } else {
                memset(dst, 0, T * sizeof(int32_t));
            }
        }

        // PASS 5: per-output EQ + gain (usb_audio.c:1195-1222)
        for (int o = 0; o < p->nout; o++) {
            if (!p->out_en[o]) continue;
            if (!p->out_mute[o]) {
                int eq_ch = 2 + o;
                if (!p->bypass_master && !p->ch_bypassed[eq_ch])
                    fwq::eq_block(p, eq_ch, buf_out[o], T);
            }
            // float multiply then truncate (usb_audio.c:1203-1205)
            int32_t gain = p->out_mute[o]
                ? 0
                : fwq::f2i_sat(p->out_gain_lin[o] * (float)vol_mul_master);
            if (gain == 0) {
                memset(buf_out[o], 0, T * sizeof(int32_t));
            } else {
                int32_t* dst = buf_out[o];
                for (int i = 0; i < T; i++)
                    dst[i] = dspi_q15_mul(dst[i], gain);
            }
        }

        // delay lines (usb_audio.c:1224-1238): shared base write index
        for (int o = 0; o < p->nout; o++) {
            int32_t dly = p->delay_samples[o];
            if (dly <= 0) continue;
            int32_t* dst = buf_out[o];
            int32_t* dline =
                p->delay_lines + (size_t)o * (fwq::DELAY_MASK + 1);
            uint32_t widx = p->delay_widx;
            for (int i = 0; i < T; i++) {
                dline[widx] = dst[i];
                dst[i] = dline[(widx - dly) & fwq::DELAY_MASK];
                widx = (widx + 1) & fwq::DELAY_MASK;
            }
        }
        p->delay_widx = (p->delay_widx + T) & fwq::DELAY_MASK;

        // PDM sub (usb_audio.c:1264-1276)
        if (p->pdm_on && p->out_en[p->nout - 1] && pdm_words) {
            const int32_t* sub = buf_out[p->nout - 1];
            for (int i = 0; i < T; i++)
                fwf::pdm_sample(p->pdm_state, sub[i],
                                pdm_words + ((size_t)pkt * T + i) * 8);
        }

        for (int o = 0; o < p->nout; o++)
            memcpy(out + ((size_t)pkt * p->nout + o) * T, buf_out[o],
                   T * sizeof(int32_t));
    }
}
