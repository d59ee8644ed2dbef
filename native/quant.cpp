// Native block quantizer for moshi_tpu — the host-side load path.
//
// The reference quantizes weights at load time in C++ via GGML's
// quantize kernels (/root/reference/src/loader.h:149-189); numpy is
// 10-50x slower for a 7B model, so this multithreaded implementation is
// the fast path behind moshi_tpu/quant/formats.py (ctypes binding in
// moshi_tpu/native.py, numpy fallback when the .so is absent).
//
// Layouts (must match quant/formats.py exactly):
//   q8_0: q int8 [O,I], d f16 [O,I/32]; q = round(w / (absmax/127))
//   q4_0: planar nibbles — packed byte j of a row holds column j (low)
//         and column j+I/2 (high); d = signed_extreme / -8 per 32-block
//   q4_k: planar nibbles; per-32 6-bit scale/min quantized against per-256
//         f16 super-scales d, dmin;  w ~= (d*sc)*q - (dmin*mn)
//
// Build: make -C native   (produces libmoshi_quant.so)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

constexpr int QK = 32;
constexpr int QK_K = 256;

static inline uint16_t f32_to_bf16(float f) {
    // round-to-nearest-even truncation to bfloat16 (scales are bf16 on
    // TPU: Mosaic kernels have no f16 type)
    uint32_t u;
    std::memcpy(&u, &f, 4);
    uint32_t rounding = 0x7FFFu + ((u >> 16) & 1u);
    return (uint16_t)((u + rounding) >> 16);
}

static inline float bf16_to_f32(uint16_t h) {
    uint32_t u = (uint32_t)h << 16;
    float f;
    std::memcpy(&f, &u, 4);
    return f;
}

static inline uint16_t f32_to_f16(float f) {
    uint32_t x;
    std::memcpy(&x, &f, 4);
    uint32_t sign = (x >> 16) & 0x8000u;
    int32_t exp = (int32_t)((x >> 23) & 0xff) - 127 + 15;
    uint32_t mant = x & 0x7fffffu;
    if (exp <= 0) {
        if (exp < -10) return (uint16_t)sign;
        mant |= 0x800000u;
        uint32_t shift = 14 - exp;
        uint16_t h = (uint16_t)(mant >> shift);
        // round to nearest
        if (mant & (1u << (shift - 1))) h++;
        return (uint16_t)(sign | h);
    }
    if (exp >= 31) return (uint16_t)(sign | 0x7c00u);
    uint16_t h = (uint16_t)(sign | (exp << 10) | (mant >> 13));
    if (mant & 0x1000u) h++;  // round
    return h;
}

static inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
    uint32_t exp = (h >> 10) & 0x1f;
    uint32_t mant = h & 0x3ffu;
    uint32_t x;
    if (exp == 0) {
        if (mant == 0) { x = sign; }
        else {
            exp = 127 - 15 + 1;
            while (!(mant & 0x400u)) { mant <<= 1; exp--; }
            mant &= 0x3ffu;
            x = sign | (exp << 23) | (mant << 13);
        }
    } else if (exp == 31) {
        x = sign | 0x7f800000u | (mant << 13);
    } else {
        x = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    float f;
    std::memcpy(&f, &x, 4);
    return f;
}

template <class F>
void parallel_rows(int64_t O, F fn) {
    unsigned n = std::max(1u, std::thread::hardware_concurrency());
    n = std::min<unsigned>(n, 32);
    if (O < 64) n = 1;
    std::vector<std::thread> ts;
    int64_t chunk = (O + n - 1) / n;
    for (unsigned t = 0; t < n; t++) {
        int64_t lo = t * chunk, hi = std::min<int64_t>(O, lo + chunk);
        if (lo >= hi) break;
        ts.emplace_back([=] { for (int64_t o = lo; o < hi; o++) fn(o); });
    }
    for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

void moshi_quantize_q8_0(const float* w, int64_t O, int64_t I,
                         int8_t* q, uint16_t* d) {
    int64_t nb = I / QK;
    parallel_rows(O, [=](int64_t o) {
        const float* row = w + o * I;
        for (int64_t b = 0; b < nb; b++) {
            const float* blk = row + b * QK;
            float amax = 0.f;
            for (int i = 0; i < QK; i++) amax = std::max(amax, std::fabs(blk[i]));
            float scale = amax / 127.f;
            uint16_t dh = f32_to_bf16(scale);
            d[o * nb + b] = dh;
            float ds = bf16_to_f32(dh);
            float inv = ds > 0.f ? 1.f / ds : 0.f;
            int8_t* dst = q + o * I + b * QK;
            for (int i = 0; i < QK; i++) {
                int v = (int)std::lround(blk[i] * inv);
                dst[i] = (int8_t)std::clamp(v, -127, 127);
            }
        }
    });
}

void moshi_quantize_q4_0(const float* w, int64_t O, int64_t I,
                         uint8_t* q, uint16_t* d) {
    int64_t nb = I / QK;
    int64_t half = I / 2;
    parallel_rows(O, [=](int64_t o) {
        const float* row = w + o * I;
        std::vector<uint8_t> tmp(I);
        for (int64_t b = 0; b < nb; b++) {
            const float* blk = row + b * QK;
            float amax = 0.f, ext = 0.f;
            for (int i = 0; i < QK; i++) {
                float a = std::fabs(blk[i]);
                if (a > amax) { amax = a; ext = blk[i]; }
            }
            uint16_t dh = f32_to_bf16(ext / -8.f);
            d[o * nb + b] = dh;
            float ds = bf16_to_f32(dh);
            float inv = ds != 0.f ? 1.f / ds : 0.f;
            for (int i = 0; i < QK; i++) {
                int v = (int)std::lround(blk[i] * inv) + 8;
                tmp[b * QK + i] = (uint8_t)std::clamp(v, 0, 15);
            }
        }
        uint8_t* dst = q + o * half;
        for (int64_t j = 0; j < half; j++)
            dst[j] = (uint8_t)(tmp[j] | (tmp[j + half] << 4));
    });
}

void moshi_quantize_q4_k(const float* w, int64_t O, int64_t I,
                         uint8_t* q, uint8_t* sc_out, uint8_t* mn_out,
                         uint16_t* d_out, uint16_t* dmin_out) {
    int64_t nsb = I / QK_K;
    int64_t half = I / 2;
    parallel_rows(O, [=](int64_t o) {
        const float* row = w + o * I;
        std::vector<uint8_t> tmp(I);
        for (int64_t s = 0; s < nsb; s++) {
            const float* sb = row + s * QK_K;
            float scales[8], mins[8];
            float smax = 0.f, mmax = 0.f;
            for (int b = 0; b < 8; b++) {
                const float* blk = sb + b * QK;
                float lo = 0.f, hi = 0.f;
                for (int i = 0; i < QK; i++) {
                    lo = std::min(lo, blk[i]);
                    hi = std::max(hi, blk[i]);
                }
                scales[b] = (hi - lo) / 15.f;
                mins[b] = -lo;
                smax = std::max(smax, scales[b]);
                mmax = std::max(mmax, mins[b]);
            }
            uint16_t dh = f32_to_bf16(smax / 63.f);
            uint16_t dmh = f32_to_bf16(mmax / 63.f);
            d_out[o * nsb + s] = dh;
            dmin_out[o * nsb + s] = dmh;
            float ds = bf16_to_f32(dh);
            float dms = bf16_to_f32(dmh);
            for (int b = 0; b < 8; b++) {
                int scq = ds > 0.f ?
                    (int)std::lround(scales[b] / ds) : 0;
                int mnq = dms > 0.f ?
                    (int)std::lround(mins[b] / dms) : 0;
                scq = std::clamp(scq, 0, 63);
                mnq = std::clamp(mnq, 0, 63);
                sc_out[(o * nsb + s) * 8 + b] = (uint8_t)scq;
                mn_out[(o * nsb + s) * 8 + b] = (uint8_t)mnq;
                float eff_s = ds * scq;
                float eff_m = dms * mnq;
                float inv = eff_s > 0.f ? 1.f / eff_s : 0.f;
                const float* blk = sb + b * QK;
                uint8_t* t = tmp.data() + s * QK_K + b * QK;
                for (int i = 0; i < QK; i++) {
                    int v = (int)std::lround((blk[i] + eff_m) * inv);
                    t[i] = (uint8_t)std::clamp(v, 0, 15);
                }
            }
        }
        uint8_t* dst = q + o * half;
        for (int64_t j = 0; j < half; j++)
            dst[j] = (uint8_t)(tmp[j] | (tmp[j + half] << 4));
    });
}

}  // extern "C"
