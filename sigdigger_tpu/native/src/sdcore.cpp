// sdcore — native host-side runtime for sigdigger_tpu.
//
// The reference's engine runs its source thread, format conversion and
// buffering in C (suscan/sigutils); the TPU build keeps the device math
// in Pallas kernels and gives the host paths the same native treatment:
//
//   * sample-format converters (u8/i8/i16 interleaved → float32 I/Q):
//     the per-read hot path for file and SDR sources
//   * strided window framing ([M, K] stride-D windows with history):
//     the host-side feeder of the fused TPU channelizer kernel
//   * a lock-free single-producer/single-consumer ring buffer for
//     source→pipeline streaming without GIL involvement
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the
// image).  Build: see sigdigger_tpu/native/build.py.

#include <atomic>
#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------
// Format converters: interleaved ints → float32 I/Q pairs, full scale.
// ---------------------------------------------------------------------

void sd_convert_u8(const uint8_t* in, float* out, int64_t n_pairs) {
    const float scale = 1.0f / 127.5f;
    for (int64_t i = 0; i < 2 * n_pairs; ++i)
        out[i] = ((float)in[i] - 127.5f) * scale;
}

void sd_convert_i8(const int8_t* in, float* out, int64_t n_pairs) {
    const float scale = 1.0f / 128.0f;
    for (int64_t i = 0; i < 2 * n_pairs; ++i)
        out[i] = (float)in[i] * scale;
}

void sd_convert_i16(const int16_t* in, float* out, int64_t n_pairs) {
    const float scale = 1.0f / 32768.0f;
    for (int64_t i = 0; i < 2 * n_pairs; ++i)
        out[i] = (float)in[i] * scale;
}

// ---------------------------------------------------------------------
// Window framing: ext = [history(K-1) | x(M*D)] → windows[M, K] where
// window m = ext[m*D : m*D+K].  Splits complex64 input into separate
// re/im planes — exactly the layout the fused TPU kernel consumes.
// ---------------------------------------------------------------------

void sd_frame_windows(const float* ext_iq,   // (K-1+M*D) I/Q pairs
                      float* out_re,         // [M, K]
                      float* out_im,         // [M, K]
                      int64_t m, int64_t k, int64_t d) {
    for (int64_t row = 0; row < m; ++row) {
        const float* src = ext_iq + 2 * row * d;
        float* re = out_re + row * k;
        float* im = out_im + row * k;
        for (int64_t j = 0; j < k; ++j) {
            re[j] = src[2 * j];
            im[j] = src[2 * j + 1];
        }
    }
}

// int16 variant of sd_frame_windows: quantizes with `scale` and
// saturates — halves the H2D bytes of the framed upload on
// tunnel/PCIe-attached hosts (the Pallas kernel dequantizes in VMEM).
void sd_frame_windows_i16(const float* ext_iq, int16_t* out_re,
                          int16_t* out_im, int64_t m, int64_t k,
                          int64_t d, float scale) {
    for (int64_t row = 0; row < m; ++row) {
        const float* src = ext_iq + 2 * row * d;
        int16_t* re = out_re + row * k;
        int16_t* im = out_im + row * k;
        for (int64_t j = 0; j < k; ++j) {
            float vr = src[2 * j] * scale;
            float vi = src[2 * j + 1] * scale;
            vr = vr < -32768.f ? -32768.f : (vr > 32767.f ? 32767.f : vr);
            vi = vi < -32768.f ? -32768.f : (vi > 32767.f ? 32767.f : vi);
            re[j] = (int16_t)(vr >= 0.f ? vr + 0.5f : vr - 0.5f);
            im[j] = (int16_t)(vi >= 0.f ? vi + 0.5f : vi - 0.5f);
        }
    }
}


// int8 variant: half the int16 bytes again — the wire precision of
// 8-bit SDR front ends (RTL-SDR class).  Saturating round-to-nearest.
void sd_frame_windows_i8(const float* ext_iq, int8_t* out_re,
                         int8_t* out_im, int64_t m, int64_t k,
                         int64_t d, float scale) {
    for (int64_t row = 0; row < m; ++row) {
        const float* src = ext_iq + 2 * row * d;
        int8_t* re = out_re + row * k;
        int8_t* im = out_im + row * k;
        for (int64_t j = 0; j < k; ++j) {
            float vr = src[2 * j] * scale;
            float vi = src[2 * j + 1] * scale;
            vr = vr < -128.f ? -128.f : (vr > 127.f ? 127.f : vr);
            vi = vi < -128.f ? -128.f : (vi > 127.f ? 127.f : vi);
            re[j] = (int8_t)(vr >= 0.f ? vr + 0.5f : vr - 0.5f);
            im[j] = (int8_t)(vi >= 0.f ? vi + 0.5f : vi - 0.5f);
        }
    }
}

// Non-overlapping PSD framing with window taps and the Bailey [A, F*B]
// layout: sample f*N + a*B + b → out[a, f*B + b].
void sd_frame_psd(const float* x_iq,      // F*N I/Q pairs
                  const float* taps,      // [N]
                  float* out_re,          // [A, F*B]
                  float* out_im,
                  int64_t f_count, int64_t a_count, int64_t b_count) {
    const int64_t n = a_count * b_count;
    for (int64_t f = 0; f < f_count; ++f) {
        for (int64_t a = 0; a < a_count; ++a) {
            const float* src = x_iq + 2 * (f * n + a * b_count);
            const float* w = taps + a * b_count;
            float* re = out_re + a * (f_count * b_count) + f * b_count;
            float* im = out_im + a * (f_count * b_count) + f * b_count;
            for (int64_t b = 0; b < b_count; ++b) {
                re[b] = src[2 * b] * w[b];
                im[b] = src[2 * b + 1] * w[b];
            }
        }
    }
}

// ---------------------------------------------------------------------
// Lock-free SPSC ring buffer of float32 I/Q pairs.
// ---------------------------------------------------------------------

struct sd_ring {
    float* data;                 // 2*capacity floats
    int64_t capacity;            // in complex samples, power of two
    std::atomic<int64_t> head;   // write position (producer)
    std::atomic<int64_t> tail;   // read position (consumer)
};

sd_ring* sd_ring_new(int64_t capacity) {
    if (capacity <= 0 || (capacity & (capacity - 1)) != 0) return nullptr;
    sd_ring* r = new sd_ring;
    r->data = new float[2 * capacity];
    r->capacity = capacity;
    r->head.store(0);
    r->tail.store(0);
    return r;
}

void sd_ring_free(sd_ring* r) {
    if (!r) return;
    delete[] r->data;
    delete r;
}

int64_t sd_ring_readable(const sd_ring* r) {
    return r->head.load(std::memory_order_acquire) -
           r->tail.load(std::memory_order_acquire);
}

int64_t sd_ring_writable(const sd_ring* r) {
    return r->capacity - sd_ring_readable(r);
}

// Returns samples actually written (may be < n when full).
int64_t sd_ring_write(sd_ring* r, const float* iq, int64_t n) {
    int64_t head = r->head.load(std::memory_order_relaxed);
    int64_t free_n = r->capacity -
        (head - r->tail.load(std::memory_order_acquire));
    if (n > free_n) n = free_n;
    const int64_t mask = r->capacity - 1;
    for (int64_t i = 0; i < n; ++i) {
        int64_t pos = (head + i) & mask;
        r->data[2 * pos] = iq[2 * i];
        r->data[2 * pos + 1] = iq[2 * i + 1];
    }
    r->head.store(head + n, std::memory_order_release);
    return n;
}

// Returns samples actually read (may be < n when empty).
int64_t sd_ring_read(sd_ring* r, float* iq, int64_t n) {
    int64_t tail = r->tail.load(std::memory_order_relaxed);
    int64_t avail = r->head.load(std::memory_order_acquire) - tail;
    if (n > avail) n = avail;
    const int64_t mask = r->capacity - 1;
    for (int64_t i = 0; i < n; ++i) {
        int64_t pos = (tail + i) & mask;
        iq[2 * i] = r->data[2 * pos];
        iq[2 * i + 1] = r->data[2 * pos + 1];
    }
    r->tail.store(tail + n, std::memory_order_release);
    return n;
}

}  // extern "C"
