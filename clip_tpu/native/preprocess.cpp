// Native host-side image preprocessing for clip_tpu.
//
// Role: the CPU-side feed pipeline in front of the TPU — PIL-parity bicubic
// resize (a = -0.5, per-output-pixel coefficient windows), short-side scale,
// center crop and mean/std normalization, with a std::thread pool for
// batches.  Functionally covers the reference's clip_image_preprocess /
// clip_image_batch_preprocess (see /root/reference/clip.cpp:797-1008) but is
// an independent implementation: planes are resampled through a reusable
// ResampleAxis object and threading uses C++11 primitives, not pthreads.
//
// Exposed as a plain C ABI consumed via ctypes (clip_tpu/native/__init__.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Keys cubic kernel, a = -0.5 (PIL BICUBIC).
inline double cubic(double t) {
    constexpr double a = -0.5;
    t = std::fabs(t);
    if (t < 1.0) return ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0;
    if (t < 2.0) return (((t - 5.0) * t + 8.0) * t - 4.0) * a;
    return 0.0;
}

// Precomputed resampling windows for one axis: for each output index,
// a [first, first+len) source range and normalized weights.
struct ResampleAxis {
    int out_size = 0;
    int window = 0;                 // max taps per output pixel
    std::vector<int> first;         // [out_size]
    std::vector<int> len;           // [out_size]
    std::vector<double> weight;     // [out_size * window]

    ResampleAxis(int in_size, int out_size_) : out_size(out_size_) {
        const double step = static_cast<double>(in_size) / out_size;
        const double scale = std::max(step, 1.0);
        const double radius = 2.0 * scale;
        window = static_cast<int>(std::ceil(radius)) * 2 + 1;
        first.resize(out_size);
        len.resize(out_size);
        weight.assign(static_cast<size_t>(out_size) * window, 0.0);

        for (int o = 0; o < out_size; ++o) {
            const double center = (o + 0.5) * step;
            int lo = static_cast<int>(center - radius + 0.5);
            int hi = static_cast<int>(center + radius + 0.5);
            lo = std::max(lo, 0);
            hi = std::min(hi, in_size);
            double total = 0.0;
            double* w = &weight[static_cast<size_t>(o) * window];
            for (int s = lo; s < hi; ++s) {
                const double v = cubic((s - center + 0.5) / scale);
                w[s - lo] = v;
                total += v;
            }
            if (total != 0.0) {
                for (int s = 0; s < hi - lo; ++s) w[s] /= total;
            }
            first[o] = lo;
            len[o] = hi - lo;
        }
    }
};

inline float clamp255(double v) {
    return static_cast<float>(std::min(std::max(v, 0.0), 255.0));
}

// Resample rows (horizontal axis) of an interleaved RGB float image.
void resample_h(const float* src, int h, int w_in, const ResampleAxis& ax, float* dst) {
    for (int y = 0; y < h; ++y) {
        const float* row = src + static_cast<size_t>(y) * w_in * 3;
        float* out = dst + static_cast<size_t>(y) * ax.out_size * 3;
        for (int o = 0; o < ax.out_size; ++o) {
            const double* wgt = &ax.weight[static_cast<size_t>(o) * ax.window];
            const int f = ax.first[o];
            double acc[3] = {0.0, 0.0, 0.0};
            for (int t = 0; t < ax.len[o]; ++t) {
                const float* px = row + static_cast<size_t>(f + t) * 3;
                acc[0] += wgt[t] * px[0];
                acc[1] += wgt[t] * px[1];
                acc[2] += wgt[t] * px[2];
            }
            out[o * 3 + 0] = clamp255(acc[0]);
            out[o * 3 + 1] = clamp255(acc[1]);
            out[o * 3 + 2] = clamp255(acc[2]);
        }
    }
}

// Resample columns (vertical axis).
void resample_v(const float* src, int h_in, int w, const ResampleAxis& ax, float* dst) {
    for (int o = 0; o < ax.out_size; ++o) {
        const double* wgt = &ax.weight[static_cast<size_t>(o) * ax.window];
        const int f = ax.first[o];
        float* out = dst + static_cast<size_t>(o) * w * 3;
        for (int x = 0; x < w * 3; ++x) {
            double acc = 0.0;
            for (int t = 0; t < ax.len[o]; ++t) {
                acc += wgt[t] * src[static_cast<size_t>(f + t) * w * 3 + x];
            }
            out[x] = clamp255(acc);
        }
    }
}

}  // namespace

extern "C" {

// uint8 RGB (h, w, 3) -> float32 (image_size, image_size, 3), normalized.
// Returns 0 on success.
int ctpu_preprocess(const uint8_t* img, int h, int w, int image_size,
                    const float* mean, const float* stddev, float* out) {
    if (!img || !out || h <= 0 || w <= 0 || image_size <= 0) return 1;

    const double ratio = static_cast<double>(std::min(w, h)) / image_size;
    const int rw = static_cast<int>(w / ratio + 0.5);
    const int rh = static_cast<int>(h / ratio + 0.5);
    if (rw < image_size || rh < image_size) return 2;

    std::vector<float> fimg(static_cast<size_t>(h) * w * 3);
    for (size_t i = 0; i < fimg.size(); ++i) fimg[i] = img[i];

    ResampleAxis hx(w, rw);
    std::vector<float> tmp(static_cast<size_t>(h) * rw * 3);
    resample_h(fimg.data(), h, w, hx, tmp.data());

    ResampleAxis vx(h, rh);
    std::vector<float> res(static_cast<size_t>(rh) * rw * 3);
    resample_v(tmp.data(), h, rw, vx, res.data());

    const int cx = (rw - image_size) / 2;
    const int cy = (rh - image_size) / 2;
    const float inv255 = 1.0f / 255.0f;
    for (int y = 0; y < image_size; ++y) {
        const float* src = res.data() + (static_cast<size_t>(y + cy) * rw + cx) * 3;
        float* dst = out + static_cast<size_t>(y) * image_size * 3;
        for (int x = 0; x < image_size; ++x) {
            for (int c = 0; c < 3; ++c) {
                dst[x * 3 + c] = (src[x * 3 + c] * inv255 - mean[c]) / stddev[c];
            }
        }
    }
    return 0;
}

// Batch version with a thread pool.  imgs: array of pointers; hs/ws: sizes.
// outs laid out contiguously at out + i * image_size * image_size * 3.
int ctpu_preprocess_batch(const uint8_t* const* imgs, const int* hs, const int* ws,
                          int n, int image_size, const float* mean,
                          const float* stddev, float* out, int n_threads) {
    if (n <= 0) return 0;
    n_threads = std::max(1, std::min(n_threads, n));
    std::atomic<int> next(0);
    std::atomic<int> status(0);
    const size_t stride = static_cast<size_t>(image_size) * image_size * 3;

    auto worker = [&]() {
        for (;;) {
            const int i = next.fetch_add(1);
            if (i >= n) return;
            const int rc = ctpu_preprocess(imgs[i], hs[i], ws[i], image_size,
                                           mean, stddev, out + stride * i);
            if (rc != 0) status.store(rc);
        }
    };

    if (n_threads == 1) {
        worker();
    } else {
        std::vector<std::thread> pool;
        pool.reserve(n_threads);
        for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
        for (auto& th : pool) th.join();
    }
    return status.load();
}

}  // extern "C"
