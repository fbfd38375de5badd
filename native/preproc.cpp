// Native image preprocessing: separable bicubic resize + rescale/normalize
// + HWC->CHW, fused in one pass over the output.
//
// Implements the same convolution-based resampling PIL uses (Keys cubic
// kernel a=-0.5, filter support scaled by the ratio when downscaling), so
// results track PIL.Image.resize(..., BICUBIC) closely (PIL runs the same
// math in 8-bit fixed point; small rounding differences remain). The fused
// epilogue applies x/255 -> (x-mean)/std exactly like the host pipeline
// (reference: processing_paligemma.py:13-50).
//
// Exposed with C linkage for the ctypes binding in paligemma_tpu/native.py.
// Build: g++ -O3 -march=native -shared -fPIC preproc.cpp -o libpreproc.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

// Keys cubic kernel, a = -0.5 (PIL's BICUBIC).
inline double cubic(double x) {
    constexpr double a = -0.5;
    x = std::fabs(x);
    if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
    if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
    return 0.0;
}

struct Taps {
    std::vector<int> start;      // first source index per output position
    std::vector<int> count;      // taps per output position
    std::vector<double> weight;  // flattened weights, max_count stride
    int max_count = 0;
};

// Precompute convolution taps for one axis (PIL ImagingResampleHorizontal
// style): center mapping (i + 0.5) * scale, support widened by the scale
// when downscaling, weights normalized to sum 1.
Taps build_taps(int in_size, int out_size) {
    Taps t;
    const double scale = static_cast<double>(in_size) / out_size;
    const double filterscale = std::max(scale, 1.0);
    const double support = 2.0 * filterscale;  // cubic support = 2
    const int max_count = static_cast<int>(std::ceil(support)) * 2 + 1;
    t.max_count = max_count;
    t.start.resize(out_size);
    t.count.resize(out_size);
    t.weight.assign(static_cast<size_t>(out_size) * max_count, 0.0);

    for (int i = 0; i < out_size; ++i) {
        const double center = (i + 0.5) * scale;
        int lo = static_cast<int>(center - support + 0.5);
        int hi = static_cast<int>(center + support + 0.5);
        lo = std::max(lo, 0);
        hi = std::min(hi, in_size);
        double sum = 0.0;
        for (int j = lo; j < hi; ++j) {
            const double w = cubic((j - center + 0.5) / filterscale);
            t.weight[static_cast<size_t>(i) * max_count + (j - lo)] = w;
            sum += w;
        }
        if (sum != 0.0) {
            for (int j = 0; j < hi - lo; ++j)
                t.weight[static_cast<size_t>(i) * max_count + j] /= sum;
        }
        t.start[i] = lo;
        t.count[i] = hi - lo;
    }
    return t;
}

}  // namespace

extern "C" {

// img: (h, w, c) uint8 row-major. out: (c, out_h, out_w) float32.
// Fused: bicubic resize -> /255 -> (x - mean[ch]) / std[ch] -> CHW.
int preproc_image(const uint8_t* img, int h, int w, int c,
                  float* out, int out_h, int out_w,
                  const float* mean, const float* stddev) {
    if (!img || !out || h <= 0 || w <= 0 || c <= 0 || out_h <= 0 || out_w <= 0)
        return -1;

    const Taps tx = build_taps(w, out_w);
    const Taps ty = build_taps(h, out_h);

    // Horizontal pass: (h, w, c) -> (h, out_w, c). PIL quantizes the
    // intermediate image back to uint8 between the two passes — match that
    // so outputs track PIL.Image.resize step-for-step.
    std::vector<uint8_t> tmp(static_cast<size_t>(h) * out_w * c);
    for (int y = 0; y < h; ++y) {
        const uint8_t* row = img + static_cast<size_t>(y) * w * c;
        uint8_t* trow = tmp.data() + static_cast<size_t>(y) * out_w * c;
        for (int x = 0; x < out_w; ++x) {
            const int lo = tx.start[x], n = tx.count[x];
            const double* wts = tx.weight.data() + static_cast<size_t>(x) * tx.max_count;
            for (int ch = 0; ch < c; ++ch) {
                double acc = 0.0;
                for (int j = 0; j < n; ++j)
                    acc += wts[j] * row[(lo + j) * c + ch];
                trow[x * c + ch] = static_cast<uint8_t>(
                    std::min(255.0, std::max(0.0, std::round(acc))));
            }
        }
    }

    // Vertical pass + fused epilogue, writing CHW.
    const double inv255 = 1.0 / 255.0;
    for (int y = 0; y < out_h; ++y) {
        const int lo = ty.start[y], n = ty.count[y];
        const double* wts = ty.weight.data() + static_cast<size_t>(y) * ty.max_count;
        for (int x = 0; x < out_w; ++x) {
            for (int ch = 0; ch < c; ++ch) {
                double acc = 0.0;
                for (int j = 0; j < n; ++j)
                    acc += wts[j] * tmp[(static_cast<size_t>(lo + j) * out_w + x) * c + ch];
                // PIL clips to uint8 after resize; match that before normalize.
                double v = std::min(255.0, std::max(0.0, std::round(acc)));
                v = (v * inv255 - mean[ch]) / stddev[ch];
                out[(static_cast<size_t>(ch) * out_h + y) * out_w + x] =
                    static_cast<float>(v);
            }
        }
    }
    return 0;
}

// Batched variant: imgs (n, h, w, c) -> out (n, c, out_h, out_w).
int preproc_batch(const uint8_t* imgs, int n, int h, int w, int c,
                  float* out, int out_h, int out_w,
                  const float* mean, const float* stddev) {
    const size_t in_stride = static_cast<size_t>(h) * w * c;
    const size_t out_stride = static_cast<size_t>(c) * out_h * out_w;
    for (int i = 0; i < n; ++i) {
        int rc = preproc_image(imgs + i * in_stride, h, w, c,
                               out + i * out_stride, out_h, out_w, mean, stddev);
        if (rc != 0) return rc;
    }
    return 0;
}

}  // extern "C"
