// Native image loader — JPEG decode + antialiased resize + normalize.
//
// Replaces the Pillow(+libjpeg) host preprocessing dependency of the
// reference's dataset path (reference dataset.py:8,115,136: PIL open →
// HF processor resize/normalize) with a first-party C++ pipeline:
// libjpeg-turbo decode → PIL-compatible antialiased triangle/Catmull-Rom
// resampling → rescale+normalize → fp32 CHW, one pass, no intermediate
// Python objects. Called via ctypes from worker threads (the GIL is
// released during the call, so the Python thread pool gets real
// parallelism).
//
// Resampling matches PIL's convolution-based resize (triangle filter for
// BILINEAR, Catmull-Rom a=-0.5 for BICUBIC, filter support scaled by the
// downscale factor = antialias), so outputs agree with the HostPreprocessor
// PIL path to float rounding (tests/test_native_loader.py).

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrMgr {
    jpeg_error_mgr pub;
    jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
    auto* err = reinterpret_cast<ErrMgr*>(cinfo->err);
    longjmp(err->setjmp_buffer, 1);
}

// ---------------------------------------------------------------- filters
double triangle(double x) {
    x = std::abs(x);
    return x < 1.0 ? 1.0 - x : 0.0;
}

double catmull_rom(double x) {  // PIL BICUBIC (a = -0.5)
    constexpr double a = -0.5;
    x = std::abs(x);
    if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
    if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
    return 0.0;
}

// One-dimensional resample pass (PIL's antialias scheme): out length n_out
// from in length n_in; weights precomputed per output index.
struct Pass {
    std::vector<int> first;           // first source index per output pixel
    std::vector<std::vector<double>> weights;
};

Pass build_pass(int n_in, int n_out, bool bicubic) {
    Pass p;
    p.first.resize(n_out);
    p.weights.resize(n_out);
    double scale = static_cast<double>(n_in) / n_out;
    double filterscale = std::max(scale, 1.0);
    double support = (bicubic ? 2.0 : 1.0) * filterscale;
    for (int xx = 0; xx < n_out; xx++) {
        double center = (xx + 0.5) * scale;
        int lo = std::max(0, static_cast<int>(center - support + 0.5));
        int hi = std::min(n_in, static_cast<int>(center + support + 0.5));
        auto& w = p.weights[xx];
        w.resize(hi - lo);
        double total = 0.0;
        for (int i = lo; i < hi; i++) {
            double x = (i + 0.5 - center) / filterscale;
            double v = bicubic ? catmull_rom(x) : triangle(x);
            w[i - lo] = v;
            total += v;
        }
        if (total != 0.0)
            for (auto& v : w) v /= total;
        p.first[xx] = lo;
    }
    return p;
}

// resize interleaved RGB double buffer (h_in, w_in) -> (h_out, w_out)
std::vector<double> resize_rgb(const std::vector<double>& in, int h_in,
                               int w_in, int h_out, int w_out, bool bicubic) {
    Pass px = build_pass(w_in, w_out, bicubic);
    // horizontal
    std::vector<double> tmp(static_cast<size_t>(h_in) * w_out * 3);
    for (int y = 0; y < h_in; y++) {
        const double* row = &in[static_cast<size_t>(y) * w_in * 3];
        double* orow = &tmp[static_cast<size_t>(y) * w_out * 3];
        for (int x = 0; x < w_out; x++) {
            const auto& w = px.weights[x];
            int lo = px.first[x];
            double r = 0, g = 0, b = 0;
            for (size_t k = 0; k < w.size(); k++) {
                const double* pix = row + (lo + k) * 3;
                r += pix[0] * w[k];
                g += pix[1] * w[k];
                b += pix[2] * w[k];
            }
            orow[x * 3 + 0] = r;
            orow[x * 3 + 1] = g;
            orow[x * 3 + 2] = b;
        }
    }
    // vertical
    Pass py = build_pass(h_in, h_out, bicubic);
    std::vector<double> out(static_cast<size_t>(h_out) * w_out * 3);
    for (int y = 0; y < h_out; y++) {
        const auto& w = py.weights[y];
        int lo = py.first[y];
        double* orow = &out[static_cast<size_t>(y) * w_out * 3];
        for (int x = 0; x < w_out; x++) {
            double r = 0, g = 0, b = 0;
            for (size_t k = 0; k < w.size(); k++) {
                const double* pix =
                    &tmp[(static_cast<size_t>(lo + k) * w_out + x) * 3];
                r += pix[0] * w[k];
                g += pix[1] * w[k];
                b += pix[2] * w[k];
            }
            orow[x * 3 + 0] = r;
            orow[x * 3 + 1] = g;
            orow[x * 3 + 2] = b;
        }
    }
    return out;
}

}  // namespace

extern "C" {

// Decode a JPEG and preprocess to fp32 CHW.
//   resample: 0 = bilinear (ViT), 1 = bicubic (CLIP/BLIP)
//   mode:     0 = fixed resize to (out_h, out_w)
//             1 = shortest-edge resize to out_h + center crop (CLIP)
//   mean/stdv: per-channel normalization after /255 rescale
// Returns 0 on success, negative on decode error.
int img_preprocess_jpeg(const uint8_t* data, int32_t len, int32_t out_h,
                        int32_t out_w, int32_t resample, int32_t mode,
                        const float* mean, const float* stdv, float* out) {
    jpeg_decompress_struct cinfo;
    ErrMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = error_exit;
    if (setjmp(jerr.setjmp_buffer)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, len);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        return -2;
    }
    cinfo.out_color_space = JCS_RGB;  // libjpeg converts gray/ycck for us
    jpeg_start_decompress(&cinfo);
    const int w_in = cinfo.output_width;
    const int h_in = cinfo.output_height;
    if (w_in <= 0 || h_in <= 0) {
        jpeg_destroy_decompress(&cinfo);
        return -3;
    }
    std::vector<uint8_t> rgb(static_cast<size_t>(w_in) * h_in * 3);
    std::vector<uint8_t*> rows(cinfo.rec_outbuf_height);
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* rowp = &rgb[static_cast<size_t>(cinfo.output_scanline) * w_in * 3];
        JSAMPROW jrow = rowp;
        jpeg_read_scanlines(&cinfo, &jrow, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);

    std::vector<double> img(rgb.size());
    for (size_t i = 0; i < rgb.size(); i++) img[i] = rgb[i];

    int rh = out_h, rw = out_w;
    if (mode == 1) {  // shortest-edge + center crop (HF CLIP recipe)
        double scale = static_cast<double>(out_h) / std::min(w_in, h_in);
        if (w_in <= h_in) {
            rw = out_h;
            rh = static_cast<int>(h_in * scale);
        } else {
            rh = out_h;
            rw = static_cast<int>(w_in * scale);
        }
    }
    std::vector<double> resized =
        resize_rgb(img, h_in, w_in, rh, rw, resample == 1);

    int top = (rh - out_h) / 2;
    int left = (rw - out_w) / 2;
    const size_t plane = static_cast<size_t>(out_h) * out_w;
    for (int y = 0; y < out_h; y++) {
        for (int x = 0; x < out_w; x++) {
            const double* pix =
                &resized[(static_cast<size_t>(y + top) * rw + (x + left)) * 3];
            for (int c = 0; c < 3; c++) {
                // PIL converts back to uint8 between resize and the HF
                // processor's rescale — reproduce that quantization for parity
                double v = std::clamp(pix[c] + 0.5, 0.0, 255.0);
                uint8_t q = static_cast<uint8_t>(v);
                out[c * plane + y * out_w + x] =
                    (static_cast<float>(q) / 255.0f - mean[c]) / stdv[c];
            }
        }
    }
    return 0;
}

}  // extern "C"
