// Host-side image runtime for the paired RGB/IR data pipeline.
//
// The reference delegates decode/resize/warp/HSV to OpenCV's C++ kernels
// (utils/datasets.py:1325-1331, 1724-1727, 1864-1869, 1376-1385; SURVEY.md
// §2.9). This is our own native implementation: one shared library with a
// plain C ABI, driven from Python via ctypes (no pybind11 in the image).
//
// All images are HWC RGB uint8. Coordinate conventions match the Python
// (numpy/cv2-semantics) implementations in data/augment.py, which remain the
// reference path; tests assert agreement.
//
// Build: see native/build.sh (g++ -O3 -shared, links -ljpeg).

#include <cstdio>  // jpeglib.h needs FILE declared first

#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg) — returns 0 on success. Caller provides the output
// buffer sized via msod_jpeg_size.
// ---------------------------------------------------------------------------

int msod_jpeg_size(const uint8_t* data, long n, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), n);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  *h = cinfo.image_height;
  *w = cinfo.image_width;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int msod_jpeg_decode(const uint8_t* data, long n, uint8_t* out, int out_h,
                     int out_w) {
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), n);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_height != out_h || (int)cinfo.output_width != out_w) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  const int stride = out_w * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// ---------------------------------------------------------------------------
// Bilinear resize (cv2.INTER_LINEAR semantics: src = (d + 0.5) * scale - 0.5)
// ---------------------------------------------------------------------------

void msod_resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst,
                          int dh, int dw) {
  const float fy = (float)sh / dh;
  const float fx = (float)sw / dw;
  for (int y = 0; y < dh; ++y) {
    float syf = (y + 0.5f) * fy - 0.5f;
    syf = std::max(0.0f, std::min(syf, (float)sh - 1));
    int sy = (int)syf;
    int sy1 = std::min(sy + 1, sh - 1);
    float wy = syf - sy;
    for (int x = 0; x < dw; ++x) {
      float sxf = (x + 0.5f) * fx - 0.5f;
      sxf = std::max(0.0f, std::min(sxf, (float)sw - 1));
      int sx = (int)sxf;
      int sx1 = std::min(sx + 1, sw - 1);
      float wx = sxf - sx;
      const uint8_t* p00 = src + (sy * sw + sx) * 3;
      const uint8_t* p01 = src + (sy * sw + sx1) * 3;
      const uint8_t* p10 = src + (sy1 * sw + sx) * 3;
      const uint8_t* p11 = src + (sy1 * sw + sx1) * 3;
      uint8_t* o = dst + (y * dw + x) * 3;
      for (int c = 0; c < 3; ++c) {
        float v = (1 - wy) * ((1 - wx) * p00[c] + wx * p01[c]) +
                  wy * ((1 - wx) * p10[c] + wx * p11[c]);
        o[c] = (uint8_t)(v + 0.5f);
      }
    }
  }
}

// Area resize for downscale (cv2.INTER_AREA box-filter semantics).
void msod_resize_area(const uint8_t* src, int sh, int sw, uint8_t* dst,
                      int dh, int dw) {
  const double fy = (double)sh / dh;
  const double fx = (double)sw / dw;
  for (int y = 0; y < dh; ++y) {
    double y0 = y * fy, y1 = (y + 1) * fy;
    int iy0 = (int)y0, iy1 = std::min((int)std::ceil(y1), sh);
    for (int x = 0; x < dw; ++x) {
      double x0 = x * fx, x1 = (x + 1) * fx;
      int ix0 = (int)x0, ix1 = std::min((int)std::ceil(x1), sw);
      double acc[3] = {0, 0, 0};
      double area = 0;
      for (int yy = iy0; yy < iy1; ++yy) {
        double hy = std::min((double)yy + 1, y1) - std::max((double)yy, y0);
        for (int xx = ix0; xx < ix1; ++xx) {
          double hx = std::min((double)xx + 1, x1) - std::max((double)xx, x0);
          double wgt = hy * hx;
          const uint8_t* p = src + (yy * sw + xx) * 3;
          acc[0] += wgt * p[0];
          acc[1] += wgt * p[1];
          acc[2] += wgt * p[2];
          area += wgt;
        }
      }
      uint8_t* o = dst + (y * dw + x) * 3;
      for (int c = 0; c < 3; ++c) o[c] = (uint8_t)(acc[c] / area + 0.5);
    }
  }
}

// ---------------------------------------------------------------------------
// Letterbox: centered pad to (th, tw) with gray value
// ---------------------------------------------------------------------------

void msod_pad_center(const uint8_t* src, int sh, int sw, uint8_t* dst, int th,
                     int tw, int top, int left, uint8_t value) {
  std::memset(dst, value, (size_t)th * tw * 3);
  for (int y = 0; y < sh; ++y) {
    std::memcpy(dst + ((y + top) * tw + left) * 3, src + y * sw * 3,
                (size_t)sw * 3);
  }
}

// ---------------------------------------------------------------------------
// Affine warp, inverse-mapped bilinear with constant border
// (cv2.warpAffine semantics; M maps SRC->DST, we invert internally).
// ---------------------------------------------------------------------------

void msod_warp_affine(const uint8_t* src, int sh, int sw, const double* M,
                      uint8_t* dst, int dh, int dw, uint8_t border) {
  // invert [a b c; d e f]
  double a = M[0], b = M[1], c = M[2], d = M[3], e = M[4], f = M[5];
  double det = a * e - b * d;
  if (std::fabs(det) < 1e-12) det = det < 0 ? -1e-12 : 1e-12;
  double ia = e / det, ib = -b / det, id = -d / det, ie = a / det;
  double ic = -(ia * c + ib * f);
  double iff = -(id * c + ie * f);
  for (int y = 0; y < dh; ++y) {
    for (int x = 0; x < dw; ++x) {
      double sxf = ia * x + ib * y + ic;
      double syf = id * x + ie * y + iff;
      uint8_t* o = dst + (y * dw + x) * 3;
      if (sxf < -1 || sxf > sw || syf < -1 || syf > sh) {
        o[0] = o[1] = o[2] = border;
        continue;
      }
      int sx = (int)std::floor(sxf), sy = (int)std::floor(syf);
      float wx = (float)(sxf - sx), wy = (float)(syf - sy);
      for (int ch = 0; ch < 3; ++ch) {
        auto sample = [&](int yy, int xx) -> float {
          if (yy < 0 || yy >= sh || xx < 0 || xx >= sw) return border;
          return src[(yy * sw + xx) * 3 + ch];
        };
        float v = (1 - wy) * ((1 - wx) * sample(sy, sx) + wx * sample(sy, sx + 1)) +
                  wy * ((1 - wx) * sample(sy + 1, sx) + wx * sample(sy + 1, sx + 1));
        o[ch] = (uint8_t)(v + 0.5f);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// HSV jitter with gain LUTs (cv2 full-range HSV for uint8: H in [0,180))
// ---------------------------------------------------------------------------

static void rgb2hsv_u8(uint8_t r, uint8_t g, uint8_t b, uint8_t* hh,
                       uint8_t* ss, uint8_t* vv) {
  int mx = std::max({r, g, b}), mn = std::min({r, g, b});
  int v = mx;
  int s = mx == 0 ? 0 : (int)std::lround(255.0 * (mx - mn) / mx);
  double h = 0;
  if (mx != mn) {
    if (mx == r)
      h = 60.0 * (g - b) / (mx - mn);
    else if (mx == g)
      h = 120 + 60.0 * (b - r) / (mx - mn);
    else
      h = 240 + 60.0 * (r - g) / (mx - mn);
  }
  if (h < 0) h += 360;
  *hh = (uint8_t)std::lround(h / 2.0) % 180;
  *ss = (uint8_t)s;
  *vv = (uint8_t)v;
}

static void hsv2rgb_u8(uint8_t h8, uint8_t s8, uint8_t v8, uint8_t* r,
                       uint8_t* g, uint8_t* b) {
  double h = h8 * 2.0, s = s8 / 255.0, v = v8 / 255.0;
  double c = v * s;
  double hp = h / 60.0;
  double xv = c * (1 - std::fabs(std::fmod(hp, 2.0) - 1));
  double r1 = 0, g1 = 0, b1 = 0;
  if (hp < 1) {
    r1 = c; g1 = xv;
  } else if (hp < 2) {
    r1 = xv; g1 = c;
  } else if (hp < 3) {
    g1 = c; b1 = xv;
  } else if (hp < 4) {
    g1 = xv; b1 = c;
  } else if (hp < 5) {
    r1 = xv; b1 = c;
  } else {
    r1 = c; b1 = xv;
  }
  double m = v - c;
  *r = (uint8_t)std::lround((r1 + m) * 255);
  *g = (uint8_t)std::lround((g1 + m) * 255);
  *b = (uint8_t)std::lround((b1 + m) * 255);
}

void msod_hsv_jitter(uint8_t* img, int h, int w, double rh, double rs,
                     double rv) {
  uint8_t lut_h[256], lut_s[256], lut_v[256];
  for (int i = 0; i < 256; ++i) {
    lut_h[i] = (uint8_t)((long)std::lround(i * rh) % 180);
    lut_s[i] = (uint8_t)std::max(0L, std::min(255L, std::lround(i * rs)));
    lut_v[i] = (uint8_t)std::max(0L, std::min(255L, std::lround(i * rv)));
  }
  const long n = (long)h * w;
  for (long i = 0; i < n; ++i) {
    uint8_t* p = img + i * 3;
    uint8_t hh, ss, vv;
    rgb2hsv_u8(p[0], p[1], p[2], &hh, &ss, &vv);
    hsv2rgb_u8(lut_h[hh], lut_s[ss], lut_v[vv], &p[0], &p[1], &p[2]);
  }
}

}  // extern "C"
