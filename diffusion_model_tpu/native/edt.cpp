// Native evaluation core: exact Euclidean distance transform + binary-mask
// metrics.
//
// The reference's evaluator leans on third-party native code — scipy's
// distance_transform_edt / OpenCV distanceTransform (C/C++),
// /root/reference/eval_iou_noise.py:15-28,162-182. This module is the
// framework's own native equivalent: a Felzenszwalb–Huttenlocher exact EDT
// (squared-distance lower envelope of parabolas, separable over rows then
// columns) plus a single-pass metrics kernel that computes every quantity
// eval_iou_noise.py derives per image pair (intersection, union, areas,
// false positives, far-noise count at distance > sigma, Gaussian-weighted
// recall numerator) in one traversal.
//
// C ABI, consumed from Python via ctypes (diffusion_model_tpu/eval/native.py).
// OpenMP-free by design: the Python layer parallelizes across image pairs
// with a thread pool (the GIL is released during these calls).

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <limits>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

// 1-D squared distance transform (lower envelope of parabolas).
// f: input costs (size n), d: output (size n), v/z: scratch (size n / n+1).
void dt1d(const double* f, double* d, int* v, double* z, int n) {
  int k = 0;
  v[0] = 0;
  z[0] = -kInf;
  z[1] = kInf;
  for (int q = 1; q < n; ++q) {
    if (f[q] == kInf) continue;
    if (f[v[0]] == kInf) {  // no finite parabola yet
      v[0] = q;
      z[1] = kInf;
      continue;
    }
    double s = ((f[q] + q * (double)q) - (f[v[k]] + v[k] * (double)v[k])) /
               (2.0 * q - 2.0 * v[k]);
    while (s <= z[k]) {
      --k;
      s = ((f[q] + q * (double)q) - (f[v[k]] + v[k] * (double)v[k])) /
          (2.0 * q - 2.0 * v[k]);
    }
    ++k;
    v[k] = q;
    z[k] = s;
    z[k + 1] = kInf;
  }
  k = 0;
  for (int q = 0; q < n; ++q) {
    while (z[k + 1] < q) ++k;
    double dq = q - (double)v[k];
    d[q] = (f[v[k]] == kInf) ? kInf : dq * dq + f[v[k]];
  }
}

}  // namespace

extern "C" {

// Exact EDT: out[i] = euclidean distance from pixel i to the nearest set
// pixel of `mask` (h*w, row-major, nonzero = foreground). Pixels on the
// mask get 0. If the mask is empty, all distances are +inf.
void edt2d(const uint8_t* mask, int h, int w, double* out) {
  std::vector<double> f(std::max(h, w));
  std::vector<double> d(std::max(h, w));
  std::vector<int> v(std::max(h, w));
  std::vector<double> z(std::max(h, w) + 1);

  // pass 1: columns (over rows of each column)
  for (int x = 0; x < w; ++x) {
    for (int y = 0; y < h; ++y) f[y] = mask[y * w + x] ? 0.0 : kInf;
    dt1d(f.data(), d.data(), v.data(), z.data(), h);
    for (int y = 0; y < h; ++y) out[y * w + x] = d[y];
  }
  // pass 2: rows
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) f[x] = out[y * w + x];
    dt1d(f.data(), d.data(), v.data(), z.data(), w);
    for (int x = 0; x < w; ++x)
      out[y * w + x] = (d[x] == kInf) ? kInf : std::sqrt(d[x]);
  }
}

// Pair metrics in one pass. Output layout (length 7):
//   [0] inter, [1] union, [2] gt_area, [3] pred_area, [4] fp,
//   [5] far_noise count (pred && dist_to_gt > sigma),
//   [6] gauss_sum = sum over pred pixels of exp(-d^2 / (2 sigma^2))
// The ratios (iou, gt_iou, far_noise_ratio, gauss_recall) and their
// empty-mask conventions live in the Python layer
// (eval_iou_noise.py:185-272 parity).
void mask_metrics(const uint8_t* gt, const uint8_t* pred, int h, int w,
                  double sigma, double* out) {
  const int n = h * w;
  long long inter = 0, uni = 0, gt_area = 0, pred_area = 0, fp = 0;
  for (int i = 0; i < n; ++i) {
    const bool g = gt[i] != 0, p = pred[i] != 0;
    inter += (g && p);
    uni += (g || p);
    gt_area += g;
    pred_area += p;
    fp += (p && !g);
  }

  long long far_noise = 0;
  double gauss_sum = 0.0;
  if (pred_area > 0 && gt_area > 0) {
    std::vector<double> dist(n);
    edt2d(gt, h, w, dist.data());
    const double inv2s2 = 1.0 / (2.0 * sigma * sigma);
    for (int i = 0; i < n; ++i) {
      if (pred[i]) {
        const double d = dist[i];
        far_noise += (d > sigma);
        gauss_sum += std::exp(-(d * d) * inv2s2);
      }
    }
  } else if (pred_area > 0) {
    // empty GT: every pred pixel is infinitely far
    far_noise = pred_area;
  }

  out[0] = (double)inter;
  out[1] = (double)uni;
  out[2] = (double)gt_area;
  out[3] = (double)pred_area;
  out[4] = (double)fp;
  out[5] = (double)far_noise;
  out[6] = gauss_sum;
}

// Batched grayscale binarization: arr (n bytes) -> mask bytes.
// invert != 0: foreground = value < threshold (black line art);
// else foreground = value >= threshold. (eval_iou_noise.py:77-94)
void binarize(const uint8_t* arr, int n, int threshold, int invert,
              uint8_t* out) {
  if (invert) {
    for (int i = 0; i < n; ++i) out[i] = arr[i] < threshold;
  } else {
    for (int i = 0; i < n; ++i) out[i] = arr[i] >= threshold;
  }
}

}  // extern "C"
