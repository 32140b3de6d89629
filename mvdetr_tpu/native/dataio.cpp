// Native host-path accelerators (CPython C API, no pybind11).
//
// TPU-native counterpart of the reference's native layer: where MVDeTr ships a
// CUDA extension for its device hot loop, this framework's device hot loops
// are XLA/Pallas — the native-code surface that remains is the *host* data
// path. This module accelerates:
//   - Gaussian target splatting   (contract: datasets/frameDataset.py:19-46,
//                                  utils/image_utils.py:86-111)
//   - greedy ground-plane NMS     (contract: utils/nms.py:7-44)
//   - bilinear perspective warp of uint8 images (augmentation path,
//                                  utils/image_utils.py:43-44)
//
// Pure-numpy fallbacks exist for every entry point; this extension removes
// the per-frame Python-loop overhead when feeding a fast TPU step.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

// ---------------------------------------------------------------- buffers
struct View {
  Py_buffer buf{};
  bool ok = false;
  ~View() {
    if (ok) PyBuffer_Release(&buf);
  }
  bool acquire(PyObject* obj, int flags) {
    if (PyObject_GetBuffer(obj, &buf, flags) != 0) return false;
    ok = true;
    return true;
  }
};

// ------------------------------------------------------------ splat_gaussian
// heatmap [H, W] float32 (writable, C-contiguous); centers [K, 2] int32 (x, y);
// sigma > 0. Max-composites a radius = int(3*sigma) Gaussian at each center.
PyObject* splat_gaussian(PyObject*, PyObject* args) {
  PyObject *heatmap_obj, *centers_obj;
  double sigma;
  if (!PyArg_ParseTuple(args, "OOd", &heatmap_obj, &centers_obj, &sigma)) return nullptr;

  View hm, ct;
  if (!hm.acquire(heatmap_obj, PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE | PyBUF_FORMAT)) return nullptr;
  if (!ct.acquire(centers_obj, PyBUF_C_CONTIGUOUS | PyBUF_FORMAT)) return nullptr;
  if (hm.buf.ndim != 2 || ct.buf.ndim != 2 || ct.buf.shape[1] != 2) {
    PyErr_SetString(PyExc_ValueError, "expected heatmap [H,W] f32 and centers [K,2] i32");
    return nullptr;
  }
  const Py_ssize_t H = hm.buf.shape[0], W = hm.buf.shape[1], K = ct.buf.shape[0];
  auto* hmp = static_cast<float*>(hm.buf.buf);
  auto* ctp = static_cast<const int32_t*>(ct.buf.buf);

  const int radius = static_cast<int>(3.0 * sigma);
  const int diameter = 2 * radius + 1;
  // precompute the gaussian stamp once (same for all centers)
  std::vector<float> g(static_cast<size_t>(diameter) * diameter);
  double maxv = 0.0;
  for (int dy = -radius; dy <= radius; ++dy)
    for (int dx = -radius; dx <= radius; ++dx) {
      double v = std::exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma));
      g[(dy + radius) * diameter + (dx + radius)] = static_cast<float>(v);
      maxv = std::max(maxv, v);
    }
  const float eps_cut = static_cast<float>(maxv * 2.220446049250313e-16);
  for (auto& v : g)
    if (v < eps_cut) v = 0.0f;

  for (Py_ssize_t k = 0; k < K; ++k) {
    const int x = ctp[2 * k], y = ctp[2 * k + 1];
    const int left = std::min<int>(x, radius), right = std::min<int>(W - x, radius + 1);
    const int top = std::min<int>(y, radius), bottom = std::min<int>(H - y, radius + 1);
    if (left + right <= 0 || top + bottom <= 0) continue;
    for (int iy = -top; iy < bottom; ++iy) {
      float* row = hmp + (y + iy) * W + x;
      const float* grow = g.data() + (iy + radius) * diameter + radius;
      for (int ix = -left; ix < right; ++ix) row[ix] = std::max(row[ix], grow[ix]);
    }
  }
  Py_RETURN_NONE;
}

// ---------------------------------------------------------------- greedy_nms
// points [K, 2] float32, scores [K] float32, thres double -> bytes keep-mask.
// Greedy by descending score; drops later candidates with dist <= thres
// (ties dropped, matching `utils/nms.py:43`).
PyObject* greedy_nms(PyObject*, PyObject* args) {
  PyObject *pts_obj, *sc_obj;
  double thres;
  if (!PyArg_ParseTuple(args, "OOd", &pts_obj, &sc_obj, &thres)) return nullptr;

  View pts, sc;
  if (!pts.acquire(pts_obj, PyBUF_C_CONTIGUOUS | PyBUF_FORMAT)) return nullptr;
  if (!sc.acquire(sc_obj, PyBUF_C_CONTIGUOUS | PyBUF_FORMAT)) return nullptr;
  if (pts.buf.ndim != 2 || pts.buf.shape[1] != 2 || sc.buf.ndim != 1 ||
      pts.buf.shape[0] != sc.buf.shape[0]) {
    PyErr_SetString(PyExc_ValueError, "expected points [K,2] f32 and scores [K] f32");
    return nullptr;
  }
  const Py_ssize_t K = sc.buf.shape[0];
  auto* p = static_cast<const float*>(pts.buf.buf);
  auto* s = static_cast<const float*>(sc.buf.buf);

  std::vector<Py_ssize_t> order(K);
  for (Py_ssize_t i = 0; i < K; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(), [&](Py_ssize_t a, Py_ssize_t b) { return s[a] > s[b]; });

  std::vector<uint8_t> keep(K, 0), dead(K, 0);
  const double t2 = thres * thres;
  for (Py_ssize_t oi = 0; oi < K; ++oi) {
    const Py_ssize_t i = order[oi];
    if (dead[i]) continue;
    keep[i] = 1;
    const double xi = p[2 * i], yi = p[2 * i + 1];
    for (Py_ssize_t oj = oi + 1; oj < K; ++oj) {
      const Py_ssize_t j = order[oj];
      if (dead[j]) continue;
      const double dx = p[2 * j] - xi, dy = p[2 * j + 1] - yi;
      if (dx * dx + dy * dy <= t2) dead[j] = 1;
    }
  }
  return PyBytes_FromStringAndSize(reinterpret_cast<const char*>(keep.data()), K);
}

// ------------------------------------------------------------- warp_u8
// img [H, W, 3] uint8, M [3, 3] float64 (src->dst), border uint8.
// Returns a new bytes object of the warped [H, W, 3] image (bilinear,
// inverse-mapped), matching cv2.warpPerspective(INTER_LINEAR, borderValue).
PyObject* warp_u8(PyObject*, PyObject* args) {
  PyObject *img_obj, *mat_obj;
  int border;
  if (!PyArg_ParseTuple(args, "OOi", &img_obj, &mat_obj, &border)) return nullptr;

  View img, mat;
  if (!img.acquire(img_obj, PyBUF_C_CONTIGUOUS | PyBUF_FORMAT)) return nullptr;
  if (!mat.acquire(mat_obj, PyBUF_C_CONTIGUOUS | PyBUF_FORMAT)) return nullptr;
  if (img.buf.ndim != 3 || img.buf.shape[2] != 3 || mat.buf.ndim != 2) {
    PyErr_SetString(PyExc_ValueError, "expected img [H,W,3] u8 and M [3,3] f64");
    return nullptr;
  }
  const Py_ssize_t H = img.buf.shape[0], W = img.buf.shape[1];
  auto* src = static_cast<const uint8_t*>(img.buf.buf);
  auto* m = static_cast<const double*>(mat.buf.buf);

  // invert M (dst -> src)
  double inv[9];
  {
    const double a = m[0], b = m[1], c = m[2], d = m[3], e = m[4], f = m[5], g = m[6], h = m[7], i = m[8];
    const double A = e * i - f * h, B = -(d * i - f * g), C = d * h - e * g;
    const double det = a * A + b * B + c * C;
    if (std::abs(det) < 1e-12) {
      PyErr_SetString(PyExc_ValueError, "singular matrix");
      return nullptr;
    }
    inv[0] = A / det; inv[1] = -(b * i - c * h) / det; inv[2] = (b * f - c * e) / det;
    inv[3] = B / det; inv[4] = (a * i - c * g) / det; inv[5] = -(a * f - c * d) / det;
    inv[6] = C / det; inv[7] = -(a * h - b * g) / det; inv[8] = (a * e - b * d) / det;
  }

  PyObject* out_bytes = PyBytes_FromStringAndSize(nullptr, H * W * 3);
  if (!out_bytes) return nullptr;
  auto* dst = reinterpret_cast<uint8_t*>(PyBytes_AsString(out_bytes));

  for (Py_ssize_t y = 0; y < H; ++y) {
    for (Py_ssize_t x = 0; x < W; ++x) {
      const double wz = inv[6] * x + inv[7] * y + inv[8];
      const double sx = (inv[0] * x + inv[1] * y + inv[2]) / wz;
      const double sy = (inv[3] * x + inv[4] * y + inv[5]) / wz;
      uint8_t* px = dst + (y * W + x) * 3;
      const int x0 = static_cast<int>(std::floor(sx)), y0 = static_cast<int>(std::floor(sy));
      if (x0 < -1 || x0 >= W || y0 < -1 || y0 >= H) {
        px[0] = px[1] = px[2] = static_cast<uint8_t>(border);
        continue;
      }
      const double fx = sx - x0, fy = sy - y0;
      for (int ch = 0; ch < 3; ++ch) {
        double acc = 0.0;
        for (int dy = 0; dy <= 1; ++dy)
          for (int dx = 0; dx <= 1; ++dx) {
            const int xi = x0 + dx, yi = y0 + dy;
            const double wgt = (dx ? fx : 1 - fx) * (dy ? fy : 1 - fy);
            const double v = (xi >= 0 && xi < W && yi >= 0 && yi < H)
                                 ? src[(yi * W + xi) * 3 + ch]
                                 : border;
            acc += wgt * v;
          }
        px[ch] = static_cast<uint8_t>(acc + 0.5);
      }
    }
  }
  return out_bytes;
}

PyMethodDef methods[] = {
    {"splat_gaussian", splat_gaussian, METH_VARARGS,
     "splat_gaussian(heatmap_f32_HW, centers_i32_K2, sigma) — in-place max-composite"},
    {"greedy_nms", greedy_nms, METH_VARARGS,
     "greedy_nms(points_f32_K2, scores_f32_K, thres) -> bytes keep mask"},
    {"warp_u8", warp_u8, METH_VARARGS,
     "warp_u8(img_u8_HW3, M_f64_33, border) -> bytes warped image"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_dataio", "native host-path ops", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__dataio(void) { return PyModule_Create(&module); }
