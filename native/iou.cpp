// Native host-side eval kernels: oriented 3D box IoU matrices + greedy NMS.
//
// The TPU framework computes everything batched on device; what remains on
// host is the irregular eval bookkeeping the reference parallelised with a
// multiprocessing.Pool (net_utils/eval_det.py:424-473).  This C++ kernel
// computes the (n_det, n_gt) oriented-IoU matrix (Sutherland–Hodgman BEV
// clip x vertical overlap, identical conventions to net_utils/box_util.py:
// 90-118) and the greedy score-sorted NMS, exposed through a plain C ABI for
// ctypes.  Falls back to the vectorized numpy implementation when the shared
// library is unavailable (see pose2room_tpu/native.py).
//
// Build: g++ -O3 -march=native -shared -fPIC iou.cpp -o libp2r_native.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Pt {
  double x, y;
};

// Clip a convex polygon by the directed edge cp1->cp2 (keep left side).
int clip_edge(const Pt* in, int n_in, Pt cp1, Pt cp2, Pt* out) {
  if (n_in == 0) return 0;
  int n_out = 0;
  const double dx = cp2.x - cp1.x;
  const double dy = cp2.y - cp1.y;
  auto side = [&](const Pt& p) {
    return dx * (p.y - cp1.y) - dy * (p.x - cp1.x);
  };
  Pt s = in[n_in - 1];
  double s_side = side(s);
  for (int i = 0; i < n_in; ++i) {
    Pt e = in[i];
    double e_side = side(e);
    bool e_in = e_side > 0.0;
    bool s_in = s_side > 0.0;
    if (e_in != s_in) {
      double denom = s_side - e_side;
      double t = (std::fabs(denom) < 1e-300) ? 0.0 : s_side / denom;
      out[n_out++] = {s.x + t * (e.x - s.x), s.y + t * (e.y - s.y)};
    }
    if (e_in) out[n_out++] = e;
    s = e;
    s_side = e_side;
  }
  return n_out;
}

double shoelace(const Pt* p, int n) {
  double acc = 0.0;
  for (int i = 0; i < n; ++i) {
    const Pt& a = p[i];
    const Pt& b = p[(i + 1) % n];
    acc += a.x * b.y - b.x * a.y;
  }
  return 0.5 * std::fabs(acc);
}

// BEV rectangle from the 8x3 corner array (conventions of box_util.py:100-104:
// vertices are corners [3,2,6,7] in (x,z)).
void bev_rect(const double* c, Pt* rect) {
  static const int ids[4] = {3, 2, 6, 7};
  for (int i = 0; i < 4; ++i) {
    rect[i] = {c[ids[i] * 3 + 0], c[ids[i] * 3 + 2]};
  }
}

double box_volume(const double* c) {
  auto edge = [&](int i, int j) {
    double dx = c[i * 3] - c[j * 3];
    double dy = c[i * 3 + 1] - c[j * 3 + 1];
    double dz = c[i * 3 + 2] - c[j * 3 + 2];
    return std::sqrt(dx * dx + dy * dy + dz * dz);
  };
  return edge(0, 1) * edge(1, 2) * edge(0, 4);
}

double pair_iou3d(const double* c1, const double* c2) {
  Pt rect1[4], rect2[4];
  bev_rect(c1, rect1);
  bev_rect(c2, rect2);
  Pt buf_a[16], buf_b[16];
  std::memcpy(buf_a, rect1, sizeof(rect1));
  int n = 4;
  for (int e = 0; e < 4; ++e) {
    Pt cp1 = rect2[(e + 3) % 4];
    Pt cp2 = rect2[e];
    n = clip_edge(buf_a, n, cp1, cp2, buf_b);
    std::memcpy(buf_a, buf_b, n * sizeof(Pt));
    if (n == 0) return 0.0;
  }
  double inter_area = shoelace(buf_a, n);
  double ymax = std::min(c1[7 * 3 + 1], c2[7 * 3 + 1]);
  double ymin = std::max(c1[4 * 3 + 1], c2[4 * 3 + 1]);
  double inter_vol = inter_area * std::max(0.0, ymax - ymin);
  double v1 = box_volume(c1);
  double v2 = box_volume(c2);
  double denom = v1 + v2 - inter_vol;
  return denom > 1e-12 ? inter_vol / denom : 0.0;
}

}  // namespace

extern "C" {

// dets: (n, 8, 3) doubles; gts: (m, 8, 3); out: (n, m).
void oriented_iou_matrix(const double* dets, int64_t n, const double* gts,
                         int64_t m, double* out) {
  for (int64_t i = 0; i < n; ++i) {
    const double* ci = dets + i * 24;
    for (int64_t j = 0; j < m; ++j) {
      out[i * m + j] = pair_iou3d(ci, gts + j * 24);
    }
  }
}

// Greedy score-sorted NMS on axis-aligned boxes.
// minmax: (k, 2*dim) as (mins..., maxs...); scores: (k,);
// classes: (k,) or nullptr; picked: out indices; returns count.
int64_t greedy_nms(const double* minmax, const double* scores,
                   const double* classes, int64_t k, int dim,
                   double threshold, int old_type, int64_t* picked) {
  std::vector<int64_t> order(k);
  for (int64_t i = 0; i < k; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return scores[a] < scores[b];
  });
  std::vector<double> area(k);
  for (int64_t i = 0; i < k; ++i) {
    double a = 1.0;
    for (int d = 0; d < dim; ++d)
      a *= minmax[i * 2 * dim + dim + d] - minmax[i * 2 * dim + d];
    area[i] = a;
  }
  int64_t n_picked = 0;
  std::vector<int64_t> cur(order);
  while (!cur.empty()) {
    int64_t i = cur.back();
    cur.pop_back();
    picked[n_picked++] = i;
    std::vector<int64_t> next;
    next.reserve(cur.size());
    for (int64_t j : cur) {
      double inter = 1.0;
      for (int d = 0; d < dim; ++d) {
        double lo = std::max(minmax[i * 2 * dim + d], minmax[j * 2 * dim + d]);
        double hi = std::min(minmax[i * 2 * dim + dim + d],
                             minmax[j * 2 * dim + dim + d]);
        inter *= std::max(0.0, hi - lo);
      }
      double o = old_type ? inter / area[j]
                          : inter / (area[i] + area[j] - inter);
      if (classes != nullptr && classes[i] != classes[j]) o = 0.0;
      if (o <= threshold) next.push_back(j);
    }
    cur.swap(next);
  }
  return n_picked;
}

}  // extern "C"
