// nexus_tpu native host library: BVH builders + traversal-link builders.
//
// The TPU-native counterpart of the reference's host C++ acceleration
// layer (Nexus/src/Geometry/BVH/BVH.cpp binned-SAH builder;
// TLAS/BVH8 collapse builders). The device compute path is JAX/Pallas;
// this library covers the CPU-heavy scene-build work that NumPy/Python
// loops handle too slowly at production scale (1M-triangle interiors):
//
//   bvh2_build    — binned-SAH BVH2 over primitive AABBs. Identical
//                   algorithm/tie-breaking to accel/bvh2.py (BINS=8,
//                   BVH.h:15; same-centroid halving fallback,
//                   BVH.cpp:40-63; leaf-cost cutoff for num<=16 in
//                   standalone mode, disabled in collapse-feeding
//                   force_leaf_one mode, BVH.cpp:74-76,86-88).
//   build_links   — per-octant threaded-BVH skip links
//                   (accel/links.py semantics), one pass per octant.
//
// C ABI only (called via ctypes — no pybind11 in this image). All
// arrays are caller-allocated; functions return node counts.
//
// Build: native/build.sh (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int BINS = 8;

struct V3 {
  float x, y, z;
};

static inline V3 vmin(const V3& a, const V3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline V3 vmax(const V3& a, const V3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}
static inline float half_area(const V3& lo, const V3& hi) {
  float ex = std::max(hi.x - lo.x, 0.0f);
  float ey = std::max(hi.y - lo.y, 0.0f);
  float ez = std::max(hi.z - lo.z, 0.0f);
  return ex * ey + ey * ez + ez * ex;
}
static inline float comp(const V3& v, int ax) {
  return ax == 0 ? v.x : (ax == 1 ? v.y : v.z);
}

}  // namespace

extern "C" {

// Binned-SAH BVH2 build over primitive AABBs.
//   tmin/tmax/cent : (n, 3) float32 primitive bounds + centroids
//   leaf_size      : max primitives per leaf (standalone mode)
//   force_leaf_one : reference collapse-feeding mode (leaf = 1, no
//                    SAH cutoff)
//   out_bmin/out_bmax        : (2n, 3) float32 (capacity; filled [0, M))
//   out_left_first/out_count : (2n,) int32
//   out_order                : (n,) int32 (leaf slot -> primitive id)
// Returns M = number of nodes written (root = node 0).
int64_t bvh2_build(const float* tmin_p, const float* tmax_p,
                   const float* cent_p, int64_t n, int32_t leaf_size,
                   int32_t force_leaf_one, float* out_bmin,
                   float* out_bmax, int32_t* out_left_first,
                   int32_t* out_count, int32_t* out_order) {
  const V3* tmin = reinterpret_cast<const V3*>(tmin_p);
  const V3* tmax = reinterpret_cast<const V3*>(tmax_p);
  const V3* cent = reinterpret_cast<const V3*>(cent_p);
  V3* bmin = reinterpret_cast<V3*>(out_bmin);
  V3* bmax = reinterpret_cast<V3*>(out_bmax);

  if (force_leaf_one) leaf_size = 1;
  if (leaf_size < 1) leaf_size = 1;

  for (int64_t i = 0; i < n; ++i) out_order[i] = static_cast<int32_t>(i);

  V3 rlo = tmin[0], rhi = tmax[0];
  for (int64_t i = 1; i < n; ++i) {
    rlo = vmin(rlo, tmin[i]);
    rhi = vmax(rhi, tmax[i]);
  }
  bmin[0] = rlo;
  bmax[0] = rhi;
  out_left_first[0] = 0;
  out_count[0] = static_cast<int32_t>(n);
  int64_t node_count = 1;

  std::vector<int64_t> stack;
  stack.push_back(0);
  while (!stack.empty()) {
    const int64_t node = stack.back();
    stack.pop_back();
    const int64_t first = out_left_first[node];
    const int64_t num = out_count[node];
    if (num <= leaf_size) continue;

    // Binned SAH over 3 axes (FindBestSplitPlane, BVH.cpp).
    int best_axis = -1, best_bin = -1;
    double best_cost = INFINITY;
    float best_cmin = 0.0f;
    double best_scale = 0.0;
    for (int ax = 0; ax < 3; ++ax) {
      float cmin = INFINITY, cmax = -INFINITY;
      for (int64_t k = first; k < first + num; ++k) {
        float c = comp(cent[out_order[k]], ax);
        cmin = std::min(cmin, c);
        cmax = std::max(cmax, c);
      }
      if (cmax - cmin < 1e-12f) continue;
      // double like the NumPy spec (scale & binning happen in f64
      // there; bin-boundary ties must agree bit-for-bit).
      const double scale = BINS / (static_cast<double>(cmax) - cmin);
      int64_t bin_count[BINS] = {0};
      V3 bin_min[BINS], bin_max[BINS];
      for (int b = 0; b < BINS; ++b) {
        bin_min[b] = {INFINITY, INFINITY, INFINITY};
        bin_max[b] = {-INFINITY, -INFINITY, -INFINITY};
      }
      for (int64_t k = first; k < first + num; ++k) {
        const int32_t id = out_order[k];
        int b = static_cast<int>(
            (static_cast<double>(comp(cent[id], ax)) - cmin) * scale);
        b = std::min(b, BINS - 1);
        bin_count[b]++;
        bin_min[b] = vmin(bin_min[b], tmin[id]);
        bin_max[b] = vmax(bin_max[b], tmax[id]);
      }
      // Left-prefix / right-suffix sweep.
      float la[BINS], ra[BINS];
      int64_t lc[BINS];
      V3 lo = bin_min[0], hi = bin_max[0];
      int64_t c = 0;
      for (int b = 0; b < BINS; ++b) {
        lo = vmin(lo, bin_min[b]);
        hi = vmax(hi, bin_max[b]);
        c += bin_count[b];
        la[b] = half_area(lo, hi);
        lc[b] = c;
      }
      lo = bin_min[BINS - 1];
      hi = bin_max[BINS - 1];
      for (int b = BINS - 1; b >= 0; --b) {
        lo = vmin(lo, bin_min[b]);
        hi = vmax(hi, bin_max[b]);
        ra[b] = half_area(lo, hi);
      }
      for (int b = 0; b < BINS - 1; ++b) {
        const int64_t rcount = num - lc[b];
        if (lc[b] == 0 || rcount == 0) continue;
        const double cost = static_cast<double>(la[b]) * lc[b] +
                            static_cast<double>(ra[b + 1]) * rcount;
        if (cost < best_cost) {
          best_cost = cost;
          best_axis = ax;
          best_bin = b + 1;
          best_cmin = cmin;
          best_scale = scale;
        }
      }
    }

    int64_t mid;
    if (best_axis < 0) {
      // Identical centroids: halve (SplitNodeInHalf, BVH.cpp:40-63).
      mid = first + num / 2;
    } else {
      if (!force_leaf_one) {
        // Standalone SAH cutoff (matches accel/bvh2.py; the reference
        // deliberately disables this, BVH.cpp:86-88).
        const double leaf_cost =
            static_cast<double>(half_area(bmin[node], bmax[node])) * num;
        if (best_cost >= leaf_cost && num <= 16) continue;
      }
      // Stable partition by bin id (matches np.argsort(~go_left,
      // kind="stable") in accel/bvh2.py).
      std::vector<int32_t> left_ids, right_ids;
      left_ids.reserve(num);
      right_ids.reserve(num);
      for (int64_t k = first; k < first + num; ++k) {
        const int32_t id = out_order[k];
        int b = static_cast<int>(
            (static_cast<double>(comp(cent[id], best_axis)) - best_cmin) *
            best_scale);
        b = std::min(b, BINS - 1);
        (b < best_bin ? left_ids : right_ids).push_back(id);
      }
      if (left_ids.empty() || right_ids.empty()) {
        mid = first + num / 2;
      } else {
        std::memcpy(out_order + first, left_ids.data(),
                    left_ids.size() * sizeof(int32_t));
        std::memcpy(out_order + first + left_ids.size(), right_ids.data(),
                    right_ids.size() * sizeof(int32_t));
        mid = first + static_cast<int64_t>(left_ids.size());
      }
    }

    const int64_t left = node_count;
    node_count += 2;
    V3 llo = tmin[out_order[first]], lhi = tmax[out_order[first]];
    for (int64_t k = first + 1; k < mid; ++k) {
      llo = vmin(llo, tmin[out_order[k]]);
      lhi = vmax(lhi, tmax[out_order[k]]);
    }
    V3 rlo2 = tmin[out_order[mid]], rhi2 = tmax[out_order[mid]];
    for (int64_t k = mid + 1; k < first + num; ++k) {
      rlo2 = vmin(rlo2, tmin[out_order[k]]);
      rhi2 = vmax(rhi2, tmax[out_order[k]]);
    }
    bmin[left] = llo;
    bmax[left] = lhi;
    out_left_first[left] = static_cast<int32_t>(first);
    out_count[left] = static_cast<int32_t>(mid - first);
    bmin[left + 1] = rlo2;
    bmax[left + 1] = rhi2;
    out_left_first[left + 1] = static_cast<int32_t>(mid);
    out_count[left + 1] = static_cast<int32_t>(first + num - mid);
    out_left_first[node] = static_cast<int32_t>(left);
    out_count[node] = 0;
    stack.push_back(left);
    stack.push_back(left + 1);
  }
  return node_count;
}

// Per-octant skip links (accel/links.py semantics).
//   bmin/bmax      : (m, 3) float32 node bounds
//   left_first     : (m,) int32
//   count          : (m,) int32 (0 = internal)
//   out_hit/out_miss: (8*m,) int32, row-major [octant, node]
void build_links(const float* bmin_p, const float* bmax_p,
                 const int32_t* left_first, const int32_t* count,
                 int64_t m, int32_t* out_hit, int32_t* out_miss) {
  const V3* bmin = reinterpret_cast<const V3*>(bmin_p);
  const V3* bmax = reinterpret_cast<const V3*>(bmax_p);

  // Precompute per-internal-node split axis + lower child.
  std::vector<int8_t> axis(m, 0);
  std::vector<int8_t> left_is_lo(m, 1);
  for (int64_t n = 0; n < m; ++n) {
    if (count[n] != 0) continue;
    const int32_t l = left_first[n];
    V3 cl = {(bmin[l].x + bmax[l].x) * 0.5f, (bmin[l].y + bmax[l].y) * 0.5f,
             (bmin[l].z + bmax[l].z) * 0.5f};
    V3 cr = {(bmin[l + 1].x + bmax[l + 1].x) * 0.5f,
             (bmin[l + 1].y + bmax[l + 1].y) * 0.5f,
             (bmin[l + 1].z + bmax[l + 1].z) * 0.5f};
    const float sx = std::fabs(cr.x - cl.x), sy = std::fabs(cr.y - cl.y),
                sz = std::fabs(cr.z - cl.z);
    int ax = 0;
    if (sy > sx) ax = 1;
    if (sz > (ax == 0 ? sx : sy)) ax = 2;
    axis[n] = static_cast<int8_t>(ax);
    left_is_lo[n] = comp(cl, ax) <= comp(cr, ax) ? 1 : 0;
  }

  for (int o = 0; o < 8; ++o) {
    int32_t* hit = out_hit + o * m;
    int32_t* miss = out_miss + o * m;
    for (int64_t i = 0; i < m; ++i) hit[i] = miss[i] = -1;
    miss[0] = -1;
    // Parents precede children (builder invariant), so one forward
    // pass resolves the far-chain dependency.
    for (int64_t n = 0; n < m; ++n) {
      if (count[n] != 0) {  // leaf: next is always the miss link
        hit[n] = miss[n];
        continue;
      }
      const int32_t l = left_first[n];
      const bool dir_pos = ((o >> axis[n]) & 1) == 0;
      const bool near_is_left = (left_is_lo[n] != 0) == dir_pos;
      const int32_t near = near_is_left ? l : l + 1;
      const int32_t far = near_is_left ? l + 1 : l;
      hit[n] = near;
      miss[near] = far;
      miss[far] = miss[n];
    }
  }
}

}  // extern "C"
