// Native BVH builder: binned-SAH over triangle soups, flattened in DFS
// preorder with escape ("skip") pointers for stackless device traversal.
//
// Mirrors the numpy fallback in models/bvh.py exactly (same meta layout:
// [first_tri|right_child, tri_count, skip, is_leaf]); exists because the
// reference's runtime tier is native C++ (SURVEY.md §2) and large meshes
// deserve an O(N log N) builder that doesn't pay Python overheads.
//
// C ABI (ctypes):
//   int32 build_bvh(const float* tris,   // T*3 vertices, xyz interleaved
//                   int32 T, int32 leaf_size, int32 sah_bins,
//                   float* nodes_min,    // capacity 2T x 3
//                   float* nodes_max,    // capacity 2T x 3
//                   int32* meta,         // capacity 2T x 4
//                   int32* order)        // T (triangle reorder)
// returns node count (<= 2T) or -1 on error.

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <limits>
#include <utility>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

inline V3 vmin(const V3 &a, const V3 &b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline V3 vmax(const V3 &a, const V3 &b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}
inline float half_area(const V3 &mn, const V3 &mx) {
  float dx = std::max(mx.x - mn.x, 0.f);
  float dy = std::max(mx.y - mn.y, 0.f);
  float dz = std::max(mx.z - mn.z, 0.f);
  return dx * dy + dy * dz + dz * dx;
}

struct Builder {
  const float *tris;
  int32_t T, leaf_size, sah_bins;
  std::vector<V3> tmin, tmax, centroid;
  std::vector<int32_t> order;
  std::vector<V3> nmin, nmax;
  std::vector<std::array<int32_t, 4>> meta;

  explicit Builder(const float *t, int32_t n, int32_t ls, int32_t bins)
      : tris(t), T(n), leaf_size(ls), sah_bins(bins) {
    tmin.resize(T);
    tmax.resize(T);
    centroid.resize(T);
    order.resize(T);
    for (int32_t i = 0; i < T; ++i) {
      const float *p = tris + size_t(i) * 9;
      V3 a{p[0], p[1], p[2]}, b{p[3], p[4], p[5]}, c{p[6], p[7], p[8]};
      tmin[i] = vmin(a, vmin(b, c));
      tmax[i] = vmax(a, vmax(b, c));
      centroid[i] = {(a.x + b.x + c.x) / 3.f, (a.y + b.y + c.y) / 3.f,
                     (a.z + b.z + c.z) / 3.f};
      order[i] = i;
    }
    nmin.reserve(2 * T);
    nmax.reserve(2 * T);
    meta.reserve(2 * T);
  }

  float cmp_axis(const V3 &v, int axis) const {
    return axis == 0 ? v.x : (axis == 1 ? v.y : v.z);
  }

  int32_t emit(int32_t lo, int32_t hi) {
    int32_t idx = static_cast<int32_t>(meta.size());
    V3 bb_min{std::numeric_limits<float>::infinity(),
              std::numeric_limits<float>::infinity(),
              std::numeric_limits<float>::infinity()};
    V3 bb_max{-bb_min.x, -bb_min.y, -bb_min.z};
    for (int32_t k = lo; k < hi; ++k) {
      bb_min = vmin(bb_min, tmin[order[k]]);
      bb_max = vmax(bb_max, tmax[order[k]]);
    }
    nmin.push_back(bb_min);
    nmax.push_back(bb_max);
    meta.push_back({lo, hi - lo, -1, 1});

    int32_t n = hi - lo;
    if (n <= leaf_size) return idx;

    // centroid extent and split axis
    V3 c_min = centroid[order[lo]], c_max = c_min;
    for (int32_t k = lo + 1; k < hi; ++k) {
      c_min = vmin(c_min, centroid[order[k]]);
      c_max = vmax(c_max, centroid[order[k]]);
    }
    V3 ext{c_max.x - c_min.x, c_max.y - c_min.y, c_max.z - c_min.z};
    int axis = 0;
    if (ext.y > ext.x) axis = 1;
    if (ext.z > cmp_axis(ext, axis)) axis = 2;
    float extent = cmp_axis(ext, axis);

    int32_t mid;
    if (extent <= 1e-12f) {
      mid = lo + n / 2;
    } else {
      const int B = sah_bins;
      std::vector<int32_t> counts(B, 0);
      std::vector<V3> bmin(B, bb_min), bmax(B, bb_max);
      std::vector<bool> used(B, false);
      float lo_c = cmp_axis(c_min, axis);
      auto bin_of = [&](int32_t tri) {
        float rel = (cmp_axis(centroid[tri], axis) - lo_c) / extent;
        int b = static_cast<int>(rel * B);
        return std::min(std::max(b, 0), B - 1);
      };
      for (int32_t k = lo; k < hi; ++k) {
        int32_t tri = order[k];
        int b = bin_of(tri);
        counts[b]++;
        if (!used[b]) {
          bmin[b] = tmin[tri];
          bmax[b] = tmax[tri];
          used[b] = true;
        } else {
          bmin[b] = vmin(bmin[b], tmin[tri]);
          bmax[b] = vmax(bmax[b], tmax[tri]);
        }
      }
      // prefix/suffix sweep
      std::vector<float> left_area(B), right_area(B);
      std::vector<int32_t> left_cnt(B);
      V3 amn = bmin[0], amx = bmax[0];
      int32_t acc = 0;
      for (int b = 0; b < B; ++b) {
        if (used[b]) {
          amn = b ? vmin(amn, bmin[b]) : bmin[b];
          amx = b ? vmax(amx, bmax[b]) : bmax[b];
        }
        acc += counts[b];
        left_area[b] = half_area(amn, amx);
        left_cnt[b] = acc;
      }
      V3 rmn, rmx;
      bool seeded = false;
      for (int b = B - 1; b >= 0; --b) {
        if (used[b]) {
          rmn = seeded ? vmin(rmn, bmin[b]) : bmin[b];
          rmx = seeded ? vmax(rmx, bmax[b]) : bmax[b];
          seeded = true;
        }
        right_area[b] = seeded ? half_area(rmn, rmx) : 0.f;
      }
      float best_cost = std::numeric_limits<float>::infinity();
      int best_split = -1;
      for (int b = 0; b + 1 < B; ++b) {
        int32_t nl = left_cnt[b], nr = n - nl;
        if (nl == 0 || nr == 0) continue;
        float cost = nl * left_area[b] + nr * right_area[b + 1];
        if (cost < best_cost) {
          best_cost = cost;
          best_split = b;
        }
      }
      if (best_split < 0) {
        mid = lo + n / 2;
      } else {
        auto pivot = std::stable_partition(
            order.begin() + lo, order.begin() + hi,
            [&](int32_t tri) { return bin_of(tri) <= best_split; });
        mid = static_cast<int32_t>(pivot - order.begin());
        if (mid == lo || mid == hi) mid = lo + n / 2;
      }
    }

    meta[idx][3] = 0;  // internal
    emit(lo, mid);     // left child is idx+1 in preorder
    int32_t right = emit(mid, hi);
    meta[idx][0] = right;
    meta[idx][1] = 0;
    return idx;
  }

  void fill_skip() {
    int32_t B = static_cast<int32_t>(meta.size());
    std::vector<std::pair<int32_t, int32_t>> work;
    if (B) work.push_back({0, B});
    while (!work.empty()) {
      auto [i, s] = work.back();
      work.pop_back();
      meta[i][2] = s;
      if (meta[i][3] == 0) {
        int32_t right = meta[i][0];
        work.push_back({i + 1, right});
        work.push_back({right, s});
      }
    }
  }
};

}  // namespace

extern "C" int32_t build_bvh(const float *tris, int32_t T, int32_t leaf_size,
                             int32_t sah_bins, float *nodes_min,
                             float *nodes_max, int32_t *meta, int32_t *order) {
  if (T <= 0 || leaf_size <= 0 || sah_bins < 2) return -1;
  Builder b(tris, T, leaf_size, sah_bins);
  b.emit(0, T);
  b.fill_skip();
  int32_t B = static_cast<int32_t>(b.meta.size());
  if (B > 2 * T) return -1;  // caller capacity contract
  for (int32_t i = 0; i < B; ++i) {
    nodes_min[i * 3 + 0] = b.nmin[i].x;
    nodes_min[i * 3 + 1] = b.nmin[i].y;
    nodes_min[i * 3 + 2] = b.nmin[i].z;
    nodes_max[i * 3 + 0] = b.nmax[i].x;
    nodes_max[i * 3 + 1] = b.nmax[i].y;
    nodes_max[i * 3 + 2] = b.nmax[i].z;
    for (int j = 0; j < 4; ++j) meta[i * 4 + j] = b.meta[i][j];
  }
  for (int32_t i = 0; i < T; ++i) order[i] = b.order[i];
  return B;
}
