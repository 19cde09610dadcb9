// Native host builders: binned-SAH BVH and alias tables.
//
// TPU-native rebuild of the reference's Rust host builders
// (lupin/src/data_structures.rs: build_bvh :196-235, bvh_split :237-325,
// choose_split :366-466, node_cost :468-475, swap_tris :502-527;
// build_alias_table :116-193). The Python/numpy versions in accel/ are the
// reference implementations; this library is the production path (the SAH
// split loop is the hot CPU stage of scene building, SURVEY.md §3.1).
//
// C ABI, consumed from Python via ctypes (accel/native/__init__.py).
// Build: g++ -O3 -march=native -shared -fPIC builders.cpp -o libbuilders.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int kNumBins = 8;

struct Vec3 {
  float x, y, z;
};

inline Vec3 vmin(const Vec3& a, const Vec3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3& a, const Vec3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct Aabb {
  Vec3 lo{std::numeric_limits<float>::infinity(),
          std::numeric_limits<float>::infinity(),
          std::numeric_limits<float>::infinity()};
  Vec3 hi{-std::numeric_limits<float>::infinity(),
          -std::numeric_limits<float>::infinity(),
          -std::numeric_limits<float>::infinity()};
  void grow(const Vec3& lo2, const Vec3& hi2) {
    lo = vmin(lo, lo2);
    hi = vmax(hi, hi2);
  }
  // Half surface area (node_cost uses half-area * count,
  // data_structures.rs:468-475).
  float half_area() const {
    float dx = std::max(hi.x - lo.x, 0.f);
    float dy = std::max(hi.y - lo.y, 0.f);
    float dz = std::max(hi.z - lo.z, 0.f);
    return dx * dy + dy * dz + dz * dx;
  }
};

struct StackItem {
  int node, begin, end, depth;
};

}  // namespace

extern "C" {

// Builds a binary binned-SAH BVH over triangle AABBs.
//
// Inputs : tri_lo/tri_hi  — (T,3) row-major per-triangle bounds.
// Outputs: node_min/node_max — (cap,3); node_first/node_count — (cap,);
//          order — (T,) new-position -> old-triangle permutation;
//          returns number of nodes; *out_depth = max depth reached.
// cap must be >= 2*T + 1. Field semantics match BvhNode
// (renderer.rs:225-237): count == 0 -> internal, children at (first, first+1).
int lupin_build_bvh(const float* tri_lo, const float* tri_hi, int num_tris,
                    int max_leaf, int max_depth, float* node_min,
                    float* node_max, int* node_first, int* node_count,
                    int* order, int* out_depth) {
  if (num_tris <= 0) {
    node_min[0] = node_min[1] = node_min[2] = 0.f;
    node_max[0] = node_max[1] = node_max[2] = 0.f;
    node_first[0] = 0;
    node_count[0] = 0;
    *out_depth = 1;
    return 1;
  }

  const Vec3* lo = reinterpret_cast<const Vec3*>(tri_lo);
  const Vec3* hi = reinterpret_cast<const Vec3*>(tri_hi);

  std::vector<Vec3> cen(num_tris);
  for (int i = 0; i < num_tris; ++i) {
    cen[i] = {(lo[i].x + hi[i].x) * 0.5f, (lo[i].y + hi[i].y) * 0.5f,
              (lo[i].z + hi[i].z) * 0.5f};
    order[i] = i;
  }

  auto write_node = [&](int n, const Aabb& b, int first, int count) {
    node_min[3 * n + 0] = b.lo.x;
    node_min[3 * n + 1] = b.lo.y;
    node_min[3 * n + 2] = b.lo.z;
    node_max[3 * n + 0] = b.hi.x;
    node_max[3 * n + 1] = b.hi.y;
    node_max[3 * n + 2] = b.hi.z;
    node_first[n] = first;
    node_count[n] = count;
  };

  auto range_bounds = [&](int begin, int end) {
    Aabb b;
    for (int i = begin; i < end; ++i) {
      int t = order[i];
      b.grow(lo[t], hi[t]);
    }
    return b;
  };

  int num_nodes = 1;
  int seen_depth = 1;
  write_node(0, range_bounds(0, num_tris), 0, num_tris);

  std::vector<StackItem> stack;
  stack.push_back({0, 0, num_tris, 1});

  while (!stack.empty()) {
    StackItem it = stack.back();
    stack.pop_back();
    int count = it.end - it.begin;
    seen_depth = std::max(seen_depth, it.depth);
    if (count <= max_leaf || it.depth >= max_depth) {
      node_first[it.node] = it.begin;
      node_count[it.node] = count;
      continue;
    }

    // Centroid bounds of this range (choose_split's refinement,
    // data_structures.rs:366-466).
    Vec3 clo{INFINITY, INFINITY, INFINITY}, chi{-INFINITY, -INFINITY, -INFINITY};
    for (int i = it.begin; i < it.end; ++i) {
      clo = vmin(clo, cen[order[i]]);
      chi = vmax(chi, cen[order[i]]);
    }
    float ext[3] = {chi.x - clo.x, chi.y - clo.y, chi.z - clo.z};
    int axis = 0;
    if (ext[1] > ext[axis]) axis = 1;
    if (ext[2] > ext[axis]) axis = 2;

    int mid;
    if (ext[axis] <= 0.f) {
      mid = it.begin + count / 2;  // degenerate: median split
    } else {
      const float base = axis == 0 ? clo.x : (axis == 1 ? clo.y : clo.z);
      const float scale = kNumBins / ext[axis];
      int bin_count[kNumBins] = {0};
      Aabb bin_bounds[kNumBins];
      auto bin_of = [&](int t) {
        float c = axis == 0 ? cen[t].x : (axis == 1 ? cen[t].y : cen[t].z);
        int b = static_cast<int>((c - base) * scale);
        return std::min(b, kNumBins - 1);
      };
      for (int i = it.begin; i < it.end; ++i) {
        int t = order[i];
        int b = bin_of(t);
        bin_count[b]++;
        bin_bounds[b].grow(lo[t], hi[t]);
      }
      // Prefix/suffix SAH sweep.
      float left_cost[kNumBins - 1], right_cost[kNumBins - 1];
      {
        Aabb acc;
        int n = 0;
        for (int b = 0; b < kNumBins - 1; ++b) {
          acc.grow(bin_bounds[b].lo, bin_bounds[b].hi);
          n += bin_count[b];
          left_cost[b] = n ? acc.half_area() * n : INFINITY;
        }
        acc = Aabb();
        n = 0;
        for (int b = kNumBins - 1; b >= 1; --b) {
          acc.grow(bin_bounds[b].lo, bin_bounds[b].hi);
          n += bin_count[b];
          right_cost[b - 1] = n ? acc.half_area() * n : INFINITY;
        }
      }
      int best = -1;
      float best_cost = INFINITY;
      for (int b = 0; b < kNumBins - 1; ++b) {
        float c = left_cost[b] + right_cost[b];
        if (std::isfinite(c) && c < best_cost) {
          best_cost = c;
          best = b;
        }
      }
      if (best < 0) {
        mid = it.begin + count / 2;
      } else {
        // Stable in-place partition keeps builds deterministic.
        int* seg = order + it.begin;
        int* tmp = seg;
        std::stable_partition(seg, order + it.end,
                              [&](int t) { return bin_of(t) <= best; });
        (void)tmp;
        mid = it.begin;
        for (int i = it.begin; i < it.end; ++i) {
          if (bin_of(order[i]) <= best)
            mid++;
          else
            break;
        }
        if (mid == it.begin || mid == it.end) mid = it.begin + count / 2;
      }
    }

    int left = num_nodes;
    int right = num_nodes + 1;
    num_nodes += 2;
    node_first[it.node] = left;
    node_count[it.node] = 0;
    write_node(left, range_bounds(it.begin, mid), it.begin, mid - it.begin);
    write_node(right, range_bounds(mid, it.end), mid, it.end - mid);
    stack.push_back({right, mid, it.end, it.depth + 1});
    stack.push_back({left, it.begin, mid, it.depth + 1});
  }

  *out_depth = seen_depth;
  return num_nodes;
}

// PBRT-4ed alias table (data_structures.rs:116-193), bit-compatible with the
// numpy reference (same LIFO work-list order and f32 arithmetic).
// Returns 0 on success, 1 for empty/all-zero weights (outputs untouched).
int lupin_build_alias_table(const float* weights, long long n, float* prob,
                            float* threshold, unsigned* alias) {
  if (n <= 0) return 1;
  double sum = 0.0;
  for (long long i = 0; i < n; ++i) sum += (double)weights[i];
  if (sum == 0.0) return 1;

  const double norm = 1.0 / sum;
  for (long long i = 0; i < n; ++i) {
    prob[i] = (float)((double)weights[i] * norm);
    threshold[i] = 0.f;
    alias[i] = 0;
  }

  struct Item {
    float est;
    long long idx;
  };
  std::vector<Item> under, over;
  under.reserve(n);
  over.reserve(n);
  for (long long i = 0; i < n; ++i) {
    float est = prob[i] * (float)n;
    if (est < 1.f)
      under.push_back({est, i});
    else
      over.push_back({est, i});
  }
  while (!under.empty() && !over.empty()) {
    Item u = under.back();
    under.pop_back();
    Item o = over.back();
    over.pop_back();
    threshold[u.idx] = u.est;
    alias[u.idx] = (unsigned)o.idx;
    float excess = u.est + o.est - 1.f;
    if (excess < 1.f)
      under.push_back({excess, o.idx});
    else
      over.push_back({excess, o.idx});
  }
  for (const Item& it : over) {
    threshold[it.idx] = 1.f;
    alias[it.idx] = 0;
  }
  for (const Item& it : under) {
    threshold[it.idx] = 1.f;
    alias[it.idx] = 0;
  }
  return 0;
}

// Radiance RGBE scanline decoder (both adaptive-RLE and flat), the hot loop
// of HDR golden loading (io/hdr.py keeps the pure-python reference).
// Returns 0 ok, negative on malformed input.
int lupin_decode_rgbe(const unsigned char* data, long long size, int width,
                      int height, unsigned char* out /* H*W*4 */) {
  long long bp = 0;
  for (int y = 0; y < height; ++y) {
    unsigned char* row = out + (long long)y * width * 4;
    if (width >= 8 && width < 32768 && bp + 4 <= size && data[bp] == 2 &&
        data[bp + 1] == 2 &&
        ((int)data[bp + 2] << 8 | (int)data[bp + 3]) == width) {
      bp += 4;
      for (int c = 0; c < 4; ++c) {
        int x = 0;
        while (x < width) {
          if (bp >= size) return -1;
          int code = data[bp++];
          if (code > 128) {
            if (bp >= size) return -1;
            unsigned char v = data[bp++];
            int run = code - 128;
            if (x + run > width) return -2;
            for (int k = 0; k < run; ++k) row[(x + k) * 4 + c] = v;
            x += run;
          } else {
            if (bp + code > size || x + code > width) return -3;
            for (int k = 0; k < code; ++k) row[(x + k) * 4 + c] = data[bp + k];
            bp += code;
            x += code;
          }
        }
      }
    } else {
      // Flat or old-style RLE.
      int x = 0;
      int shift = 0;
      while (x < width) {
        if (bp + 4 > size) return -4;
        const unsigned char* px = data + bp;
        bp += 4;
        if (px[0] == 1 && px[1] == 1 && px[2] == 1 && x > 0) {
          int count = (int)px[3] << shift;
          if (x + count > width) return -5;
          for (int k = 0; k < count; ++k)
            std::memcpy(row + (x + k) * 4, row + (x - 1) * 4, 4);
          x += count;
          shift += 8;
        } else {
          std::memcpy(row + x * 4, px, 4);
          x += 1;
          shift = 0;
        }
      }
    }
  }
  return 0;
}

}  // extern "C"
