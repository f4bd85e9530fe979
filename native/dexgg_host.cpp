// dexgg_host — native host-side runtime ops for the camera-rate loop.
//
// The reference leans on open3d's C++ core for its per-frame perception
// (statistical outlier removal, RANSAC plane segmentation — see
// inference/segmentation.py) and on CUDA bps_torch for encoding.  On the
// TPU stack the encoder is a Pallas kernel; these C++ implementations cover
// the *host* side of the closed loop (RealSense frame -> segmented object
// cloud) where python/numpy overhead would eat the camera budget at
// 1280x720 (~1M points/frame), plus a SIMD-friendly host BPS fallback for
// CPU-only deployments.
//
// Exposed as a plain C ABI consumed via ctypes (dexgangrasp_tpu/native.py);
// every function has a pure-numpy fallback so the framework runs without
// the compiled library.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <random>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- BPS ----
// out[b] = min_n ||basis[b] - pts[n]||  (brute force, cache-blocked)
void dexgg_bps_encode(const float* basis, int64_t B, const float* pts,
                      int64_t N, float* out) {
  constexpr int64_t BLK = 256;
  std::vector<float> best(static_cast<size_t>(B),
                          std::numeric_limits<float>::infinity());
  for (int64_t n0 = 0; n0 < N; n0 += BLK) {
    const int64_t n1 = std::min(n0 + BLK, N);
    for (int64_t b = 0; b < B; ++b) {
      const float bx = basis[3 * b], by = basis[3 * b + 1],
                  bz = basis[3 * b + 2];
      float m = best[b];
      for (int64_t n = n0; n < n1; ++n) {
        const float dx = bx - pts[3 * n];
        const float dy = by - pts[3 * n + 1];
        const float dz = bz - pts[3 * n + 2];
        const float d = dx * dx + dy * dy + dz * dz;
        m = d < m ? d : m;
      }
      best[b] = m;
    }
  }
  for (int64_t b = 0; b < B; ++b) out[b] = std::sqrt(best[b]);
}

// ----------------------------------------- statistical outlier removal ----
// open3d remove_statistical_outlier semantics: mean distance to k nearest
// neighbors; drop points with mean_d > mean(mean_d) + std_ratio*std(mean_d).
// Grid-hash accelerated kNN (expands the cell search ring until k found).
namespace {
struct Grid {
  float minx, miny, minz, cell;
  int64_t nx, ny, nz;
  std::vector<int32_t> cell_start;  // prefix offsets, size ncells+1
  std::vector<int32_t> order;       // point indices sorted by cell

  int64_t cell_of(float x, float y, float z) const {
    int64_t cx = std::min<int64_t>(nx - 1, std::max<int64_t>(0, (int64_t)((x - minx) / cell)));
    int64_t cy = std::min<int64_t>(ny - 1, std::max<int64_t>(0, (int64_t)((y - miny) / cell)));
    int64_t cz = std::min<int64_t>(nz - 1, std::max<int64_t>(0, (int64_t)((z - minz) / cell)));
    return (cx * ny + cy) * nz + cz;
  }
};

Grid build_grid(const float* pts, int64_t N, float cell) {
  Grid g;
  g.cell = cell;
  g.minx = g.miny = g.minz = std::numeric_limits<float>::infinity();
  float maxx = -g.minx, maxy = -g.miny, maxz = -g.minz;
  for (int64_t i = 0; i < N; ++i) {
    g.minx = std::min(g.minx, pts[3 * i]);
    maxx = std::max(maxx, pts[3 * i]);
    g.miny = std::min(g.miny, pts[3 * i + 1]);
    maxy = std::max(maxy, pts[3 * i + 1]);
    g.minz = std::min(g.minz, pts[3 * i + 2]);
    maxz = std::max(maxz, pts[3 * i + 2]);
  }
  g.nx = std::max<int64_t>(1, (int64_t)((maxx - g.minx) / cell) + 1);
  g.ny = std::max<int64_t>(1, (int64_t)((maxy - g.miny) / cell) + 1);
  g.nz = std::max<int64_t>(1, (int64_t)((maxz - g.minz) / cell) + 1);
  const int64_t ncells = g.nx * g.ny * g.nz;
  std::vector<int32_t> counts(static_cast<size_t>(ncells) + 1, 0);
  std::vector<int64_t> cid(static_cast<size_t>(N));
  for (int64_t i = 0; i < N; ++i) {
    cid[i] = g.cell_of(pts[3 * i], pts[3 * i + 1], pts[3 * i + 2]);
    counts[cid[i] + 1]++;
  }
  for (int64_t c = 0; c < ncells; ++c) counts[c + 1] += counts[c];
  g.cell_start = counts;
  g.order.resize(static_cast<size_t>(N));
  std::vector<int32_t> cursor(g.cell_start.begin(), g.cell_start.end() - 1);
  for (int64_t i = 0; i < N; ++i) g.order[cursor[cid[i]]++] = (int32_t)i;
  return g;
}
}  // namespace

void dexgg_stat_outlier_mask(const float* pts, int64_t N, int32_t k,
                             float std_ratio, uint8_t* keep_mask) {
  if (N <= k + 1) {
    std::memset(keep_mask, 1, static_cast<size_t>(N));
    return;
  }
  // cell-size heuristic: estimate the k-th-NN radius from a brute-force
  // subsample (robust for both volumetric and surface-like clouds — a pure
  // bounding-box-volume heuristic degenerates badly on planar scans, where
  // it packs thousands of points per cell)
  float cell;
  {
    const int64_t n_query = std::min<int64_t>(128, N);
    const int64_t n_ref = std::min<int64_t>(4096, N);
    const int64_t q_stride = std::max<int64_t>(1, N / n_query);
    const int64_t r_stride = std::max<int64_t>(1, N / n_ref);
    std::vector<float> kth;
    std::vector<float> dists;
    for (int64_t qi = 0; qi < N; qi += q_stride) {
      dists.clear();
      const float x = pts[3 * qi], y = pts[3 * qi + 1], z = pts[3 * qi + 2];
      for (int64_t ri = 0; ri < N; ri += r_stride) {
        if (ri == qi) continue;
        const float dx = x - pts[3 * ri], dy = y - pts[3 * ri + 1],
                    dz = z - pts[3 * ri + 2];
        dists.push_back(dx * dx + dy * dy + dz * dz);
      }
      const int64_t kk = std::min<int64_t>(k, (int64_t)dists.size() - 1);
      if (kk < 1) continue;
      std::nth_element(dists.begin(), dists.begin() + kk - 1, dists.end());
      kth.push_back(std::sqrt(dists[kk - 1]));
    }
    float r_sub = 1e-3f;
    if (!kth.empty()) {
      std::nth_element(kth.begin(), kth.begin() + kth.size() / 2, kth.end());
      r_sub = kth[kth.size() / 2];
    }
    // subsample is sparser than the full cloud by factor s = n_ref/N; for
    // surface-like data r_k scales ~ 1/sqrt(density)
    const float s = (float)n_ref / (float)N;
    cell = std::max(r_sub * std::sqrt(s) * 1.5f, 1e-5f);
  }
  Grid g = build_grid(pts, N, cell);

  std::vector<double> mean_d(static_cast<size_t>(N));
  std::vector<float> heap;
  for (int64_t i = 0; i < N; ++i) {
    const float x = pts[3 * i], y = pts[3 * i + 1], z = pts[3 * i + 2];
    heap.clear();
    int ring = 1;
    // expand rings until we have k neighbors and the closed ring bound holds
    while (true) {
      heap.clear();
      const int64_t cx = std::min<int64_t>(g.nx - 1, std::max<int64_t>(0, (int64_t)((x - g.minx) / g.cell)));
      const int64_t cy = std::min<int64_t>(g.ny - 1, std::max<int64_t>(0, (int64_t)((y - g.miny) / g.cell)));
      const int64_t cz = std::min<int64_t>(g.nz - 1, std::max<int64_t>(0, (int64_t)((z - g.minz) / g.cell)));
      for (int64_t ax = std::max<int64_t>(0, cx - ring); ax <= std::min(g.nx - 1, cx + ring); ++ax)
        for (int64_t ay = std::max<int64_t>(0, cy - ring); ay <= std::min(g.ny - 1, cy + ring); ++ay)
          for (int64_t az = std::max<int64_t>(0, cz - ring); az <= std::min(g.nz - 1, cz + ring); ++az) {
            const int64_t c = (ax * g.ny + ay) * g.nz + az;
            for (int32_t s = g.cell_start[c]; s < g.cell_start[c + 1]; ++s) {
              const int32_t j = g.order[s];
              if (j == (int32_t)i) continue;
              const float dx = x - pts[3 * j], dy = y - pts[3 * j + 1],
                          dz = z - pts[3 * j + 2];
              heap.push_back(dx * dx + dy * dy + dz * dz);
            }
          }
      if ((int64_t)heap.size() >= k) {
        std::nth_element(heap.begin(), heap.begin() + (k - 1), heap.end());
        const float kth = heap[k - 1];
        // all true kNN are inside the searched rings if kth dist fits
        const float ring_reach = ring * g.cell;
        if (kth <= ring_reach * ring_reach ||
            (ring >= g.nx && ring >= g.ny && ring >= g.nz))
          break;
      } else if (ring >= g.nx && ring >= g.ny && ring >= g.nz) {
        break;
      }
      ++ring;
    }
    const int64_t kk = std::min<int64_t>(k, (int64_t)heap.size());
    std::partial_sort(heap.begin(), heap.begin() + kk, heap.end());
    double acc = 0;
    for (int64_t j = 0; j < kk; ++j) acc += std::sqrt((double)heap[j]);
    mean_d[i] = kk ? acc / kk : 0.0;
  }
  double mu = 0;
  for (int64_t i = 0; i < N; ++i) mu += mean_d[i];
  mu /= N;
  double var = 0;
  for (int64_t i = 0; i < N; ++i) var += (mean_d[i] - mu) * (mean_d[i] - mu);
  const double sd = std::sqrt(var / N);
  const double thresh = mu + std_ratio * sd;
  for (int64_t i = 0; i < N; ++i) keep_mask[i] = mean_d[i] <= thresh;
}

// ------------------------------------------------------- RANSAC plane ----
void dexgg_ransac_plane(const float* pts, int64_t N, float dist_thresh,
                        int32_t iters, uint64_t seed, float* plane_out,
                        uint8_t* inlier_mask) {
  std::mt19937_64 rng(seed);
  std::uniform_int_distribution<int64_t> pick(0, N - 1);
  double best_count = -1;
  float best[4] = {0, 0, 1, 0};
  for (int32_t it = 0; it < iters; ++it) {
    const int64_t i0 = pick(rng), i1 = pick(rng), i2 = pick(rng);
    const float* a = pts + 3 * i0;
    const float* b = pts + 3 * i1;
    const float* c = pts + 3 * i2;
    const float u[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
    const float v[3] = {c[0] - a[0], c[1] - a[1], c[2] - a[2]};
    float n[3] = {u[1] * v[2] - u[2] * v[1], u[2] * v[0] - u[0] * v[2],
                  u[0] * v[1] - u[1] * v[0]};
    const float norm = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
    if (norm < 1e-12f) continue;
    n[0] /= norm;
    n[1] /= norm;
    n[2] /= norm;
    const float d = -(n[0] * a[0] + n[1] * a[1] + n[2] * a[2]);
    int64_t count = 0;
    for (int64_t i = 0; i < N; ++i) {
      const float dist = std::fabs(n[0] * pts[3 * i] + n[1] * pts[3 * i + 1] +
                                   n[2] * pts[3 * i + 2] + d);
      count += dist < dist_thresh;
    }
    if (count > best_count) {
      best_count = (double)count;
      best[0] = n[0];
      best[1] = n[1];
      best[2] = n[2];
      best[3] = d;
    }
  }
  std::memcpy(plane_out, best, 4 * sizeof(float));
  for (int64_t i = 0; i < N; ++i) {
    const float dist = std::fabs(best[0] * pts[3 * i] +
                                 best[1] * pts[3 * i + 1] +
                                 best[2] * pts[3 * i + 2] + best[3]);
    inlier_mask[i] = dist < dist_thresh;
  }
}

// ------------------------------------------------------ voxel downsample --
// keep one representative point (the first encountered) per voxel of edge
// `voxel`; returns the number of kept points written to out (<= N).
int64_t dexgg_voxel_downsample(const float* pts, int64_t N, float voxel,
                               float* out, int64_t max_out) {
  if (N == 0 || voxel <= 0) return 0;
  float minv[3] = {1e30f, 1e30f, 1e30f};
  for (int64_t i = 0; i < N; ++i)
    for (int j = 0; j < 3; ++j) minv[j] = std::min(minv[j], pts[3 * i + j]);
  // open-addressing hash set of voxel keys
  int64_t cap = 1;
  while (cap < 2 * N) cap <<= 1;
  std::vector<uint64_t> table(static_cast<size_t>(cap), ~0ull);
  int64_t n_out = 0;
  for (int64_t i = 0; i < N && n_out < max_out; ++i) {
    const uint64_t vx = (uint64_t)((pts[3 * i] - minv[0]) / voxel);
    const uint64_t vy = (uint64_t)((pts[3 * i + 1] - minv[1]) / voxel);
    const uint64_t vz = (uint64_t)((pts[3 * i + 2] - minv[2]) / voxel);
    const uint64_t keyv = (vx * 73856093ull) ^ (vy * 19349663ull) ^
                          (vz * 83492791ull);
    const uint64_t packed = (vx << 42) | (vy << 21) | vz;
    uint64_t slot = keyv & (uint64_t)(cap - 1);
    bool fresh = true;
    while (table[slot] != ~0ull) {
      if (table[slot] == packed) {
        fresh = false;
        break;
      }
      slot = (slot + 1) & (uint64_t)(cap - 1);
    }
    if (fresh) {
      table[slot] = packed;
      out[3 * n_out] = pts[3 * i];
      out[3 * n_out + 1] = pts[3 * i + 1];
      out[3 * n_out + 2] = pts[3 * i + 2];
      ++n_out;
    }
  }
  return n_out;
}

// ------------------------------------------------------ frame prep -------
// The whole host half of a fused camera frame in ONE pass over the ROI:
// organized (H,W,3) frame -> ROI crop (rect + optional boolean mask) ->
// finite + z-window filter -> voxel-hash downsample -> cap at `target`
// via a deterministic uniform subsample (seeded by the kept count, same
// contract as ops/bps.pad_cloud) -> PAD_VALUE-fill to exactly `target`.
// Replaces ~4 numpy passes + 2 temporaries over ~200k points.
// Returns n_valid (<= target).
int64_t dexgg_prep_frame(const float* frame, int64_t H, int64_t W,
                         int64_t r0, int64_t r1, int64_t c0, int64_t c1,
                         const uint8_t* roi_mask /* nullable, H*W */,
                         float zmin, float zmax, float voxel,
                         float* out, int64_t target, float pad_value) {
  r0 = std::max<int64_t>(0, r0);
  c0 = std::max<int64_t>(0, c0);
  r1 = std::min(H, r1);
  c1 = std::min(W, c1);
  std::vector<float> kept;
  kept.reserve(16384 * 3);
  // voxel bounds from the z-window'd ROI (cheap first pass over the rect)
  float minv[3] = {1e30f, 1e30f, 1e30f};
  for (int64_t r = r0; r < r1; ++r)
    for (int64_t c = c0; c < c1; ++c) {
      if (roi_mask && !roi_mask[r * W + c]) continue;
      const float* p = frame + 3 * (r * W + c);
      if (!std::isfinite(p[0]) || !std::isfinite(p[1]) ||
          !std::isfinite(p[2]))
        continue;
      if (p[2] <= zmin || p[2] >= zmax) continue;
      minv[0] = std::min(minv[0], p[0]);
      minv[1] = std::min(minv[1], p[1]);
      minv[2] = std::min(minv[2], p[2]);
    }
  const int64_t roi_n = (r1 - r0) * (c1 - c0);
  int64_t cap = 1;
  while (cap < 2 * std::max<int64_t>(roi_n, 16)) cap <<= 1;
  std::vector<uint64_t> table(static_cast<size_t>(cap), ~0ull);
  const float inv_voxel = voxel > 0 ? 1.0f / voxel : 0.0f;
  for (int64_t r = r0; r < r1; ++r)
    for (int64_t c = c0; c < c1; ++c) {
      if (roi_mask && !roi_mask[r * W + c]) continue;
      const float* p = frame + 3 * (r * W + c);
      if (!std::isfinite(p[0]) || !std::isfinite(p[1]) ||
          !std::isfinite(p[2]))
        continue;
      if (p[2] <= zmin || p[2] >= zmax) continue;
      if (voxel > 0) {
        const uint64_t vx = (uint64_t)((p[0] - minv[0]) * inv_voxel);
        const uint64_t vy = (uint64_t)((p[1] - minv[1]) * inv_voxel);
        const uint64_t vz = (uint64_t)((p[2] - minv[2]) * inv_voxel);
        const uint64_t keyv = (vx * 73856093ull) ^ (vy * 19349663ull) ^
                              (vz * 83492791ull);
        const uint64_t packed = (vx << 42) | (vy << 21) | vz;
        uint64_t slot = keyv & (uint64_t)(cap - 1);
        bool fresh = true;
        while (table[slot] != ~0ull) {
          if (table[slot] == packed) {
            fresh = false;
            break;
          }
          slot = (slot + 1) & (uint64_t)(cap - 1);
        }
        if (!fresh) continue;
        table[slot] = packed;
      }
      kept.push_back(p[0]);
      kept.push_back(p[1]);
      kept.push_back(p[2]);
    }
  int64_t n = (int64_t)kept.size() / 3;
  if (n > target) {
    // deterministic partial Fisher-Yates seeded by n (pad_cloud contract)
    std::mt19937_64 rng((uint64_t)n);
    for (int64_t i = 0; i < target; ++i) {
      std::uniform_int_distribution<int64_t> pick(i, n - 1);
      const int64_t j = pick(rng);
      for (int k = 0; k < 3; ++k) std::swap(kept[3 * i + k], kept[3 * j + k]);
    }
    n = target;
  }
  std::memcpy(out, kept.data(), (size_t)(3 * n) * sizeof(float));
  for (int64_t i = n; i < target; ++i) {
    out[3 * i] = out[3 * i + 1] = out[3 * i + 2] = pad_value;
  }
  return n;
}

// ------------------------------------------------------ workspace crop ----
// keep_mask[i] = all(lo <= p <= hi); fused box filter for ROI cropping
void dexgg_box_crop_mask(const float* pts, int64_t N, const float* lo,
                         const float* hi, uint8_t* keep_mask) {
  for (int64_t i = 0; i < N; ++i) {
    const float x = pts[3 * i], y = pts[3 * i + 1], z = pts[3 * i + 2];
    keep_mask[i] = x >= lo[0] && x <= hi[0] && y >= lo[1] && y <= hi[1] &&
                   z >= lo[2] && z <= hi[2];
  }
}

}  // extern "C"
