// Reference-algorithm correlative scan matcher, C++17, no dependencies.
//
// A from-scratch implementation of the real-time correlative matching
// algorithm the reference frontend uses (Olson 2009; reference behavior per
// scan_matcher_real_time_correlative.cpp: windowed-max coarse map, coarse
// sweep strided by the low-resolution factor, fine refinement of winning
// blocks, strictly-greater updates). Compiled -O3 and timed on the same
// workload as the TPU kernels, it provides the measured single-core C++
// baseline for BENCH (the reference itself cannot be built here: its
// Eigen3/Boost dependencies are not installed).
//
// Workload file (little-endian):
//   int32 H, W; float32 res, origin_x, origin_y
//   float32 values[H*W]            (row-major, [y][x], unknown = 0)
//   int32 n_queries, NB
//   per query: float32 pose[3]; float32 ranges[NB]; float32 angles[NB]
//   float32 range_x, range_y, range_theta, scan_range_max; int32 low_res
//
// Output: one JSON line {"matches_per_sec": ..., "checksum": ...}
// plus best poses written to <workload>.out.bin for parity checking.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <string>
#include <vector>

namespace {

struct Workload {
  int h = 0, w = 0;
  float res = 0.f, ox = 0.f, oy = 0.f;
  std::vector<float> values;
  int nq = 0, nb = 0;
  std::vector<float> poses;    // [nq*3]
  std::vector<float> ranges;   // [nq*nb]
  std::vector<float> angles;   // [nq*nb]
  float range_x = 0.f, range_y = 0.f, range_t = 0.f, scan_range_max = 0.f;
  int low_res = 5;
};

bool LoadWorkload(const char* path, Workload* wl) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  auto rd = [&](void* dst, size_t n) { return std::fread(dst, 1, n, f) == n; };
  int32_t hw[2];
  if (!rd(hw, sizeof(hw))) return false;
  wl->h = hw[0];
  wl->w = hw[1];
  float meta[3];
  if (!rd(meta, sizeof(meta))) return false;
  wl->res = meta[0];
  wl->ox = meta[1];
  wl->oy = meta[2];
  wl->values.resize(size_t(wl->h) * wl->w);
  if (!rd(wl->values.data(), wl->values.size() * 4)) return false;
  int32_t qn[2];
  if (!rd(qn, sizeof(qn))) return false;
  wl->nq = qn[0];
  wl->nb = qn[1];
  wl->poses.resize(size_t(wl->nq) * 3);
  wl->ranges.resize(size_t(wl->nq) * wl->nb);
  wl->angles.resize(size_t(wl->nq) * wl->nb);
  for (int q = 0; q < wl->nq; ++q) {
    if (!rd(&wl->poses[q * 3], 12)) return false;
    if (!rd(&wl->ranges[size_t(q) * wl->nb], size_t(wl->nb) * 4)) return false;
    if (!rd(&wl->angles[size_t(q) * wl->nb], size_t(wl->nb) * 4)) return false;
  }
  float params[4];
  if (!rd(params, sizeof(params))) return false;
  wl->range_x = params[0];
  wl->range_y = params[1];
  wl->range_t = params[2];
  wl->scan_range_max = params[3];
  int32_t lr;
  if (!rd(&lr, sizeof(lr))) return false;
  wl->low_res = lr;
  std::fclose(f);
  return true;
}

// Forward-looking windowed max: out[i] = max over [i, i+win) with zero pad.
void ForwardWindowMax(const std::vector<float>& in, int h, int w, int win,
                      std::vector<float>* out) {
  std::vector<float> tmp(size_t(h) * w, 0.f);
  out->assign(size_t(h) * w, 0.f);
  // Rows.
  for (int y = 0; y < h; ++y) {
    std::deque<int> q;
    const float* row = &in[size_t(y) * w];
    float* trow = &tmp[size_t(y) * w];
    for (int x = 0; x < w + win; ++x) {
      if (x < w) {
        while (!q.empty() && row[x] >= row[q.back()]) q.pop_back();
        q.push_back(x);
      }
      int i = x - win + 1;  // window [i, i+win)
      if (i >= 0 && i < w) {
        while (!q.empty() && q.front() < i) q.pop_front();
        trow[i] = q.empty() ? 0.f : row[q.front()];
      }
    }
  }
  // Columns.
  for (int x = 0; x < w; ++x) {
    std::deque<int> q;
    for (int y = 0; y < h + win; ++y) {
      if (y < h) {
        float v = tmp[size_t(y) * w + x];
        while (!q.empty() && v >= tmp[size_t(q.back()) * w + x])
          q.pop_back();
        q.push_back(y);
      }
      int i = y - win + 1;
      if (i >= 0 && i < h) {
        while (!q.empty() && q.front() < i) q.pop_front();
        (*out)[size_t(i) * w + x] =
            q.empty() ? 0.f : tmp[size_t(q.front()) * w + x];
      }
    }
  }
}

struct Result {
  float x, y, t;
  float score;
};

Result MatchOne(const Workload& wl, const std::vector<float>& coarse,
                int q) {
  const float* pose = &wl.poses[q * 3];
  const float* rr = &wl.ranges[size_t(q) * wl.nb];
  const float* aa = &wl.angles[size_t(q) * wl.nb];

  // Search steps: xy = resolution; theta from the cosine law with the
  // scan's max range clamped by scan_range_max.
  float max_range = 0.f;
  for (int b = 0; b < wl.nb; ++b) max_range = std::max(max_range, rr[b]);
  max_range = std::min(max_range, wl.scan_range_max);
  const float tr = wl.res / max_range;
  const float step_t = std::acos(1.0f - 0.5f * tr * tr);
  const int win_x = int(std::ceil(0.5f * wl.range_x / wl.res));
  const int win_y = int(std::ceil(0.5f * wl.range_y / wl.res));
  const int win_t = int(std::ceil(0.5f * wl.range_t / step_t));

  // Valid beams: r < scan_range_max.
  std::vector<int> keep;
  keep.reserve(wl.nb);
  for (int b = 0; b < wl.nb; ++b)
    if (rr[b] > 0.f && rr[b] < wl.scan_range_max) keep.push_back(b);

  std::vector<int> ix(keep.size()), iy(keep.size());
  float best = -1.f;
  int bx = -win_x, by = -win_y, bt = -win_t;

  auto score_at = [&](const std::vector<float>& grid, int dx, int dy) {
    float s = 0.f;
    for (size_t k = 0; k < keep.size(); ++k) {
      const int cx = ix[k] + dx;
      const int cy = iy[k] + dy;
      if (cx >= 0 && cx < wl.w && cy >= 0 && cy < wl.h)
        s += grid[size_t(cy) * wl.w + cx];
    }
    return s;
  };

  for (int t = -win_t; t <= win_t; ++t) {
    const float th = pose[2] + step_t * float(t);
    for (size_t k = 0; k < keep.size(); ++k) {
      const int b = keep[k];
      const float wx = pose[0] + rr[b] * std::cos(th + aa[b]);
      const float wy = pose[1] + rr[b] * std::sin(th + aa[b]);
      ix[k] = int(std::floor((wx - wl.ox) / wl.res));
      iy[k] = int(std::floor((wy - wl.oy) / wl.res));
    }
    for (int x = -win_x; x <= win_x; x += wl.low_res) {
      for (int y = -win_y; y <= win_y; y += wl.low_res) {
        const float coarse_score = score_at(coarse, x, y);
        if (coarse_score <= best) continue;
        // Refine within the winning block on the fine map.
        for (int fx = x; fx < x + wl.low_res; ++fx) {
          for (int fy = y; fy < y + wl.low_res; ++fy) {
            const float s = score_at(wl.values, fx, fy);
            if (s > best) {
              best = s;
              bx = fx;
              by = fy;
              bt = t;
            }
          }
        }
      }
    }
  }

  Result r;
  r.x = pose[0] + float(bx) * wl.res;
  r.y = pose[1] + float(by) * wl.res;
  r.t = pose[2] + float(bt) * step_t;
  r.score = best;
  return r;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <workload.bin> [repeats]\n", argv[0]);
    return 1;
  }
  Workload wl;
  if (!LoadWorkload(argv[1], &wl)) {
    std::fprintf(stderr, "failed to load %s\n", argv[1]);
    return 1;
  }
  const int repeats = argc > 2 ? std::atoi(argv[2]) : 1;

  std::vector<float> coarse;
  const auto tc0 = std::chrono::steady_clock::now();
  ForwardWindowMax(wl.values, wl.h, wl.w, wl.low_res, &coarse);
  const auto tc1 = std::chrono::steady_clock::now();

  std::vector<Result> results(wl.nq);
  const auto t0 = std::chrono::steady_clock::now();
  for (int rep = 0; rep < repeats; ++rep)
    for (int q = 0; q < wl.nq; ++q) results[q] = MatchOne(wl, coarse, q);
  const auto t1 = std::chrono::steady_clock::now();

  const double secs = std::chrono::duration<double>(t1 - t0).count();
  const double coarse_secs = std::chrono::duration<double>(tc1 - tc0).count();
  const double mps = double(wl.nq) * repeats / secs;

  double checksum = 0.0;
  for (const auto& r : results) checksum += r.score;

  const std::string out_path = std::string(argv[1]) + ".out.bin";
  if (FILE* f = std::fopen(out_path.c_str(), "wb")) {
    for (const auto& r : results) {
      float v[4] = {r.x, r.y, r.t, r.score};
      std::fwrite(v, sizeof(v), 1, f);
    }
    std::fclose(f);
  }

  std::printf(
      "{\"matches_per_sec\": %.3f, \"coarse_precompute_sec\": %.6f, "
      "\"checksum\": %.3f}\n",
      mps, coarse_secs, checksum);
  return 0;
}
