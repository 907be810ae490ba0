// Native OKS-NMS host library (SURVEY.md §2.14).
//
// The reference's only in-repo native code is its NMS stack
// (lib/nms/cpu_nms.pyx Cython + nms_kernel.cu CUDA). The TPU rebuild keeps
// the *device* path in JAX (vectorized OKS + fixed-iteration suppression,
// rsgnet_tpu/ops/nms.py); this C++ library is the host-side equivalent used
// by the evaluation pipeline where instance counts are tiny and variable —
// exact greedy semantics, no padding, no device round-trip.
//
// Semantics mirror the reference lib/nms/nms.py:
//   oks_iou:  e = (dx^2+dy^2) / var / ((a_g+a_d)/2 + eps) / 2, var=(2*sigma)^2
//             mean(exp(-e)) over all K (or over joints with both vis > thre)
//   oks_nms:  greedy keep in descending-score order, suppress OKS > thresh
//   soft_oks_nms: gaussian rescore exp(-oks^2/thresh), up to max_dets rounds.
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <numeric>
#include <vector>

namespace {

// OKS between instance g and instance d over K joints (x, y, s triplets).
double oks_pair(const float* g, const float* d, double a_g, double a_d,
                const float* sigmas, int k, float in_vis_thre) {
  double sum = 0.0;
  int count = 0;
  const double denom_area = (a_g + a_d) / 2.0 + 2.220446049250313e-16;
  for (int j = 0; j < k; ++j) {
    const double var = 4.0 * static_cast<double>(sigmas[j]) * sigmas[j];
    const double dx = static_cast<double>(d[3 * j]) - g[3 * j];
    const double dy = static_cast<double>(d[3 * j + 1]) - g[3 * j + 1];
    if (in_vis_thre >= 0.0f &&
        !(g[3 * j + 2] > in_vis_thre && d[3 * j + 2] > in_vis_thre)) {
      continue;
    }
    const double e = (dx * dx + dy * dy) / var / denom_area / 2.0;
    sum += std::exp(-e);
    ++count;
  }
  return count > 0 ? sum / count : 0.0;
}

std::vector<int> score_order(const float* scores, int m) {
  std::vector<int> order(m);
  std::iota(order.begin(), order.end(), 0);
  // Tie-break matches the NumPy oracle (ascending stable argsort, reversed):
  // among equal scores the HIGHEST index comes first. The JAX device kernels
  // implement the same rule, so all three paths agree on quantized scores.
  std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
    return scores[a] > scores[b] || (scores[a] == scores[b] && a > b);
  });
  return order;
}

}  // namespace

extern "C" {

// Returns the number of kept instances; their original indices are written to
// `keep` in descending-score order. in_vis_thre < 0 disables the visibility
// filter (reference passes None).
int oks_nms(const float* kpts, const float* scores, const float* areas,
            const float* sigmas, int m, int k, float thresh,
            float in_vis_thre, int* keep) {
  std::vector<int> order = score_order(scores, m);
  std::vector<char> suppressed(m, 0);
  int n_keep = 0;
  for (int oi = 0; oi < m; ++oi) {
    const int i = order[oi];
    if (suppressed[i]) continue;
    keep[n_keep++] = i;
    for (int oj = oi + 1; oj < m; ++oj) {
      const int j = order[oj];
      if (suppressed[j]) continue;
      const double oks = oks_pair(kpts + 3 * k * i, kpts + 3 * k * j,
                                  areas[i], areas[j], sigmas, k, in_vis_thre);
      if (oks > thresh) suppressed[j] = 1;
    }
  }
  return n_keep;
}

// Soft-NMS with gaussian decay. Writes kept original indices to `keep` and
// their (pre-decay) selection scores to `new_scores`; returns count.
int soft_oks_nms(const float* kpts, const float* scores, const float* areas,
                 const float* sigmas, int m, int k, float thresh,
                 float in_vis_thre, int max_dets, int* keep,
                 float* new_scores) {
  std::vector<double> live(scores, scores + m);
  std::vector<char> used(m, 0);
  int n_keep = 0;
  while (n_keep < max_dets) {
    int best = -1;
    double best_s = 0.0;
    for (int i = 0; i < m; ++i) {
      // >= : among equal scores the HIGHEST index wins, matching the NumPy
      // oracle's reversed stable argsort and the JAX device kernel.
      if (!used[i] && (best < 0 || live[i] >= best_s)) {
        best_s = live[i];
        best = i;
      }
    }
    if (best < 0) break;
    used[best] = 1;
    keep[n_keep] = best;
    new_scores[n_keep] = static_cast<float>(live[best]);
    ++n_keep;
    for (int j = 0; j < m; ++j) {
      if (used[j]) continue;
      const double oks =
          oks_pair(kpts + 3 * k * best, kpts + 3 * k * j, areas[best],
                   areas[j], sigmas, k, in_vis_thre);
      live[j] *= std::exp(-(oks * oks) / thresh);
    }
  }
  return n_keep;
}

}  // extern "C"
