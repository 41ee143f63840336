// KITTI eval per-frame matching statistics — native kernel.
//
// The reference numba-jits exactly this loop (mmdet3d
// evaluation/functional/kitti_utils/eval.py compute_statistics_jit:73-214
// and fused_compute_statistics:216-260); this repo has no numba, so the
// C++ port plays that role (ctypes-bound in
// tpu_bev3d/evaluation/functional/kitti_native.py, with the pure-Python
// implementation as documented fallback and parity oracle).
//
// Semantics mirror kitti_eval.py compute_statistics exactly.

#include <cmath>
#include <cstdint>
#include <vector>

namespace {
constexpr double kNoDet = -10000000.0;
}

extern "C" {

// Pass 1 (compute_fp=false, thresh=-inf): collect matched-TP detection
// scores for threshold construction. Returns count written to out_scores
// (capacity n_gt).
int32_t kitti_collect_tp_scores(const float* overlaps,  // [n_dt, n_gt]
                                int32_t n_dt, int32_t n_gt,
                                const float* dt_scores,
                                const int32_t* ignored_gt,
                                const int32_t* ignored_dt,
                                float min_overlap, float* out_scores) {
  std::vector<char> assigned(n_dt, 0);
  int32_t n_out = 0;
  for (int32_t j = 0; j < n_gt; ++j) {
    if (ignored_gt[j] == -1) continue;
    int32_t det_idx = -1;
    double valid_detection = kNoDet;
    for (int32_t i = 0; i < n_dt; ++i) {
      if (ignored_dt[i] == -1 || assigned[i]) continue;
      const float overlap = overlaps[i * n_gt + j];
      const float score = dt_scores[i];
      if (overlap > min_overlap && score > valid_detection) {
        det_idx = i;
        valid_detection = score;
      }
    }
    if (valid_detection == kNoDet) continue;
    if (ignored_gt[j] == 1 || ignored_dt[det_idx] == 1) {
      assigned[det_idx] = true;
    } else {
      out_scores[n_out++] = dt_scores[det_idx];
      assigned[det_idx] = true;
    }
  }
  return n_out;
}

// Pass 2 (compute_fp=true): for every threshold, run the frame's greedy
// matching and ACCUMULATE tp/fp/fn/similarity into the per-threshold
// output arrays (caller zero-initializes once and feeds every frame).
// dc_overlaps may be null (n_dc = 0); metric==0 enables the DontCare
// subtraction like the 2D-bbox protocol.
void kitti_accumulate_stats(const float* overlaps,  // [n_dt, n_gt]
                            int32_t n_dt, int32_t n_gt,
                            const float* dt_scores,
                            const float* gt_alphas,   // null if !aos
                            const float* dt_alphas,   // null if !aos
                            const int32_t* ignored_gt,
                            const int32_t* ignored_dt,
                            const float* dc_overlaps,  // [n_dt, n_dc]
                            int32_t n_dc, float min_overlap,
                            const double* thresholds, int32_t n_thresh,
                            int32_t compute_aos, int32_t metric,
                            int64_t* tp_out, int64_t* fp_out,
                            int64_t* fn_out, double* sim_out) {
  for (int32_t t = 0; t < n_thresh; ++t) {
    const double thresh = thresholds[t];
    std::vector<char> assigned(n_dt, 0);
    int64_t tp = 0, fp = 0, fn = 0;
    double similarity = 0.0;
    for (int32_t j = 0; j < n_gt; ++j) {
      if (ignored_gt[j] == -1) continue;
      int32_t det_idx = -1;
      double valid_detection = kNoDet;
      double max_overlap = 0.0;
      bool assigned_ignored_det = false;
      for (int32_t i = 0; i < n_dt; ++i) {
        if (ignored_dt[i] == -1 || assigned[i] ||
            dt_scores[i] < thresh)
          continue;
        const float overlap = overlaps[i * n_gt + j];
        if (overlap > min_overlap &&
            (overlap > max_overlap || assigned_ignored_det) &&
            ignored_dt[i] == 0) {
          max_overlap = overlap;
          det_idx = i;
          valid_detection = 1;
          assigned_ignored_det = false;
        } else if (overlap > min_overlap && valid_detection == kNoDet &&
                   ignored_dt[i] == 1) {
          det_idx = i;
          valid_detection = 1;
          assigned_ignored_det = true;
        }
      }
      if (valid_detection == kNoDet && ignored_gt[j] == 0) {
        ++fn;
      } else if (valid_detection != kNoDet &&
                 (ignored_gt[j] == 1 || ignored_dt[det_idx] == 1)) {
        assigned[det_idx] = true;
      } else if (valid_detection != kNoDet) {
        ++tp;
        if (compute_aos) {
          const double delta = gt_alphas[j] - dt_alphas[det_idx];
          similarity += (1.0 + std::cos(delta)) / 2.0;
        }
        assigned[det_idx] = true;
      }
    }
    for (int32_t i = 0; i < n_dt; ++i) {
      if (!(assigned[i] || ignored_dt[i] == -1 || ignored_dt[i] == 1 ||
            dt_scores[i] < thresh))
        ++fp;
    }
    if (metric == 0 && dc_overlaps != nullptr && n_dc > 0) {
      int64_t nstuff = 0;
      for (int32_t i = 0; i < n_dt; ++i) {
        if (assigned[i] || ignored_dt[i] == -1 || ignored_dt[i] == 1 ||
            dt_scores[i] < thresh)
          continue;
        bool in_dc = false;
        for (int32_t d = 0; d < n_dc; ++d) {
          if (dc_overlaps[i * n_dc + d] > min_overlap) {
            in_dc = true;
            break;
          }
        }
        if (in_dc) {
          ++nstuff;
          assigned[i] = true;
        }
      }
      fp -= nstuff;
    }
    tp_out[t] += tp;
    fp_out[t] += fp;
    fn_out[t] += fn;
    sim_out[t] += similarity;
  }
}

}  // extern "C"
