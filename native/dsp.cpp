// Native DSP core: Boersma autocorrelation pitch tracker.
//
// TPU-native replacement for the reference's parselmouth/Praat C++ dependency
// (f0energy.py:51-53) — the offline pipeline's hot loop. Semantics mirror
// vispeech_tpu/dsp/pitch.py::pitch_ac_numpy exactly (same window, FFT sizes,
// candidate strengths, Viterbi costs) so both backends are interchangeable.
//
// Build: make -C native    → build/libvispeech_dsp.so (ctypes, no pybind11)

#include <cmath>
#include <complex>
#include <cstring>
#include <vector>

namespace {

constexpr double kSilenceThreshold = 0.03;
constexpr double kOctaveCost = 0.01;
constexpr double kOctaveJumpCost = 0.35;
constexpr double kVoicedUnvoicedCost = 0.14;
constexpr int kMaxCandidates = 15;
constexpr double kPeriodsPerWindow = 3.0;

using cplx = std::complex<double>;

// iterative radix-2 Cooley-Tukey (in-place), n must be a power of two
void fft(std::vector<cplx>& a, bool invert) {
  const size_t n = a.size();
  for (size_t i = 1, j = 0; i < n; i++) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    const double ang = 2.0 * M_PI / double(len) * (invert ? 1.0 : -1.0);
    const cplx wl(std::cos(ang), std::sin(ang));
    for (size_t i = 0; i < n; i += len) {
      cplx w(1.0, 0.0);
      for (size_t j = 0; j < len / 2; j++) {
        cplx u = a[i + j];
        cplx v = a[i + j + len / 2] * w;
        a[i + j] = u + v;
        a[i + j + len / 2] = u - v;
        w *= wl;
      }
    }
  }
  if (invert)
    for (auto& x : a) x /= double(n);
}

size_t next_pow2(size_t n) {
  size_t p = 1;
  while (p < n) p <<= 1;
  return p;
}

// normalized autocorrelation of seg (length wlen) via FFT of size nfft;
// writes wlen values into out (out[0] == 1)
void norm_autocorr(const double* seg, int wlen, size_t nfft,
                   std::vector<cplx>& work, double* out) {
  work.assign(nfft, cplx(0.0, 0.0));
  for (int i = 0; i < wlen; i++) work[i] = cplx(seg[i], 0.0);
  fft(work, false);
  for (auto& v : work) v = cplx(std::norm(v), 0.0);
  fft(work, true);
  const double r0 = work[0].real() + 1e-30;
  for (int i = 0; i < wlen; i++) out[i] = work[i].real() / r0;
}

}  // namespace

extern "C" {

// Returns the number of frames written to out (<= max_frames), or -1 on error.
int pitch_ac(const double* x, long n, double sr, double time_step,
             double pitch_floor, double pitch_ceiling,
             double voicing_threshold, double* out, long max_frames) {
  if (n <= 0 || sr <= 0 || time_step <= 0) return -1;
  const double window_sec = kPeriodsPerWindow / pitch_floor;
  const int wlen = int(std::lround(window_sec * sr));
  if (wlen < 8 || wlen > n) return 0;

  const double duration = double(n) / sr;
  const int n_frames =
      std::max(0, int(std::floor((duration - window_sec) / time_step)) + 1);
  if (n_frames == 0) return 0;
  if (n_frames > max_frames) return -1;
  const double t1 = duration / 2.0 - ((n_frames - 1) * time_step) / 2.0;

  // global peak around the global mean
  double mean = 0.0;
  for (long i = 0; i < n; i++) mean += x[i];
  mean /= double(n);
  double global_peak = 1e-30;
  for (long i = 0; i < n; i++)
    global_peak = std::max(global_peak, std::fabs(x[i] - mean));

  // hann window + its normalized autocorrelation
  std::vector<double> window(wlen);
  for (int i = 0; i < wlen; i++)
    window[i] = 0.5 - 0.5 * std::cos(2.0 * M_PI * i / double(wlen - 1));
  const size_t nfft = next_pow2(size_t(wlen * 3 / 2));
  std::vector<cplx> work;
  std::vector<double> wac(wlen);
  norm_autocorr(window.data(), wlen, nfft, work, wac.data());

  const int lag_min = std::max(2, int(std::floor(sr / pitch_ceiling)));
  const int lag_max = std::min(wlen - 2, int(std::ceil(sr / pitch_floor)));

  std::vector<double> cand_freq(size_t(n_frames) * kMaxCandidates, 0.0);
  std::vector<double> cand_str(size_t(n_frames) * kMaxCandidates, -1e30);

  std::vector<double> seg(wlen), r(wlen);
  for (int f = 0; f < n_frames; f++) {
    const double center = (t1 + f * time_step) * sr;
    long start = std::lround(center - wlen / 2.0);
    if (start < 0) start = 0;
    if (start > n - wlen) start = n - wlen;

    double m = 0.0;
    for (int i = 0; i < wlen; i++) m += x[start + i];
    m /= double(wlen);
    double local_peak = 0.0;
    for (int i = 0; i < wlen; i++) {
      seg[i] = x[start + i] - m;
      local_peak = std::max(local_peak, std::fabs(seg[i]));
    }
    const double intensity = local_peak / global_peak;
    double* cs = &cand_str[size_t(f) * kMaxCandidates];
    double* cf = &cand_freq[size_t(f) * kMaxCandidates];
    cs[0] = voicing_threshold +
            std::max(0.0, 2.0 - intensity / (kSilenceThreshold /
                                             (1.0 + voicing_threshold)));

    for (int i = 0; i < wlen; i++) seg[i] *= window[i];
    norm_autocorr(seg.data(), wlen, nfft, work, r.data());
    for (int i = 0; i < wlen; i++) {
      const double w = wac[i];
      r[i] = (w > 1e-6) ? r[i] / w : 0.0;
    }

    // local maxima in [lag_min, lag_max], strongest first (selection sort of
    // the top kMaxCandidates-1 is enough at this candidate count)
    struct Peak { int lag; double val; };
    std::vector<Peak> peaks;
    for (int lag = lag_min + 1; lag < lag_max; lag++)
      if (r[lag] > r[lag - 1] && r[lag] >= r[lag + 1])
        peaks.push_back({lag, r[lag]});
    int k = 1;
    while (k < kMaxCandidates && !peaks.empty()) {
      size_t best = 0;
      for (size_t p = 1; p < peaks.size(); p++)
        if (peaks[p].val > peaks[best].val) best = p;
      const int lag = peaks[best].lag;
      peaks.erase(peaks.begin() + best);
      const double y0 = r[lag - 1], y1 = r[lag], y2 = r[lag + 1];
      const double denom = y0 - 2.0 * y1 + y2;
      double delta = (std::fabs(denom) > 1e-12) ? 0.5 * (y0 - y2) / denom : 0.0;
      delta = std::max(-1.0, std::min(1.0, delta));
      const double lag_i = lag + delta;
      double strength = y1 - 0.25 * (y0 - y2) * delta;
      const double freq = sr / lag_i;
      if (freq < pitch_floor || freq > pitch_ceiling) continue;
      if (strength > 1.0) strength = 1.0;
      cf[k] = freq;
      cs[k] = strength - kOctaveCost * std::log2(pitch_ceiling / freq);
      k++;
    }
  }

  // Viterbi (costs per 10 ms as in Praat)
  const double cost_scale = time_step / 0.01;
  std::vector<double> delta(cand_str.begin(), cand_str.begin() + kMaxCandidates);
  std::vector<int> back(size_t(n_frames) * kMaxCandidates, 0);
  std::vector<double> ndelta(kMaxCandidates);
  for (int f = 1; f < n_frames; f++) {
    const double* cfp = &cand_freq[size_t(f - 1) * kMaxCandidates];
    const double* cfc = &cand_freq[size_t(f) * kMaxCandidates];
    const double* csc = &cand_str[size_t(f) * kMaxCandidates];
    int* bk = &back[size_t(f) * kMaxCandidates];
    for (int j = 0; j < kMaxCandidates; j++) {
      double best = -1e300;
      int arg = 0;
      for (int i = 0; i < kMaxCandidates; i++) {
        double trans;
        const bool vp = cfp[i] > 0, vc = cfc[j] > 0;
        if (vp && vc)
          trans = kOctaveJumpCost * cost_scale *
                  std::fabs(std::log2(cfp[i] / cfc[j]));
        else if (vp != vc)
          trans = kVoicedUnvoicedCost * cost_scale;
        else
          trans = 0.0;
        const double v = delta[i] - trans + csc[j];
        if (v > best) { best = v; arg = i; }
      }
      ndelta[j] = best;
      bk[j] = arg;
    }
    delta = ndelta;
  }

  int best = 0;
  for (int j = 1; j < kMaxCandidates; j++)
    if (delta[j] > delta[best]) best = j;
  std::vector<int> path(n_frames);
  path[n_frames - 1] = best;
  for (int f = n_frames - 2; f >= 0; f--)
    path[f] = back[size_t(f + 1) * kMaxCandidates + path[f + 1]];
  for (int f = 0; f < n_frames; f++)
    out[f] = cand_freq[size_t(f) * kMaxCandidates + path[f]];
  return n_frames;
}

}  // extern "C"
