// Native host-side data ops for modelcompose_tpu.
//
// Plays the role the reference delegates to native libraries on the host
// side (torchaudio's kaldi fbank C++, decord/ffmpeg decode, pointnet2 CUDA
// ops — SURVEY.md §2.11): the hot per-sample preprocessing that must keep
// the TPU fed.  Exposed through a C ABI for ctypes (no pybind11 in this
// image).
//
// Ops:
//   mc_fbank       — kaldi-compatible log-mel filterbank (25ms/10ms povey
//                    window, preemphasis 0.97, 512-pt real FFT, kaldi mel
//                    banks), multi-threaded over frames.
//   mc_fps         — farthest point sampling over [N,3] float points.
//   mc_knn         — k-nearest-neighbour indices from query centers.
//
// Build: make -C native   (produces libmcdata.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr float kPi = 3.14159265358979323846f;

// ---------------------------------------------------------------------
// Real FFT via iterative radix-2 complex FFT (N must be a power of two).
// ---------------------------------------------------------------------
void fft_inplace(std::vector<float>& re, std::vector<float>& im) {
  const size_t n = re.size();
  // bit reversal
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      std::swap(re[i], re[j]);
      std::swap(im[i], im[j]);
    }
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    const float ang = -2.0f * kPi / static_cast<float>(len);
    const float wr = std::cos(ang), wi = std::sin(ang);
    for (size_t i = 0; i < n; i += len) {
      float cur_r = 1.0f, cur_i = 0.0f;
      for (size_t k = 0; k < len / 2; ++k) {
        const float ur = re[i + k], ui = im[i + k];
        const float vr = re[i + k + len / 2] * cur_r -
                         im[i + k + len / 2] * cur_i;
        const float vi = re[i + k + len / 2] * cur_i +
                         im[i + k + len / 2] * cur_r;
        re[i + k] = ur + vr;
        im[i + k] = ui + vi;
        re[i + k + len / 2] = ur - vr;
        im[i + k + len / 2] = ui - vi;
        const float nr = cur_r * wr - cur_i * wi;
        cur_i = cur_r * wi + cur_i * wr;
        cur_r = nr;
      }
    }
  }
}

inline float mel(float f) { return 1127.0f * std::log1p(f / 700.0f); }

struct MelBanks {
  int num_bins;
  int num_fft_bins;
  std::vector<float> weights;  // [num_bins, num_fft_bins]
};

MelBanks make_mel_banks(int num_bins, int fft_size, float sample_rate,
                        float low_freq, float high_freq) {
  if (high_freq <= 0.0f) high_freq += sample_rate / 2.0f;
  MelBanks banks;
  banks.num_bins = num_bins;
  banks.num_fft_bins = fft_size / 2;
  banks.weights.assign(static_cast<size_t>(num_bins) * banks.num_fft_bins,
                       0.0f);
  const float fft_bin_width = sample_rate / fft_size;
  const float mel_low = mel(low_freq), mel_high = mel(high_freq);
  const float mel_delta = (mel_high - mel_low) / (num_bins + 1);
  for (int j = 0; j < num_bins; ++j) {
    const float left = mel_low + j * mel_delta;
    const float center = left + mel_delta;
    const float right = center + mel_delta;
    for (int i = 0; i < banks.num_fft_bins; ++i) {
      const float m = mel(fft_bin_width * i);
      const float up = (m - left) / (center - left);
      const float down = (right - m) / (right - center);
      const float w = std::max(0.0f, std::min(up, down));
      banks.weights[static_cast<size_t>(j) * banks.num_fft_bins + i] = w;
    }
  }
  return banks;
}

}  // namespace

extern "C" {

// waveform: [n] float at kaldi scale (x * 2^15). out: [num_frames, num_bins]
// preallocated by the caller (num_frames = 1 + (n - win) / hop).
// Returns the number of frames written, or -1 on error.
int mc_fbank(const float* waveform, int64_t n, float* out, int num_bins,
             float sample_rate, float frame_length_ms, float frame_shift_ms,
             float preemph, int remove_dc, int num_threads) {
  const int win = static_cast<int>(sample_rate * frame_length_ms / 1000.0f);
  const int hop = static_cast<int>(sample_rate * frame_shift_ms / 1000.0f);
  if (n < win) return 0;
  const int num_frames = 1 + static_cast<int>((n - win) / hop);
  int fft_size = 1;
  while (fft_size < win) fft_size <<= 1;

  std::vector<float> window(win);
  for (int i = 0; i < win; ++i) {
    window[i] = std::pow(
        0.5f - 0.5f * std::cos(2.0f * kPi * i / (win - 1)), 0.85f);
  }
  const MelBanks banks =
      make_mel_banks(num_bins, fft_size, sample_rate, 20.0f, 0.0f);
  const float eps = 1.1920929e-7f;

  auto worker = [&](int f0, int f1) {
    std::vector<float> re(fft_size), im(fft_size);
    std::vector<double> frame(win);
    for (int f = f0; f < f1; ++f) {
      const float* src = waveform + static_cast<int64_t>(f) * hop;
      double mean = 0.0;
      for (int i = 0; i < win; ++i) mean += src[i];
      mean = remove_dc ? mean / win : 0.0;
      for (int i = 0; i < win; ++i) frame[i] = src[i] - mean;
      if (preemph != 0.0f) {
        for (int i = win - 1; i > 0; --i)
          frame[i] -= preemph * frame[i - 1];
        frame[0] -= preemph * frame[0];
      }
      std::fill(re.begin(), re.end(), 0.0f);
      std::fill(im.begin(), im.end(), 0.0f);
      for (int i = 0; i < win; ++i)
        re[i] = static_cast<float>(frame[i]) * window[i];
      fft_inplace(re, im);
      float* dst = out + static_cast<size_t>(f) * num_bins;
      for (int j = 0; j < num_bins; ++j) {
        const float* w = &banks.weights[static_cast<size_t>(j) *
                                        banks.num_fft_bins];
        float acc = 0.0f;
        for (int i = 0; i < banks.num_fft_bins; ++i) {
          if (w[i] != 0.0f) acc += w[i] * (re[i] * re[i] + im[i] * im[i]);
        }
        dst[j] = std::log(std::max(acc, eps));
      }
    }
  };

  const int nt = std::max(1, std::min(num_threads,
                                      static_cast<int>(num_frames)));
  if (nt == 1) {
    worker(0, num_frames);
  } else {
    std::vector<std::thread> threads;
    const int per = (num_frames + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
      const int f0 = t * per;
      const int f1 = std::min(num_frames, f0 + per);
      if (f0 < f1) threads.emplace_back(worker, f0, f1);
    }
    for (auto& th : threads) th.join();
  }
  return num_frames;
}

// xyz: [n, 3]; out_idx: [npoint]; iterative farthest point sampling with a
// fixed start index (deterministic).
void mc_fps(const float* xyz, int64_t n, int npoint, int start_index,
            int32_t* out_idx) {
  if (npoint <= 0) return;
  if (n <= 0 || start_index < 0 || start_index >= n) return;  // OOB guard
  std::vector<float> dist(n, 1e10f);
  int64_t farthest = start_index;
  for (int i = 0; i < npoint; ++i) {
    out_idx[i] = static_cast<int32_t>(farthest);
    const float cx = xyz[farthest * 3], cy = xyz[farthest * 3 + 1],
                cz = xyz[farthest * 3 + 2];
    float best = -1.0f;
    int64_t best_i = 0;
    for (int64_t p = 0; p < n; ++p) {
      const float dx = xyz[p * 3] - cx, dy = xyz[p * 3 + 1] - cy,
                  dz = xyz[p * 3 + 2] - cz;
      const float d = dx * dx + dy * dy + dz * dz;
      if (d < dist[p]) dist[p] = d;
      if (dist[p] > best) {
        best = dist[p];
        best_i = p;
      }
    }
    farthest = best_i;
  }
}

// xyz: [n, 3]; centers: [m, 3]; out_idx: [m, k] nearest-point indices
// (ascending by distance, ties by index — nth_element + sort of the top
// k is bitwise-identical to the old full partial_sort).  Centers are
// independent, so the loop fans out over hardware threads: 512x8192x32
// KNN drops from ~120 ms single-threaded to the per-thread share, which
// is what keeps the host point pipeline ahead of the on-chip tower
// (~65 clouds/s).
void mc_knn(const float* xyz, int64_t n, const float* centers, int64_t m,
            int k, int32_t* out_idx) {
  if (k <= 0 || n <= 0 || m <= 0) return;  // nth_element UB guard
  // k stays the caller's row stride (out_idx is [m, k]); when the cloud
  // has fewer than k points only k_eff real neighbours exist and the row
  // tail repeats the farthest valid one (top_k-style fallback).
  const int k_eff = k > n ? static_cast<int>(n) : k;
  const int nt = std::max(
      1, std::min<int>(static_cast<int>(m),
                       std::thread::hardware_concurrency()));
  auto worker = [&](int64_t c0, int64_t c1) {
    std::vector<std::pair<float, int32_t>> d(n);
    for (int64_t c = c0; c < c1; ++c) {
      const float cx = centers[c * 3], cy = centers[c * 3 + 1],
                  cz = centers[c * 3 + 2];
      for (int64_t p = 0; p < n; ++p) {
        const float dx = xyz[p * 3] - cx, dy = xyz[p * 3 + 1] - cy,
                    dz = xyz[p * 3 + 2] - cz;
        d[p] = {dx * dx + dy * dy + dz * dz, static_cast<int32_t>(p)};
      }
      std::nth_element(d.begin(), d.begin() + k_eff - 1, d.end());
      std::sort(d.begin(), d.begin() + k_eff);
      for (int i = 0; i < k_eff; ++i)
        out_idx[c * k + i] = d[i].second;
      for (int i = k_eff; i < k; ++i)
        out_idx[c * k + i] = d[k_eff - 1].second;
    }
  };
  if (nt <= 1) {
    worker(0, m);
    return;
  }
  std::vector<std::thread> threads;
  const int64_t step = (m + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    const int64_t c0 = t * step, c1 = std::min<int64_t>(m, c0 + step);
    if (c0 < c1) threads.emplace_back(worker, c0, c1);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
