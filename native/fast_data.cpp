// Native host-side data-path primitives for multimodal_clinical_tpu.
//
// The reference delegates its host data path to torch DataLoader workers
// (WeightedRandomSampler draws, librosa/scipy DSP, PIL decode). The TPU
// rebuild moves DSP on-device (ops/); what remains host-side and hot is
// (a) weighted index sampling per epoch and (b) PCM wav decode for the
// streaming audio benchmarks. Both are implemented here in C++ and exposed
// through ctypes (utils/native.py) with pure-numpy fallbacks.
//
//  * alias-method weighted sampler: O(n) table build + O(1) per draw,
//    replacing numpy's O(n)-per-epoch cumulative-sum choice() for the
//    balanced samplers (cremad/get_data.py:153-158 equivalents).
//    Deterministic per (seed, epoch) via SplitMix64 streams.
//  * int16 PCM -> float32 [-1, 1] with channel mixdown, replacing the
//    python wave-module inner loop in the VGGSound adapter.
//
// Build: `make -C native` (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// SplitMix64 — deterministic, seedable, fast.
// ---------------------------------------------------------------------------
static inline uint64_t splitmix64(uint64_t* state) {
  uint64_t z = (*state += 0x9E3779B97F4A7C15ULL);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

static inline double uniform01(uint64_t* state) {
  return (double)(splitmix64(state) >> 11) * (1.0 / 9007199254740992.0);
}

// ---------------------------------------------------------------------------
// Alias table build (Vose's method). prob/alias are caller-allocated, size n.
// ---------------------------------------------------------------------------
void build_alias_table(const double* weights, int64_t n, double* prob,
                       int64_t* alias) {
  double total = 0.0;
  for (int64_t i = 0; i < n; ++i) total += weights[i];
  std::vector<double> scaled(n);
  for (int64_t i = 0; i < n; ++i) scaled[i] = weights[i] * n / total;

  std::vector<int64_t> small, large;
  small.reserve(n);
  large.reserve(n);
  for (int64_t i = 0; i < n; ++i) {
    (scaled[i] < 1.0 ? small : large).push_back(i);
  }
  while (!small.empty() && !large.empty()) {
    int64_t s = small.back(); small.pop_back();
    int64_t l = large.back(); large.pop_back();
    prob[s] = scaled[s];
    alias[s] = l;
    scaled[l] = (scaled[l] + scaled[s]) - 1.0;
    (scaled[l] < 1.0 ? small : large).push_back(l);
  }
  while (!large.empty()) {
    prob[large.back()] = 1.0;
    alias[large.back()] = large.back();
    large.pop_back();
  }
  while (!small.empty()) {  // numerical leftovers
    prob[small.back()] = 1.0;
    alias[small.back()] = small.back();
    small.pop_back();
  }
}

// Draw num_samples indices from a prebuilt alias table into out (int64).
void alias_sample(const double* prob, const int64_t* alias, int64_t n,
                  int64_t num_samples, uint64_t seed, int64_t* out) {
  uint64_t state = seed ^ 0xD1B54A32D192ED03ULL;
  // decorrelate nearby seeds
  for (int k = 0; k < 4; ++k) splitmix64(&state);
  for (int64_t i = 0; i < num_samples; ++i) {
    uint64_t r = splitmix64(&state);
    int64_t col = (int64_t)(r % (uint64_t)n);
    double u = uniform01(&state);
    out[i] = (u < prob[col]) ? col : alias[col];
  }
}

// ---------------------------------------------------------------------------
// int16 PCM -> float32 [-1, 1] with channel mixdown.
// in: interleaved int16, frames x channels. out: frames floats.
// ---------------------------------------------------------------------------
void pcm16_to_float_mono(const int16_t* in, int64_t frames, int32_t channels,
                         float* out) {
  const float scale = 1.0f / 32768.0f;
  if (channels == 1) {
    for (int64_t i = 0; i < frames; ++i) out[i] = in[i] * scale;
    return;
  }
  const float inv_ch = 1.0f / (float)channels;
  for (int64_t i = 0; i < frames; ++i) {
    int32_t acc = 0;
    for (int32_t c = 0; c < channels; ++c) acc += in[i * channels + c];
    out[i] = (float)acc * scale * inv_ch;
  }
}

}  // extern "C"
