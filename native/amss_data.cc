// Native host-side data path: batch assembly for the Mixer.
//
// Capability parity: the reference leaned on h5py/TF's C cores for its input
// pipeline (SURVEY.md §2.1, §2.8); this framework's equivalent is a small C++
// kernel that gathers per-speaker waveform chunks out of memory-mapped shards
// and assembles the [B, S, T] source batch (gain-scaled) without the Python
// per-chunk loop.  Speaker/offset/gain SELECTION stays in numpy (cheap, and
// keeps the deterministic (seed, step) contract in one place) — only the
// memory-bound copy/scale runs natively.
//
// Built with: g++ -O3 -march=native -shared -fPIC amss_data.cc -o libamss_data.so
// Bound via ctypes (amss_tpu/data/native.py) — no pybind11 in this image.

#include <cstdint>
#include <cstring>

extern "C" {

// Gather B*S chunks into out[B*S*T], scaling by gains.  For chunk j:
//   src  = shards[speaker_idx[j]] + starts[j], length min(T, len - start)
//   tail (if shard shorter than T) wraps around to the shard head (matches
//   numpy np.resize tiling used by the Python fallback).
void amss_batch_fill(float* out, int64_t n_chunks, int64_t T,
                     const float* const* shards, const int64_t* shard_lens,
                     const int32_t* speaker_idx, const int64_t* starts,
                     const float* gains) {
  for (int64_t j = 0; j < n_chunks; ++j) {
    const float* src = shards[speaker_idx[j]];
    const int64_t len = shard_lens[speaker_idx[j]];
    float g = gains[j];
    float* dst = out + j * T;
    if (len <= 0) {  // defensive: empty shard -> zero-fill, never read src
      for (int64_t i = 0; i < T; ++i) dst[i] = 0.0f;
      continue;
    }
    int64_t remaining = T;
    // Clamp into [0, len): a manifest n_samples that disagrees with the
    // actual .npy must not turn into an out-of-bounds read/negative take.
    int64_t pos = starts[j] % len;
    if (pos < 0) pos += len;
    while (remaining > 0) {
      int64_t avail = len - pos;
      int64_t take = avail < remaining ? avail : remaining;
      const float* s = src + pos;
      for (int64_t i = 0; i < take; ++i) dst[i] = g * s[i];
      dst += take;
      remaining -= take;
      pos = 0;  // wrap (short shards tile)
    }
  }
}

// Sum sources [B, S, T] -> mixture [B, T] (host-side helper for eval paths;
// training mixes on device).
void amss_mix(float* out, const float* sources, int64_t B, int64_t S,
              int64_t T) {
  for (int64_t b = 0; b < B; ++b) {
    float* dst = out + b * T;
    std::memset(dst, 0, sizeof(float) * T);
    for (int64_t s = 0; s < S; ++s) {
      const float* src = sources + (b * S + s) * T;
      for (int64_t t = 0; t < T; ++t) dst[t] += src[t];
    }
  }
}

}  // extern "C"
