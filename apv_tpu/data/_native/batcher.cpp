// Native host-side input-pipeline kernels (SURVEY.md §2.1 "Minibatch
// iterator" — the host tier feeding host→HBM transfers).
//
// The hot host ops while the TPU trains are (a) the per-batch row gather
// (shuffled minibatch assembly) and (b) the one-time static Bernoulli
// binarization of MNIST. Both are implemented here as plain-C-ABI
// functions loaded via ctypes (no pybind11 in this environment); numpy
// fallbacks exist in pipeline.py, and parity is tested in
// tests/test_native.py.
//
// Single-threaded by design: the build host has one core, and the gather is
// memory-bound; the win over numpy fancy indexing is avoiding its generic
// dispatch + intermediate index checking per element.

#include <cstdint>
#include <cstring>

extern "C" {

// dst[i, :] = src[idx[i], :] for row_bytes-sized rows.
void apv_gather_rows(const uint8_t* src, const int64_t* idx, int64_t n_idx,
                     int64_t row_bytes, uint8_t* dst) {
  for (int64_t i = 0; i < n_idx; ++i) {
    std::memcpy(dst + i * row_bytes, src + idx[i] * row_bytes,
                static_cast<size_t>(row_bytes));
  }
}

// Same, for float32 rows (binarized MNIST lives as f32 {0,1}).
void apv_gather_rows_f32(const float* src, const int64_t* idx, int64_t n_idx,
                         int64_t row_elems, float* dst) {
  for (int64_t i = 0; i < n_idx; ++i) {
    std::memcpy(dst + i * row_elems, src + idx[i] * row_elems,
                static_cast<size_t>(row_elems) * sizeof(float));
  }
}

// splitmix64 — deterministic, high-quality 64-bit mixer.
static inline uint64_t splitmix64(uint64_t& s) {
  uint64_t z = (s += 0x9E3779B97F4A7C15ULL);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

// Static Bernoulli binarization: dst[i] = 1.0f iff u < src[i]/255.
// BIT-EXACT CONTRACT: preprocess._splitmix64_uniform is the same generator
// stream, and tests/test_native.py::test_binarize_native_numpy_identical
// asserts exact equality — any change to the mixer, the 24-bit draw, or
// the comparison breaks dataset determinism across the native/numpy split.
void apv_binarize_u8(const uint8_t* src, int64_t n, uint64_t seed,
                     float* dst) {
  uint64_t state = seed ^ 0xD1B54A32D192ED03ULL;
  for (int64_t i = 0; i < n; ++i) {
    // 24 high bits → uniform in [0,1) with f32-exact granularity
    const uint32_t r = static_cast<uint32_t>(splitmix64(state) >> 40);
    const float u = static_cast<float>(r) * (1.0f / 16777216.0f);
    dst[i] = (u * 255.0f < static_cast<float>(src[i])) ? 1.0f : 0.0f;
  }
}

// Fused gather + u8→f32 scale to [0,1] bin centers (CIFAR eval batches).
void apv_gather_rows_u8_to_unit_f32(const uint8_t* src, const int64_t* idx,
                                    int64_t n_idx, int64_t row_elems,
                                    float* dst) {
  const float k = 1.0f / 255.0f;
  for (int64_t i = 0; i < n_idx; ++i) {
    const uint8_t* row = src + idx[i] * row_elems;
    float* out = dst + i * row_elems;
    for (int64_t j = 0; j < row_elems; ++j) out[j] = row[j] * k;
  }
}

}  // extern "C"
