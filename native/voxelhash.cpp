// Host-side sparse-voxel runtime: hashing, dedup, kernel maps, sampling.
//
// Native replacement for the hot host paths of the data pipeline — the
// reference does this work in Python/NumPy inside DataLoader workers
// (lib/openscene/voxelization_utils.py fnv hashing + np.unique dedup) and in
// MinkowskiEngine's C++ CoordinateManager (kernel-map construction). Exposed
// through a C ABI consumed via ctypes (situation3d_tpu/ops/native.py);
// every function has a NumPy fallback so the wheel works without the .so.
//
// Keys: voxel coords packed into 63-bit integers (21 bits per axis, offset
// by 2^20 so negatives from kernel offsets stay valid probes). Hash table:
// open addressing, linear probing, power-of-two capacity.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline uint64_t pack(int32_t x, int32_t y, int32_t z) {
  const uint64_t B = 1u << 20;  // bias so slightly-negative probes pack fine
  return (uint64_t(uint32_t(x + B)) << 42) | (uint64_t(uint32_t(y + B)) << 21) |
         uint64_t(uint32_t(z + B));
}

inline uint64_t hash64(uint64_t k) {
  // splitmix64 finalizer
  k += 0x9e3779b97f4a7c15ull;
  k = (k ^ (k >> 30)) * 0xbf58476d1ce4e5b9ull;
  k = (k ^ (k >> 27)) * 0x94d049bb133111ebull;
  return k ^ (k >> 31);
}

struct HashTable {
  std::vector<uint64_t> keys;
  std::vector<int64_t> vals;
  uint64_t mask;

  explicit HashTable(int64_t n) {
    int64_t cap = 16;
    while (cap < n * 2) cap <<= 1;
    keys.assign(cap, UINT64_MAX);
    vals.assign(cap, -1);
    mask = cap - 1;
  }

  // insert if absent; returns the stored value (first writer wins)
  int64_t insert(uint64_t key, int64_t val) {
    uint64_t i = hash64(key) & mask;
    for (;;) {
      if (keys[i] == UINT64_MAX) {
        keys[i] = key;
        vals[i] = val;
        return val;
      }
      if (keys[i] == key) return vals[i];
      i = (i + 1) & mask;
    }
  }

  int64_t find(uint64_t key) const {
    uint64_t i = hash64(key) & mask;
    for (;;) {
      if (keys[i] == UINT64_MAX) return -1;
      if (keys[i] == key) return vals[i];
      i = (i + 1) & mask;
    }
  }
};

}  // namespace

extern "C" {

// Dedup integer voxel coords, keeping the first occurrence.
// coords: [n, 3] int32. first_index: [n] out (only first n_unique valid).
// inverse: [n] out. Returns n_unique.
int64_t s3d_sparse_quantize(const int32_t* coords, int64_t n,
                            int32_t* first_index, int32_t* inverse) {
  HashTable table(n);
  int64_t n_unique = 0;
  for (int64_t i = 0; i < n; ++i) {
    uint64_t key = pack(coords[3 * i], coords[3 * i + 1], coords[3 * i + 2]);
    int64_t got = table.insert(key, n_unique);
    if (got == n_unique) {
      first_index[n_unique] = int32_t(i);
      ++n_unique;
    }
    inverse[i] = int32_t(got);
  }
  return n_unique;
}

// Neighbor map for a sparse conv level (see sparse/kernel_map.py semantics).
// in_coords [n_in,3] (raw units, multiples of in_stride), out_coords
// [n_out,3], offsets [k,3] (integer steps), offset_stride raw units/step.
// nbr_idx [n_out*k] out, miss == n_in.
void s3d_kernel_map(const int32_t* in_coords, int64_t n_in, int32_t in_stride,
                    const int32_t* out_coords, int64_t n_out,
                    const int32_t* offsets, int32_t k, int32_t offset_stride,
                    int32_t* nbr_idx) {
  HashTable table(n_in > 0 ? n_in : 1);
  for (int64_t i = 0; i < n_in; ++i) {
    table.insert(pack(in_coords[3 * i] / in_stride,
                      in_coords[3 * i + 1] / in_stride,
                      in_coords[3 * i + 2] / in_stride),
                 i);
  }
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t j = 0; j < n_out; ++j) {
    for (int32_t o = 0; o < k; ++o) {
      int32_t q[3];
      bool ok = true;
      for (int d = 0; d < 3; ++d) {
        q[d] = out_coords[3 * j + d] + offsets[3 * o + d] * offset_stride;
        if (q[d] % in_stride != 0) ok = false;  // parity miss (transpose conv)
        if (q[d] < 0) ok = false;
      }
      int64_t hit = -1;
      if (ok) {
        hit = table.find(pack(q[0] / in_stride, q[1] / in_stride,
                              q[2] / in_stride));
      }
      nbr_idx[j * k + o] = hit >= 0 ? int32_t(hit) : int32_t(n_in);
    }
  }
}

// Strided-conv output coords: unique(floor(c / new_stride) * new_stride).
// out_coords must hold n entries; returns n_unique.
int64_t s3d_downsample(const int32_t* coords, int64_t n, int32_t new_stride,
                       int32_t* out_coords) {
  HashTable table(n > 0 ? n : 1);
  int64_t n_unique = 0;
  for (int64_t i = 0; i < n; ++i) {
    int32_t c[3];
    for (int d = 0; d < 3; ++d)
      c[d] = (coords[3 * i + d] / new_stride) * new_stride;
    int64_t got = table.insert(pack(c[0], c[1], c[2]), n_unique);
    if (got == n_unique) {
      std::memcpy(out_coords + 3 * n_unique, c, sizeof(c));
      ++n_unique;
    }
  }
  return n_unique;
}

// Farthest point sampling (sampling_gpu.cu semantics: start at 0, skip
// near-origin padding points with |p|^2 <= 1e-3).
void s3d_fps(const float* xyz, int64_t n, int32_t m, int32_t* idx) {
  if (m <= 0 || n <= 0) return;
  std::vector<float> temp(n, 1e10f);
  std::vector<bool> selectable(n);
  for (int64_t i = 0; i < n; ++i) {
    const float* p = xyz + 3 * i;
    selectable[i] = p[0] * p[0] + p[1] * p[1] + p[2] * p[2] > 1e-3f;
  }
  int64_t old = 0;
  idx[0] = 0;
  for (int32_t j = 1; j < m; ++j) {
    const float* po = xyz + 3 * old;
    float best = -1.0f;
    int64_t besti = 0;
    for (int64_t i = 0; i < n; ++i) {
      if (!selectable[i]) continue;
      const float* p = xyz + 3 * i;
      float d = (p[0] - po[0]) * (p[0] - po[0]) +
                (p[1] - po[1]) * (p[1] - po[1]) +
                (p[2] - po[2]) * (p[2] - po[2]);
      if (d < temp[i]) temp[i] = d;
      if (temp[i] > best) {
        best = temp[i];
        besti = i;
      }
    }
    old = besti;
    idx[j] = int32_t(old);
  }
}

// Ball query (ball_query_gpu.cu semantics: first hit fills all slots).
void s3d_ball_query(const float* xyz, int64_t n, const float* centers,
                    int64_t m, float radius, int32_t nsample, int32_t* idx) {
  const float r2 = radius * radius;
  for (int64_t j = 0; j < m; ++j) {
    const float* c = centers + 3 * j;
    int32_t cnt = 0;
    int32_t* row = idx + j * nsample;
    for (int64_t i = 0; i < n && cnt < nsample; ++i) {
      const float* p = xyz + 3 * i;
      float d2 = (c[0] - p[0]) * (c[0] - p[0]) +
                 (c[1] - p[1]) * (c[1] - p[1]) +
                 (c[2] - p[2]) * (c[2] - p[2]);
      if (d2 < r2) {
        if (cnt == 0)
          for (int32_t l = 0; l < nsample; ++l) row[l] = int32_t(i);
        row[cnt++] = int32_t(i);
      }
    }
    if (cnt == 0)
      for (int32_t l = 0; l < nsample; ++l) row[l] = 0;
  }
}

}  // extern "C"
