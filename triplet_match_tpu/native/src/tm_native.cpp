// Native host runtime for triplet_match_tpu.
//
// The reference implements its entire runtime in C++ (pointcloud/kd-tree/
// model index — /root/reference/include/impl/*.hpp); in this framework the
// compute path is JAX/XLA on TPU, and this library covers the host-side
// runtime where native code genuinely wins:
//   * binary PCD payload parsing (strided field extraction, no Python loop)
//   * MurmurHash3_x86_32 (bit-compatible with impl/discretize.hpp:12-45)
//   * brute-force kNN with OpenMP (host-side validation / small queries,
//     the pointcloud::knn_inclusive analog for CPU paths)
//   * the O(n^2) pair-feature pass with OpenMP (model-compile fallback for
//     hosts without an accelerator; mirrors impl/model.hpp:100-149)
//
// Plain C ABI; loaded via ctypes (no pybind11 dependency).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// MurmurHash3_x86_32 over uint32 words, seed 42 (reference-compatible).
// ---------------------------------------------------------------------------

static inline uint32_t rotl32(uint32_t x, int8_t r) {
  return (x << r) | (x >> (32 - r));
}

uint32_t tm_murmur32(const uint32_t* key, int dim) {
  uint32_t h1 = 42u;
  const uint32_t c1 = 0xcc9e2d51u;
  const uint32_t c2 = 0x1b873593u;
  for (int i = 0; i < dim; ++i) {
    uint32_t k1 = key[i];
    k1 *= c1;
    k1 = rotl32(k1, 15);
    k1 *= c2;
    h1 ^= k1;
    h1 = rotl32(h1, 13);
    h1 = h1 * 5u + 0xe6546b64u;
  }
  h1 ^= 4u * static_cast<uint32_t>(dim);
  h1 ^= h1 >> 16;
  h1 *= 0x85ebca6bu;
  h1 ^= h1 >> 13;
  h1 *= 0xc2b2ae35u;
  h1 ^= h1 >> 16;
  return h1;
}

void tm_murmur32_batch(const uint32_t* keys, int n, int dim, uint32_t* out) {
#pragma omp parallel for
  for (int i = 0; i < n; ++i) {
    out[i] = tm_murmur32(keys + static_cast<size_t>(i) * dim, dim);
  }
}

// ---------------------------------------------------------------------------
// Binary PCD payload extraction: gather float columns out of strided records.
//   data:    raw record bytes (n * stride)
//   offsets: byte offset of each of `ncols` float32 fields
//   out:     [n, ncols] float32
// ---------------------------------------------------------------------------

void tm_extract_fields(const uint8_t* data, int64_t n, int stride,
                       const int* offsets, int ncols, float* out) {
#pragma omp parallel for
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* rec = data + i * stride;
    float* dst = out + i * ncols;
    for (int c = 0; c < ncols; ++c) {
      std::memcpy(dst + c, rec + offsets[c], sizeof(float));
    }
  }
}

// ---------------------------------------------------------------------------
// Brute-force kNN (squared L2), OpenMP over queries.
//   q: [nq, 3], r: [nr, 3], valid: [nr] (0/1), out_idx: [nq, k], out_d2: [nq, k]
// ---------------------------------------------------------------------------

void tm_knn(const float* q, int64_t nq, const float* r, int64_t nr,
            const uint8_t* valid, int k, int32_t* out_idx, float* out_d2) {
#pragma omp parallel for schedule(dynamic, 16)
  for (int64_t i = 0; i < nq; ++i) {
    const float qx = q[i * 3], qy = q[i * 3 + 1], qz = q[i * 3 + 2];
    // max-heap of (d2, idx) as parallel arrays
    std::vector<std::pair<float, int32_t>> heap;
    heap.reserve(k + 1);
    for (int64_t j = 0; j < nr; ++j) {
      if (valid && !valid[j]) continue;
      const float dx = r[j * 3] - qx;
      const float dy = r[j * 3 + 1] - qy;
      const float dz = r[j * 3 + 2] - qz;
      const float d2 = dx * dx + dy * dy + dz * dz;
      if (static_cast<int>(heap.size()) < k) {
        heap.emplace_back(d2, static_cast<int32_t>(j));
        std::push_heap(heap.begin(), heap.end());
      } else if (d2 < heap.front().first) {
        std::pop_heap(heap.begin(), heap.end());
        heap.back() = {d2, static_cast<int32_t>(j)};
        std::push_heap(heap.begin(), heap.end());
      }
    }
    std::sort_heap(heap.begin(), heap.end());
    for (int m = 0; m < k; ++m) {
      if (m < static_cast<int>(heap.size())) {
        out_idx[i * k + m] = heap[m].second;
        out_d2[i * k + m] = heap[m].first;
      } else {
        out_idx[i * k + m] = 0;
        out_d2[i * k + m] = 3.0e38f;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Pair-feature pass (host fallback of impl/model.hpp:100-149).
//   xyz/tangent: [n, 3]; edge: [n] 0/1
//   Pass 1 (out_keys == nullptr): compute feature distance bounds over valid
//   pairs -> writes bounds[2] = {min_dist, max_dist} and returns valid count.
//   Pass 2: discretize + pack keys exactly like features/discretize.py:
//   key = (d0 << 20) | (a1 << 10) | a2; invalid pairs -> 0xFFFFFFFF.
//   out arrays are length n*n, row-major (i, j).
// ---------------------------------------------------------------------------

static inline float unsigned_angle(float ax, float ay, float az, float bx,
                                   float by, float bz) {
  const float cx = ay * bz - az * by;
  const float cy = az * bx - ax * bz;
  const float cz = ax * by - ay * bx;
  const float cross = std::sqrt(cx * cx + cy * cy + cz * cz);
  const float dot = std::fabs(ax * bx + ay * by + az * bz);
  return std::atan2(cross, dot);
}

int64_t tm_pair_pass(const float* xyz, const float* tangent, const uint8_t* edge,
                     int64_t n, float lower, float upper, float parallel_eps,
                     float bmin0, float brange0, int dist_steps, float angle_step,
                     float* bounds, uint32_t* out_keys) {
  int64_t count = 0;
  float dmin = 3.0e38f, dmax = -3.0e38f;
#pragma omp parallel
  {
    float l_dmin = 3.0e38f, l_dmax = -3.0e38f;
    int64_t l_count = 0;
#pragma omp for schedule(dynamic, 32)
    for (int64_t i = 0; i < n; ++i) {
      if (!edge[i]) {
        if (out_keys) {
          for (int64_t j = 0; j < n; ++j) out_keys[i * n + j] = 0xFFFFFFFFu;
        }
        continue;
      }
      const float pix = xyz[i * 3], piy = xyz[i * 3 + 1], piz = xyz[i * 3 + 2];
      const float tix = tangent[i * 3], tiy = tangent[i * 3 + 1], tiz = tangent[i * 3 + 2];
      for (int64_t j = 0; j < n; ++j) {
        uint32_t key = 0xFFFFFFFFu;
        if (edge[j] && j != i) {
          const float dx = xyz[j * 3] - pix;
          const float dy = xyz[j * 3 + 1] - piy;
          const float dz = xyz[j * 3 + 2] - piz;
          const float dist = std::sqrt(dx * dx + dy * dy + dz * dz);
          if (dist >= lower && dist <= upper) {
            const float inv = 1.0f / std::max(dist, 1e-30f);
            const float ddt = std::fabs((dx * tix + dy * tiy + dz * tiz) * inv);
            if (1.0f - ddt >= parallel_eps) {
              if (!out_keys) {
                l_dmin = std::min(l_dmin, dist);
                l_dmax = std::max(l_dmax, dist);
                ++l_count;
              } else {
                // distance must be inside bounds (feature_valid)
                if (dist >= bmin0 && dist <= bmin0 + brange0) {
                  const float a1 = unsigned_angle(dx, dy, dz, tix, tiy, tiz);
                  const float a2 = unsigned_angle(dx, dy, dz, tangent[j * 3],
                                                  tangent[j * 3 + 1], tangent[j * 3 + 2]);
                  float nval = (dist - bmin0) / brange0;
                  uint32_t d0 = nval < 0.0f ? 0u
                               : (nval >= 1.0f ? static_cast<uint32_t>(dist_steps - 1)
                                               : static_cast<uint32_t>(nval * dist_steps));
                  uint32_t b1 = static_cast<uint32_t>(a1 / angle_step);
                  uint32_t b2 = static_cast<uint32_t>(a2 / angle_step);
                  key = (d0 << 20) | (b1 << 10) | b2;
                  ++l_count;
                }
              }
            }
          }
        }
        if (out_keys) out_keys[i * n + j] = key;
      }
    }
#pragma omp critical
    {
      dmin = std::min(dmin, l_dmin);
      dmax = std::max(dmax, l_dmax);
      count += l_count;
    }
  }
  if (bounds) {
    bounds[0] = dmin;
    bounds[1] = dmax;
  }
  return count;
}

// ---------------------------------------------------------------------------
// Grid-accelerated kNN — the host-side analog of ops/gridnn.py (and of the
// reference's kd-tree locality, impl/pointcloud.hpp:138-198).  Points hash
// into a uniform grid sized by ``cell``; each query scans its 27-cell
// stencil with a bounded insertion heap.  Exact when the true neighbors lie
// within one ring (cell >= the k-NN radius of interest); tm_knn (brute)
// remains the exactness oracle.
// ---------------------------------------------------------------------------

void tm_grid_knn(const float* q, int64_t nq, const float* r, int64_t nr,
                 const uint8_t* valid, int k, float cell,
                 int32_t* out_idx, float* out_d2) {
  float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
  for (int64_t i = 0; i < nr; ++i) {
    if (valid && !valid[i]) continue;
    for (int d = 0; d < 3; ++d) {
      lo[d] = std::min(lo[d], r[i * 3 + d]);
      hi[d] = std::max(hi[d], r[i * 3 + d]);
    }
  }
  if (cell <= 0.f) cell = 1e-6f;
  int dims[3];
  for (int d = 0; d < 3; ++d) {
    float ext = std::max(hi[d] - lo[d], 1e-6f);
    // floor, not ceil: the effective edge ext/dims must be >= cell or the
    // one-ring stencil misses true neighbors at distances in (edge, cell];
    // dims==1 spans the whole axis and stays exact
    dims[d] = std::min(std::max(static_cast<int>(ext / cell), 1), 1024);
  }
  // bound the dense per-cell table (1024^3 cells would be a ~4.3GB vector):
  // coarsen the largest axis until the count fits ~16M entries (64MB) —
  // growing cells only widens the stencil's reach, exactness is kept
  const int64_t kMaxCells = int64_t(1) << 24;
  while (static_cast<int64_t>(dims[0]) * dims[1] * dims[2] > kMaxCells) {
    int dmax = 0;
    if (dims[1] > dims[dmax]) dmax = 1;
    if (dims[2] > dims[dmax]) dmax = 2;
    dims[dmax] = std::max(dims[dmax] / 2, 1);
  }
  float inv_cell[3];
  for (int d = 0; d < 3; ++d)
    inv_cell[d] = dims[d] / std::max(hi[d] - lo[d], 1e-6f);

  auto cell_of = [&](const float* p, int* c) {
    for (int d = 0; d < 3; ++d) {
      int v = static_cast<int>(std::floor((p[d] - lo[d]) * inv_cell[d]));
      c[d] = std::min(std::max(v, 0), dims[d] - 1);
    }
  };

  // counting-sort points into cells
  const int64_t ncells = static_cast<int64_t>(dims[0]) * dims[1] * dims[2];
  std::vector<int32_t> start(ncells + 1, 0);
  std::vector<int32_t> order(nr);
  {
    std::vector<int32_t> cid(nr, -1);
    for (int64_t i = 0; i < nr; ++i) {
      if (valid && !valid[i]) continue;
      int c[3];
      cell_of(r + i * 3, c);
      cid[i] = (c[0] * dims[1] + c[1]) * dims[2] + c[2];
      ++start[cid[i] + 1];
    }
    for (int64_t c = 0; c < ncells; ++c) start[c + 1] += start[c];
    std::vector<int32_t> cursor(start.begin(), start.end() - 1);
    for (int64_t i = 0; i < nr; ++i)
      if (cid[i] >= 0) order[cursor[cid[i]]++] = static_cast<int32_t>(i);
  }

#pragma omp parallel for schedule(dynamic, 64)
  for (int64_t iq = 0; iq < nq; ++iq) {
    float* d2 = out_d2 + iq * k;
    int32_t* idx = out_idx + iq * k;
    for (int j = 0; j < k; ++j) {
      d2[j] = 3.0e38f;
      idx[j] = 0;
    }
    int qc[3];
    cell_of(q + iq * 3, qc);
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          int cx = qc[0] + dx, cy = qc[1] + dy, cz = qc[2] + dz;
          if (cx < 0 || cy < 0 || cz < 0 || cx >= dims[0] || cy >= dims[1] ||
              cz >= dims[2])
            continue;
          int64_t c = (static_cast<int64_t>(cx) * dims[1] + cy) * dims[2] + cz;
          for (int32_t s = start[c]; s < start[c + 1]; ++s) {
            int32_t p = order[s];
            float dd = 0.f;
            for (int d = 0; d < 3; ++d) {
              float t = q[iq * 3 + d] - r[p * 3 + d];
              dd += t * t;
            }
            if (dd < d2[k - 1]) {  // bounded insertion sort
              int j = k - 1;
              while (j > 0 && d2[j - 1] > dd) {
                d2[j] = d2[j - 1];
                idx[j] = idx[j - 1];
                --j;
              }
              d2[j] = dd;
              idx[j] = p;
            }
          }
        }
  }
}

// ---------------------------------------------------------------------------
// LZF (libLZF stream format) — PCD "binary_compressed" payloads.
//
// PCL writes binary_compressed bodies as an LZF stream of the field-major
// (SoA) point data (pcl/io/lzf.cpp; loaded by pointcloud::from_pcd via PCL,
// /root/reference/include/impl/pointcloud.hpp:58-64).  The stream format is
// fixed by liblzf (Marc Lehmann, BSD): control byte < 32 = literal run of
// ctrl+1 bytes; otherwise a back-reference of length (ctrl>>5)+2 (+extra
// byte when the 3-bit length saturates) at offset ((ctrl&31)<<8 | next)+1.
// Bit-compatible by necessity, like MurmurHash3 above.
// ---------------------------------------------------------------------------

// Returns decompressed byte count, or 0 on malformed input / overflow.
int64_t tm_lzf_decompress(const uint8_t* in, int64_t in_len,
                          uint8_t* out, int64_t out_cap) {
  int64_t i = 0, o = 0;
  while (i < in_len) {
    uint32_t ctrl = in[i++];
    if (ctrl < 32u) {
      int64_t len = ctrl + 1;
      if (i + len > in_len || o + len > out_cap) return 0;
      std::memcpy(out + o, in + i, len);
      i += len;
      o += len;
    } else {
      int64_t len = ctrl >> 5;
      if (len == 7) {
        if (i >= in_len) return 0;
        len += in[i++];
      }
      len += 2;
      if (i >= in_len) return 0;
      int64_t ref = o - (static_cast<int64_t>(ctrl & 0x1f) << 8) - in[i++] - 1;
      if (ref < 0 || o + len > out_cap) return 0;
      // byte-by-byte: source and destination may overlap
      for (int64_t j = 0; j < len; ++j) out[o + j] = out[ref + j];
      o += len;
    }
  }
  return o;
}

// Returns compressed byte count, or 0 when the output does not fit in
// out_cap (callers should fall back to storing uncompressed).
int64_t tm_lzf_compress(const uint8_t* in, int64_t in_len,
                        uint8_t* out, int64_t out_cap) {
  constexpr int HLOG = 13;
  constexpr int64_t MAX_OFF = 1 << 13;
  constexpr int64_t MAX_REF = (1 << 8) + (1 << 3);  // 264
  constexpr int64_t MAX_LIT = 32;
  std::vector<int64_t> htab(1 << HLOG, -1);

  int64_t i = 0, o = 0, lit_start = 0, lit = 0;
  auto flush_lit = [&]() -> bool {
    while (lit > 0) {
      int64_t run = std::min(lit, MAX_LIT);
      if (o + 1 + run > out_cap) return false;
      out[o++] = static_cast<uint8_t>(run - 1);
      std::memcpy(out + o, in + lit_start, run);
      o += run;
      lit_start += run;
      lit -= run;
    }
    return true;
  };

  while (i < in_len - 2) {
    uint32_t h = (static_cast<uint32_t>(in[i]) << 16) |
                 (static_cast<uint32_t>(in[i + 1]) << 8) | in[i + 2];
    h = ((h >> (24 - HLOG)) - h * 5) & ((1 << HLOG) - 1);
    int64_t ref = htab[h];
    htab[h] = i;
    int64_t off = i - ref - 1;
    if (ref >= 0 && off < MAX_OFF && in[ref] == in[i] &&
        in[ref + 1] == in[i + 1] && in[ref + 2] == in[i + 2]) {
      int64_t maxlen = std::min(in_len - i, MAX_REF);
      int64_t len = 3;
      while (len < maxlen && in[ref + len] == in[i + len]) ++len;
      if (!flush_lit()) return 0;
      int64_t stored = len - 2;
      if (stored < 7) {
        if (o + 2 > out_cap) return 0;
        out[o++] = static_cast<uint8_t>((off >> 8) | (stored << 5));
      } else {
        if (o + 3 > out_cap) return 0;
        out[o++] = static_cast<uint8_t>((off >> 8) | (7 << 5));
        out[o++] = static_cast<uint8_t>(stored - 7);
      }
      out[o++] = static_cast<uint8_t>(off & 0xff);
      i += len;
      lit_start = i;
    } else {
      ++i;
      ++lit;
    }
  }
  lit = in_len - lit_start;  // literal run through the end of the input
  if (!flush_lit()) return 0;
  return o;
}

}  // extern "C"
