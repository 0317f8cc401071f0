// Native host-side graph builder for precond_tpu.
//
// The reference keeps all mesh/CSR preprocessing in C++ (SeCsr.h:49-105
// InitIdxs, SeSchwarzPreconditioner.cpp:175-184 neighbor-table sizing);
// this library is the equivalent runtime piece for the TPU framework: it
// packs COO 3x3-block systems into the ELL device layout, builds vertex
// adjacency from element lists, and provides a 63-bit Morton argsort for
// host-side setup. Exposed with a plain C ABI for ctypes.
//
// Build: make -C native   (produces libprecond_host.so)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// COO (rows, cols, 3x3 vals) -> ELL. Duplicates are summed. Returns the ELL
// width used (max row degree after coalescing), or -1 if it exceeds max_k.
// idx_out must hold n*max_k ints (pre-filled by callee), blocks_out
// n*max_k*9 floats, mask_out n*max_k bytes.
// ---------------------------------------------------------------------------
int coo_to_ell(int n, long long m, const int* rows, const int* cols,
               const float* vals, int max_k, int* idx_out, float* blocks_out,
               unsigned char* mask_out) {
  std::vector<long long> order(m);
  std::iota(order.begin(), order.end(), 0LL);
  std::sort(order.begin(), order.end(), [&](long long a, long long b) {
    if (rows[a] != rows[b]) return rows[a] < rows[b];
    return cols[a] < cols[b];
  });

  for (int r = 0; r < n; ++r)
    for (int k = 0; k < max_k; ++k) idx_out[(long long)r * max_k + k] = r;
  std::memset(blocks_out, 0, (long long)n * max_k * 9 * sizeof(float));
  std::memset(mask_out, 0, (long long)n * max_k);

  int width = 0;
  long long i = 0;
  while (i < m) {
    const int r = rows[order[i]];
    int slot = 0;
    while (i < m && rows[order[i]] == r) {
      const int c = cols[order[i]];
      if (slot >= max_k) return -1;
      long long base = ((long long)r * max_k + slot) * 9;
      idx_out[(long long)r * max_k + slot] = c;
      mask_out[(long long)r * max_k + slot] = 1;
      while (i < m && rows[order[i]] == r && cols[order[i]] == c) {
        const float* v = vals + order[i] * 9;
        for (int t = 0; t < 9; ++t) blocks_out[base + t] += v[t];
        ++i;
      }
      ++slot;
    }
    width = std::max(width, slot);
  }
  return width;
}

// ---------------------------------------------------------------------------
// Undirected pair list -> ELL adjacency (self excluded, deduplicated).
// Returns max degree, or -1 on overflow of max_k.
// ---------------------------------------------------------------------------
int pairs_to_adjacency_ell(int n, long long m, const int* a, const int* b,
                           int max_k, int* idx_out, unsigned char* mask_out) {
  std::vector<std::vector<int>> adj(n);
  for (long long i = 0; i < m; ++i) {
    if (a[i] == b[i]) continue;
    adj[a[i]].push_back(b[i]);
    adj[b[i]].push_back(a[i]);
  }
  int width = 0;
  for (int r = 0; r < n; ++r) {
    auto& v = adj[r];
    std::sort(v.begin(), v.end());
    v.erase(std::unique(v.begin(), v.end()), v.end());
    if ((int)v.size() > max_k) return -1;
    width = std::max(width, (int)v.size());
    for (int k = 0; k < max_k; ++k) {
      idx_out[(long long)r * max_k + k] = k < (int)v.size() ? v[k] : r;
      mask_out[(long long)r * max_k + k] = k < (int)v.size();
    }
  }
  return width;
}

// ---------------------------------------------------------------------------
// 63-bit Morton argsort (exact SeMorton64 bit-interleave, SeMorton.h:75-101).
// positions: n*3 floats; perm_out: n ints (sorted -> original).
// ---------------------------------------------------------------------------
static inline uint64_t expand_bits(uint64_t bits) {
  bits = (bits | (bits << 32)) & 0xFFFF00000000FFFFull;
  bits = (bits | (bits << 16)) & 0x00FF0000FF0000FFull;
  bits = (bits | (bits << 8)) & 0xF00F00F00F00F00Full;
  bits = (bits | (bits << 4)) & 0x30C30C30C30C30C3ull;
  return (bits | (bits << 2)) & 0x9249249249249249ull;
}

void morton_argsort(int n, const float* positions, int* perm_out) {
  float lo[3] = {positions[0], positions[1], positions[2]};
  float hi[3] = {positions[0], positions[1], positions[2]};
  for (int i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d) {
      lo[d] = std::min(lo[d], positions[3 * i + d]);
      hi[d] = std::max(hi[d], positions[3 * i + d]);
    }
  float ext[3];
  for (int d = 0; d < 3; ++d) ext[d] = hi[d] > lo[d] ? hi[d] - lo[d] : 1.0f;

  const float scale = float(1 << 21);
  std::vector<uint64_t> keys(n);
  for (int i = 0; i < n; ++i) {
    uint64_t q[3];
    for (int d = 0; d < 3; ++d) {
      float u = (positions[3 * i + d] - lo[d]) / ext[d] * scale;
      u = std::min(std::max(u, 0.0f), scale - 1.0f);
      q[d] = (uint64_t)u;
    }
    keys[i] = (expand_bits(q[0]) << 2) + (expand_bits(q[1]) << 1) + expand_bits(q[2]);
  }
  std::iota(perm_out, perm_out + n, 0);
  std::stable_sort(perm_out, perm_out + n,
                   [&](int x, int y) { return keys[x] < keys[y]; });
}

// ---------------------------------------------------------------------------
// Element (tet/tri/edge) lists -> unique undirected pair list, for adjacency.
// elems: m*verts_per ints. Returns number of pairs written (<= cap) or -1.
// ---------------------------------------------------------------------------
long long elements_to_pairs(long long m, int verts_per, const int* elems,
                            long long cap, int* a_out, int* b_out) {
  std::vector<std::pair<int, int>> pairs;
  pairs.reserve(m * verts_per * (verts_per - 1) / 2);
  for (long long e = 0; e < m; ++e)
    for (int i = 0; i < verts_per; ++i)
      for (int j = i + 1; j < verts_per; ++j) {
        int x = elems[e * verts_per + i], y = elems[e * verts_per + j];
        if (x == y) continue;
        pairs.emplace_back(std::min(x, y), std::max(x, y));
      }
  std::sort(pairs.begin(), pairs.end());
  pairs.erase(std::unique(pairs.begin(), pairs.end()), pairs.end());
  if ((long long)pairs.size() > cap) return -1;
  for (size_t i = 0; i < pairs.size(); ++i) {
    a_out[i] = pairs[i].first;
    b_out[i] = pairs[i].second;
  }
  return (long long)pairs.size();
}

}  // extern "C"
