// Native graph-construction kernels (host side).
//
// The per-trajectory graph build (cell connectivity -> unique bidirectional
// edges -> receiver-sorted CSR -> mesh-relative edge features) is the hot
// host-side path when streaming large datasets; the reference hides the
// equivalent work inside GraphNetCore.jl's Julia JIT (triangles_to_edges /
// parse_edges call sites, /root/reference/src/graph.jl:30-52).  Here it is a
// small C++ library bound via ctypes (see mgn_tpu/ops/native.py), with a pure
// NumPy fallback when the shared object is unavailable.
//
// Build: native/build.sh  (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Cells (ncells x k, 0-based) -> unique undirected pairs, both directions.
// senders/receivers must have capacity ncells * k * (k - 1).
// Returns the number of directed edges written (2 * unique undirected pairs),
// sorted by (receiver, sender) — i.e. already CSR-ready.
int64_t mgn_cells_to_edges(const int32_t* cells, int64_t ncells, int32_t k,
                           int32_t* senders, int32_t* receivers) {
  std::vector<uint64_t> keys;
  keys.reserve(static_cast<size_t>(ncells) * k * (k - 1) / 2);
  for (int64_t c = 0; c < ncells; ++c) {
    const int32_t* cell = cells + c * k;
    for (int32_t i = 0; i < k; ++i) {
      for (int32_t j = i + 1; j < k; ++j) {
        uint32_t a = static_cast<uint32_t>(cell[i]);
        uint32_t b = static_cast<uint32_t>(cell[j]);
        uint32_t lo = std::min(a, b), hi = std::max(a, b);
        keys.push_back((static_cast<uint64_t>(lo) << 32) | hi);
      }
    }
  }
  std::sort(keys.begin(), keys.end());
  keys.erase(std::unique(keys.begin(), keys.end()), keys.end());

  // emit both directions keyed by receiver: (recv, send) sorted;
  // self-loops (excluded-node placeholders) kept once
  std::vector<uint64_t> directed;
  directed.reserve(keys.size() * 2);
  for (uint64_t key : keys) {
    uint32_t lo = static_cast<uint32_t>(key >> 32);
    uint32_t hi = static_cast<uint32_t>(key & 0xffffffffu);
    directed.push_back((static_cast<uint64_t>(hi) << 32) | lo);  // recv=hi
    if (lo != hi)
      directed.push_back((static_cast<uint64_t>(lo) << 32) | hi);  // recv=lo
  }
  std::sort(directed.begin(), directed.end());
  const int64_t e = static_cast<int64_t>(directed.size());
  for (int64_t i = 0; i < e; ++i) {
    receivers[i] = static_cast<int32_t>(directed[i] >> 32);
    senders[i] = static_cast<int32_t>(directed[i] & 0xffffffffu);
  }
  return e;
}

// CSR row offsets (n + 1) for receiver-sorted edges.
void mgn_csr_offsets(const int32_t* receivers, int64_t e, int64_t n,
                     int32_t* row_offsets) {
  std::memset(row_offsets, 0, sizeof(int32_t) * (n + 1));
  for (int64_t i = 0; i < e; ++i) row_offsets[receivers[i] + 1]++;
  for (int64_t v = 0; v < n; ++v) row_offsets[v + 1] += row_offsets[v];
}

// Mesh-relative edge features [pos_s - pos_r, |pos_s - pos_r|] (e x (dim+1)).
void mgn_edge_features(const float* mesh_pos, int32_t dim,
                       const int32_t* senders, const int32_t* receivers,
                       int64_t e, float* out) {
  for (int64_t i = 0; i < e; ++i) {
    const float* ps = mesh_pos + static_cast<int64_t>(senders[i]) * dim;
    const float* pr = mesh_pos + static_cast<int64_t>(receivers[i]) * dim;
    float norm2 = 0.f;
    float* row = out + i * (dim + 1);
    for (int32_t d = 0; d < dim; ++d) {
      float r = ps[d] - pr[d];
      row[d] = r;
      norm2 += r * r;
    }
    row[dim] = std::sqrt(norm2);
  }
}

}  // extern "C"
