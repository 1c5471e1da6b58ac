// Beneš/Clos routing support: bipartite multigraph edge coloring by
// recursive Euler splitting.
//
// Used by ops/permute.py to decompose an arbitrary static permutation into
// stages of TPU-friendly within-row (128-lane) gathers. XLA's arbitrary
// gather/scatter lowerings serialize the edge axis (~7.5 ns/element measured
// on TPU v5e), while Mosaic's within-row dynamic_gather runs at full VPU
// throughput — so a 2k-1-stage Clos network of row gathers beats both the
// native gather (~100x) and a routing sort (~25x).
//
// Problem: given a D-regular bipartite multigraph (left/right node sets of
// size R, N = R*D edges given as (u[e], v[e])), produce a proper edge
// coloring with D colors (every color class is a perfect matching). D must
// be a power of two: recursively split Eulerian circuits into halves.
//
// Implementation notes (host-preprocessing hot path; measured on the 2-vCPU
// build hosts): edges are carried as dense (u, v, id) int32 triples that are
// compacted per half at every split, so each level's adjacency build is a
// sequential pass and the only random traffic is the Euler walk itself.
//
// C ABI:
//   int etpu_edge_color(int64 n_edges, int64 n_left, int32 degree,
//                       const int32* u, const int32* v, int32* colors_out)
//   returns 0 on success, nonzero on invalid input.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct EdgeSet {
  // Dense per-subset edge arrays; w[k] encodes the ORIGINAL edge id so the
  // final color write needs no indirection chain.
  std::vector<int32_t> u, v, id;
  size_t size() const { return u.size(); }
};

// One Euler-split level over a D-regular subset: partition into two halves
// such that every node's incident edges split evenly. Bipartite circuits
// alternate direction strictly; traversal direction assigns the half.
void euler_split(int64_t r, EdgeSet& es, int degree,
                 EdgeSet& half0, EdgeSet& half1) {
  const int64_t n_nodes = 2 * r;
  const int64_t m = (int64_t)es.size();
  const int32_t* u = es.u.data();
  const int32_t* v = es.v.data();

  // CSR-style adjacency over the subset (sequential build passes).
  std::vector<int32_t> adj_off(n_nodes + 1, 0);
  for (int64_t k = 0; k < m; ++k) {
    adj_off[u[k] + 1]++;
    adj_off[(int64_t)v[k] + r + 1]++;
  }
  for (int64_t i = 0; i < n_nodes; ++i) adj_off[i + 1] += adj_off[i];
  std::vector<int32_t> adj_edge(2 * m);
  std::vector<int32_t> cursor(adj_off.begin(), adj_off.end() - 1);
  for (int64_t k = 0; k < m; ++k) {
    adj_edge[cursor[u[k]]++] = (int32_t)k;
    adj_edge[cursor[(int64_t)v[k] + r]++] = (int32_t)k;
  }
  cursor.assign(adj_off.begin(), adj_off.end() - 1);
  std::vector<uint8_t> used(m, 0);

  half0.u.reserve(m / 2); half0.v.reserve(m / 2); half0.id.reserve(m / 2);
  half1.u.reserve(m / 2); half1.v.reserve(m / 2); half1.id.reserve(m / 2);

  for (int64_t k0 = 0; k0 < m; ++k0) {
    if (used[k0]) continue;
    int64_t k = k0;
    bool forward = true;  // about to traverse edge k left->right (= half0)
    while (true) {
      used[k] = 1;
      int64_t next_node;
      if (forward) {
        half0.u.push_back(u[k]); half0.v.push_back(v[k]);
        half0.id.push_back(es.id[k]);
        next_node = (int64_t)v[k] + r;
      } else {
        half1.u.push_back(u[k]); half1.v.push_back(v[k]);
        half1.id.push_back(es.id[k]);
        next_node = u[k];
      }
      int32_t& cur = cursor[next_node];
      const int32_t end = adj_off[next_node + 1];
      while (cur < end && used[adj_edge[cur]]) ++cur;
      if (cur >= end) break;  // circuit closed
      k = adj_edge[cur];
      forward = !forward;
    }
  }
}

void color_recursive(int64_t r, EdgeSet& es, int degree, int color_base,
                     int32_t* colors, int parallel_depth) {
  if (degree == 1) {
    for (size_t k = 0; k < es.size(); ++k) colors[es.id[k]] = color_base;
    return;
  }
  EdgeSet half0, half1;
  euler_split(r, es, degree, half0, half1);
  { EdgeSet tmp; std::swap(tmp, es); }  // free before recursing
  if (parallel_depth > 0) {
    std::thread t0([&, degree, color_base] {
      color_recursive(r, half0, degree / 2, color_base, colors,
                      parallel_depth - 1);
    });
    color_recursive(r, half1, degree / 2, color_base + degree / 2, colors,
                    parallel_depth - 1);
    t0.join();
  } else {
    color_recursive(r, half0, degree / 2, color_base, colors, 0);
    color_recursive(r, half1, degree / 2, color_base + degree / 2, colors, 0);
  }
}

}  // namespace

extern "C" {

int etpu_edge_color(int64_t n_edges, int64_t n_left, int32_t degree,
                    const int32_t* u, const int32_t* v, int32_t* colors_out) {
  if (degree <= 0 || (degree & (degree - 1)) != 0) return 1;  // power of 2
  if (n_edges != n_left * (int64_t)degree) return 2;
  if (n_edges > INT32_MAX) return 3;
  EdgeSet es;
  es.u.assign(u, u + n_edges);
  es.v.assign(v, v + n_edges);
  es.id.resize(n_edges);
  for (int64_t e = 0; e < n_edges; ++e) es.id[e] = (int32_t)e;
  int hw = (int)std::thread::hardware_concurrency();
  int pdepth = 0;
  while ((1 << (pdepth + 1)) <= hw && pdepth < 4) ++pdepth;
  color_recursive(n_left, es, degree, 0, colors_out, pdepth);
  return 0;
}

}  // extern "C"
