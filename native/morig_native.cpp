// morig_native — C++ preprocessing accelerators for the morig_tpu framework.
//
// The TPU compute path is JAX/XLA/Pallas; these are the *host-side* hot
// kernels of the data pipeline, replacing the scipy/open3d-backed steps the
// reference leans on (SURVEY.md §2.9):
//   * surface-geodesic all-pairs Dijkstra over a normal-filtered kNN graph
//     (reference: scipy dijkstra over open3d Poisson samples,
//      data_proc/common_ops.py:175-211 — the "takes some time" path)
//   * solid-voxelization flood fill (reference: scipy binary_dilation loop,
//      data_proc/common_ops.py:289-312)
//   * one-ring edge extraction from triangle soup
//     (reference: per-vertex numpy loop, data_proc/common_ops.py:15-32)
//
// Exposed as a plain C ABI for ctypes; no Python headers needed.
// Build: g++ -O3 -march=native -shared -fPIC -o libmorig_native.so morig_native.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// surface geodesic: all-pairs shortest path over a kNN graph with
// normal-compatibility filtering.  pts (n,3), normals (n,3) row-major.
// out_dist (n,n) filled with geodesic distances; disconnected pairs get
// inf_offset + euclidean distance.
// ---------------------------------------------------------------------------
void geodesic_knn_dijkstra(const float* pts, const float* normals, int n,
                           int knn, float cos_min, float inf_offset,
                           float* out_dist) {
  // build kNN graph (brute force; n <= ~4000)
  std::vector<std::vector<std::pair<int, float>>> adj(n);
  std::vector<std::pair<float, int>> cand(n);
  for (int i = 0; i < n; ++i) {
    const float* pi = pts + 3 * i;
    for (int j = 0; j < n; ++j) {
      const float* pj = pts + 3 * j;
      float dx = pi[0] - pj[0], dy = pi[1] - pj[1], dz = pi[2] - pj[2];
      cand[j] = {dx * dx + dy * dy + dz * dz, j};
    }
    int k = std::min(knn + 1, n);
    std::partial_sort(cand.begin(), cand.begin() + k, cand.end());
    const float* ni = normals + 3 * i;
    for (int t = 0; t < k; ++t) {
      int j = cand[t].second;
      if (j == i) continue;
      const float* nj = normals + 3 * j;
      float li = std::sqrt(ni[0]*ni[0] + ni[1]*ni[1] + ni[2]*ni[2]);
      float lj = std::sqrt(nj[0]*nj[0] + nj[1]*nj[1] + nj[2]*nj[2]);
      float cos = (ni[0]*nj[0] + ni[1]*nj[1] + ni[2]*nj[2]) / (li * lj + 1e-10f);
      if (cos > cos_min) {
        float d = std::sqrt(cand[t].first);
        adj[i].push_back({j, d});
      }
    }
  }
  // symmetrize (directed graph treated as undirected, scipy directed=False)
  for (int i = 0; i < n; ++i)
    for (auto& e : adj[i]) {
      bool found = false;
      for (auto& r : adj[e.first])
        if (r.first == i) { found = true; break; }
      if (!found) adj[e.first].push_back({i, e.second});
    }

  const float INF = 1e30f;
  std::vector<float> dist(n);
  using QE = std::pair<float, int>;
  for (int s = 0; s < n; ++s) {
    std::fill(dist.begin(), dist.end(), INF);
    dist[s] = 0.f;
    std::priority_queue<QE, std::vector<QE>, std::greater<QE>> q;
    q.push({0.f, s});
    while (!q.empty()) {
      auto [d, u] = q.top();
      q.pop();
      if (d > dist[u]) continue;
      for (auto& [v, w] : adj[u]) {
        float nd = d + w;
        if (nd < dist[v]) {
          dist[v] = nd;
          q.push({nd, v});
        }
      }
    }
    float* row = out_dist + (size_t)s * n;
    const float* ps = pts + 3 * s;
    for (int j = 0; j < n; ++j) {
      if (dist[j] >= INF) {
        const float* pj = pts + 3 * j;
        float dx = ps[0]-pj[0], dy = ps[1]-pj[1], dz = ps[2]-pj[2];
        row[j] = inf_offset + std::sqrt(dx*dx + dy*dy + dz*dz);
      } else {
        row[j] = dist[j];
      }
    }
  }
}

// ---------------------------------------------------------------------------
// flood fill: grid (d*d*d) uint8, 1 = surface shell.  Marks everything
// reachable from the boundary (through zero cells) as outside and rewrites
// grid as solid occupancy (shell + interior = 1).
// ---------------------------------------------------------------------------
void solid_fill(uint8_t* grid, int d) {
  const size_t total = (size_t)d * d * d;
  std::vector<uint8_t> outside(total, 0);
  std::vector<int> stack;
  stack.reserve(total / 8);
  auto idx = [d](int x, int y, int z) { return ((size_t)x * d + y) * d + z; };
  auto push = [&](int x, int y, int z) {
    if (x < 0 || y < 0 || z < 0 || x >= d || y >= d || z >= d) return;
    size_t i = idx(x, y, z);
    if (!outside[i] && !grid[i]) {
      outside[i] = 1;
      stack.push_back((int)i);
    }
  };
  for (int a = 0; a < d; ++a)
    for (int b = 0; b < d; ++b) {
      push(0, a, b); push(d - 1, a, b);
      push(a, 0, b); push(a, d - 1, b);
      push(a, b, 0); push(a, b, d - 1);
    }
  while (!stack.empty()) {
    int i = stack.back();
    stack.pop_back();
    int z = i % d, y = (i / d) % d, x = i / (d * d);
    push(x + 1, y, z); push(x - 1, y, z);
    push(x, y + 1, z); push(x, y - 1, z);
    push(x, y, z + 1); push(x, y, z - 1);
  }
  for (size_t i = 0; i < total; ++i) grid[i] = outside[i] ? 0 : 1;
}

// ---------------------------------------------------------------------------
// one-ring edges from triangles.  faces (nf,3) int32.  Writes unique sorted
// undirected edges into out_edges (capacity max_edges pairs); returns count,
// or -1 if capacity exceeded.
// ---------------------------------------------------------------------------
int one_ring_edges(const int32_t* faces, int nf, int32_t* out_edges,
                   int max_edges) {
  std::vector<std::pair<int32_t, int32_t>> edges;
  edges.reserve((size_t)nf * 3);
  for (int f = 0; f < nf; ++f) {
    const int32_t* t = faces + 3 * f;
    int32_t pairs[3][2] = {{t[0], t[1]}, {t[1], t[2]}, {t[0], t[2]}};
    for (auto& p : pairs) {
      int32_t a = std::min(p[0], p[1]), b = std::max(p[0], p[1]);
      if (a != b) edges.push_back({a, b});
    }
  }
  std::sort(edges.begin(), edges.end());
  edges.erase(std::unique(edges.begin(), edges.end()), edges.end());
  if ((int)edges.size() > max_edges) return -1;
  for (size_t i = 0; i < edges.size(); ++i) {
    out_edges[2 * i] = edges[i].first;
    out_edges[2 * i + 1] = edges[i].second;
  }
  return (int)edges.size();
}

// ---------------------------------------------------------------------------
// volumetric geodesic BFS: distance (in dilation steps) from bone samples to
// every voxel inside the solid grid (reference one_bone,
// data_proc/common_ops.py:275-314, without the multiprocessing pool).
// grid: solid occupancy (d^3); seeds: (ns,3) int voxel coords;
// out: (d^3) int32 distances (-1 where unreachable/outside).
// ---------------------------------------------------------------------------
void voxel_bfs(const uint8_t* grid, int d, const int32_t* seeds, int ns,
               int32_t* out) {
  const size_t total = (size_t)d * d * d;
  for (size_t i = 0; i < total; ++i) out[i] = -1;
  std::queue<int> q;
  auto idx = [d](int x, int y, int z) { return ((size_t)x * d + y) * d + z; };
  for (int s = 0; s < ns; ++s) {
    int x = seeds[3*s], y = seeds[3*s+1], z = seeds[3*s+2];
    if (x < 0 || y < 0 || z < 0 || x >= d || y >= d || z >= d) continue;
    size_t i = idx(x, y, z);
    if (out[i] < 0) { out[i] = 0; q.push((int)i); }
  }
  while (!q.empty()) {
    int i = q.front(); q.pop();
    int z = i % d, y = (i / d) % d, x = i / (d * d);
    int32_t nd = out[i] + 1;
    // 26-connected dilation (3x3x3 kernel, common_ops.py:276)
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          int nx = x + dx, ny = y + dy, nz = z + dz;
          if (nx < 0 || ny < 0 || nz < 0 || nx >= d || ny >= d || nz >= d)
            continue;
          size_t j = idx(nx, ny, nz);
          if (grid[j] && out[j] < 0) {
            out[j] = nd;
            q.push((int)j);
          }
        }
  }
}

}  // extern "C"
