// Native graph-preprocessing runtime for neuralgraphpde.
//
// The TPU compute path is JAX/XLA/Pallas; this library is the host-side
// runtime around it (SURVEY §2.2 native-code plan): edge sorting, CSR
// construction, Pallas tile layout, edge partitioning and spatial graph
// building at C++ speed for multi-million-edge meshes, exposed through a
// C ABI consumed via ctypes (neuralgraphpde/native.py).
//
// All functions are single-threaded O(E)-ish passes; callers parallelize
// across graphs/shards.

#include <cstdint>
#include <cstring>
#include <vector>
#include <cmath>
#include <algorithm>

extern "C" {

// Stable counting sort of edges by receiver. perm_out[k] = original index of
// the k-th edge in receiver-sorted order. Returns 0 on success.
int ngp_sort_by_receiver(int64_t num_edges, int64_t num_nodes,
                         const int32_t* receivers, int64_t* perm_out) {
  std::vector<int64_t> counts(num_nodes + 1, 0);
  for (int64_t e = 0; e < num_edges; ++e) {
    int32_t r = receivers[e];
    if (r < 0 || r >= num_nodes) return 1;
    counts[r + 1]++;
  }
  for (int64_t i = 0; i < num_nodes; ++i) counts[i + 1] += counts[i];
  for (int64_t e = 0; e < num_edges; ++e) {
    perm_out[counts[receivers[e]]++] = e;
  }
  return 0;
}

// CSR row offsets (num_nodes + 1) from receiver-sorted receivers.
int ngp_csr_offsets(int64_t num_edges, int64_t num_nodes,
                    const int32_t* sorted_receivers, int64_t* offsets_out) {
  std::vector<int64_t> counts(num_nodes, 0);
  for (int64_t e = 0; e < num_edges; ++e) {
    int32_t r = sorted_receivers[e];
    if (r < 0 || r >= num_nodes) return 1;
    counts[r]++;
  }
  offsets_out[0] = 0;
  for (int64_t i = 0; i < num_nodes; ++i)
    offsets_out[i + 1] = offsets_out[i] + counts[i];
  return 0;
}

// Count the chunks the tiled-CSR layout needs (phase 1 of 2).
// tn: output rows per tile; te: edges per chunk.
int64_t ngp_tiled_csr_count(int64_t num_edges, int64_t num_nodes,
                            const int32_t* receivers, int64_t tn, int64_t te) {
  int64_t num_tiles = (num_nodes + tn - 1) / tn;
  if (num_tiles < 1) num_tiles = 1;
  std::vector<int64_t> tile_counts(num_tiles, 0);
  for (int64_t e = 0; e < num_edges; ++e) tile_counts[receivers[e] / tn]++;
  int64_t chunks = 0;
  for (int64_t t = 0; t < num_tiles; ++t) {
    int64_t c = (tile_counts[t] + te - 1) / te;
    chunks += c > 0 ? c : 1;
  }
  return chunks;
}

// Build the tiled-CSR layout (phase 2). Outputs are pre-allocated by the
// caller with C = ngp_tiled_csr_count chunks:
//   senders_out   (C * te) int32   recv_local_out (C * te) int32
//   wmask_out     (C * te) float   chunk_tile_out (C)      int32
// edge_weight may be null (unit weights). Returns 0 on success.
int ngp_tiled_csr_build(int64_t num_edges, int64_t num_nodes,
                        const int32_t* senders, const int32_t* receivers,
                        const float* edge_weight, int64_t tn, int64_t te,
                        int32_t* senders_out, int32_t* recv_local_out,
                        float* wmask_out, int32_t* chunk_tile_out) {
  int64_t num_tiles = (num_nodes + tn - 1) / tn;
  if (num_tiles < 1) num_tiles = 1;

  std::vector<int64_t> perm(num_edges);
  if (ngp_sort_by_receiver(num_edges, num_nodes, receivers, perm.data()))
    return 1;

  // per-tile edge ranges in sorted order
  std::vector<int64_t> tile_counts(num_tiles, 0);
  for (int64_t e = 0; e < num_edges; ++e) tile_counts[receivers[e] / tn]++;

  // Within each receiver tile, order edges by sender: tile membership is all
  // correctness needs, and sender-sorted chunks give the feature gather
  // near-sequential HBM access.
  {
    int64_t lo = 0;
    for (int64_t t = 0; t < num_tiles; ++t) {
      int64_t hi = lo + tile_counts[t];
      std::sort(perm.begin() + lo, perm.begin() + hi,
                [&](int64_t a, int64_t b) { return senders[a] < senders[b]; });
      lo = hi;
    }
  }

  int64_t c = 0, pos = 0;
  for (int64_t t = 0; t < num_tiles; ++t) {
    int64_t remaining = tile_counts[t];
    int64_t chunks = (remaining + te - 1) / te;
    if (chunks == 0) chunks = 1;
    for (int64_t k = 0; k < chunks; ++k) {
      int64_t n = std::min<int64_t>(te, remaining);
      for (int64_t j = 0; j < n; ++j) {
        int64_t e = perm[pos + j];
        senders_out[c * te + j] = senders[e];
        recv_local_out[c * te + j] =
            static_cast<int32_t>(receivers[e] - t * tn);
        wmask_out[c * te + j] = edge_weight ? edge_weight[e] : 1.0f;
      }
      for (int64_t j = n; j < te; ++j) {
        senders_out[c * te + j] = 0;
        recv_local_out[c * te + j] = 0;
        wmask_out[c * te + j] = 0.0f;
      }
      chunk_tile_out[c] = static_cast<int32_t>(t);
      pos += n;
      remaining -= n;
      ++c;
    }
  }
  return 0;
}

// Greedy balanced edge partitioner: assigns each receiver-node's edge block
// to the currently lightest partition, receivers visited in decreasing
// degree order. part_of_node_out: (num_nodes) int32.
int ngp_greedy_partition(int64_t num_edges, int64_t num_nodes,
                         const int32_t* receivers, int64_t num_parts,
                         int32_t* part_of_node_out) {
  std::vector<int64_t> degree(num_nodes, 0);
  for (int64_t e = 0; e < num_edges; ++e) degree[receivers[e]]++;
  std::vector<int64_t> order(num_nodes);
  for (int64_t i = 0; i < num_nodes; ++i) order[i] = i;
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return degree[a] > degree[b];
  });
  std::vector<int64_t> load(num_parts, 0);
  for (int64_t idx = 0; idx < num_nodes; ++idx) {
    int64_t node = order[idx];
    int64_t best = 0;
    for (int64_t p = 1; p < num_parts; ++p)
      if (load[p] < load[best]) best = p;
    part_of_node_out[node] = static_cast<int32_t>(best);
    load[best] += degree[node] + 1;  // +1 balances node counts too
  }
  return 0;
}

// 2D radius graph via cell lists. Phase 1: count edges (excluding self).
int64_t ngp_radius_graph_2d_count(int64_t n, const float* xy, float radius) {
  float cell = radius;
  float minx = 1e30f, miny = 1e30f, maxx = -1e30f, maxy = -1e30f;
  for (int64_t i = 0; i < n; ++i) {
    minx = std::min(minx, xy[2 * i]);
    maxx = std::max(maxx, xy[2 * i]);
    miny = std::min(miny, xy[2 * i + 1]);
    maxy = std::max(maxy, xy[2 * i + 1]);
  }
  int64_t gx = std::max<int64_t>(1, (int64_t)((maxx - minx) / cell) + 1);
  int64_t gy = std::max<int64_t>(1, (int64_t)((maxy - miny) / cell) + 1);
  std::vector<std::vector<int32_t>> cells(gx * gy);
  auto cell_of = [&](int64_t i) {
    int64_t cx = std::min<int64_t>(gx - 1, (int64_t)((xy[2 * i] - minx) / cell));
    int64_t cy = std::min<int64_t>(gy - 1, (int64_t)((xy[2 * i + 1] - miny) / cell));
    return cx * gy + cy;
  };
  for (int64_t i = 0; i < n; ++i) cells[cell_of(i)].push_back((int32_t)i);
  float r2 = radius * radius;
  int64_t count = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t cx = std::min<int64_t>(gx - 1, (int64_t)((xy[2 * i] - minx) / cell));
    int64_t cy = std::min<int64_t>(gy - 1, (int64_t)((xy[2 * i + 1] - miny) / cell));
    for (int64_t dx = -1; dx <= 1; ++dx)
      for (int64_t dy = -1; dy <= 1; ++dy) {
        int64_t nx = cx + dx, ny = cy + dy;
        if (nx < 0 || nx >= gx || ny < 0 || ny >= gy) continue;
        for (int32_t j : cells[nx * gy + ny]) {
          if (j == i) continue;
          float ddx = xy[2 * i] - xy[2 * j];
          float ddy = xy[2 * i + 1] - xy[2 * j + 1];
          if (ddx * ddx + ddy * ddy <= r2) ++count;
        }
      }
  }
  return count;
}

// Phase 2: fill senders/receivers (edge j -> i for each neighbor j of i).
int ngp_radius_graph_2d_build(int64_t n, const float* xy, float radius,
                              int32_t* senders_out, int32_t* receivers_out) {
  float cell = radius;
  float minx = 1e30f, miny = 1e30f, maxx = -1e30f, maxy = -1e30f;
  for (int64_t i = 0; i < n; ++i) {
    minx = std::min(minx, xy[2 * i]);
    maxx = std::max(maxx, xy[2 * i]);
    miny = std::min(miny, xy[2 * i + 1]);
    maxy = std::max(maxy, xy[2 * i + 1]);
  }
  int64_t gx = std::max<int64_t>(1, (int64_t)((maxx - minx) / cell) + 1);
  int64_t gy = std::max<int64_t>(1, (int64_t)((maxy - miny) / cell) + 1);
  std::vector<std::vector<int32_t>> cells(gx * gy);
  for (int64_t i = 0; i < n; ++i) {
    int64_t cx = std::min<int64_t>(gx - 1, (int64_t)((xy[2 * i] - minx) / cell));
    int64_t cy = std::min<int64_t>(gy - 1, (int64_t)((xy[2 * i + 1] - miny) / cell));
    cells[cx * gy + cy].push_back((int32_t)i);
  }
  float r2 = radius * radius;
  int64_t k = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t cx = std::min<int64_t>(gx - 1, (int64_t)((xy[2 * i] - minx) / cell));
    int64_t cy = std::min<int64_t>(gy - 1, (int64_t)((xy[2 * i + 1] - miny) / cell));
    for (int64_t dx = -1; dx <= 1; ++dx)
      for (int64_t dy = -1; dy <= 1; ++dy) {
        int64_t nx = cx + dx, ny = cy + dy;
        if (nx < 0 || nx >= gx || ny < 0 || ny >= gy) continue;
        for (int32_t j : cells[nx * gy + ny]) {
          if (j == i) continue;
          float ddx = xy[2 * i] - xy[2 * j];
          float ddy = xy[2 * i + 1] - xy[2 * j + 1];
          if (ddx * ddx + ddy * ddy <= r2) {
            senders_out[k] = j;
            receivers_out[k] = (int32_t)i;
            ++k;
          }
        }
      }
  }
  return 0;
}

}  // extern "C"
