// Native union-find track builder (C++ twin of sfmx/recon/tracks.py).
//
// Capability parity: OpenMVG's tracks builder.  This is the pipeline's one
// genuinely host-bound serial graph stage (between device matching and
// device reconstruction); the numpy fallback is O(matches * alpha) too but
// pays Python interpreter cost per edge — this implementation is the
// production path for 5k-20k-image maps (configs 4-5).
//
// Semantics (identical to the Python oracle, tested for parity):
//   * union (imgA,featA)~(imgB,featB) for every valid match
//   * a track containing two features of the same image is corrupted -> drop
//   * tracks shorter than min_length are dropped
//   * observations sorted by track id; track ids dense in [0, n_tracks)
//   * track order matches the Python impl: by (min node id in component)
//     after sorting nodes by (root, node) — i.e. stable by first occurrence.

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int64_t> parent;
  std::vector<int8_t> rank_;

  explicit UnionFind(int64_t n) : parent(n), rank_(n, 0) {
    for (int64_t i = 0; i < n; ++i) parent[i] = i;
  }

  int64_t find(int64_t i) {
    int64_t root = i;
    while (parent[root] != root) root = parent[root];
    while (parent[i] != root) {
      int64_t next = parent[i];
      parent[i] = root;
      i = next;
    }
    return root;
  }

  void unite(int64_t a, int64_t b) {
    int64_t ra = find(a), rb = find(b);
    if (ra == rb) return;
    if (rank_[ra] < rank_[rb]) std::swap(ra, rb);
    parent[rb] = ra;
    if (rank_[ra] == rank_[rb]) ++rank_[ra];
  }
};

}  // namespace

extern "C" {

// Returns number of observations written (<= out_cap), or -1 if out_cap too
// small.  *n_tracks_out receives the track count.
int64_t sfmx_build_tracks(
    const int32_t* pair_list, int64_t n_pairs,
    const int32_t* match_idx, const uint8_t* match_valid, int64_t K,
    int64_t n_images, int64_t max_feats, int64_t min_length,
    int32_t* out_cam, int32_t* out_feat, int32_t* out_track,
    int64_t out_cap, int64_t* n_tracks_out) {
  const int64_t n_nodes = n_images * max_feats;
  UnionFind uf(n_nodes);
  std::vector<uint8_t> used(n_nodes, 0);

  for (int64_t p = 0; p < n_pairs; ++p) {
    const int64_t a = pair_list[2 * p];
    const int64_t b = pair_list[2 * p + 1];
    const int32_t* row_idx = match_idx + p * K;
    const uint8_t* row_val = match_valid + p * K;
    for (int64_t fa = 0; fa < K; ++fa) {
      if (!row_val[fa]) continue;
      const int64_t fb = row_idx[fa];
      const int64_t na = a * max_feats + fa;
      const int64_t nb = b * max_feats + fb;
      used[na] = used[nb] = 1;
      uf.unite(na, nb);
    }
  }

  // Collect used nodes with roots; sort by (root, node) for contiguous runs.
  std::vector<std::pair<int64_t, int64_t>> nodes;  // (root, node)
  for (int64_t n = 0; n < n_nodes; ++n) {
    if (used[n]) nodes.emplace_back(uf.find(n), n);
  }
  std::sort(nodes.begin(), nodes.end());

  int64_t out_n = 0;
  int32_t tid = 0;
  const int64_t total = static_cast<int64_t>(nodes.size());
  int64_t s = 0;
  while (s < total) {
    int64_t e = s;
    while (e < total && nodes[e].first == nodes[s].first) ++e;
    const int64_t len = e - s;
    bool ok = len >= min_length;
    if (ok) {
      // same-image conflict check (images of a sorted-node run)
      for (int64_t i = s + 1; i < e && ok; ++i) {
        if (nodes[i].second / max_feats == nodes[i - 1].second / max_feats) {
          // node ids sorted => same image appears adjacently iff duplicated
          ok = false;
        }
      }
    }
    if (ok) {
      if (out_n + len > out_cap) return -1;
      for (int64_t i = s; i < e; ++i) {
        const int64_t node = nodes[i].second;
        out_cam[out_n] = static_cast<int32_t>(node / max_feats);
        out_feat[out_n] = static_cast<int32_t>(node % max_feats);
        out_track[out_n] = tid;
        ++out_n;
      }
      ++tid;
    }
    s = e;
  }
  *n_tracks_out = tid;
  return out_n;
}

// Covisibility counts: out is (n_images*n_images) int32, row-major.
void sfmx_covisibility(
    const int32_t* obs_cam, const int32_t* obs_track, int64_t n_obs,
    int64_t n_images, int32_t* out) {
  int64_t s = 0;
  while (s < n_obs) {
    int64_t e = s;
    while (e < n_obs && obs_track[e] == obs_track[s]) ++e;
    for (int64_t i = s; i < e; ++i) {
      for (int64_t j = i + 1; j < e; ++j) {
        out[obs_cam[i] * n_images + obs_cam[j]] += 1;
        out[obs_cam[j] * n_images + obs_cam[i]] += 1;
      }
    }
    s = e;
  }
}

}  // extern "C"
