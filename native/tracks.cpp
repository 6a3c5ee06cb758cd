// Native union-find track builder (C++ twin of sfmx/recon/tracks.py).
//
// Capability parity: OpenMVG's tracks builder.  This is the pipeline's one
// genuinely host-bound serial graph stage (between device matching and
// device reconstruction); the numpy fallback is O(matches * alpha) too but
// pays Python interpreter cost per edge — this implementation is the
// production path for 5k-20k-image maps (configs 4-5).
//
// Semantics (identical to the Python oracle, tested for parity):
//   * CONFLICT-AWARE union (imgA,featA)~(imgB,featB): a union whose two
//     components already share an image (with different features) is
//     REJECTED — that edge is provably wrong, and accepting it is how one
//     bad match between self-similar regions percolates the whole match
//     graph into a single chimeric mega-component (measured on a
//     1024-frame corridor: 386k of 399k matched features in ONE component
//     before this rule; healthy track sets after).  Edges are processed in
//     pair-list order, features ascending.
//   * residual same-image conflicts (none should survive) are split, not
//     dropped: the conflicting image's observations are removed.
//   * tracks shorter than min_length are dropped
//   * observations sorted by track id; track ids dense in [0, n_tracks)
//   * track order matches the Python impl: by (min node id in component)
//     after sorting nodes by (root, node) — i.e. stable by first occurrence.

#include <algorithm>
#include <cstdint>
#include <unordered_map>
#include <unordered_set>
#include <utility>
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
  // Per-ROOT image set for the conflict-aware union.  Sparse by design:
  // a singleton component's image set is implicitly {node / max_feats}, so
  // only MERGED roots ever allocate a heap set — at production scale
  // (5k-20k images x ~2k features = tens of millions of nodes) the dense
  // vector-of-sets this replaces zero-initialized multi-GB of host RAM for
  // nodes that never appear in any match.
  std::unordered_map<int64_t, std::unordered_set<int32_t>> imgmap;

  auto img_of = [&](int64_t node) {
    return static_cast<int32_t>(node / max_feats);
  };

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
      used[na] = 1;
      used[nb] = 1;
      int64_t ra = uf.find(na), rb = uf.find(nb);
      if (ra == rb) continue;
      // reject the union if the components share any image
      auto ita = imgmap.find(ra);
      auto itb = imgmap.find(rb);
      std::unordered_set<int32_t>* sa =
          (ita == imgmap.end()) ? nullptr : &ita->second;
      std::unordered_set<int32_t>* sb =
          (itb == imgmap.end()) ? nullptr : &itb->second;
      bool conflict;
      if (sa == nullptr && sb == nullptr) {
        conflict = (img_of(ra) == img_of(rb));
      } else if (sa == nullptr) {
        conflict = sb->count(img_of(ra)) != 0;
      } else if (sb == nullptr) {
        conflict = sa->count(img_of(rb)) != 0;
      } else {
        const std::unordered_set<int32_t>* small =
            (sa->size() <= sb->size()) ? sa : sb;
        const std::unordered_set<int32_t>* large = (small == sa) ? sb : sa;
        conflict = false;
        for (int32_t img : *small) {
          if (large->count(img)) { conflict = true; break; }
        }
      }
      if (conflict) continue;
      uf.unite(na, nb);
      const int64_t rn = uf.find(na);  // surviving root
      const int64_t ro = (rn == ra) ? rb : ra;
      // merge the two image sets (implicit singletons materialize here)
      std::unordered_set<int32_t>* sn = (rn == ra) ? sa : sb;
      std::unordered_set<int32_t>* so = (rn == ra) ? sb : sa;
      if (sn == nullptr) {
        sn = &imgmap[rn];  // may rehash; so-pointer re-fetched below
        sn->insert(img_of(rn));
        auto ito = imgmap.find(ro);
        so = (ito == imgmap.end()) ? nullptr : &ito->second;
      }
      if (so == nullptr) {
        sn->insert(img_of(ro));
      } else {
        if (sn->size() < so->size()) sn->swap(*so);
        sn->insert(so->begin(), so->end());
        imgmap.erase(ro);
      }
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
  std::vector<uint8_t> keep;
  int64_t s = 0;
  while (s < total) {
    int64_t e = s;
    while (e < total && nodes[e].first == nodes[s].first) ++e;
    const int64_t len = e - s;
    if (len < min_length) {
      s = e;
      continue;
    }
    // conflict SPLIT: node ids are sorted within the run, so observations
    // of the same image are adjacent — flag every member of a same-image
    // group with count > 1
    keep.assign(len, 1);
    int64_t kept = len;
    int64_t i = s;
    while (i < e) {
      int64_t j = i;
      const int64_t img = nodes[i].second / max_feats;
      while (j < e && nodes[j].second / max_feats == img) ++j;
      if (j - i > 1) {
        for (int64_t k = i; k < j; ++k) keep[k - s] = 0;
        kept -= (j - i);
      }
      i = j;
    }
    if (kept >= min_length) {
      if (out_n + kept > out_cap) return -1;
      for (int64_t k = s; k < e; ++k) {
        if (!keep[k - s]) continue;
        const int64_t node = nodes[k].second;
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
