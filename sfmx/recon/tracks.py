"""Track building: fuse pairwise matches into multi-view tracks (union-find).

Capability parity: OpenMVG's tracks builder (union-find over feature nodes
with same-image-conflict filtering).  This is genuinely host-bound serial
graph work — the one part of the pipeline that is NOT a device kernel by
design; it runs once per map build between the (device) matching stage and
the (device) reconstruction stage.  A C++ implementation with identical
semantics lives in ``native/`` (used when built; this numpy path is the
fallback and the test oracle).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np


class TrackTable(NamedTuple):
    """Flat observation table, the scene's sparse structure (SURVEY C7).

    Observations are sorted by track id; tracks are contiguous runs.
    """

    obs_cam: np.ndarray    # (O,) int32 camera/image id
    obs_feat: np.ndarray   # (O,) int32 feature index within the image
    obs_track: np.ndarray  # (O,) int32 track id, sorted ascending
    n_tracks: int

    def track_slices(self):
        starts = np.searchsorted(self.obs_track, np.arange(self.n_tracks))
        ends = np.searchsorted(self.obs_track, np.arange(self.n_tracks), side="right")
        return starts, ends


class _UnionFind:
    __slots__ = ("parent", "rank")

    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)
        self.rank = np.zeros(n, dtype=np.int8)

    def find(self, i: int) -> int:
        p = self.parent
        root = i
        while p[root] != root:
            root = p[root]
        while p[i] != root:  # path compression
            p[i], i = root, p[i]
        return root

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.rank[ra] < self.rank[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        if self.rank[ra] == self.rank[rb]:
            self.rank[ra] += 1


def build_tracks(
    pair_list: np.ndarray,        # (Np,2) image id pairs
    match_idx: np.ndarray,        # (Np,K) best-match index into image b
    match_valid: np.ndarray,      # (Np,K) bool
    n_images: int,
    max_feats: int,
    *,
    min_length: int = 2,
) -> TrackTable:
    """CONFLICT-AWARE union-find over (image, feature) nodes.

    A union whose two components already share an image (with different
    features) is REJECTED: that edge is provably wrong, and accepting it
    is how one bad match between self-similar regions percolates the whole
    match graph — a 1024-frame corridor build measured 386k of 399k
    matched features fused into ONE chimeric component under the naive
    rule (and OpenMVG's drop-conflicted-tracks filter then discards
    almost everything).  Residual conflicts (none should survive) are
    split, not dropped; tracks shorter than ``min_length`` are dropped.
    """
    try:
        from . import _native_tracks  # C++ fast path if built

        return _native_tracks.build_tracks(
            pair_list, match_idx, match_valid, n_images, max_feats, min_length
        )
    except ImportError:
        pass

    def node(img, feat):
        return img * max_feats + feat

    uf = _UnionFind(n_images * max_feats)
    used = np.zeros(n_images * max_feats, dtype=bool)
    imgset: dict[int, set] = {}
    for p in range(pair_list.shape[0]):
        a, b = int(pair_list[p, 0]), int(pair_list[p, 1])
        feats_a = np.where(match_valid[p])[0]
        for fa in feats_a:
            fb = int(match_idx[p, fa])
            na, nb = node(a, fa), node(b, fb)
            for n_, img in ((na, a), (nb, b)):
                if not used[n_]:
                    used[n_] = True
                    imgset[n_] = {img}
            ra, rb = uf.find(na), uf.find(nb)
            if ra == rb:
                continue
            sa, sb = imgset[ra], imgset[rb]
            small, large = (sa, sb) if len(sa) <= len(sb) else (sb, sa)
            if not small.isdisjoint(large):
                continue  # conflict-inducing edge: reject the union
            uf.union(na, nb)
            rn = uf.find(na)
            lose = rb if rn == ra else ra
            if rn != lose:
                dst, other = imgset[rn], imgset[lose]
                if len(dst) < len(other):
                    dst, other = other, dst
                dst.update(other)
                imgset[rn] = dst
                imgset[lose] = set()

    nodes = np.where(used)[0]
    roots = np.array([uf.find(int(n)) for n in nodes], dtype=np.int64)
    imgs = (nodes // max_feats).astype(np.int32)
    feats = (nodes % max_feats).astype(np.int32)

    # Sort by root to get contiguous runs, then detect conflicts & short tracks.
    order = np.argsort(roots, kind="stable")
    roots, imgs, feats = roots[order], imgs[order], feats[order]
    uroots, starts = np.unique(roots, return_index=True)
    ends = np.append(starts[1:], len(roots))

    cam_parts, feat_parts, track_parts = [], [], []
    tid = 0
    for s, e in zip(starts, ends):
        if e - s < min_length:
            continue
        track_imgs = imgs[s:e]
        u, c = np.unique(track_imgs, return_counts=True)
        if (c > 1).any():
            keep = ~np.isin(track_imgs, u[c > 1])
            if int(keep.sum()) < min_length:
                continue
        else:
            keep = slice(None)
        cam_parts.append(track_imgs[keep])
        feat_parts.append(feats[s:e][keep])
        track_parts.append(np.full(len(cam_parts[-1]), tid, np.int32))
        tid += 1

    if not cam_parts:
        return TrackTable(
            np.zeros(0, np.int32), np.zeros(0, np.int32), np.zeros(0, np.int32), 0
        )

    return TrackTable(
        np.concatenate(cam_parts).astype(np.int32),
        np.concatenate(feat_parts).astype(np.int32),
        np.concatenate(track_parts), tid)


def covisibility_counts(tt: TrackTable, n_images: int) -> np.ndarray:
    """(C,C) symmetric matrix of shared-track counts between image pairs."""
    cov = np.zeros((n_images, n_images), dtype=np.int32)
    starts, ends = tt.track_slices()
    for s, e in zip(starts, ends):
        cams = tt.obs_cam[s:e]
        for i in range(len(cams)):
            for j in range(i + 1, len(cams)):
                cov[cams[i], cams[j]] += 1
                cov[cams[j], cams[i]] += 1
    return cov
