"""Multi-session map merge (C12): cross-registration → fusion → joint BA.

Capability parity: the reference's model-merge tool (SURVEY §3.5): match
common features across session reconstructions, solve the similarity
transform between them, concatenate, and jointly bundle-adjust.

TPU design: cross-session registration is a landmark-descriptor GEMM +
batched 3-point RANSAC over Umeyama hypotheses (vmapped closed-form solves,
no iterative alignment); matched landmark pairs are FUSED (one landmark id,
observations remapped), which is what stitches the sessions together in the
joint BA.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.masking import NEG_INF
from ..mapstore.scene import Scene
from ..solvers import lm, ransac, umeyama


def landmark_descriptors(scene: Scene, feat_desc: np.ndarray, obs_feat: np.ndarray):
    """Mean per-landmark descriptor over alive observations (host-side)."""
    obs_cam = np.asarray(scene.obs_cam)
    obs_pt = np.asarray(scene.obs_pt)
    alive = np.asarray(scene.obs_alive)
    P, D = scene.X.shape[0], feat_desc.shape[-1]
    acc = np.zeros((P, D), np.float32)
    cnt = np.zeros(P, np.float32)
    np.add.at(acc, obs_pt[alive], feat_desc[obs_cam[alive], obs_feat[alive]])
    np.add.at(cnt, obs_pt[alive], 1.0)
    acc /= np.maximum(cnt[:, None], 1.0)
    n = np.linalg.norm(acc, axis=1, keepdims=True)
    return acc / np.maximum(n, 1e-8)


def register_pair(Xa, desc_a, alive_a, Xb, desc_b, alive_b, *,
                  key=None, ratio: float = 0.9, k_hypotheses: int = 2048,
                  inlier_frac_of_extent: float = 0.02):
    """Estimate sim3 taking scene B coords into scene A's frame.

    Returns (s, R, t, pairs (M,2) matched landmark ids, inlier_mask (M,)).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    sim = desc_a @ desc_b.T
    sim[~alive_a] = -2
    sim[:, ~alive_b] = -2
    best_b = sim.argmax(1)
    best_s = sim.max(1)
    mutual = sim.argmax(0)[best_b] == np.arange(len(desc_a))
    cand = (best_s > 0.7) & mutual & alive_a
    ia = np.where(cand)[0]
    ib = best_b[ia]
    if len(ia) < 3:
        raise ValueError(f"too few cross-session landmark matches: {len(ia)}")

    Pa = jnp.asarray(Xa[ia], jnp.float32)
    Pb = jnp.asarray(Xb[ib], jnp.float32)
    extent = float(np.linalg.norm(Xa[alive_a].max(0) - Xa[alive_a].min(0)))
    thresh = (inlier_frac_of_extent * extent) ** 2

    def solver(pa, pb):
        s, R, t = umeyama.umeyama(pb, pa)  # B -> A
        return s, R, t

    def residual_fn(model, pa, pb):
        s, R, t = model
        pred = umeyama.apply_sim3(s, R, t, pb)
        return jnp.sum((pred - pa) ** 2, axis=-1)

    mask = jnp.ones(len(ia), bool)
    (s, R, t), inliers, cnt = ransac.ransac(
        key, solver, residual_fn, (Pa, Pb), mask,
        k_hypotheses=k_hypotheses, sample_size=3, inlier_threshold=thresh,
    )
    # refine on inliers
    s, R, t = umeyama.umeyama(Pb, Pa, inliers)
    pairs = np.stack([ia, ib], axis=1)
    return float(s), np.asarray(R), np.asarray(t), pairs, np.asarray(inliers)


def transform_scene_inplace(cam_R, cam_t, X, s, R, t):
    """Apply world similarity (B->A) to poses and points of scene B.

    New pose: R' = Rc R^T, t' = s*tc - R' t  (keeps pixel projections, depths
    scale by s).
    """
    X2 = s * (X @ R.T) + t
    R2 = np.einsum("cij,kj->cik", cam_R, R)  # Rc @ R^T
    t2 = s * cam_t - np.einsum("cij,j->ci", R2, t)
    return R2, t2, X2


def merge_scenes(sessions, *, ba_iters: int = 20, cg_iters: int = 40,
                 huber_px: float = 4.0, seed: int = 0):
    """Merge session maps into one scene + joint BA.

    sessions: list of (Scene, feat_desc (C,K,D), kp_uv, kp_mask, obs_feat).
    The first session defines the output frame.
    """
    key = jax.random.PRNGKey(seed)
    base_scene = sessions[0][0]
    stats = {"n_sessions": len(sessions), "pair_inliers": []}

    # Per-session numpy state.
    st = []
    for scene, desc, kp_uv, kp_mask, obs_feat in sessions:
        st.append({
            "R": np.array(scene.cam_R), "t": np.array(scene.cam_t),
            "X": np.array(scene.X), "Xa": np.array(scene.X_alive),
            "cam_alive": np.array(scene.cam_alive), "cam_k": np.array(scene.cam_k),
            "obs_cam": np.array(scene.obs_cam), "obs_pt": np.array(scene.obs_pt),
            "obs_uv": np.array(scene.obs_uv), "obs_alive": np.array(scene.obs_alive),
            "intr": np.array(scene.intr),
            "ldesc": landmark_descriptors(scene, desc, obs_feat),
        })

    # Register every session onto the first, fusing matched landmarks.
    for i in range(1, len(st)):
        key, sk = jax.random.split(key)
        s, R, t, pairs, inl = register_pair(
            st[0]["X"], st[0]["ldesc"], st[0]["Xa"],
            st[i]["X"], st[i]["ldesc"], st[i]["Xa"], key=sk,
        )
        stats["pair_inliers"].append(int(inl.sum()))
        st[i]["R"], st[i]["t"], st[i]["X"] = transform_scene_inplace(
            st[i]["R"], st[i]["t"], st[i]["X"], s, R, t)
        st[i]["fuse"] = {int(b): int(a) for (a, b), ok in zip(pairs, inl) if ok}

    # Concatenate into one table; fused landmarks map to the base id.
    cam_off, pt_off, intr_off = 0, 0, 0
    Rs, ts, cam_alive, cam_k, Xs, Xa, intrs = [], [], [], [], [], [], []
    obs_cam, obs_pt, obs_uv, obs_alive = [], [], [], []
    pt_maps = []
    for i, s_i in enumerate(st):
        C, P = len(s_i["R"]), len(s_i["X"])
        pt_map = np.arange(P) + pt_off
        if i > 0:
            for b, a in s_i["fuse"].items():
                pt_map[b] = a  # base scene occupies offset 0
        pt_maps.append(pt_map)
        Rs.append(s_i["R"]); ts.append(s_i["t"])
        cam_alive.append(s_i["cam_alive"]); cam_k.append(s_i["cam_k"] + intr_off)
        Xs.append(s_i["X"]); Xa.append(s_i["Xa"])
        intrs.append(s_i["intr"])
        obs_cam.append(s_i["obs_cam"] + cam_off)
        obs_pt.append(pt_map[s_i["obs_pt"]])
        obs_uv.append(s_i["obs_uv"]); obs_alive.append(s_i["obs_alive"])
        cam_off += C; pt_off += P; intr_off += len(s_i["intr"])

    merged = Scene(
        intr=jnp.asarray(np.concatenate(intrs), jnp.float32),
        cam_k=jnp.asarray(np.concatenate(cam_k), jnp.int32),
        cam_R=jnp.asarray(np.concatenate(Rs), jnp.float32),
        cam_t=jnp.asarray(np.concatenate(ts), jnp.float32),
        cam_alive=jnp.asarray(np.concatenate(cam_alive)),
        X=jnp.asarray(np.concatenate(Xs), jnp.float32),
        X_alive=jnp.asarray(np.concatenate(Xa)),
        obs_cam=jnp.asarray(np.concatenate(obs_cam), jnp.int32),
        obs_pt=jnp.asarray(np.concatenate(obs_pt), jnp.int32),
        obs_uv=jnp.asarray(np.concatenate(obs_uv), jnp.float32),
        obs_alive=jnp.asarray(np.concatenate(obs_alive)),
    )

    # Joint global BA (the reference's final merge step).
    w = np.asarray(merged.obs_alive).astype(np.float32)
    fixed = ~np.asarray(merged.cam_alive)
    first = np.flatnonzero(np.asarray(merged.cam_alive))
    if len(first):
        fixed[first[0]] = True
    R2, t2, X2, costs = lm.ba_solve(
        merged.intr, merged.cam_k, merged.cam_R, merged.cam_t, merged.X,
        merged.obs_cam, merged.obs_pt, merged.obs_uv, jnp.asarray(w),
        jnp.asarray(fixed), iters=ba_iters, cg_iters=cg_iters, huber_px=huber_px,
    )
    merged = dataclasses.replace(merged, cam_R=R2, cam_t=t2, X=X2)
    stats["joint_ba_cost"] = [float(costs[0]), float(costs[-1])]
    stats["n_cameras"] = int(np.asarray(merged.cam_alive).sum())
    stats["n_points"] = int(np.asarray(merged.X_alive).sum())
    return merged, stats
