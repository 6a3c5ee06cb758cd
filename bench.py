"""Headline benchmark: full query-localization path, frames/s per chip.

Measures the serving-path hot loop (BASELINE.json north-star "query frames/s
per chip"): feature extraction (nonlinear scale space + NMS + descriptors)
plus the jitted localize path (retrieval GEMM -> 2D-3D matching GEMM ->
batched PnP-RANSAC -> GN refine) for a batch of VGA frames against a
device-resident map.

vs_baseline: the same per-frame workload through the reference's CPU stack
stand-in (OpenCV AKAZE detectAndCompute + BFMatcher ratio test +
solvePnPRansac — the exact components hulop/SfMLocalization uses), measured
on this host.  The real reference pipeline was not obtainable (SURVEY.md §0).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np

B = 16          # query batch
H, W = 480, 640
K_FEAT = 512
P_MAP = 8192    # landmarks
C_KF = 256      # keyframes


def tpu_frames_per_s():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the axon remote-compile service takes minutes
    # for the full pipeline; cached executables make reruns start in seconds
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from __graft_entry__ import _example_map
    from sfmx.kernels import features
    from sfmx.localize.localize import localize_query

    lmap = _example_map(P=P_MAP, C=C_KF, D=features.N_FLOAT_DIM, Kc=256)
    lmap = jax.device_put(lmap)
    intr = jnp.asarray([560.0, 560.0, W / 2, H / 2, 0, 0, 0], jnp.float32)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, H, W)), jnp.float32)

    # Two jits dispatched back-to-back (device-side handoff, async dispatch
    # overlaps them).  Fusing both into one XLA program measured 2.5x SLOWER
    # (91 vs 37 ms/batch16): the combined program's layout/schedule choices
    # degrade both halves.
    extract = jax.jit(lambda im: features.detect_and_describe(
        im, max_keypoints=K_FEAT, threshold=1e-7))

    @jax.jit
    def loc_path(desc, uv, mask, key):
        keys = jax.random.split(key, desc.shape[0])

        def one(d, u, m, k):
            return localize_query(lmap, d, u, m, intr, k,
                                  top_k_kf=8, m_cap=2048, k_hypotheses=512)

        return jax.vmap(one)(desc, uv, mask, keys)

    def query_path(imgs, key):
        feats = extract(imgs)
        return loc_path(feats.desc, feats.kp.uv, feats.kp.mask, key)

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    out = query_path(imgs, key)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    # steady state
    reps = 5
    t0 = time.time()
    for i in range(reps):
        out = query_path(imgs, jax.random.PRNGKey(i + 1))
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    return B / dt, compile_s


def cpu_baseline_frames_per_s():
    """Reference-stack stand-in: SIFT + BF ratio match + solvePnPRansac."""
    try:
        import cv2
    except ImportError:
        return None
    rng = np.random.default_rng(0)
    img = (rng.random((H, W)) * 255).astype(np.uint8)
    img = cv2.GaussianBlur(img, (0, 0), 2.0)  # give AKAZE real structure
    # this cv2 build ships SIFT but not AKAZE; the reference supports both
    # extractors (BASELINE.json: "SIFT/AKAZE feature extraction")
    sift = cv2.SIFT_create(nfeatures=K_FEAT)
    map_desc = rng.random((2048, 128)).astype(np.float32)
    bf = cv2.BFMatcher(cv2.NORM_L2)
    obj = rng.uniform(-3, 3, (512, 3)).astype(np.float32)
    imgp = rng.uniform(0, 640, (512, 2)).astype(np.float32)
    Kmat = np.array([[560, 0, W / 2], [0, 560, H / 2], [0, 0, 1]], np.float32)

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        kp, desc = sift.detectAndCompute(img, None)
        if desc is not None and len(desc) >= 2:
            bf.knnMatch(desc[:K_FEAT], map_desc, k=2)
        cv2.solvePnPRansac(obj, imgp, Kmat, None, iterationsCount=512,
                           reprojectionError=4.0)
    dt = (time.time() - t0) / reps
    return 1.0 / dt


def main():
    # one retry: the remote-compile service is occasionally flaky
    try:
        value, compile_s = tpu_frames_per_s()
    except Exception as e:
        print(f"# first attempt failed ({type(e).__name__}: {e}); retrying",
              file=sys.stderr)
        value, compile_s = tpu_frames_per_s()
    base = cpu_baseline_frames_per_s()
    vs = value / base if base else None
    print(json.dumps({
        "metric": "query_localization_throughput",
        "value": round(value, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(vs, 2) if vs else None,
    }))
    print(f"# compile {compile_s:.1f}s; cpu baseline {base and round(base,2)} frames/s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
