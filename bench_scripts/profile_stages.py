"""Exclusive TPU profile: extraction stages + localization + BA iters/s."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from sfmx.kernels import features, pallas_describe as pd
from sfmx.solvers import lm

B,H,W,K = 16,480,640,512
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.random((B,H,W)), jnp.float32)
cfg = features.ScaleSpaceConfig()

def timeit(name, fn, *args, reps=3):
    t0=time.time(); out = fn(*args); jax.block_until_ready(out)
    compile_t = time.time()-t0
    t0=time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: compile+1 {compile_t:.1f}s steady {(time.time()-t0)/reps*1000:.0f}ms", flush=True)
    return out

ss = jax.jit(lambda im: features.build_scale_space(im, cfg))
lv = timeit("scale_space", ss, imgs)
rf = jax.jit(lambda l: features.hessian_response(l, cfg))
resp = timeit("response", rf, lv)
det = jax.jit(lambda l, r: features.detect(l, r, cfg, max_keypoints=K, threshold=1e-7, with_orientation=False))
kp = timeit("detect", det, lv, resp)
dsc = jax.jit(lambda l, kp: pd.describe_upright(l, kp.uv, kp.level, kp.sigma, kp.mask))
raw = timeit("describe_pallas", dsc, lv, kp)
fin = jax.jit(lambda r, m: (pd.finalize_float(r, m), pd.finalize_bits(r, m)))
timeit("finalize", fin, raw, kp.mask)

# BA iters/s: synthetic 500-cam problem (config-3 scale, EuRoC MH_01 analog)
C3, P3, O3 = 512, 20000, 200000
key = jax.random.PRNGKey(0)
Xw = jax.random.uniform(key, (P3,3), minval=-10, maxval=10)
tvec = jnp.concatenate([jax.random.uniform(key,(C3,2),minval=-5,maxval=5), jnp.full((C3,1), 20.0)],1)
Rm = jnp.broadcast_to(jnp.eye(3,dtype=jnp.float32),(C3,3,3))
cam_id = jax.random.randint(key,(O3,),0,C3)
pt_id = jax.random.randint(key,(O3,),0,P3)
Xc = Xw[pt_id] + tvec[cam_id]
uv = (Xc[:,:2]/Xc[:,2:3])*500.0 + jnp.asarray([320.,240.])
uv = uv + 0.5*jax.random.normal(key,(O3,2))
w = jnp.ones(O3, jnp.float32)
intr = jnp.asarray([[500.,500.,320.,240.,0,0,0]], jnp.float32)
k_idx = jnp.zeros(C3, jnp.int32)
fixed = jnp.zeros(C3, bool).at[0].set(True)
ITERS = 20
t0=time.time()
out = lm.ba_solve(intr,k_idx,Rm,tvec,Xw,cam_id,pt_id,uv,w,fixed,iters=ITERS,cg_iters=30)
jax.block_until_ready(out)
print(f"ba_solve(512cam/20k pts/200k obs): compile+{ITERS}it {time.time()-t0:.1f}s", flush=True)
t0=time.time()
out = lm.ba_solve(intr,k_idx,Rm,tvec,Xw,cam_id,pt_id,uv,w,fixed,iters=ITERS,cg_iters=30)
jax.block_until_ready(out)
dt = time.time()-t0
print(f"ba steady: {dt:.2f}s for {ITERS} LM iters -> {ITERS/dt:.1f} LM iters/s ({ITERS*30/dt:.0f} CG iters/s); final cost {float(out[3][-1]):.4g}", flush=True)
