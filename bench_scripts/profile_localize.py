import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _example_map
from sfmx.localize.localize import localize_query
from sfmx.localize import retrieve
from sfmx.core import cameras
from sfmx.solvers import pnp, ransac

B, K, D, M = 16, 512, 128, 2048
lmap = jax.device_put(_example_map(P=8192, C=256, D=D, Kc=256))
rng = np.random.default_rng(0)
q_desc = jnp.asarray(rng.standard_normal((B,K,D)).astype(np.float32))
q_uv = jnp.asarray(rng.uniform(0,640,(B,K,2)).astype(np.float32))
q_mask = jnp.ones((B,K), bool)
intr = jnp.asarray([560.,560.,320.,240.,0,0,0], jnp.float32)
keys = jax.random.split(jax.random.PRNGKey(0), B)

def timeit(name, f, *a, reps=5):
    out = f(*a); jax.block_until_ready(out)
    t0=time.time()
    for _ in range(reps): out = f(*a)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/reps*1000:.1f}ms", flush=True)
    return out

# full query
full = jax.jit(jax.vmap(lambda d,u,m,k: localize_query(lmap, d,u,m,intr,k, top_k_kf=8, m_cap=M, k_hypotheses=512)))
timeit("full_localize", full, q_desc, q_uv, q_mask, keys)

# pieces (example map has no vocab; time VLAD with a synthetic one)
vocab = jnp.asarray(rng.standard_normal((16, D)).astype(np.float32))
vl = jax.jit(jax.vmap(lambda d,m: retrieve.vlad_encode(d,m,vocab)))
timeit("vlad", vl, q_desc, q_mask)

def corr(d, u, m):
    sim = jnp.dot(d, lmap.lm_desc[:M].T, preferred_element_type=jnp.float32)
    return sim.max(1)
timeit("2d3d_gemm", jax.jit(jax.vmap(corr)), q_desc, q_uv, q_mask)

xn = jax.vmap(lambda u: cameras.pixel_to_normalized(intr, u))(q_uv)
X3 = jnp.asarray(rng.uniform(-3,3,(B,K,3)).astype(np.float32))
ok = jnp.ones((B,K), bool)
def rans(k, x, X, o):
    def residual_fn(model, xn_d, X_d):
        R, t = model
        r = pnp.pnp_residual(R, t, xn_d, X_d)
        return jnp.sum(r*r, axis=-1)
    return ransac.ransac(k, pnp.dlt_pnp_minimal, residual_fn, (x, X), o, k_hypotheses=512, sample_size=6, inlier_threshold=1e-4)[2]
timeit("pnp_ransac512", jax.jit(jax.vmap(rans)), keys, xn, X3, ok)

def refine(x, X, o):
    R0 = jnp.eye(3); t0 = jnp.zeros(3)
    return pnp.refine_pnp_gn(R0, t0, x, X, o)[1]
timeit("gn_refine", jax.jit(jax.vmap(refine)), xn, X3, ok)
