import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sfmx.solvers import pnp, ransac
from sfmx.solvers.linalg import smallest_eigvec_spd

B, K, HYP = 16, 512, 512
rng = np.random.default_rng(0)
xn = jnp.asarray(rng.uniform(-0.5, 0.5, (B,K,2)).astype(np.float32))
X3 = jnp.asarray(rng.uniform(-3, 3, (B,K,3)).astype(np.float32))
ok = jnp.ones((B,K), bool)
keys = jax.random.split(jax.random.PRNGKey(0), B)

def timeit(name, f, *a, reps=5):
    out = f(*a); jax.block_until_ready(out)
    t0=time.time()
    for _ in range(reps): out = f(*a)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/reps*1000:.1f}ms", flush=True)

def residual_fn(model, xn_d, X_d):
    R, t = model
    r = pnp.pnp_residual(R, t, xn_d, X_d)
    return jnp.sum(r*r, axis=-1)

# 1) current full ransac
def rans(k, x, X, o):
    return ransac.ransac(k, pnp.dlt_pnp_minimal, residual_fn, (x, X), o,
                         k_hypotheses=HYP, sample_size=6, inlier_threshold=1e-4)[2]
timeit("ransac_current", jax.jit(jax.vmap(rans)), keys, xn, X3, ok)

# 2) solver-only: 512 dlt solves per query, no scoring
def solves(k, x, X, o):
    idx = ransac.sample_minimal(k, o, HYP, 6)
    models = jax.vmap(lambda s: pnp.dlt_pnp_minimal(x[s], X[s]))(idx)
    return models[1].sum()
timeit("dlt_solves_only", jax.jit(jax.vmap(solves)), keys, xn, X3, ok)

# 3) scoring-only: fixed model scored HYP times
def scores(k, x, X, o):
    R = jnp.eye(3); t = jnp.zeros(3)
    def sc(i):
        return jnp.sum((residual_fn((R, t), x, X) < 1e-4) & o)
    return jax.vmap(sc)(jnp.arange(HYP)).sum()
timeit("scoring_only", jax.jit(jax.vmap(scores)), keys, xn, X3, ok)

# 4) polar-decomposition so3 projection variant
def project_polar(M):
    def inv3t(A):
        c0 = jnp.cross(A[1], A[2]); c1 = jnp.cross(A[2], A[0]); c2 = jnp.cross(A[0], A[1])
        det = jnp.dot(A[0], c0)
        adjT = jnp.stack([c0, c1, c2])          # rows = cofactors -> A^{-T} = adjT/det
        return adjT / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    def body(_, Xk):
        return 0.5 * (Xk + inv3t(Xk))
    return jax.lax.fori_loop(0, 6, body, M)

def dlt_polar(xn_s, X_s):
    import sfmx.core.se3 as se3
    orig = se3.project_to_so3
    se3.project_to_so3 = project_polar
    try:
        out = pnp.dlt_pnp(xn_s, X_s, jnp.ones(xn_s.shape[0], bool))
    finally:
        se3.project_to_so3 = orig
    return out

def rans_polar(k, x, X, o):
    return ransac.ransac(k, dlt_polar, residual_fn, (x, X), o,
                         k_hypotheses=HYP, sample_size=6, inlier_threshold=1e-4)[2]
timeit("ransac_polar_so3", jax.jit(jax.vmap(rans_polar)), keys, xn, X3, ok)

# 5) eigh instead of inverse-iteration (the original)
import sfmx.solvers.pnp as pnp_mod
src_eigh = lambda A: jnp.linalg.eigh(A)[1][:, 0]
def dlt_eigh(xn_s, X_s):
    import sfmx.solvers.linalg as lg
    orig = lg.smallest_eigvec_spd
    lg.smallest_eigvec_spd = lambda A, **kw: src_eigh(A)
    try:
        return pnp.dlt_pnp(xn_s, X_s, jnp.ones(xn_s.shape[0], bool))
    finally:
        lg.smallest_eigvec_spd = orig
def rans_eigh(k, x, X, o):
    return ransac.ransac(k, dlt_eigh, residual_fn, (x, X), o,
                         k_hypotheses=HYP, sample_size=6, inlier_threshold=1e-4)[2]
timeit("ransac_eigh", jax.jit(jax.vmap(rans_eigh)), keys, xn, X3, ok)
