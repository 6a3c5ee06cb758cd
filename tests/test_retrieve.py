"""Retrieval (C8): vocabulary + VLAD quality vs mean pooling."""
import jax
import jax.numpy as jnp
import numpy as np

from sfmx.localize import retrieve


def _clustered_descs(rng, n_clusters=8, per=40, d=64, noise=0.15):
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    descs = np.repeat(centers, per, axis=0) + noise * rng.standard_normal(
        (n_clusters * per, d)).astype(np.float32)
    descs /= np.linalg.norm(descs, axis=1, keepdims=True)
    labels = np.repeat(np.arange(n_clusters), per)
    return centers, descs, labels


def test_vocabulary_recovers_clusters(rng):
    centers, descs, labels = _clustered_descs(rng)
    vocab = retrieve.build_vocabulary(
        jnp.asarray(descs), jnp.ones(len(descs), bool), jax.random.PRNGKey(0),
        n_words=8,
    )
    # every true center should have a vocab word very close to it
    sim = np.asarray(vocab) @ centers.T  # (8,8)
    assert (sim.max(axis=0) > 0.95).all()


def test_vlad_retrieval_beats_mean_pooling(rng):
    """Keyframes drawn from word-distributions; VLAD separates them better."""
    d, V = 64, 8
    centers, descs, labels = _clustered_descs(rng, n_clusters=V, d=d)
    vocab = retrieve.build_vocabulary(
        jnp.asarray(descs), jnp.ones(len(descs), bool), jax.random.PRNGKey(0),
        n_words=V,
    )
    # Places share the SAME word mixture (mean pooling cannot separate them)
    # but differ in per-word residual structure — the signal VLAD encodes.
    offsets = 0.25 * rng.standard_normal((6, V, d)).astype(np.float32)

    def sample_place(p, n=60, noise=0.1):
        words = rng.choice(V, size=n)           # uniform mixture for all places
        f = centers[words] + offsets[p, words]
        f = f + noise * rng.standard_normal((n, d)).astype(np.float32)
        return (f / np.linalg.norm(f, axis=1, keepdims=True)).astype(np.float32)

    kf = np.stack([sample_place(p) for p in range(6)])       # (6,n,d)
    q = np.stack([sample_place(p) for p in range(6)])        # same places, new noise
    mask = jnp.ones(kf.shape[:2], bool)

    kf_vlad = retrieve.vlad_encode_b(jnp.asarray(kf), mask, vocab)
    q_vlad = retrieve.vlad_encode_b(jnp.asarray(q), mask, vocab)
    vlad_hits = (np.asarray(q_vlad @ kf_vlad.T).argmax(1) == np.arange(6)).mean()

    kf_mean = kf.mean(1)
    kf_mean /= np.linalg.norm(kf_mean, axis=1, keepdims=True)
    q_mean = q.mean(1)
    q_mean /= np.linalg.norm(q_mean, axis=1, keepdims=True)
    mean_hits = (np.asarray(q_mean @ kf_mean.T).argmax(1) == np.arange(6)).mean()

    assert vlad_hits >= mean_hits
    assert vlad_hits == 1.0


def test_vlad_masks_dead_rows(rng):
    d, V = 64, 4
    centers, descs, _ = _clustered_descs(rng, n_clusters=V, d=d)
    vocab = retrieve.build_vocabulary(
        jnp.asarray(descs), jnp.ones(len(descs), bool), jax.random.PRNGKey(1),
        n_words=V,
    )
    f = descs[:32]
    full = retrieve.vlad_encode(jnp.asarray(f), jnp.ones(32, bool), vocab)
    # appending masked garbage must not change the encoding
    f2 = np.concatenate([f, rng.standard_normal((16, d)).astype(np.float32)])
    m2 = np.concatenate([np.ones(32, bool), np.zeros(16, bool)])
    masked = retrieve.vlad_encode(jnp.asarray(f2), jnp.asarray(m2), vocab)
    np.testing.assert_allclose(np.asarray(full), np.asarray(masked), atol=1e-5)


def test_recall_at_k_metric():
    """recall_at_k: position-correlated descriptors score ~1.0, random
    descriptors score near chance; dense-spacing tolerance radius means a
    same-spot neighbor counts as a hit."""
    import numpy as np

    from sfmx.localize import retrieve

    rng = np.random.default_rng(0)
    C, Q, D = 256, 32, 16
    th = np.linspace(0, 2 * np.pi, C, endpoint=False)
    kfc = np.stack([np.cos(th), np.sin(th), 0 * th], 1).astype(np.float32)
    g = np.concatenate([kfc[:, :2], 0.05 * rng.standard_normal((C, D - 2))],
                       1).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    qi = rng.integers(0, C, Q)
    qc = kfc[qi] + 0.001 * rng.standard_normal((Q, 3)).astype(np.float32)
    qg = g[qi] + 0.02 * rng.standard_normal((Q, D)).astype(np.float32)
    qg /= np.linalg.norm(qg, axis=1, keepdims=True)
    alive = np.ones(C, bool)
    r_good = retrieve.recall_at_k(g, kfc, alive, qg, qc, k=8)
    assert r_good >= 0.95, r_good
    g_rand = rng.standard_normal((C, D)).astype(np.float32)
    g_rand /= np.linalg.norm(g_rand, axis=1, keepdims=True)
    r_bad = retrieve.recall_at_k(g_rand, kfc, alive, qg, qc, k=8)
    assert r_bad < 0.7, r_bad


def test_strict_recall_at_k_metric():
    """strict_recall_at_k: THE nearest keyframe must be in top-k — exact
    query descriptors hit 1.0, random ones sit near chance (k/C)."""
    import numpy as np

    from sfmx.localize import retrieve

    rng = np.random.default_rng(1)
    C, Q, D = 256, 32, 16
    th = np.linspace(0, 2 * np.pi, C, endpoint=False)
    kfc = np.stack([np.cos(th), np.sin(th), 0 * th], 1).astype(np.float32)
    g = rng.standard_normal((C, D)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    qi = rng.integers(0, C, Q)
    qc = kfc[qi] + 1e-4 * rng.standard_normal((Q, 3)).astype(np.float32)
    r_exact = retrieve.strict_recall_at_k(g, kfc, np.ones(C, bool), g[qi],
                                          qc, k=8)
    assert r_exact == 1.0
    qg_rand = rng.standard_normal((Q, D)).astype(np.float32)
    qg_rand /= np.linalg.norm(qg_rand, axis=1, keepdims=True)
    r_rand = retrieve.strict_recall_at_k(g, kfc, np.ones(C, bool), qg_rand,
                                         qc, k=8)
    assert r_rand < 0.3, r_rand
