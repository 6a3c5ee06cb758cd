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
