"""Ring collectives + halo gather: parity with dense psum/all_gather."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from sfmx.dist import halo, mesh as meshlib


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return meshlib.make_mesh("blk")


def test_ring_all_reduce_matches_psum(mesh8, rng):
    n = 8
    x = rng.standard_normal((n, 16, 6, 6)).astype(np.float32)  # per-shard copies

    def f(xs):
        ring = halo.ring_all_reduce(xs, "blk")
        dense = jax.lax.psum(xs, "blk")
        return ring, dense

    fm = jax.jit(jax.shard_map(f, mesh=mesh8, in_specs=P("blk"),
                               out_specs=(P("blk"), P("blk"))))
    # feed shard-varying inputs: (8*16,6,6) split over shards; each shard's
    # local (16,6,6) reshaped to the (n*Cb) convention with Cb=2
    xs = jnp.asarray(x.reshape(n * 16, 6, 6))
    ring, dense = fm(xs)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_ring_reduce_scatter_owns_correct_chunk(mesh8, rng):
    n = 8
    Cb = 4
    x = rng.standard_normal((n, n * Cb, 3)).astype(np.float32)

    def f(xs):
        own = halo.ring_reduce_scatter(xs, "blk")
        return own

    fm = jax.jit(jax.shard_map(f, mesh=mesh8, in_specs=P("blk"), out_specs=P("blk")))
    out = np.asarray(fm(jnp.asarray(x.reshape(n * n * Cb, 3))))  # (n*Cb,3)
    total = x.sum(axis=0).reshape(n, Cb, 3)  # true per-chunk sums
    np.testing.assert_allclose(out.reshape(n, Cb, 3), total, rtol=1e-5, atol=1e-5)


def test_halo_gather_roundtrip(mesh8, rng):
    n = 8
    Plocal, Hcap = 10, 4
    vals = rng.standard_normal((n, Plocal, 3)).astype(np.float32)
    idx = rng.integers(0, Plocal, (n, Hcap)).astype(np.int32)
    msk = rng.random((n, Hcap)) < 0.7

    def f(v, i, m):
        g, gm = halo.halo_gather(v, i, m, "blk")
        return g, gm

    fm = jax.jit(jax.shard_map(
        f, mesh=mesh8, in_specs=(P("blk"), P("blk"), P("blk")),
        out_specs=(P("blk"), P("blk"))))
    g, gm = fm(jnp.asarray(vals.reshape(-1, 3)), jnp.asarray(idx.reshape(-1)),
               jnp.asarray(msk.reshape(-1)))
    # every shard receives the same (n,Hcap,3) boundary set -> output is it
    # tiled over shards; check shard 0's copy
    g = np.asarray(g).reshape(n, n, Hcap, 3)[0]
    gm = np.asarray(gm).reshape(n, n, Hcap)[0]
    for s in range(n):
        expect = vals[s][idx[s]] * msk[s][:, None]
        np.testing.assert_allclose(g[s], expect, atol=1e-6)
        np.testing.assert_array_equal(gm[s], msk[s])
