"""Fold-X conv: exactness against the naive 3-D conv."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtpose_tpu.ops.fold_conv import conv3d_fold4, conv3d_naive


@pytest.mark.parametrize("C,Co,k", [(4, 4, 3), (4, 8, 3), (8, 4, 1), (4, 4, 1)])
def test_fold4_matches_naive(C, Co, k):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 6, 16, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, k, k, C, Co)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(Co,)).astype(np.float32))
    got = conv3d_fold4(x, w, b)
    want = conv3d_naive(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_boundary_exact():
    """The folded padding must reproduce the original 1-voxel zero pad —
    check a delta at the X edge."""
    x = np.zeros((1, 3, 3, 8, 2), np.float32)
    x[0, 1, 1, 0, 0] = 1.0   # at x=0 edge
    x[0, 1, 1, 7, 1] = 1.0   # at x=max edge
    w = jnp.asarray(np.random.default_rng(1).normal(size=(3, 3, 3, 2, 3)).astype(np.float32))
    got = conv3d_fold4(jnp.asarray(x), w)
    want = conv3d_naive(jnp.asarray(x), w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 2, 4, 8, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 4)).astype(np.float32))

    g1 = jax.grad(lambda w: jnp.sum(conv3d_fold4(x, w) ** 2))(w)
    g2 = jax.grad(lambda w: jnp.sum(conv3d_naive(x, w) ** 2))(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-3)
