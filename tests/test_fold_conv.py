"""Fold-X machinery: exactness against naive conv / GroupNorm."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtpose_tpu.ops.fold_conv import (conv3d_fold4, conv3d_naive, fold_x,
                                      unfold_x, conv3d_folded,
                                      group_norm_folded)


@pytest.mark.parametrize("C,Co,k,stride", [
    (4, 4, 3, 1), (4, 8, 3, 1), (8, 4, 1, 1), (4, 4, 1, 1),
    (4, 4, 3, 2), (4, 8, 3, 2), (8, 8, 1, 2),
])
def test_fold4_matches_naive(C, Co, k, stride):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 6, 16, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, k, k, C, Co)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(Co,)).astype(np.float32))
    got = conv3d_fold4(x, w, b, stride=stride)
    want = conv3d_naive(x, w, b, stride=stride)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("C,Co,k", [(4, 4, 3), (4, 8, 3), (8, 4, 3), (4, 4, 5)])
def test_gather_matches_naive(C, Co, k):
    """conv3d_folded_gather (the production stride-1 path) must equal the
    naive conv exactly, including the zero-padding boundary."""
    from rtpose_tpu.ops.fold_conv import conv3d_folded_gather

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 4, 6, 16, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, k, k, C, Co)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(Co,)).astype(np.float32))
    got = unfold_x(conv3d_folded_gather(fold_x(x), w, b))
    want = conv3d_naive(x, w, b)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_gather_gradients_match():
    from rtpose_tpu.ops.fold_conv import conv3d_folded_gather

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(1, 2, 4, 8, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 4)).astype(np.float32))
    g1 = jax.grad(lambda w: jnp.sum(
        unfold_x(conv3d_folded_gather(fold_x(x), w)) ** 2))(w)
    g2 = jax.grad(lambda w: jnp.sum(conv3d_naive(x, w) ** 2))(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("C,Co", [(4, 4), (8, 4), (4, 8)])
def test_folded_1x1_matmul_matches_naive(C, Co):
    """The lane-wise matmul 1x1 form (x1 issued FLOPs) equals the naive
    conv bit-for-bit in f32 (same contraction, no reassociation across C)."""
    from rtpose_tpu.ops.fold_conv import conv3d_folded_1x1

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 4, 6, 16, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(1, 1, 1, C, Co)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(Co,)).astype(np.float32))
    got = unfold_x(conv3d_folded_1x1(fold_x(x), w, b))
    want = conv3d_naive(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_folded_concat_1x1_matches_concat_kernel_form():
    """conv3d_folded_concat_1x1 == conv3d_folded_concat == naive on the
    unfolded concat, for k=1 s=1 (the HRNet final fuse conv)."""
    from rtpose_tpu.ops.fold_conv import (conv3d_folded_concat,
                                          conv3d_folded_concat_1x1)

    rng = np.random.default_rng(12)
    blocks = (4, 8, 4)
    xs = [jnp.asarray(rng.normal(size=(2, 4, 6, 16, Cb)).astype(np.float32))
          for Cb in blocks]
    w = jnp.asarray(rng.normal(size=(1, 1, 1, sum(blocks), 8)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    xf_cat = jnp.concatenate([fold_x(x) for x in xs], axis=-1)
    got = unfold_x(conv3d_folded_concat_1x1(xf_cat, w, blocks, b))
    want_kernel = unfold_x(conv3d_folded_concat(xf_cat, w, blocks, b))
    want_naive = conv3d_naive(jnp.concatenate(xs, axis=-1), w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_kernel),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_naive),
                               rtol=1e-5, atol=1e-5)


def test_fold_unfold_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 2, 3, 8, 5)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(unfold_x(fold_x(x))), np.asarray(x))


def test_boundary_exact():
    x = np.zeros((1, 3, 3, 8, 2), np.float32)
    x[0, 1, 1, 0, 0] = 1.0
    x[0, 1, 1, 7, 1] = 1.0
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


@pytest.mark.parametrize("C,groups", [(16, 8), (4, 1), (32, 8)])
def test_group_norm_folded_matches_flax(C, groups):
    import flax.linen as nn
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 3, 4, 8, C)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))

    gn = nn.GroupNorm(num_groups=groups, epsilon=1e-5)
    want = gn.apply({"params": {"scale": scale, "bias": bias}}, x)

    got = unfold_x(group_norm_folded(fold_x(x), scale, bias, groups))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
