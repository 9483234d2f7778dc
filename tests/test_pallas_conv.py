"""Pallas fused folded-conv kernel: interpret-mode exactness vs the XLA
gather formulation (forward + custom_vjp gradients)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from rtpose_tpu.ops import pallas_conv
from rtpose_tpu.ops.fold_conv import FOLD, conv3d_folded_gather


def _case(B=2, Z=4, Y=8, Xf=8, C=32, Co=32, seed=0):
    rng = np.random.default_rng(seed)
    xf = jnp.asarray(rng.normal(size=(B, Z, Y, Xf, FOLD * C))
                     .astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C, Co))
                    .astype(np.float32)).astype(jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(Co,)).astype(np.float32))
    return xf, w, b


class TestPallasConvForward:
    def test_supported_shape_detection(self):
        xf, w, b = _case()
        assert pallas_conv._supported(xf, w)
        assert not pallas_conv._supported(xf.astype(jnp.float32), w)
        assert not pallas_conv._supported(
            xf, jnp.zeros((1, 1, 1, 32, 32), jnp.bfloat16))
        # Xf not a multiple of 8: sublane offsets would diverge
        assert not pallas_conv._supported(xf[:, :, :, :6], w)

    def test_forward_matches_gather(self):
        xf, w, b = _case()
        want = np.asarray(conv3d_folded_gather(xf, w, b), np.float32)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                pallas_conv.conv3d_folded_gather_fast(xf, w, b), np.float32)
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, atol=2e-3 * scale)

    def test_fallback_identity_for_unsupported(self):
        xf, w, b = _case(C=32, Co=32)
        w16 = jnp.zeros((3, 3, 3, 16, 32), jnp.bfloat16)
        xf16 = xf[..., :64]
        out = pallas_conv.conv3d_folded_gather_fast(xf16, w16, None)
        want = conv3d_folded_gather(xf16, w16, None)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


class TestPallasConvBackward:
    def test_gradients_match_autodiff_of_gather(self):
        xf, w, _ = _case(seed=1)
        ct = jnp.asarray(
            np.random.default_rng(2).normal(
                size=(2, 4, 8, 8, 128)).astype(np.float32)).astype(jnp.bfloat16)

        def loss_ref(x_, w_):
            return (conv3d_folded_gather(x_, w_).astype(jnp.float32)
                    * ct.astype(jnp.float32)).sum()

        gx_ref, gw_ref = jax.grad(loss_ref, (0, 1))(xf, w)

        with pltpu.force_tpu_interpret_mode():
            def loss_p(x_, w_):
                return (pallas_conv._fused(x_, w_).astype(jnp.float32)
                        * ct.astype(jnp.float32)).sum()
            gx_p, gw_p = jax.grad(loss_p, (0, 1))(xf, w)

        # gw rides the identical XLA linear-transpose path -> exact
        np.testing.assert_array_equal(np.asarray(gw_p), np.asarray(gw_ref))
        sx = np.abs(np.asarray(gx_ref, np.float32)).max()
        np.testing.assert_allclose(np.asarray(gx_p, np.float32),
                                   np.asarray(gx_ref, np.float32),
                                   atol=5e-3 * sx)

    def test_grad_input_conv_identity(self):
        """grad-input of the stride-1 conv == conv with flipped/transposed
        weights (the identity the backward relies on), checked in f32."""
        rng = np.random.default_rng(3)
        xf = jnp.asarray(rng.normal(size=(1, 3, 6, 4, 128)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 3, 32, 32)).astype(np.float32))
        ct = jnp.asarray(rng.normal(size=(1, 3, 6, 4, 128)).astype(np.float32))

        def loss(x_):
            return (conv3d_folded_gather(x_, w) * ct).sum()

        gx_auto = jax.grad(loss)(xf)
        gx_manual = conv3d_folded_gather(ct, pallas_conv._flip_transpose(w))
        np.testing.assert_allclose(np.asarray(gx_manual), np.asarray(gx_auto),
                                   rtol=2e-4, atol=2e-4)
