"""Deformable conv tests: zero-offset equivalence with standard conv,
known shifted sampling, masking, gradients, and the DCN head path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtpose_tpu.ops.deform_conv import deform_conv2d


def std_conv(x, w, padding=1, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class TestDeformConv:
    def test_zero_offsets_equal_standard_conv(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 8, 10, 6)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 6, 4)).astype(np.float32))
        off = jnp.zeros((2, 8, 10, 1 * 9 * 2))
        got = deform_conv2d(x, off, w, padding=1, deformable_groups=1)
        want = std_conv(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_integer_shift_offsets(self):
        """Offsets of exactly (+1, 0) everywhere == conv over shifted input."""
        rng = np.random.default_rng(1)
        x = np.zeros((1, 8, 8, 1), np.float32)
        x[0, :, :, 0] = rng.normal(size=(8, 8))
        w = jnp.asarray(rng.normal(size=(3, 3, 1, 2)).astype(np.float32))
        off = np.zeros((1, 8, 8, 18), np.float32)
        off[..., 0::2] = 1.0  # dy = +1 for every tap
        got = deform_conv2d(jnp.asarray(x), jnp.asarray(off), w, padding=1)
        # identity: out[y] == standard conv evaluated one row below
        want = std_conv(jnp.asarray(x), w)
        np.testing.assert_allclose(np.asarray(got)[0, :7], np.asarray(want)[0, 1:],
                                   rtol=1e-4, atol=1e-5)

    def test_fractional_offset_bilinear(self):
        """1x1 'conv' with a 0.5 offset == average of two neighbors."""
        x = np.zeros((1, 4, 4, 1), np.float32)
        x[0, 1, 1, 0] = 2.0
        x[0, 2, 1, 0] = 4.0
        w = jnp.ones((1, 1, 1, 1), jnp.float32)
        off = np.zeros((1, 4, 4, 2), np.float32)
        off[..., 0] = 0.5  # dy = 0.5
        got = deform_conv2d(jnp.asarray(x), jnp.asarray(off), w, padding=0)
        assert float(got[0, 1, 1, 0]) == pytest.approx(3.0, abs=1e-5)

    def test_mask_modulation(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(1, 6, 6, 4)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 4, 3)).astype(np.float32))
        off = jnp.zeros((1, 6, 6, 18))
        mask_half = jnp.full((1, 6, 6, 9), 0.5)
        got_half = deform_conv2d(x, off, w, mask=mask_half)
        got_full = deform_conv2d(x, off, w, mask=jnp.ones((1, 6, 6, 9)))
        np.testing.assert_allclose(np.asarray(got_half), np.asarray(got_full) / 2,
                                   rtol=1e-4, atol=1e-5)

    def test_gradients_flow_to_offsets(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(1, 6, 6, 2)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 2, 2)).astype(np.float32))
        off0 = jnp.full((1, 6, 6, 18), 0.3)

        def f(off):
            return jnp.sum(deform_conv2d(x, off, w) ** 2)

        g = jax.grad(f)(off0)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    def test_deformable_groups(self):
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(1, 6, 6, 8)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 8, 4)).astype(np.float32))
        off = jnp.zeros((1, 6, 6, 4 * 9 * 2))
        got = deform_conv2d(x, off, w, deformable_groups=4)
        want = std_conv(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


class TestDCNHead:
    def test_center_head_with_dcn(self):
        from rtpose_tpu.models import CenterHead
        head = CenterHead(
            tasks=[dict(num_class=1, class_names=["Pelvis"])],
            in_channels=32, share_conv_channel=32,
            common_heads={"reg": (45, 2)}, weight=0.5,
            code_weights=[1.0] * 45, dcn_head=True)
        x = jnp.zeros((1, 2, 8, 8, 32))
        params = head.init(jax.random.PRNGKey(0), x)
        preds = head.apply(params, x)
        assert preds[0]["hm"].shape == (1, 2, 8, 8, 1)
        assert preds[0]["reg"].shape == (1, 2, 8, 8, 45)
        # offset conv zero-init -> hm bias visible at init
        np.testing.assert_allclose(np.asarray(preds[0]["hm"]), -2.19, atol=1e-4)
