"""Model shape/behavior tests — pinned against SURVEY.md §3.3's forward table
and the reference HRNet fuse semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtpose_tpu.ops.interpolate import resize_trilinear_align_corners, interp_matrix
from rtpose_tpu.models import (
    ResNetBlock, HRNet3D, HighResolution3DNet, MODEL_CONFIGS,
    CenterHead, RadarPoseNet, build_detector,
)

# tiny spatial size to keep CPU tests fast; channel math is what matters
TINY = (8, 16, 16)  # (Z, Y, X)


class TestInterpolate:
    def test_matrix_rows_sum_to_one(self):
        w = np.asarray(interp_matrix(5, 13))
        np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-6)

    def test_align_corners_endpoints(self):
        # align_corners maps first->first and last->last exactly
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 2, 3, 4, 2)).astype(np.float32))
        y = resize_trilinear_align_corners(x, (4, 6, 8))
        np.testing.assert_allclose(np.asarray(y)[0, 0, 0, 0], np.asarray(x)[0, 0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(y)[0, -1, -1, -1], np.asarray(x)[0, -1, -1, -1], atol=1e-6)

    def test_matches_torch_trilinear(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 3, 2, 4, 5)).astype(np.float32)  # NCDHW
        ref = F.interpolate(torch.from_numpy(x), size=(8, 16, 20),
                            mode="trilinear", align_corners=True).numpy()
        # ours: channels-last
        xcl = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))
        out = resize_trilinear_align_corners(xcl, (8, 16, 20))
        out = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_exact_2x_upsample_values(self):
        x = jnp.arange(4.0).reshape(1, 1, 1, 4, 1)
        y = resize_trilinear_align_corners(x, (1, 1, 7))
        np.testing.assert_allclose(np.asarray(y).ravel(), [0, .5, 1, 1.5, 2, 2.5, 3], atol=1e-6)


class TestBackbone:
    def test_hrnet_branch_shapes(self):
        Z, Y, X = TINY
        net = HighResolution3DNet(MODEL_CONFIGS["hr_tiny_feat32_zyx_l4_in32"])
        x = jnp.zeros((1, Z, Y, X, 32))
        params = net.init(jax.random.PRNGKey(0), x)
        feats = net.apply(params, x)
        assert len(feats) == 4
        # SURVEY §3.3: branch i is 2^i downsampled; channels [32, 32, 64, 64]
        assert feats[0].shape == (1, Z, Y, X, 32)
        assert feats[1].shape == (1, Z // 2, Y // 2, X // 2, 32)
        assert feats[2].shape == (1, Z // 4, Y // 4, X // 4, 64)
        assert feats[3].shape == (1, Z // 8, Y // 8, X // 8, 64)

    def test_wrapper_concat_conv(self):
        Z, Y, X = TINY
        net = HRNet3D(backbone_cfg="hr_tiny_feat32_zyx_l4_in32",
                      final_conv_in=192, final_conv_out=128,
                      final_fuse="conat_conv")
        x = jnp.zeros((1, Z, Y, X, 32))
        params = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(params, x)
        # concat 32+32+64+64 = 192 -> final_conv 128, full resolution
        assert out.shape == (1, Z, Y, X, 128)

    def test_wrapper_top(self):
        Z, Y, X = TINY
        net = HRNet3D(backbone_cfg="hr_tiny_feat16_zyx_l4",
                      final_conv_in=16, final_conv_out=16, final_fuse="top")
        x = jnp.zeros((1, Z, Y, X, 1))
        params = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(params, x)
        assert out.shape == (1, Z, Y, X, 16)

    def test_three_stage_config(self):
        Z, Y, X = TINY
        net = HighResolution3DNet(MODEL_CONFIGS["hr_tiny_feat32"])
        x = jnp.zeros((1, Z, Y, X, 32))
        params = net.init(jax.random.PRNGKey(0), x)
        feats = net.apply(params, x)
        assert len(feats) == 3
        assert feats[2].shape == (1, Z // 4, Y // 4, X // 4, 128)


class TestHead:
    def _head(self):
        return CenterHead(
            tasks=[dict(num_class=1, class_names=["Pelvis"])],
            in_channels=128, share_conv_channel=128,
            common_heads={"reg": (45, 2)}, weight=0.5,
            code_weights=[1.0] * 45,
        )

    def test_output_shapes_and_bias(self):
        Z, Y, X = TINY
        head = self._head()
        x = jnp.zeros((2, Z, Y, X, 128))
        params = head.init(jax.random.PRNGKey(0), x)
        preds = head.apply(params, x)
        assert len(preds) == 1
        assert preds[0]["hm"].shape == (2, Z, Y, X, 1)
        assert preds[0]["reg"].shape == (2, Z, Y, X, 45)
        # zero input + hm bias init -> logits == -2.19 (prior prob ~0.1)
        np.testing.assert_allclose(np.asarray(preds[0]["hm"]), -2.19, atol=1e-6)

    def test_loss_decreases_on_perfect_pred(self):
        Z, Y, X = TINY
        head = self._head()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, Z, Y, X, 128)).astype(np.float32))
        params = head.init(jax.random.PRNGKey(0), x)
        preds = head.apply(params, x)
        example = {
            "hm": [jnp.zeros((1, Z, Y, X, 1))],
            "anno_pose": [jnp.zeros((1, 1, 45))],
            "ind": [jnp.zeros((1, 1), jnp.int32)],
            "mask": [jnp.ones((1, 1), jnp.uint8)],
            "cat": [jnp.zeros((1, 1), jnp.int32)],
        }
        hm = np.zeros((1, Z, Y, X, 1), np.float32); hm[0, 0, 0, 0, 0] = 1.0
        example["hm"] = [jnp.asarray(hm)]
        losses = head.loss(example, preds)
        assert np.isfinite(float(losses["loss"][0]))
        assert losses["loc_loss_elem"][0].shape == (45,)


class TestDetector:
    def test_radar_pose_net_end_to_end_shapes(self):
        Z, Y, X = TINY
        model_cfg = dict(
            type="RadarPoseNet",
            reader=dict(type="RadarFeatureNet"),
            backbone=dict(type="HRNet3D", backbone_cfg="hr_tiny_feat32_zyx_l4_in32",
                          final_conv_in=192, final_conv_out=128,
                          final_fuse="conat_conv", ds_factor=1),
            pose_head=dict(type="CenterHead",
                           tasks=[dict(num_class=1, class_names=["Pelvis"])],
                           in_channels=128, share_conv_channel=128,
                           common_heads={"reg": (45, 2)}, weight=0.5,
                           code_weights=[1.0] * 45, dataset="cruw_pose",
                           dcn_head=False),
            neck=None,
        )
        model = build_detector(model_cfg)
        x = jnp.zeros((1, Z, Y, X, 32))
        params = model.init(jax.random.PRNGKey(0), x)
        preds = model.apply(params, x)
        assert preds[0]["hm"].shape == (1, Z, Y, X, 1)
        assert preds[0]["reg"].shape == (1, Z, Y, X, 45)

    def test_param_count_reasonable(self):
        # flagship model should be ~1-10M params (tiny HRNet)
        model_cfg = dict(
            type="RadarPoseNet",
            reader=dict(type="RadarFeatureNet"),
            backbone=dict(type="HRNet3D", backbone_cfg="hr_tiny_feat32_zyx_l4_in32",
                          final_conv_in=192, final_conv_out=128,
                          final_fuse="conat_conv", ds_factor=1),
            pose_head=dict(type="CenterHead",
                           tasks=[dict(num_class=1, class_names=["Pelvis"])],
                           in_channels=128, share_conv_channel=128,
                           common_heads={"reg": (45, 2)}, weight=0.5,
                           code_weights=[1.0] * 45),
            neck=None,
        )
        model = build_detector(model_cfg)
        x = jnp.zeros((1, 4, 8, 8, 32))
        params = model.init(jax.random.PRNGKey(0), x)
        n = sum(p.size for p in jax.tree.leaves(params))
        assert 1e5 < n < 2e7, n
