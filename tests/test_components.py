"""Tests for the secondary component surface: grid sample, polar->cart,
BEV second stage, RoI head, box geometry, JDE loss, utils, wrappers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtpose_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d
from rtpose_tpu.models import (PolarToCart, BEVFeatureExtractor, RoIHead,
                               assign_roi_targets, jde_embedding_loss)
from rtpose_tpu.core.boxes import (box_corners_3d, points_in_box, iou_aligned,
                                   mask_boxes_outside_range, limit_period,
                                   camera_to_lidar, lidar_to_camera)
from rtpose_tpu.utils import Timer, ProgressBar, count_parameters, estimate_flops
from rtpose_tpu.utils.freeze import split_frozen


class TestGridSample:
    def test_matches_torch_2d(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 3, 5, 7)).astype(np.float32)     # NCHW
        grid = (rng.random((1, 4, 6, 2)).astype(np.float32) * 2 - 1)
        want = F.grid_sample(torch.from_numpy(x), torch.from_numpy(grid),
                             mode="bilinear", align_corners=False,
                             padding_mode="zeros").numpy()
        got = grid_sample_2d(jnp.asarray(np.transpose(x[0], (1, 2, 0))),
                             jnp.asarray(grid[0]))
        np.testing.assert_allclose(np.transpose(np.asarray(got), (2, 0, 1)),
                                   want[0], atol=1e-5)

    def test_matches_torch_3d(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 2, 4, 5, 6)).astype(np.float32)  # NCDHW
        grid = (rng.random((1, 3, 4, 5, 3)).astype(np.float32) * 2 - 1)
        want = F.grid_sample(torch.from_numpy(x), torch.from_numpy(grid),
                             mode="bilinear", align_corners=False).numpy()
        got = grid_sample_3d(jnp.asarray(np.transpose(x[0], (1, 2, 3, 0))),
                             jnp.asarray(grid[0]))
        np.testing.assert_allclose(np.transpose(np.asarray(got), (3, 0, 1, 2)),
                                   want[0], atol=1e-5)


class TestPolarToCart:
    def test_shapes_2d(self):
        m = PolarToCart(cart_roi={"z": [0, 1], "y": [-2, 2], "x": [0, 4]},
                        voxel_size=0.5, polar_range=(0, 5, -60, 60, -20, 20),
                        dimension="2")
        x = jnp.ones((2, 10, 12, 3))  # (B, A, R, C) polar
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        assert out.shape == (2, 8, 8, 3)  # y: 8 cells, x: 8 cells

    def test_shapes_3d(self):
        m = PolarToCart(cart_roi={"z": [0, 1], "y": [-1, 1], "x": [0, 2]},
                        voxel_size=0.5, polar_range=(0, 3, -60, 60, -20, 20),
                        dimension="3")
        x = jnp.ones((1, 4, 10, 12, 2))
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        assert out.shape == (1, 2, 4, 4, 2)


class TestBEV:
    def test_center_sampling(self):
        m = BEVFeatureExtractor(pc_start=(0.0, 0.0), voxel_size=(1.0, 1.0),
                                out_stride=1)
        feat = jnp.arange(16.0).reshape(1, 4, 4, 1)
        centers = jnp.asarray([[[1.0, 2.0], [0.0, 0.0]]])  # world (x, y)
        params = m.init(jax.random.PRNGKey(0), feat, centers)
        out = m.apply(params, feat, centers)
        # feature at (x=1, y=2) = row 2, col 1 = 9
        assert float(out[0, 0, 0]) == pytest.approx(9.0)
        assert float(out[0, 1, 0]) == pytest.approx(0.0)


class TestRoIHead:
    def test_forward_shapes(self):
        m = RoIHead(input_channels=32, shared_fc=(64,), cls_fc=(64,),
                    reg_fc=(64,), num_class=1, code_size=7)
        feats = jnp.zeros((2, 8, 32))
        params = m.init(jax.random.PRNGKey(0), feats)
        out = m.apply(params, feats)
        assert out["rcnn_cls"].shape == (2, 8, 1)
        assert out["rcnn_reg"].shape == (2, 8, 7)

    def test_target_assignment(self):
        rois = jnp.asarray([[0, 0, 0, 2, 2, 2, 0.0],
                            [10, 10, 0, 2, 2, 2, 0.0],
                            [0.2, 0, 0, 2, 2, 2, 0.0]])
        gt = jnp.asarray([[0, 0, 0, 2, 2, 2, 0.0]])
        t = assign_roi_targets(rois, jnp.ones(3), gt, jnp.int32(1))
        assert int(t["labels"][0]) == 1      # perfect match -> fg
        assert int(t["labels"][1]) == 0      # disjoint -> bg
        assert float(t["max_iou"][0]) == pytest.approx(1.0, abs=1e-5)


class TestBoxes:
    def test_corners_axis_aligned(self):
        b = jnp.asarray([[1.0, 2.0, 3.0, 2.0, 4.0, 6.0, 0.0]])
        c = np.asarray(box_corners_3d(b))[0]
        assert c[:, 0].min() == pytest.approx(0.0)
        assert c[:, 0].max() == pytest.approx(2.0)
        assert c[:, 1].min() == pytest.approx(0.0)
        assert c[:, 2].max() == pytest.approx(6.0)

    def test_points_in_rotated_box(self):
        box = jnp.asarray([0, 0, 0, 2, 1, 2, np.pi / 2])  # rotated 90deg
        pts = jnp.asarray([[0.0, 0.9, 0.0],   # inside after rotation (dy<->dx)
                           [0.9, 0.0, 0.0]])  # outside (x extent now 0.5)
        inside = np.asarray(points_in_box(pts, box))
        assert inside.tolist() == [True, False]

    def test_iou_aligned(self):
        a = jnp.asarray([[0, 0, 2, 2.0]])
        b = jnp.asarray([[1, 1, 3, 3.0]])
        assert float(iou_aligned(a, b)[0, 0]) == pytest.approx(1 / 7, abs=1e-6)

    def test_limit_period(self):
        v = limit_period(jnp.asarray([0.75 * np.pi]))
        assert float(v[0]) == pytest.approx(-0.25 * np.pi, abs=1e-6)

    def test_camera_lidar_roundtrip(self):
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
        r = jnp.eye(4); v = jnp.eye(4).at[0, 3].set(1.5)
        back = camera_to_lidar(lidar_to_camera(pts, r, v), r, v)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)

    def test_range_mask(self):
        boxes = jnp.asarray([[0, 0, 0, 1, 1, 1, 0.0], [9, 9, 9, 1, 1, 1, 0.0]])
        m = mask_boxes_outside_range(boxes, [-1, -1, -1, 5, 5, 5])
        assert np.asarray(m).tolist() == [True, False]


class TestJDE:
    def test_separable_embeddings_zero_loss(self):
        e = jnp.asarray([[1, 0], [1, 0], [0, 1], [0, 1.0]])
        ids = jnp.asarray([0, 0, 1, 1])
        loss = jde_embedding_loss(e, ids, jnp.ones(4), margin=0.3)
        assert float(loss) == pytest.approx(0.0)

    def test_collapsed_embeddings_margin_loss(self):
        e = jnp.ones((4, 2))
        ids = jnp.asarray([0, 0, 1, 1])
        loss = jde_embedding_loss(e, ids, jnp.ones(4), margin=0.3)
        assert float(loss) == pytest.approx(0.3, abs=1e-6)

    def test_masked_entries_ignored(self):
        e = jnp.asarray([[1, 0], [1, 0], [0, 1], [5, 5.0]])
        ids = jnp.asarray([0, 0, 1, 1])
        loss = jde_embedding_loss(e, ids, jnp.asarray([1, 1, 1, 0]), margin=0.3)
        assert np.isfinite(float(loss))


class TestUtils:
    def test_count_parameters(self):
        p = {"a": jnp.zeros((3, 4)), "b": {"c": jnp.zeros(5)}}
        assert count_parameters(p) == 17

    def test_estimate_flops_matmul(self):
        f = lambda a, b: a @ b
        a = jnp.zeros((64, 64)); b = jnp.zeros((64, 64))
        flops = estimate_flops(f, a, b)
        if flops is not None:
            assert flops == pytest.approx(2 * 64 ** 3, rel=0.5)

    def test_timer(self):
        t = Timer()
        assert t.since_start() >= 0

    def test_progressbar(self):
        import io
        buf = io.StringIO()
        bar = ProgressBar(task_num=2, file=buf)
        bar.update(); bar.update()
        assert "2/2" in buf.getvalue()

    def test_freeze(self):
        import optax
        params = {"backbone_m": {"w": jnp.ones(3)}, "head_m": {"w": jnp.ones(3)}}
        opt = split_frozen(optax.sgd(1.0), params, ["backbone_m"])
        state = opt.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = opt.update(grads, state, params)
        assert float(jnp.abs(updates["backbone_m"]["w"]).sum()) == 0
        assert float(jnp.abs(updates["head_m"]["w"]).sum()) > 0


class TestWrappers:
    def test_concat_repeat(self):
        class Tiny:
            def __init__(self, n, base): self.n, self.base = n, base
            def __len__(self): return self.n
            def __getitem__(self, i): return self.base + i
        from rtpose_tpu.data.wrappers import ConcatDataset, RepeatDataset
        cat = ConcatDataset([Tiny(3, 0), Tiny(2, 100)])
        assert len(cat) == 5
        assert cat[3] == 100
        rep = RepeatDataset(Tiny(3, 0), times=3)
        assert len(rep) == 9
        assert rep[7] == 1


class TestDistillation:
    def test_forward_and_loss(self):
        import jax
        import jax.numpy as jnp
        from rtpose_tpu.models import build_detector
        from rtpose_tpu.ops.voxelize import VoxelizerSpec, voxelize
        import numpy as np

        grid = (4, 8, 8)
        head = dict(type="CenterHead",
                    tasks=[dict(num_class=1, class_names=["Pelvis"])],
                    in_channels=64, share_conv_channel=64,
                    common_heads={"reg": (45, 2)}, weight=0.5,
                    code_weights=[1.0] * 45)
        backbone = dict(type="HRNet3D", backbone_cfg="hr_tiny_feat16_zyx_l4",
                        final_conv_in=176, final_conv_out=64,
                        final_fuse="conat_conv")
        cfg = dict(
            type="Distillation",
            student=dict(type="RadarPoseNet",
                         reader=dict(type="RadarFeatureNet"),
                         backbone=dict(backbone), pose_head=dict(head),
                         neck=None),
            teacher=dict(type="VoxelNet",
                         reader=dict(type="VoxelFeatureExtractorV3",
                                     num_input_features=4),
                         backbone=dict(backbone), pose_head=dict(head),
                         neck=None, grid_zyx=grid),
        )
        model = build_detector(cfg)
        rng = np.random.default_rng(0)
        radar = {"rdr_tensor": jnp.asarray(
            rng.normal(size=(1, *grid, 1)).astype(np.float32))}
        spec = VoxelizerSpec(pc_range=(0, -2, -1, 4, 2, 1),
                             voxel_size=(0.5, 0.5, 0.5), max_points=4,
                             max_voxels=16)
        pts = rng.uniform([0, -2, -1, 0], [4, 2, 1, 1], size=(1, 32, 4)).astype(np.float32)
        vox = jax.vmap(lambda p: voxelize(p, jnp.int32(32), spec))(jnp.asarray(pts))
        lidar = dict(voxels=vox["voxels"],
                     num_points_per_voxel=vox["num_points_per_voxel"],
                     coors=vox["coors"], num_voxels=vox["num_voxels"])
        params = model.init(jax.random.PRNGKey(0), radar, lidar)
        s_preds, t_preds, s_feat, t_feat = model.apply(params, radar, lidar)
        assert s_preds[0]["hm"].shape == t_preds[0]["hm"].shape

        loss = model.apply(params, s_preds, t_preds, s_feat, t_feat,
                           method="distill_loss")
        assert np.isfinite(float(loss))


class TestConfigTool:
    def test_downsample_factor(self):
        from rtpose_tpu.utils.config_tool import get_downsample_factor
        cfg = dict(neck=dict(ds_layer_strides=[2, 2, 2],
                             us_layer_strides=[1, 2, 4]),
                   backbone=dict(ds_factor=1))
        assert get_downsample_factor(cfg) == 2
        assert get_downsample_factor(dict(neck=None,
                                          backbone=dict(ds_factor=1))) == 1
