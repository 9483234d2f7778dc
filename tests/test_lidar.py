"""LiDAR branch tests: voxel readers, dense middle encoder, VoxelNet."""

import numpy as np
import jax
import jax.numpy as jnp

from rtpose_tpu.models import (VoxelFeatureExtractorV3, RPN, VoxelNet,
                               build_detector)
from rtpose_tpu.ops.voxelize import VoxelizerSpec, voxelize


class TestVFE:
    def test_mean_of_valid_points(self):
        vfe = VoxelFeatureExtractorV3()
        feats = jnp.asarray([[[1., 2.], [3., 4.], [0., 0.]],
                             [[5., 6.], [0., 0.], [0., 0.]]])
        npts = jnp.asarray([2, 1])
        params = vfe.init(jax.random.PRNGKey(0), feats, npts)
        out = vfe.apply(params, feats, npts)
        np.testing.assert_allclose(np.asarray(out), [[2., 3.], [5., 6.]])


class TestRPN:
    def test_shapes(self):
        rpn = RPN(layer_nums=(2, 2), ds_layer_strides=(1, 2),
                  ds_num_filters=(32, 64), us_layer_strides=(1, 2),
                  us_num_filters=(32, 32), num_input_features=16)
        x = jnp.zeros((1, 16, 16, 16))
        params = rpn.init(jax.random.PRNGKey(0), x)
        out = rpn.apply(params, x)
        assert out.shape == (1, 16, 16, 64)  # concat 32+32 at full res


class TestVoxelNet:
    def test_end_to_end(self):
        grid = (4, 8, 8)
        spec = VoxelizerSpec(pc_range=(0, -2, -1, 4, 2, 1),
                             voxel_size=(0.5, 0.5, 0.5),
                             max_points=4, max_voxels=32)
        assert spec.grid_size_zyx == grid

        model_cfg = dict(
            type="VoxelNet",
            reader=dict(type="VoxelFeatureExtractorV3", num_input_features=4),
            backbone=dict(type="HRNet3D", backbone_cfg="hr_tiny_feat16_zyx_l4",
                          final_conv_in=176, final_conv_out=64,
                          final_fuse="conat_conv", ds_factor=1),
            pose_head=dict(type="CenterHead",
                           tasks=[dict(num_class=1, class_names=["Pelvis"])],
                           in_channels=64, share_conv_channel=64,
                           common_heads={"reg": (45, 2)}, weight=0.5,
                           code_weights=[1.0] * 45),
            neck=None,
            grid_zyx=grid,
        )
        model = build_detector(model_cfg)

        rng = np.random.default_rng(0)
        B, N = 2, 64
        pts = rng.uniform([0, -2, -1, 0], [4, 2, 1, 1], size=(B, N, 4)).astype(np.float32)
        vox = jax.vmap(lambda p: voxelize(p, jnp.int32(N), spec))(jnp.asarray(pts))
        # VFE expects 4 input features but voxelize emits (V,P,4) -> ok
        batch = dict(voxels=vox["voxels"],
                     num_points_per_voxel=vox["num_points_per_voxel"],
                     coors=vox["coors"], num_voxels=vox["num_voxels"])
        params = model.init(jax.random.PRNGKey(0), batch)
        preds = model.apply(params, batch)
        assert preds[0]["hm"].shape == (B, *grid, 1)
        assert preds[0]["reg"].shape == (B, *grid, 45)

    def test_gradients_flow(self):
        # a gradient through voxel scatter + backbone must be finite/nonzero
        grid = (4, 8, 8)
        spec = VoxelizerSpec(pc_range=(0, -2, -1, 4, 2, 1),
                             voxel_size=(0.5, 0.5, 0.5),
                             max_points=4, max_voxels=32)
        model_cfg = dict(
            type="VoxelNet",
            reader=dict(type="VoxelFeatureExtractorV3", num_input_features=4),
            backbone=dict(type="HRNet3D", backbone_cfg="hr_tiny_feat16_zyx_l4",
                          final_conv_in=176, final_conv_out=64,
                          final_fuse="conat_conv", ds_factor=1),
            pose_head=dict(type="CenterHead",
                           tasks=[dict(num_class=1, class_names=["Pelvis"])],
                           in_channels=64, share_conv_channel=64,
                           common_heads={"reg": (45, 2)}, weight=0.5,
                           code_weights=[1.0] * 45),
            neck=None, grid_zyx=grid)
        model = build_detector(model_cfg)
        rng = np.random.default_rng(1)
        pts = rng.uniform([0, -2, -1, 0], [4, 2, 1, 1], size=(1, 32, 4)).astype(np.float32)
        vox = jax.vmap(lambda p: voxelize(p, jnp.int32(32), spec))(jnp.asarray(pts))
        batch = dict(voxels=vox["voxels"],
                     num_points_per_voxel=vox["num_points_per_voxel"],
                     coors=vox["coors"], num_voxels=vox["num_voxels"])
        params = model.init(jax.random.PRNGKey(0), batch)

        def loss(p):
            preds = model.apply(p, batch)
            return jnp.sum(preds[0]["hm"] ** 2)

        g = jax.grad(loss)(params)
        gn = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
        assert np.isfinite(gn) and gn > 0


class TestVoxelizationStage:
    """Pipeline-stage parity with the reference Voxelization
    (det3d/datasets/pipelines/pose.py:52-142): train/test max_voxels caps
    and the test-time double-flip TTA voxel sets."""

    def _cfg(self, max_voxel_num, double_flip=False):
        return dict(range=[-2.0, -2.0, -2.0, 2.0, 2.0, 2.0],
                    voxel_size=[0.5, 0.5, 0.5], max_points_in_voxel=4,
                    max_voxel_num=max_voxel_num, max_num_points=256,
                    double_flip=double_flip)

    def _points(self, n=40, seed=0):
        rng = np.random.default_rng(seed)
        pts = rng.uniform(-1.9, 1.9, size=(n, 3)).astype(np.float32)
        return np.concatenate([pts, rng.random((n, 1), dtype=np.float32)], 1)

    def test_train_test_caps(self):
        """mode='train' voxelizes under max_voxel_num[0], everything else
        under max_voxel_num[1] (pose.py:74-78)."""
        from rtpose_tpu.data.pipelines import Voxelization
        stage = Voxelization(cfg=self._cfg([8, 16]))
        tr = stage({"points": self._points(), "mode": "train"})
        te = stage({"points": self._points(), "mode": "test"})
        assert tr["voxels"].shape[0] == 8
        assert te["voxels"].shape[0] == 16
        # an int cap applies to both modes (reference [n, n] promotion)
        stage_i = Voxelization(cfg=self._cfg(12))
        assert stage_i({"points": self._points(), "mode": "train"})[
            "voxels"].shape[0] == 12
        assert stage_i({"points": self._points(), "mode": "test"})[
            "voxels"].shape[0] == 12

    def test_double_flip_sets(self):
        """Test mode + double_flip=True adds {y,x,double_flip}-flipped voxel
        sets; each matches voxelizing the manually-flipped point cloud.
        Train mode never produces them (pose.py:95)."""
        from rtpose_tpu.data.pipelines import Voxelization
        stage = Voxelization(cfg=self._cfg(32, double_flip=True))
        pts = self._points(60, seed=1)
        te = stage({"points": pts.copy(), "mode": "test"})
        for prefix, (fx, fy) in (("yflip", (False, True)),
                                 ("xflip", (True, False)),
                                 ("double_flip", (True, True))):
            assert f"{prefix}_voxels" in te
            fp = pts.copy()
            if fx:
                fp[:, 0] = -fp[:, 0]
            if fy:
                fp[:, 1] = -fp[:, 1]
            ref = stage._voxelize(fp, stage.test_spec)
            np.testing.assert_array_equal(te[f"{prefix}_coordinates"],
                                          ref["coordinates"])
            np.testing.assert_allclose(te[f"{prefix}_voxels"], ref["voxels"])
            assert int(te[f"{prefix}_num_voxels"]) == int(ref["num_voxels"])
        tr = stage({"points": pts.copy(), "mode": "train"})
        assert not any(k.startswith(("yflip", "xflip", "double_flip"))
                       for k in tr)
