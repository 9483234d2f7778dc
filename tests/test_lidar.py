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


class TestDoubleFlipTTAConsumer:
    """The eval-side CONSUMER of the double-flip voxel sets (VERDICT r4 #7):
    ``core.decode.unflip_pose_preds`` + the TTA branch of
    ``engine.steps.make_eval_step``.  CenterPoint unflip semantics over this
    head's reg layout (per-joint (x, y, z) voxel-unit offsets from the
    peak's INTEGER voxel): flip the grid axis, then ``off -> 1 - off`` on
    the flipped component (continuous voxel coords map c -> N - c while
    integer voxels map k -> N - 1 - k)."""

    def _spec(self):
        from rtpose_tpu.core.targets import PoseTargetSpec
        # ranges symmetric about 0 in x and y (the double-flip TTA
        # assumption); binary-exact voxel size so c -> N - c is exact
        return PoseTargetSpec(grid_zyx=(8, 16, 32),
                              pc_range_min_xyz=(-4.0, -2.0, -1.0),
                              voxel_size_xyz=(0.25, 0.25, 0.25),
                              max_poses=1, mode="one_hm", num_classes=1)

    def _decode_spec(self):
        from rtpose_tpu.core.decode import DecodeSpec
        return DecodeSpec(grid_zyx=(8, 16, 32),
                          pc_range_min_xyz=(-4.0, -2.0, -1.0),
                          voxel_size_xyz=(0.25, 0.25, 0.25))

    def _dense_targets(self, poses):
        """Assigner targets as dense (1,Z,Y,X,1) hm + (1,Z,Y,X,45) reg."""
        from rtpose_tpu.core.targets import assign_pose_targets_np
        spec = self._spec()
        t = assign_pose_targets_np(poses[None].astype(np.float32), 1, spec)
        hm = np.transpose(t["hm"], (1, 2, 3, 0))[None]        # (1,Z,Y,X,1)
        reg = np.zeros((*spec.grid_zyx, 45), np.float32)
        reg.reshape(-1, 45)[t["ind"][0]] = t["anno_pose"][0]
        return hm, reg[None]

    def _poses(self, seed=3):
        rng = np.random.default_rng(seed)
        pelvis = np.array([0.63, 0.37, 0.12], np.float32)
        poses = pelvis + rng.uniform(-0.6, 0.6, (15, 3)).astype(np.float32)
        poses[0] = pelvis
        return poses

    def test_unflip_matches_flipped_world_targets(self):
        """Ground-truth-level exactness: assign targets for the y-/x-/double-
        flipped WORLD poses, unflip those dense maps, and the decode must
        reproduce the unflipped scene's keypoints."""
        import jax.numpy as jnp

        from rtpose_tpu.core.decode import decode_pose_preds, unflip_pose_preds

        dspec = self._decode_spec()
        poses = self._poses()
        hm0, reg0 = self._dense_targets(poses)
        k0, s0, _ = decode_pose_preds(jnp.asarray(hm0), jnp.asarray(reg0),
                                      dspec)
        # sanity: decoding the GT-targets reproduces the poses themselves
        np.testing.assert_allclose(np.asarray(k0)[0], poses, atol=1e-4)

        for fx, fy in ((False, True), (True, False), (True, True)):
            pf = poses.copy()
            if fx:
                pf[:, 0] = -pf[:, 0]
            if fy:
                pf[:, 1] = -pf[:, 1]
            hm_f, reg_f = self._dense_targets(pf)
            hm_u, reg_u = unflip_pose_preds(jnp.asarray(hm_f),
                                            jnp.asarray(reg_f), fx, fy)
            # the unflipped dense maps ARE the original scene's maps
            np.testing.assert_allclose(np.asarray(hm_u), hm0, atol=1e-5)
            ku, su, _ = decode_pose_preds(hm_u, reg_u, dspec)
            np.testing.assert_allclose(np.asarray(ku), np.asarray(k0),
                                       atol=1e-4)
            np.testing.assert_allclose(np.asarray(su), np.asarray(s0),
                                       atol=1e-5)

    def test_tta_eval_step_parity_on_equivariant_model(self):
        """End-to-end through ``make_eval_step(tta_double_flip=True)``: on a
        flip-EQUIVARIANT model (density heatmap via scatter + voxel-center
        offsets, reg = 0.5 being the unflip fixed point), the 4-way TTA
        average must decode to exactly the plain forward's keypoints."""
        import jax
        import jax.numpy as jnp

        from rtpose_tpu.core.decode import decode_pose_preds
        from rtpose_tpu.data.pipelines import Voxelization
        from rtpose_tpu.engine.steps import make_eval_step
        from rtpose_tpu.ops.voxelize import scatter_to_dense

        grid = (8, 16, 32)

        class EquivariantModel:
            def apply(self, params, vox):
                def one(feats, coors, n):
                    dens = scatter_to_dense(feats[:, :1] * 0.0 + 1.0, coors,
                                            n, grid)          # point count
                    return dens
                counts = jax.vmap(
                    lambda v, c, n: one(v.mean(1), c, n)
                )(vox["voxels"], vox["coors"], vox["num_voxels"])
                B = counts.shape[0]
                reg = jnp.full((B, *grid, 45), 0.5, jnp.float32)
                return [dict(hm=counts, reg=reg)]

        stage = Voxelization(cfg=dict(
            range=[-4.0, -2.0, -1.0, 4.0, 2.0, 1.0],
            voxel_size=[0.25, 0.25, 0.25], max_points_in_voxel=4,
            max_voxel_num=64, max_num_points=256, double_flip=True))
        rng = np.random.default_rng(11)
        # unique densest voxel: 5 points into one cell + scattered singles
        pts = rng.uniform([-3.4, -1.6, -0.8], [3.4, 1.6, 0.8],
                          (20, 3)).astype(np.float32)
        pts = (np.floor((pts - [-4, -2, -1]) / 0.25) * 0.25
               + [-4, -2, -1] + 0.1).astype(np.float32)  # off boundaries
        pts = np.concatenate([pts, np.repeat(pts[:1], 4, 0)
                              + rng.uniform(0.01, 0.05, (4, 3)).astype(np.float32) * 0.1])
        pts = np.concatenate([pts, np.ones((len(pts), 1), np.float32)], 1)
        item = stage({"points": pts, "mode": "test"})
        for key in [k for k in item if k.endswith("coordinates")]:
            item[key[: -len("coordinates")] + "coors"] = item.pop(key)
        batch = {k: jnp.asarray(np.asarray(v)[None]) for k, v in item.items()
                 if isinstance(v, np.ndarray)
                 and np.issubdtype(np.asarray(v).dtype, np.number)}

        model = EquivariantModel()
        step = make_eval_step(model, head=None, decode_spec=self._decode_spec(),
                              input_key=None, tta_double_flip=True)
        (k_tta, s_tta, l_tta), = step(None, batch)

        plain = model.apply(None, {k: batch[k] for k in
                                   ("voxels", "num_points_per_voxel",
                                    "coors", "num_voxels")})
        k0, s0, l0 = decode_pose_preds(plain[0]["hm"], plain[0]["reg"],
                                       self._decode_spec())
        np.testing.assert_allclose(np.asarray(k_tta), np.asarray(k0),
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(l_tta), np.asarray(l0))
        # scores agree through the sigmoid -> mean -> logit round trip
        np.testing.assert_allclose(np.asarray(s_tta), np.asarray(s0),
                                   atol=1e-4)
