"""Numeric parity tests against the ACTUAL reference implementation.

The reference (torch CPU) is imported from /root/reference via ref_shim and
compared module-by-module with this framework:

* HRNet3D backbone + CenterHead forward (all 4 experiment configs): the
  reference's randomly-initialized state_dict is imported through
  ``engine.torch_import`` and the hm/reg outputs must match in fp32.
* FastFocalLoss / RegLoss (centernet_loss.py:6-54) on random data.
* AssignLabelPose / AssignLabelPose2 target assignment (pose.py:145-541)
  against both the host (numpy) and on-device (jnp) assigners.
* 100-step OneCycle + OptimWrapper(true_wd) trajectory
  (fastai_optim.py:121-269, learning_schedules_fastai.py:77-95).

With no published reference weights and no real CRUW data, this module-level
torch parity is the strongest available proxy for the "MPJPE within 0.1 cm"
north star.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_shim import import_reference

import_reference()

import torch  # noqa: E402

from det3d.models.backbones.hrnet3d import HRNet3D as RefHRNet3D  # noqa: E402
from det3d.models.pose_heads.center_head import CenterHead as RefCenterHead  # noqa: E402
from det3d.models.losses.centernet_loss import (FastFocalLoss as RefFastFocal,  # noqa: E402
                                                RegLoss as RefRegLoss)

from rtpose_tpu.engine.torch_import import import_torch_state_dict  # noqa: E402
from rtpose_tpu.models import build_detector  # noqa: E402
from rtpose_tpu.models.hrnet3d import MODEL_CONFIGS  # noqa: E402
from rtpose_tpu.models.losses import (clamped_sigmoid, fast_focal_loss,  # noqa: E402
                                      reg_loss)

GRID = (8, 16, 32)  # small (Z, Y, X): /8 branches stay >= 1 voxel

# (name, backbone_cfg, in_ch, fuse, conv_in, conv_out, share, reg_dim, ncls)
# mirrors configs/cruw_pose/*.py model dicts (reference values).
# hr3d ('top' fuse, 15-class) and the flagship doppler config run in the
# default selection; the two structurally-equivalent big variants are @slow.
CONFIGS = [
    pytest.param("hr3d", "hr_tiny_feat32_zyx_l4", 1, "top", 32, 32, 32, 3, 15),
    pytest.param("hr3d_one_hm", "hr_tiny_feat32_zyx_l4", 1, "conat_conv",
                 192, 128, 128, 45, 1, marks=pytest.mark.slow),
    pytest.param("hr3d_one_hm_doppler", "hr_tiny_feat32_zyx_l4_in32", 32,
                 "conat_conv", 192, 128, 128, 45, 1),
    pytest.param("hr3d_one_hm_doppler_phase", "hr_tiny_feat64_zyx_l4_in64", 64,
                 "conat_conv", 384, 256, 256, 45, 1, marks=pytest.mark.slow),
]

JOINTS = ["Pelvis", "RHip", "RKnee", "RAnkle", "LHip", "LKnee", "LAnkle",
          "Torso", "Neck", "Head", "LShoulder", "LElbow", "LWrist",
          "RShoulder", "RElbow"]


def build_ref_model(backbone_cfg, fuse, conv_in, conv_out, share, reg_dim, ncls):
    torch.manual_seed(0)
    bb = RefHRNet3D(backbone_cfg=backbone_cfg, final_conv_in=conv_in,
                    final_conv_out=conv_out, final_fuse=fuse)
    head = RefCenterHead(in_channels=conv_out,
                         tasks=[dict(num_class=ncls, class_names=JOINTS[:ncls])],
                         common_heads={"reg": (reg_dim, 2)},
                         share_conv_channel=share, weight=0.5,
                         code_weights=[1.0] * reg_dim)
    bb.eval(), head.eval()
    return bb, head


def build_our_model(backbone_cfg, fuse, conv_in, conv_out, share, reg_dim, ncls):
    cfg = dict(
        type="RadarPoseNet",
        reader=dict(type="RadarFeatureNet"),
        backbone=dict(type="HRNet3D", backbone_cfg=backbone_cfg,
                      final_conv_in=conv_in, final_conv_out=conv_out,
                      final_fuse=fuse, fold_x=False),
        pose_head=dict(type="CenterHead",
                       tasks=[dict(num_class=ncls, class_names=JOINTS[:ncls])],
                       in_channels=conv_out, share_conv_channel=share,
                       common_heads={"reg": (reg_dim, 2)}, weight=0.5,
                       code_weights=[1.0] * reg_dim, fold_x=False),
        neck=None)
    return build_detector(cfg)


def randomized_state_dict(bb, head, seed=0):
    """Prefixed full-detector state dict with every tensor randomized, so a
    mapping bug cannot hide behind default-initialized (0/1) params."""
    rng = np.random.default_rng(seed)
    sd = {}
    for prefix, mod in (("backbone.", bb), ("pose_head.", head)):
        for k, v in mod.state_dict().items():
            arr = rng.normal(scale=0.2, size=tuple(v.shape)).astype(np.float32)
            sd[prefix + k] = torch.from_numpy(arr)
    # write back into the torch modules so both sides run the same weights
    bb.load_state_dict({k[len("backbone."):]: v for k, v in sd.items()
                        if k.startswith("backbone.")})
    head.load_state_dict({k[len("pose_head."):]: v for k, v in sd.items()
                          if k.startswith("pose_head.")})
    return sd


class TestForwardParity:
    @pytest.mark.parametrize("name,bb_cfg,in_ch,fuse,ci,co,share,reg_dim,ncls",
                             CONFIGS, ids=[c.values[0] for c in CONFIGS])
    def test_model_forward(self, name, bb_cfg, in_ch, fuse, ci, co, share,
                           reg_dim, ncls):
        Z, Y, X = GRID
        ref_bb, ref_head = build_ref_model(bb_cfg, fuse, ci, co, share,
                                           reg_dim, ncls)
        sd = randomized_state_dict(ref_bb, ref_head)

        model = build_our_model(bb_cfg, fuse, ci, co, share, reg_dim, ncls)
        x_cl = np.zeros((1, Z, Y, X, in_ch), np.float32)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(x_cl))
        params, report = import_torch_state_dict(
            {k: v.numpy() for k, v in sd.items()}, params,
            MODEL_CONFIGS[bb_cfg])
        assert not report["mismatched"], report["mismatched"][:5]
        assert not report["unexpected"], report["unexpected"][:5]
        assert not report["missing"], report["missing"][:5]

        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, in_ch, Z, Y, X)).astype(np.float32)
        with torch.no_grad():
            feats = ref_bb(torch.from_numpy(x))
            ref_preds, _ = ref_head(feats)
        ours = jax.jit(model.apply)(params,
                                    jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1))))

        for key in ("hm", "reg"):
            want = ref_preds[0][key].numpy()                     # (1,C,Z,Y,X)
            got = np.transpose(np.asarray(ours[0][key]), (0, 4, 1, 2, 3))
            scale = max(np.abs(want).max(), 1e-3)
            diff = np.abs(got - want).max()
            assert diff / scale < 2e-4, (name, key, diff, scale)


class TestLossParity:
    def _random_case(self, B=2, C=3, M=4, D=9, seed=0):
        Z, Y, X = 4, 6, 8
        rng = np.random.default_rng(seed)
        logits = rng.normal(scale=2.0, size=(B, Z, Y, X, C)).astype(np.float32)
        reg = rng.normal(size=(B, Z, Y, X, D)).astype(np.float32)
        # gaussian-ish target with exact 1.0 peaks at the object voxels
        target = rng.uniform(0, 0.7, size=(B, Z, Y, X, C)).astype(np.float32)
        ind = rng.integers(0, Z * Y * X, size=(B, M))
        cat = rng.integers(0, C, size=(B, M))
        mask = (rng.uniform(size=(B, M)) > 0.3).astype(np.uint8)
        anno = rng.normal(size=(B, M, D)).astype(np.float32)
        for b in range(B):
            for m in range(M):
                if mask[b, m]:
                    z, r = divmod(int(ind[b, m]), Y * X)
                    y, x = divmod(r, X)
                    target[b, z, y, x, cat[b, m]] = 1.0
        return logits, reg, target, ind, cat, mask, anno

    def test_fast_focal_loss(self):
        logits, _, target, ind, cat, mask, _ = self._random_case()
        # reference takes the CLAMPED SIGMOID probabilities (NCDHW)
        t_out = torch.sigmoid(torch.from_numpy(
            np.transpose(logits, (0, 4, 1, 2, 3)))).clamp(1e-4, 1 - 1e-4)
        ref = RefFastFocal()(t_out,
                             torch.from_numpy(np.transpose(target, (0, 4, 1, 2, 3))),
                             torch.from_numpy(ind).long(),
                             torch.from_numpy(mask),
                             torch.from_numpy(cat).long())
        ours = fast_focal_loss(clamped_sigmoid(jnp.asarray(logits)),
                               jnp.asarray(target), jnp.asarray(ind),
                               jnp.asarray(mask), jnp.asarray(cat))
        assert float(ours) == pytest.approx(float(ref), rel=1e-5)

    def test_fast_focal_loss_no_positives(self):
        logits, _, target, ind, cat, mask, _ = self._random_case(seed=3)
        mask[:] = 0
        t_out = torch.sigmoid(torch.from_numpy(
            np.transpose(logits, (0, 4, 1, 2, 3)))).clamp(1e-4, 1 - 1e-4)
        ref = RefFastFocal()(t_out,
                             torch.from_numpy(np.transpose(target, (0, 4, 1, 2, 3))),
                             torch.from_numpy(ind).long(),
                             torch.from_numpy(mask),
                             torch.from_numpy(cat).long())
        ours = fast_focal_loss(clamped_sigmoid(jnp.asarray(logits)),
                               jnp.asarray(target), jnp.asarray(ind),
                               jnp.asarray(mask), jnp.asarray(cat))
        assert float(ours) == pytest.approx(float(ref), rel=1e-5)

    def test_reg_loss(self):
        _, reg, _, ind, _, mask, anno = self._random_case(seed=1)
        ref = RefRegLoss()(torch.from_numpy(np.transpose(reg, (0, 4, 1, 2, 3))),
                           torch.from_numpy(mask),
                           torch.from_numpy(ind).long(),
                           torch.from_numpy(anno))
        ours = reg_loss(jnp.asarray(reg), jnp.asarray(mask), jnp.asarray(ind),
                        jnp.asarray(anno))
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5,
                                   atol=1e-7)


# ---------------------------------------------------------------------------
# Target assigner parity
# ---------------------------------------------------------------------------

ROI = {"z": [-1.0875, 1.8125], "y": [-1.25625, 1.25625], "x": [0.7703125, 2.2203125]}
VOXEL = [0.0453125, 0.15703125, 0.3625]   # (sx, sy, sz) for GRID (8,16,32)


def _ref_assign(cls, poses_world, grid_zyx, max_poses=2, min_radius=2):
    """Run the reference pipeline object on a synthetic (res, info) pair."""
    from det3d.datasets.pipelines import pose as ref_pose
    from ref_shim import _AttrDict

    tasks = [_AttrDict(num_class=1, class_names=["Pelvis"])]
    cfg = _AttrDict(out_size_factor=[1, 1, 1],
                    target_assigner=_AttrDict(tasks=tasks),
                    gaussian_overlap=0.1, max_poses=max_poses,
                    min_radius=min_radius)
    assigner = cls(cfg=cfg)
    Z, Y, X = grid_zyx
    res = {"rdr_cube": np.zeros((Z, Y, X), np.float32), "mode": "train",
           "hm_size": np.array([Z, Y, X]), "meta": {},
           "poses": [p.tolist() for p in poses_world]}
    info = _AttrDict.fromDict({
        "DATASET": {"ROI": {"roi1": ROI},
                    "LABEL": {"ROI_TYPE": "roi1"},
                    "RDR_CUBE": {"GRID_SIZE": VOXEL}}})
    out, _ = assigner(res, info)
    return out["rdr"]


def _our_spec(grid_zyx, mode, num_classes, max_poses=2, min_radius=2):
    from rtpose_tpu.core.targets import PoseTargetSpec
    return PoseTargetSpec(grid_zyx=grid_zyx,
                          pc_range_min_xyz=(ROI["x"][0], ROI["y"][0], ROI["z"][0]),
                          voxel_size_xyz=tuple(VOXEL),
                          max_poses=max_poses, min_radius=min_radius,
                          mode=mode, num_classes=num_classes)


def _random_poses(n, seed, out_of_range=False):
    rng = np.random.default_rng(seed)
    lo = np.array([ROI["x"][0], ROI["y"][0], ROI["z"][0]])
    hi = np.array([ROI["x"][1], ROI["y"][1], ROI["z"][1]])
    poses = rng.uniform(lo + 0.05, hi - 0.05, size=(n, 15, 3))
    if out_of_range:
        poses[0, 0] = hi + 1.0   # pelvis outside the grid -> dropped
    return poses.astype(np.float32)


class TestAssignerParity:
    @pytest.mark.parametrize("seed,oob", [(0, False), (1, False), (2, True)])
    def test_one_hm(self, seed, oob):
        from det3d.datasets.pipelines.pose import AssignLabelPose2
        from rtpose_tpu.core.targets import (assign_pose_targets,
                                             assign_pose_targets_np)

        grid = (8, 16, 32)
        poses = _random_poses(2, seed, out_of_range=oob)
        ref = _ref_assign(AssignLabelPose2, poses, grid)
        spec = _our_spec(grid, "one_hm", 1)
        ours = assign_pose_targets_np(poses, 2, spec)

        np.testing.assert_allclose(ours["hm"], ref["hm"][0], atol=1e-6)
        np.testing.assert_array_equal(ours["ind"], ref["ind"][0])
        np.testing.assert_array_equal(ours["mask"], ref["mask"][0])
        np.testing.assert_array_equal(ours["cat"], ref["cat"][0])
        np.testing.assert_allclose(ours["anno_pose"], ref["anno_pose"][0],
                                   atol=1e-5)

        dev = jax.jit(lambda p, n: assign_pose_targets(p, n, spec))(
            jnp.asarray(poses), jnp.asarray(2))
        np.testing.assert_allclose(np.asarray(dev["hm"]), ref["hm"][0], atol=1e-5)
        np.testing.assert_array_equal(np.asarray(dev["ind"]), ref["ind"][0])
        np.testing.assert_array_equal(np.asarray(dev["mask"]), ref["mask"][0])
        np.testing.assert_allclose(np.asarray(dev["anno_pose"]),
                                   ref["anno_pose"][0], atol=1e-5)

    def test_per_joint(self):
        from det3d.datasets.pipelines.pose import AssignLabelPose
        from rtpose_tpu.core.targets import (assign_pose_targets,
                                             assign_pose_targets_np)
        from ref_shim import _AttrDict

        grid = (8, 16, 32)
        poses = _random_poses(1, 4)

        # reference per-joint: one task with 15 classes
        from det3d.datasets.pipelines import pose as ref_pose
        tasks = [_AttrDict(num_class=15, class_names=JOINTS)]
        cfg = _AttrDict(out_size_factor=[1, 1, 1],
                        target_assigner=_AttrDict(tasks=tasks),
                        gaussian_overlap=0.1, max_poses=1, min_radius=1)
        assigner = AssignLabelPose(cfg=cfg)
        Z, Y, X = grid
        res = {"rdr_cube": np.zeros((Z, Y, X), np.float32), "mode": "train",
               "hm_size": np.array([Z, Y, X]), "meta": {},
               "poses": [poses[0].tolist()]}
        info = _AttrDict.fromDict({
            "DATASET": {"ROI": {"roi1": ROI},
                        "LABEL": {"ROI_TYPE": "roi1"},
                        "RDR_CUBE": {"GRID_SIZE": VOXEL}}})
        ref, _ = assigner(res, info)
        ref = ref["rdr"]

        spec = _our_spec(grid, "per_joint", 15, max_poses=1, min_radius=1)
        ours = assign_pose_targets_np(poses, 1, spec)
        np.testing.assert_allclose(ours["hm"], ref["hm"][0], atol=1e-6)
        np.testing.assert_array_equal(ours["ind"], ref["ind"][0])
        np.testing.assert_array_equal(ours["mask"], ref["mask"][0])
        np.testing.assert_array_equal(ours["cat"], ref["cat"][0])
        np.testing.assert_allclose(ours["anno_pose"], ref["anno_pose"][0],
                                   atol=1e-5)

        dev = jax.jit(lambda p, n: assign_pose_targets(p, n, spec))(
            jnp.asarray(poses), jnp.asarray(1))
        np.testing.assert_allclose(np.asarray(dev["hm"]), ref["hm"][0], atol=1e-5)
        np.testing.assert_array_equal(np.asarray(dev["cat"]), ref["cat"][0])


# ---------------------------------------------------------------------------
# Optimizer trajectory parity
# ---------------------------------------------------------------------------

class TestOptimizerTrajectory:
    def _torch_trajectory(self, w0, xs, ys, steps, lr_max, wd, clip=None):
        """Reference loop: OptimWrapper(true_wd) + OneCycle + optional
        clip_grad_norm (hooks/optimizer.py:14-24)."""
        from functools import partial

        from det3d.solver.fastai_optim import OptimWrapper
        from det3d.solver.learning_schedules_fastai import OneCycle
        from det3d.torchie.apis.train import get_layer_groups

        model = torch.nn.Linear(w0.shape[1], w0.shape[0], bias=False)
        with torch.no_grad():
            model.weight.copy_(torch.from_numpy(w0))
        opt = OptimWrapper.create(
            partial(torch.optim.Adam, betas=(0.9, 0.99), amsgrad=False),
            3e-3, get_layer_groups(model), wd=wd, true_wd=True, bn_wd=True)
        sched = OneCycle(opt, steps, lr_max, [0.95, 0.85], 10.0, 0.4)
        tx, ty = torch.from_numpy(xs), torch.from_numpy(ys)
        traj = []
        for s in range(steps):
            sched.step(s)
            opt.zero_grad()
            loss = 0.5 * ((model(tx) - ty) ** 2).sum()
            loss.backward()
            if clip is not None:
                torch.nn.utils.clip_grad_norm_(model.parameters(), clip)
            opt.step()
            traj.append(model.weight.detach().numpy().copy())
        return np.stack(traj)

    def _jax_trajectory(self, w0, xs, ys, steps, lr_max, wd, clip=None):
        from rtpose_tpu.solver import adam_one_cycle, make_one_cycle_fns

        lr_fn, mom_fn = make_one_cycle_fns(steps, lr_max)
        opt = adam_one_cycle(lr_fn, mom_fn, beta2=0.99, weight_decay=wd,
                             grad_clip_norm=clip, fixed_wd=True)
        params = {"w": jnp.asarray(w0)}
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            def loss_fn(p):
                return 0.5 * jnp.sum(
                    (jnp.asarray(xs) @ p["w"].T - jnp.asarray(ys)) ** 2)
            grads = jax.grad(loss_fn)(params)
            import optax
            updates, state2 = opt.update(grads, state, params)
            return optax.apply_updates(params, updates), state2

        traj = []
        for _ in range(steps):
            params, state = step(params, state)
            traj.append(np.asarray(params["w"]))
        return np.stack(traj)

    @pytest.mark.parametrize("clip", [None, 0.5], ids=["noclip", "clip"])
    def test_100_step_trajectory(self, clip):
        rng = np.random.default_rng(0)
        w0 = rng.normal(size=(2, 4)).astype(np.float32)
        xs = rng.normal(size=(8, 4)).astype(np.float32)
        ys = rng.normal(size=(8, 2)).astype(np.float32)
        steps, lr_max, wd = 100, 2e-3, 0.01

        ref = self._torch_trajectory(w0, xs, ys, steps, lr_max, wd, clip)
        ours = self._jax_trajectory(w0, xs, ys, steps, lr_max, wd, clip)
        # f32 accumulation over 100 steps: allow 1e-5 absolute drift
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)
