"""END-TO-END training-trajectory parity against the torch reference.

The module-level parity suite (test_reference_parity.py) pins forward, loss,
assigner and optimizer EACH in isolation.  This test composes the whole
thing: N full train steps — target assignment -> forward -> combined
hm+reg loss -> backward -> grad-clip -> OptimWrapper(true_wd)+OneCycle —
run in the ACTUAL reference (torch CPU: trainer hot loop of
``det3d/torchie/trainer/trainer.py:370-434`` + ``hooks/optimizer.py:14-24``)
and in our fused jitted step (``engine/steps.make_train_step``), from the
same initial weights on the same batches.  Per-step losses and the final
parameters must track, which closes the remaining composition gap: any
mismatch in loss weighting, gradient flow, wd-vs-norm-layer treatment or
schedule stepping shows up here even if every module matches alone.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_shim import import_reference

import_reference()

import torch  # noqa: E402

from test_reference_parity import (JOINTS, ROI, VOXEL, build_our_model,  # noqa: E402
                                   build_ref_model, randomized_state_dict)

from rtpose_tpu.core.targets import PoseTargetSpec  # noqa: E402
from rtpose_tpu.engine import TrainState, make_train_step  # noqa: E402
from rtpose_tpu.engine.torch_import import import_torch_state_dict  # noqa: E402
from rtpose_tpu.models import CenterHead  # noqa: E402
from rtpose_tpu.models.hrnet3d import MODEL_CONFIGS  # noqa: E402
from rtpose_tpu.solver import adam_one_cycle, make_one_cycle_fns  # noqa: E402

GRID = (8, 16, 32)
B, STEPS = 2, 5
LR_MAX, WD, CLIP = 2e-3, 0.01, 35.0
# the per-joint 'top'-fuse variant (configs/cruw_pose/hr3d.py): cheapest of
# the four experiment configs, and the only one whose 15-class per-joint
# assignment path is otherwise never composed with the optimizer
BB_CFG, IN_CH, FUSE, CI, CO, SHARE, REG_DIM, NCLS = (
    "hr_tiny_feat32_zyx_l4", 1, "top", 32, 32, 32, 3, 15)


def _batches(seed=0):
    """STEPS batches of (cube, poses, num_poses); poses strictly inside ROI."""
    rng = np.random.default_rng(seed)
    Z, Y, X = GRID
    lo = np.array([ROI["x"][0], ROI["y"][0], ROI["z"][0]])
    hi = np.array([ROI["x"][1], ROI["y"][1], ROI["z"][1]])
    out = []
    for _ in range(STEPS):
        x = rng.normal(size=(B, IN_CH, Z, Y, X)).astype(np.float32)
        poses = rng.uniform(lo + 0.05, hi - 0.05,
                            size=(B, 2, 15, 3)).astype(np.float32)
        # the reference's AssignLabelPose indexes min(len*15, max_poses*15)
        # entries (pose.py:218-221) and so CRASHES unless every sample
        # carries exactly max_poses poses — keep both samples at 2
        nposes = np.array([2, 2], np.int32)
        out.append((x, poses, nposes))
    return out


def _ref_example(poses, nposes):
    """Batch targets through the reference AssignLabelPose (pose.py:145-344)."""
    from det3d.datasets.pipelines.pose import AssignLabelPose
    from ref_shim import _AttrDict

    tasks = [_AttrDict(num_class=NCLS, class_names=JOINTS)]
    cfg = _AttrDict(out_size_factor=[1, 1, 1],
                    target_assigner=_AttrDict(tasks=tasks),
                    gaussian_overlap=0.1, max_poses=2, min_radius=2)
    assigner = AssignLabelPose(cfg=cfg)
    info = _AttrDict.fromDict({
        "DATASET": {"ROI": {"roi1": ROI},
                    "LABEL": {"ROI_TYPE": "roi1"},
                    "RDR_CUBE": {"GRID_SIZE": VOXEL}}})
    Z, Y, X = GRID
    acc = {k: [] for k in ("hm", "ind", "mask", "cat", "anno_pose")}
    for b in range(poses.shape[0]):
        res = {"rdr_cube": np.zeros((Z, Y, X), np.float32), "mode": "train",
               "hm_size": np.array([Z, Y, X]), "meta": {},
               "poses": [poses[b, i].tolist() for i in range(int(nposes[b]))]}
        out, _ = assigner(res, info)
        for k in acc:
            acc[k].append(out["rdr"][k][0])
    to_t = {"hm": torch.float32, "ind": torch.int64, "mask": torch.uint8,
            "cat": torch.int64, "anno_pose": torch.float32}
    return {k: [torch.from_numpy(np.stack(v)).to(to_t[k])]
            for k, v in acc.items()}


def _torch_trajectory(sd, batches):
    """The reference train loop on the full model."""
    from functools import partial

    from det3d.solver.fastai_optim import OptimWrapper
    from det3d.solver.learning_schedules_fastai import OneCycle
    from det3d.torchie.apis.train import get_layer_groups

    bb, head = build_ref_model(BB_CFG, FUSE, CI, CO, SHARE, REG_DIM, NCLS)
    bb.load_state_dict({k[len("backbone."):]: v for k, v in sd.items()
                        if k.startswith("backbone.")})
    head.load_state_dict({k[len("pose_head."):]: v for k, v in sd.items()
                          if k.startswith("pose_head.")})
    model = torch.nn.ModuleDict({"backbone": bb, "pose_head": head})
    model.train()
    opt = OptimWrapper.create(
        partial(torch.optim.Adam, betas=(0.9, 0.99), amsgrad=False),
        3e-3, get_layer_groups(model), wd=WD, true_wd=True, bn_wd=True)
    sched = OneCycle(opt, STEPS, LR_MAX, [0.95, 0.85], 10.0, 0.4)

    losses = []
    for s, (x, poses, nposes) in enumerate(batches):
        example = _ref_example(poses, nposes)
        sched.step(s)
        opt.zero_grad()
        preds, _ = head(bb(torch.from_numpy(x)))
        ldict = head.loss(example, preds, None)
        loss = sum(ldict["loss"])
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
        opt.step()
        losses.append((float(loss), float(ldict["hm_loss"][0]),
                       float(ldict["loc_loss"][0])))
    final = {f"{m}.{k}": v.detach().numpy().copy()
             for m in ("backbone", "pose_head")
             for k, v in model[m].state_dict().items()}
    return losses, final


def _jax_trajectory(sd, batches):
    """Our fused step (assigner + forward + loss + clip + adam in one jit)."""
    model = build_our_model(BB_CFG, FUSE, CI, CO, SHARE, REG_DIM, NCLS)
    head = CenterHead(tasks=[dict(num_class=NCLS, class_names=JOINTS)],
                      in_channels=CO, share_conv_channel=SHARE,
                      common_heads={"reg": (REG_DIM, 2)}, weight=0.5,
                      code_weights=[1.0] * REG_DIM, fold_x=False,
                      focal_form="clamped")
    spec = PoseTargetSpec(
        grid_zyx=GRID,
        pc_range_min_xyz=(ROI["x"][0], ROI["y"][0], ROI["z"][0]),
        voxel_size_xyz=tuple(VOXEL), max_poses=2, min_radius=2,
        mode="per_joint", num_classes=NCLS)

    x0 = np.transpose(batches[0][0], (0, 2, 3, 4, 1))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x0))
    params, report = import_torch_state_dict(
        {k: v.numpy() for k, v in sd.items()}, params, MODEL_CONFIGS[BB_CFG])
    assert not (report["mismatched"] or report["missing"]), report

    lr_fn, mom_fn = make_one_cycle_fns(STEPS, LR_MAX)
    opt = adam_one_cycle(lr_fn, mom_fn, beta2=0.99, weight_decay=WD,
                         grad_clip_norm=CLIP, fixed_wd=True)
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(model, head, spec, opt, lr_fn=lr_fn))

    losses = []
    for x, poses, nposes in batches:
        batch = {
            "rdr_tensor": jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1))),
            "poses": jnp.asarray(poses),
            "num_poses": jnp.asarray(nposes),
        }
        state, metrics = step(state, batch)
        losses.append((float(metrics["loss"]), float(metrics["hm_loss"]),
                       float(metrics["loc_loss"])))
    return losses, state.params


class TestFullTrainTrajectory:
    def test_losses_and_params_track(self):
        torch.manual_seed(0)
        bb, head = build_ref_model(BB_CFG, FUSE, CI, CO, SHARE, REG_DIM, NCLS)
        sd = randomized_state_dict(bb, head, seed=7)
        batches = _batches(seed=11)

        ref_losses, ref_final = _torch_trajectory(sd, batches)
        our_losses, our_params = _jax_trajectory(sd, batches)

        # per-step scalar losses: f32 forward/backward drift compounds
        # step-over-step (the focal clamp's gradient discontinuity amplifies
        # it), so the tolerance grows linearly from the single-forward level
        for s, (r, o) in enumerate(zip(ref_losses, our_losses)):
            for name, rv, ov in zip(("loss", "hm", "loc"), r, o):
                assert ov == pytest.approx(rv, rel=1e-3 * (s + 1)), \
                    (s, name, rv, ov)

        # final parameters: map the torch result through the same importer
        # and compare tree-to-tree.  Element-wise equality is NOT the right
        # bar: for noise-dominated gradient elements (|g| ~ f32 epsilon of
        # the two frameworks' reduction orders) Adam's m/sqrt(v) normalizer
        # turns a sign flip into a full +-lr step, so individual elements
        # may legitimately differ by up to 2*sum(lr).  What must hold:
        #  (a) every leaf tracks in relative L2 (the bulk of the tensor), and
        #  (b) no element moved apart farther than Adam's total step budget.
        want, report = import_torch_state_dict(
            ref_final, jax.tree.map(np.asarray, our_params),
            MODEL_CONFIGS[BB_CFG])
        assert not (report["mismatched"] or report["missing"]), report
        flat_w = jax.tree_util.tree_leaves_with_path(want)
        flat_o = dict(jax.tree_util.tree_leaves_with_path(
            jax.tree.map(np.asarray, our_params)))
        assert flat_w and len(flat_w) == len(flat_o)
        lr_fn, _ = make_one_cycle_fns(STEPS, LR_MAX)
        step_budget = 2.0 * sum(float(lr_fn(s)) for s in range(STEPS))
        for path, w in flat_w:
            o = np.asarray(flat_o[path])
            w = np.asarray(w)
            rel_l2 = (np.linalg.norm(o - w)
                      / max(np.linalg.norm(w), 1e-6))
            assert rel_l2 < 2e-2, (jax.tree_util.keystr(path), rel_l2)
            assert np.abs(o - w).max() <= step_budget, \
                (jax.tree_util.keystr(path), float(np.abs(o - w).max()),
                 step_budget)
