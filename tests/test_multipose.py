"""Multi-person end-to-end: two-person synthetic frames -> grouped samples
-> max_poses=2 on-device assignment -> training -> multi-peak decode.

Exercises the multi-object semantics of the assigner (pose.py:346-541) and
the TPU-new ``decode_pose_multi`` beyond unit level.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __graft_entry__ as graft

from rtpose_tpu.core.decode import DecodeSpec, decode_pose_multi
from rtpose_tpu.core.targets import PoseTargetSpec
from rtpose_tpu.core.targets import assign_pose_targets_np
from rtpose_tpu.data import BatchLoader
from rtpose_tpu.data.cruw_pose import CRUWPoseDataset
from rtpose_tpu.data.synthetic import dataset_cfg, generate_synthetic_dataset
from rtpose_tpu.engine import create_train_state, make_train_step
from rtpose_tpu.solver import adam_one_cycle, make_one_cycle_fns


TINY_ROI = {"z": [-1.0875, 1.8125], "y": [-1.25625, 1.25625],
            "x": [0.7703125, 2.2203125]}  # -> grid (8, 16, 32)
VOXEL = (0.0453125, 0.15703125, 0.3625)


def _tiny_cfg(root):
    cfg = dataset_cfg(root, "zyx_real")
    cfg["ROI"] = {"roi1": TINY_ROI}
    return {"DATASET": cfg}


def _tiny_specs(max_poses):
    pc_min = (TINY_ROI["x"][0], TINY_ROI["y"][0], TINY_ROI["z"][0])
    tspec = PoseTargetSpec(grid_zyx=(8, 16, 32), pc_range_min_xyz=pc_min,
                           voxel_size_xyz=VOXEL, out_size_factor_zyx=(1, 1, 1),
                           max_poses=max_poses, min_radius=2, mode="one_hm",
                           num_classes=1)
    dspec = DecodeSpec(grid_zyx=(8, 16, 32), pc_range_min_xyz=pc_min,
                       voxel_size_xyz=VOXEL)
    return tspec, dspec


@pytest.fixture(scope="module")
def two_person_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("twoperson"))
    generate_synthetic_dataset(
        root, num_seqs=1, frames_per_seq=6, rdr_type="zyx_real", seed=5,
        pelvis_range={"x": (1.0, 2.1), "y": (-1.0, 1.0), "z": (-0.4, 1.0)},
        offset_scale=(0.06, 0.06, 0.08), z_clip=(-1.0, 1.7),
        persons_per_frame=2)
    return root


class TestTwoPersonData:
    def test_grouped_samples_carry_both_poses(self, two_person_root):
        cfg = _tiny_cfg(two_person_root)
        flat = CRUWPoseDataset(cfg, "Train.json", split="train", max_poses=1)
        grouped = CRUWPoseDataset(cfg, "Train.json", split="train",
                                  max_poses=2, group_by_frame=True)
        assert len(flat) == 2 * len(grouped)  # one sample per object vs frame
        it = grouped[0]
        assert int(it["num_poses"]) == 2
        assert it["poses"].shape == (2, 15, 3)
        # the two pelvises are distinct people
        assert np.linalg.norm(it["poses"][0, 0] - it["poses"][1, 0]) > 1.0

    def test_assigner_places_two_centers(self, two_person_root):
        cfg = _tiny_cfg(two_person_root)
        grouped = CRUWPoseDataset(cfg, "Train.json", split="train",
                                  max_poses=2, group_by_frame=True)
        spec, _ = _tiny_specs(2)
        it = grouped[0]
        t = assign_pose_targets_np(it["poses"], 2, spec)
        assert int(t["mask"].sum()) == 2
        assert t["ind"][0] != t["ind"][1]


class TestTwoPersonTrainDecode:
    def test_train_step_and_multi_decode(self, two_person_root):
        """2 steps of dense multi-pose training run finite; the multi-peak
        decode on the GT-shaped heatmap finds both people."""
        cfg = _tiny_cfg(two_person_root)
        ds = CRUWPoseDataset(cfg, "Train.json", split="train",
                             max_poses=2, group_by_frame=True)
        asm = graft._flagship(tiny=True)
        spec, dspec = _tiny_specs(2)

        loader = BatchLoader(ds, batch_size=2, shuffle=False, drop_last=False)
        batch = next(iter(loader))
        batch.pop("meta")
        batch.pop("valid")
        batch = {k: jnp.asarray(v) for k, v in batch.items()}

        lr_fn, mom_fn = make_one_cycle_fns(10, 1e-3)
        opt = adam_one_cycle(lr_fn, mom_fn)
        state = create_train_state(asm.model, opt,
                                   jnp.zeros((1, 8, 16, 32, 1), jnp.float32))
        # dense path: the sparse-reg specialization is single-peak
        step = jax.jit(make_train_step(asm.model, asm.head, spec, opt,
                                       sparse_reg=False))
        state, m1 = step(state, batch)
        state, m2 = step(state, batch)
        assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
        assert float(m1["num_positive"]) == pytest.approx(
            2 * batch["poses"].shape[0])

        # multi-peak decode on the target heatmap itself (logit-space):
        # both gt pelvises must be recovered as separate objects
        from rtpose_tpu.core.targets import assign_pose_targets_np
        t = assign_pose_targets_np(np.asarray(batch["poses"][0]), 2, spec)
        hm = np.transpose(t["hm"], (1, 2, 3, 0))[None]            # (1,Z,Y,X,1)
        logits = np.log(np.clip(hm, 1e-6, 1 - 1e-6)) - np.log(
            1 - np.clip(hm, 1e-6, 1 - 1e-6))
        reg = np.zeros((1, *hm.shape[1:4], 45), np.float32)
        kpts, scores = decode_pose_multi(jnp.asarray(logits),
                                         jnp.asarray(reg), dspec,
                                         max_objects=2)
        assert scores.shape == (1, 2)
        assert float(scores[0, 1]) > 0.5  # second person found
        got = np.sort(np.asarray(kpts)[0, :, 0, :2], axis=0)
        want = np.sort(np.asarray(batch["poses"][0])[:, 0, :2], axis=0)
        # voxel-resolution agreement on the two pelvis centers
        assert np.abs(got - want).max() < 0.5, (got, want)


class TestMultiPersonEvalPath:
    def test_evaluation_matches_objects_greedily(self, two_person_root):
        """Perfect predictions fed in SWAPPED object order must still score
        MPJPE 0 — the evaluation matches each GT object to the nearest
        predicted pelvis instead of relying on order."""
        import json

        cfg = _tiny_cfg(two_person_root)
        ds = CRUWPoseDataset(cfg, "Train.json", split="test",
                             max_poses=2, group_by_frame=True)
        gt = json.load(open(ds.label_file))
        detections = {}
        for seq, frames in gt.items():
            for frame, objs in frames.items():
                kp = []
                for obj in reversed(objs):          # swapped order
                    pose = np.asarray(obj["pose"])
                    kp += [(j, *pose[j].tolist(), 0.9) for j in range(15)]
                detections[f"{seq}/{frame}/{objs[0]['Radar_frameID']}"] = {
                    "keypoints": kp}
        res, _ = ds.evaluation(detections)
        assert res["results"]["MPJPE"] == pytest.approx(0.0, abs=1e-6)
        assert res["results"]["ABS_MPJPE"] == pytest.approx(0.0, abs=1e-6)

    def test_run_eval_multi_decode_structure(self, two_person_root):
        """make_eval_step(multi_poses=2) -> run_eval -> evaluation: the full
        eval path emits P*15 keypoints per frame and scores finitely."""
        from rtpose_tpu.engine import make_eval_step, run_eval

        cfg = _tiny_cfg(two_person_root)
        ds = CRUWPoseDataset(cfg, "Train.json", split="test",
                             max_poses=2, group_by_frame=True)
        asm = graft._flagship(tiny=True)
        _, dspec = _tiny_specs(2)
        loader = BatchLoader(ds, batch_size=2, shuffle=False, drop_last=False)

        lr_fn, mom_fn = make_one_cycle_fns(10, 1e-3)
        opt = adam_one_cycle(lr_fn, mom_fn)
        state = create_train_state(asm.model, opt,
                                   jnp.zeros((1, 8, 16, 32, 1), jnp.float32))
        eval_step = make_eval_step(asm.model, asm.head, dspec,
                                   multi_poses=2)
        dets, _ = run_eval(eval_step, state.params, loader, dspec)
        assert len(dets) == len(ds)
        for val in dets.values():
            assert len(val["keypoints"]) == 2 * 15
            ids = [p[0] for p in val["keypoints"]]
            assert ids == list(range(15)) * 2      # score-ordered groups
        res, _ = ds.evaluation(dets)
        assert np.isfinite(res["results"]["MPJPE"])
