"""CenterNet-style 3-D pose target assignment.

Behavioral parity with the reference assigners
(``det3d/datasets/pipelines/pose.py:145-541`` in ipl-uw/RT-POSE):

* ``mode='one_hm'`` (AssignLabelPose2, the flagship config): ONE heatmap class
  ("Pelvis"); each pose contributes one gaussian peak at the pelvis voxel and a
  45-dim regression target = all 15 keypoints' continuous-voxel offsets from
  the pelvis *integer* voxel.
* ``mode='per_joint'`` (AssignLabelPose): 15 heatmap classes (one per joint);
  each keypoint contributes its own peak and a 3-dim offset target.

Coordinate conventions (pinned by golden tests, not by copying code):

* world -> voxel: ``c_x = (x - xmin) / voxel_size_x / osf_x`` (and y, z alike);
  ``voxel_size`` is indexed (x, y, z), ``out_size_factor`` is indexed
  (z, y, x) — the reference's mixed convention, kept for config parity.
* heatmap is (Z, Y, X); flat index ``ind = z * (Y * X) + y * X + x``;
* integer voxel = float voxel truncated toward zero (numpy ``astype(int32)``);
* a pose whose pelvis integer voxel falls outside the grid is dropped.

Two implementations:

* ``assign_pose_targets_np`` — numpy, used by the host data pipeline (exact
  reference parity including in-place gaussian max-merge).
* ``assign_pose_targets`` — pure jnp over fixed shapes, lives *inside* the
  jitted train step (poses ride to the device as a tiny (M, 15, 3) array and
  the ~160k-voxel heatmap is synthesized on the VPU — the TPU-first design).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .gaussian import draw_gaussian3d, dense_pose_heatmap

NUM_JOINTS = 15


@dataclasses.dataclass(frozen=True)
class PoseTargetSpec:
    """Static assigner configuration (mirrors the reference ``assigner`` cfg)."""

    grid_zyx: Tuple[int, int, int]          # feature-map (Z, Y, X)
    pc_range_min_xyz: Tuple[float, float, float]   # (xmin, ymin, zmin) of the ROI
    voxel_size_xyz: Tuple[float, float, float]     # (sx, sy, sz) meters/voxel
    out_size_factor_zyx: Tuple[int, int, int] = (1, 1, 1)
    max_poses: int = 1
    min_radius: int = 2
    mode: str = "one_hm"                    # 'one_hm' | 'per_joint'
    num_classes: int = 1

    @property
    def reg_dim(self) -> int:
        return 3 * NUM_JOINTS if self.mode == "one_hm" else 3

    @property
    def max_objects(self) -> int:
        return self.max_poses if self.mode == "one_hm" else self.max_poses * NUM_JOINTS


def _world_to_voxel_np(xyz: np.ndarray, spec: PoseTargetSpec) -> np.ndarray:
    """(..., 3) world xyz -> continuous voxel coords (cx, cy, cz)."""
    xmin, ymin, zmin = spec.pc_range_min_xyz
    sx, sy, sz = spec.voxel_size_xyz
    fz, fy, fx = spec.out_size_factor_zyx
    out = np.empty_like(xyz, dtype=np.float32)
    out[..., 0] = (xyz[..., 0] - xmin) / sx / fx
    out[..., 1] = (xyz[..., 1] - ymin) / sy / fy
    out[..., 2] = (xyz[..., 2] - zmin) / sz / fz
    return out


def assign_pose_targets_np(poses: np.ndarray, num_poses: int, spec: PoseTargetSpec):
    """Host (numpy) target assignment for one sample.

    Args:
      poses: (max_poses, 15, 3) float world-coordinate keypoints (padded).
      num_poses: number of valid poses in ``poses``.
      spec: static assigner config.

    Returns dict of numpy arrays:
      hm:        (num_classes, Z, Y, X) float32
      anno_pose: (max_objects, reg_dim) float32
      ind:       (max_objects,) int64
      mask:      (max_objects,) uint8
      cat:       (max_objects,) int64
    """
    nz, ny, nx = spec.grid_zyx
    n_obj = spec.max_objects
    hm = np.zeros((spec.num_classes, nz, ny, nx), dtype=np.float32)
    anno_pose = np.zeros((n_obj, spec.reg_dim), dtype=np.float32)
    ind = np.zeros((n_obj,), dtype=np.int64)
    mask = np.zeros((n_obj,), dtype=np.uint8)
    cat = np.zeros((n_obj,), dtype=np.int64)

    if spec.mode == "one_hm":
        for k in range(min(num_poses, n_obj)):
            ct = _world_to_voxel_np(poses[k], spec)          # (15, 3) voxel coords
            ct_int = ct[0].astype(np.int32)                   # pelvis voxel
            if not (0 <= ct_int[0] < nx and 0 <= ct_int[1] < ny and 0 <= ct_int[2] < nz):
                continue
            draw_gaussian3d(hm[0], ct_int, spec.min_radius)
            x, y, z = int(ct_int[0]), int(ct_int[1]), int(ct_int[2])
            cat[k] = 0
            ind[k] = z * ny * nx + y * nx + x
            mask[k] = 1
            anno_pose[k] = (ct - ct_int[None].astype(np.float32)).reshape(-1)
    else:  # per_joint
        k = 0
        for p in range(num_poses):
            for j in range(NUM_JOINTS):
                if k >= n_obj:
                    break
                ct = _world_to_voxel_np(poses[p, j], spec)   # (3,)
                ct_int = ct.astype(np.int32)
                slot = k
                k += 1
                if not (0 <= ct_int[0] < nx and 0 <= ct_int[1] < ny and 0 <= ct_int[2] < nz):
                    continue
                radius = max(spec.min_radius, 1)
                draw_gaussian3d(hm[j], ct_int, radius)
                x, y, z = int(ct_int[0]), int(ct_int[1]), int(ct_int[2])
                cat[slot] = j
                ind[slot] = z * ny * nx + y * nx + x
                mask[slot] = 1
                anno_pose[slot] = ct - ct_int.astype(np.float32)

    return dict(hm=hm, anno_pose=anno_pose, ind=ind, mask=mask, cat=cat)


def _world_to_voxel_jnp(xyz: jnp.ndarray, spec: PoseTargetSpec) -> jnp.ndarray:
    xmin, ymin, zmin = spec.pc_range_min_xyz
    sx, sy, sz = spec.voxel_size_xyz
    fz, fy, fx = spec.out_size_factor_zyx
    scale = jnp.asarray([1.0 / (sx * fx), 1.0 / (sy * fy), 1.0 / (sz * fz)], jnp.float32)
    offset = jnp.asarray([xmin, ymin, zmin], jnp.float32)
    return (xyz - offset) * scale


def assign_pose_targets(poses: jnp.ndarray, num_poses: jnp.ndarray, spec: PoseTargetSpec):
    """On-device target assignment for one sample (vmap over the batch).

    Fixed-shape jnp equivalent of ``assign_pose_targets_np`` — identical
    outputs (verified by tests), but runs inside the jitted train step.

    Args:
      poses: (max_poses, 15, 3) float32 world keypoints (padding arbitrary).
      num_poses: () int32 count of valid poses.
      spec: static config.
    """
    nz, ny, nx = spec.grid_zyx
    n_obj = spec.max_objects

    if spec.mode == "one_hm":
        ct = _world_to_voxel_jnp(poses.astype(jnp.float32), spec)  # (M, 15, 3) xyz voxel
        ct_int = ct[:, 0, :].astype(jnp.int32)                      # (M, 3) pelvis voxel
        slot_valid = jnp.arange(n_obj) < num_poses
        in_range = (
            (ct_int[:, 0] >= 0) & (ct_int[:, 0] < nx)
            & (ct_int[:, 1] >= 0) & (ct_int[:, 1] < ny)
            & (ct_int[:, 2] >= 0) & (ct_int[:, 2] < nz)
        )
        ok = slot_valid & in_range
        centers_zyx = ct_int[:, ::-1]                               # (M, 3) zyx
        hm0 = dense_pose_heatmap(centers_zyx, ok, spec.grid_zyx, spec.min_radius)
        hm = hm0[None]                                              # (1, Z, Y, X)
        ind = (ct_int[:, 2] * ny * nx + ct_int[:, 1] * nx + ct_int[:, 0])
        ind = jnp.where(ok, ind, 0).astype(jnp.int32)
        mask = ok.astype(jnp.uint8)
        cat = jnp.zeros((n_obj,), jnp.int32)
        anno = (ct - ct_int[:, None, :].astype(jnp.float32)).reshape(n_obj, -1)
        anno = jnp.where(ok[:, None], anno, 0.0)
        return dict(hm=hm, anno_pose=anno, ind=ind, mask=mask, cat=cat)

    # per_joint: flatten (pose, joint) into object slots
    ct = _world_to_voxel_jnp(poses.astype(jnp.float32), spec)       # (M, 15, 3)
    ct = ct.reshape(-1, 3)[:n_obj]                                  # (M*15, 3)
    ct_int = ct.astype(jnp.int32)
    pose_idx = jnp.arange(n_obj) // NUM_JOINTS
    joint_idx = (jnp.arange(n_obj) % NUM_JOINTS).astype(jnp.int32)
    slot_valid = pose_idx < num_poses
    in_range = (
        (ct_int[:, 0] >= 0) & (ct_int[:, 0] < nx)
        & (ct_int[:, 1] >= 0) & (ct_int[:, 1] < ny)
        & (ct_int[:, 2] >= 0) & (ct_int[:, 2] < nz)
    )
    ok = slot_valid & in_range
    radius = max(spec.min_radius, 1)

    def one_class(cls_id):
        sel = ok & (joint_idx == cls_id)
        return dense_pose_heatmap(ct_int[:, ::-1], sel, spec.grid_zyx, radius)

    hm = jax.vmap(one_class)(jnp.arange(spec.num_classes, dtype=jnp.int32))
    ind = (ct_int[:, 2] * ny * nx + ct_int[:, 1] * nx + ct_int[:, 0])
    ind = jnp.where(ok, ind, 0).astype(jnp.int32)
    mask = ok.astype(jnp.uint8)
    cat = jnp.where(ok, joint_idx, 0)
    anno = jnp.where(ok[:, None], ct - ct_int.astype(jnp.float32), 0.0)
    return dict(hm=hm, anno_pose=anno, ind=ind, mask=mask, cat=cat)
