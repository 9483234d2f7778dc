"""Host-side data pipelines.

Parity with the reference pipeline registry
(``det3d/datasets/pipelines/``): ``Compose`` applies transforms sequentially
(compose.py:7-36); ``AssignLabelPose`` / ``AssignLabelPose2`` are the
CenterNet target assigners (pose.py:145-541), here thin wrappers over the
golden-tested ``rtpose_tpu.core.targets`` functions.

On TPU the assigners normally run *inside* the jitted train step (the loader
ships raw padded poses); these host versions exist for (a) parity testing
against the on-device path and (b) the ``precompute_targets`` loader mode.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from ..core.targets import PoseTargetSpec, assign_pose_targets_np
from ..registry import PIPELINES


class Compose:
    """Sequential transform application; None output short-circuits."""

    def __init__(self, transforms):
        from ..registry import build_from_cfg
        self.transforms = []
        for t in transforms:
            if isinstance(t, dict):
                self.transforms.append(build_from_cfg(t, PIPELINES))
            elif callable(t):
                self.transforms.append(t)
            else:
                raise TypeError(f"transform must be dict or callable, got {t!r}")

    def __call__(self, item, info=None):
        for t in self.transforms:
            item = t(item, info)
            if item is None:
                return None
        return item


def _spec_from_cfg(cfg: Dict[str, Any], info: Dict[str, Any], mode: str) -> PoseTargetSpec:
    """Build a PoseTargetSpec from the reference assigner-config schema."""
    ds = info["DATASET"]
    roi = ds["ROI"][ds["LABEL"]["ROI_TYPE"]]
    # reference voxel GRID_SIZE is (x, y, z) meters
    voxel = tuple(float(v) for v in ds["RDR_CUBE"]["GRID_SIZE"])
    from .cruw_pose import CubeGeometry
    geom = CubeGeometry.from_roi({k: list(v) for k, v in roi.items()})
    osf = tuple(int(f) for f in cfg.get("out_size_factor", (1, 1, 1)))
    grid = tuple(g // f for g, f in zip(geom.grid_zyx, osf))
    return PoseTargetSpec(
        grid_zyx=grid,
        pc_range_min_xyz=(float(roi["x"][0]), float(roi["y"][0]), float(roi["z"][0])),
        voxel_size_xyz=voxel,
        out_size_factor_zyx=osf,
        max_poses=int(cfg.get("max_poses", 1)),
        min_radius=int(cfg.get("min_radius", 2)),
        mode=mode,
        num_classes=(1 if mode == "one_hm"
                     else len(cfg["target_assigner"]["tasks"][0]["class_names"])),
    )


class _AssignBase:
    mode: str = "one_hm"

    def __init__(self, cfg=None, **kwargs):
        self.cfg = dict(cfg) if cfg is not None else {}

    def __call__(self, item: Dict[str, Any], info=None) -> Dict[str, Any]:
        if item.get("mode") != "train":
            return item
        spec = _spec_from_cfg(self.cfg, info, self.mode)
        t = assign_pose_targets_np(item["poses"], int(item["num_poses"]), spec)
        # channels-last heatmap for the TPU model, per-task lists
        item["hm"] = [np.transpose(t["hm"], (1, 2, 3, 0))]
        item["ind"] = [t["ind"].astype(np.int32)]
        item["mask"] = [t["mask"]]
        item["cat"] = [t["cat"].astype(np.int32)]
        item["anno_pose"] = [t["anno_pose"]]
        return item


@PIPELINES.register_module
class AssignLabelPose(_AssignBase):
    """Per-joint heatmaps (15 classes), 3-dim offsets (pose.py:145-344)."""

    mode = "per_joint"


@PIPELINES.register_module
class AssignLabelPose2(_AssignBase):
    """Single pelvis heatmap, 45-dim regression (pose.py:346-541)."""

    mode = "one_hm"
