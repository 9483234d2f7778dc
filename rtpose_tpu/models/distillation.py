"""LiDAR -> radar cross-modal distillation.

The reference ships an empty TODO stub (detectors/distillation.py:1-4).
Here the capability is functional: a frozen LiDAR teacher (VoxelNet) and a
radar student (RadarPoseNet) trained with the task loss plus feature/
heatmap distillation terms.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import DETECTORS, build_from_cfg


@DETECTORS.register_module
class Distillation(nn.Module):
    """Student-teacher pair; the caller freezes teacher params
    (rtpose_tpu.utils.freeze) and feeds both modalities."""

    student: dict = None          # RadarPoseNet cfg
    teacher: dict = None          # VoxelNet cfg
    feat_weight: float = 1.0
    hm_weight: float = 1.0

    def setup(self):
        self.student_m = build_from_cfg(dict(self.student), DETECTORS)
        self.teacher_m = build_from_cfg(dict(self.teacher), DETECTORS)

    def __call__(self, radar_batch: Dict[str, jnp.ndarray],
                 lidar_batch: Dict[str, jnp.ndarray]):
        s_feat = self.student_m.extract_feat(radar_batch["rdr_tensor"])
        s_preds = self.student_m.head_m(s_feat)
        t_feat = jnp.asarray(self.teacher_m.extract_feat(lidar_batch))
        t_preds = self.teacher_m.head_m(t_feat)
        return s_preds, t_preds, s_feat, t_feat

    def distill_loss(self, s_preds, t_preds, s_feat, t_feat):
        """Feature L2 + heatmap KL-style (sigmoid BCE against teacher)."""
        feat_l2 = jnp.mean(jnp.square(
            s_feat.astype(jnp.float32) - t_feat.astype(jnp.float32)))
        s_hm = s_preds[0]["hm"].astype(jnp.float32)
        t_hm = jnp.clip(jax.nn.sigmoid(t_preds[0]["hm"].astype(jnp.float32)),
                        1e-4, 1 - 1e-4)
        bce = jnp.mean(
            jnp.maximum(s_hm, 0) - s_hm * t_hm + jnp.log1p(jnp.exp(-jnp.abs(s_hm))))
        return self.feat_weight * feat_l2 + self.hm_weight * bce
