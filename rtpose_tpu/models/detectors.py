"""Detector compositions (reader -> backbone -> [neck] -> pose head).

Parity with ``det3d/models/detectors/`` in ipl-uw/RT-POSE:

* ``RadarPoseNet`` (radar_pose_net.py:10-46) — the flagship HRRadarPose:
  identity reader over the dense radar cube, HRNet3D backbone, CenterHead.
* ``VoxelNet`` (voxelnet.py:8-66) — LiDAR companion: voxel feature extractor,
  dense middle encoder, (neck), CenterHead.  See ``rtpose_tpu.models.voxelnet``.

In JAX the detector is a pure function: ``apply(params, batch) -> preds``;
train/predict behavior (loss vs decode) is chosen by the caller, not by a
``return_loss`` flag threaded through the module.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..registry import BACKBONES, DETECTORS, HEADS, NECKS, READERS, build_from_cfg


def build_submodule(cfg, registry, extra: dict | None = None):
    if cfg is None:
        return None
    cfg = dict(cfg)
    if extra:
        cfg.update(extra)
    return build_from_cfg(cfg, registry)


@DETECTORS.register_module
class RadarPoseNet(nn.Module):
    """HRRadarPose detector over a dense (B, Z, Y, X, C) radar cube."""

    reader: dict = None
    backbone: dict = None
    pose_head: dict = None
    neck: Optional[dict] = None
    pretrained: Optional[str] = None

    def setup(self):
        self.reader_m = build_submodule(self.reader, READERS)
        self.backbone_m = build_submodule(self.backbone, BACKBONES)
        self.neck_m = build_submodule(self.neck, NECKS)
        self.head_m = build_submodule(self.pose_head, HEADS)

    def extract_feat(self, rdr_tensor: jnp.ndarray) -> jnp.ndarray:
        x = self.reader_m(rdr_tensor)
        x = self.backbone_m(x)
        if self.neck_m is not None:
            x = self.neck_m(x)
        return x

    def __call__(self, rdr_tensor: jnp.ndarray) -> List[Dict[str, jnp.ndarray]]:
        feat = self.extract_feat(rdr_tensor)
        return self.head_m(feat)

    # pure helpers usable through module binding (model.apply(..., method=...))
    def loss(self, rdr_tensor, example):
        preds = self(rdr_tensor)
        return self.head_m.loss(example, preds)


def build_detector(cfg: dict, train_cfg=None, test_cfg=None):
    """Factory with the reference builder signature
    (det3d/models/builder.py:17-52)."""
    cfg = dict(cfg)
    cfg.pop("train_cfg", None)
    cfg.pop("test_cfg", None)
    return build_from_cfg(cfg, DETECTORS)
