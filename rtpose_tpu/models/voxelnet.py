"""VoxelNet: LiDAR companion detector (voxelnet.py:8-66 parity, TPU shape).

Pipeline: padded voxels -> VoxelFeatureExtractorV3 (mean) -> dense scatter
onto the (Z, Y, X) grid (the fixed-shape 'middle encoder' — the reference
fork inherits a sparse-conv slot here but ships no spconv; on TPU the dense
scatter + 3-D conv backbone IS the idiomatic formulation) -> HRNet3D (or
any registered backbone) -> CenterHead.

Batch layout (all fixed shapes, one sample per vmap lane):
  voxels:               (B, V, P, F)
  num_points_per_voxel: (B, V)
  coors:                (B, V, 3) int32 (z, y, x)
  num_voxels:           (B,)
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.voxelize import scatter_to_dense
from ..registry import BACKBONES, DETECTORS, HEADS, NECKS, READERS
from .detectors import build_submodule


@DETECTORS.register_module
class VoxelNet(nn.Module):
    reader: dict = None
    backbone: dict = None
    pose_head: dict = None
    neck: Optional[dict] = None
    sensor_type: str = "lidar"
    grid_zyx: Tuple[int, int, int] = (40, 128, 128)
    pretrained: Optional[str] = None

    def setup(self):
        self.reader_m = build_submodule(self.reader, READERS)
        self.backbone_m = build_submodule(self.backbone, BACKBONES)
        self.neck_m = build_submodule(self.neck, NECKS)
        self.head_m = build_submodule(self.pose_head, HEADS)

    def extract_feat(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        vf = jax.vmap(self.reader_m)(batch["voxels"],
                                     batch["num_points_per_voxel"])  # (B, V, C)
        dense = jax.vmap(
            lambda f, c, n: scatter_to_dense(f, c, n, self.grid_zyx)
        )(vf, batch["coors"], batch["num_voxels"])                    # (B,Z,Y,X,C)
        x = self.backbone_m(dense)
        if self.neck_m is not None:
            x = self.neck_m(x)
        return x

    def __call__(self, batch: Dict[str, jnp.ndarray]) -> List[Dict[str, jnp.ndarray]]:
        return self.head_m(self.extract_feat(batch))

    def loss(self, batch, example):
        preds = self(batch)
        return self.head_m.loss(example, preds)
