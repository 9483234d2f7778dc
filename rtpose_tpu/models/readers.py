"""Input readers/encoders.

* ``RadarFeatureNet`` — identity pass-through for the radar cube
  (reference ``det3d/models/readers/radar_encoder.py:8-17``).
* ``VoxelFeatureExtractorV3`` — mean of points per voxel
  (``voxel_encoder.py:9-24``); fixed-shape: padded (V, P, F) voxels with a
  per-voxel point count.
* ``PillarFeatureNet`` / ``PointPillarsScatter`` — PointPillars encoding +
  dense BEV scatter (``pillar_encoder.py:15-218``), fixed-shape TPU variant:
  the scatter is a one-hot matmul / scatter-add over a static canvas.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import READERS


@READERS.register_module
class RadarFeatureNet(nn.Module):
    """Identity reader: the radar cube is already a dense grid."""

    @nn.compact
    def __call__(self, rdr_tensor: jnp.ndarray) -> jnp.ndarray:
        return rdr_tensor


@READERS.register_module
class VoxelFeatureExtractorV3(nn.Module):
    """Mean of the (padded) points in each voxel.

    Args to __call__:
      features: (V, P, F) padded point features per voxel.
      num_points: (V,) valid point count per voxel (0 for padding voxels).
    Returns (V, F) voxel features (zeros for empty/padding voxels).
    """

    num_input_features: int = 4

    @nn.compact
    def __call__(self, features: jnp.ndarray, num_points: jnp.ndarray) -> jnp.ndarray:
        s = jnp.sum(features, axis=1)
        denom = jnp.maximum(num_points.astype(features.dtype), 1.0)[:, None]
        return s / denom


@READERS.register_module
class PillarFeatureNet(nn.Module):
    """PointPillars per-pillar PointNet (simplified single PFNLayer, as the
    reference default num_filters=(64,)).

    __call__(features, num_points, coors):
      features: (V, P, F) raw point features (x, y, z, intensity, ...)
      num_points: (V,)
      coors: (V, 3) int (z, y, x) voxel coords (z always 0 for pillars)
    Returns (V, C) pillar features.
    """

    num_filters: Sequence[int] = (64,)
    voxel_size: Sequence[float] = (0.2, 0.2, 4.0)
    pc_range: Sequence[float] = (0.0, -40.0, -3.0, 70.4, 40.0, 1.0)
    num_input_features: int = 4
    with_distance: bool = False

    @nn.compact
    def __call__(self, features, num_points, coors):
        V, P, F = features.shape
        countf = jnp.maximum(num_points.astype(features.dtype), 1.0)
        # decorated features: offsets from pillar mean and pillar center
        points_mean = jnp.sum(features[..., :3], axis=1, keepdims=True) / countf[:, None, None]
        f_cluster = features[..., :3] - points_mean
        vx, vy = self.voxel_size[0], self.voxel_size[1]
        x_offset = vx / 2 + self.pc_range[0]
        y_offset = vy / 2 + self.pc_range[1]
        xc = features[..., 0:1] - (coors[:, 2:3, None].astype(features.dtype).transpose(0, 2, 1) * vx + x_offset)
        yc = features[..., 1:2] - (coors[:, 1:2, None].astype(features.dtype).transpose(0, 2, 1) * vy + y_offset)
        feats = [features, f_cluster, xc, yc]
        if self.with_distance:
            feats.append(jnp.linalg.norm(features[..., :3], axis=-1, keepdims=True))
        x = jnp.concatenate(feats, axis=-1)
        # mask padding points
        pmask = (jnp.arange(P)[None, :] < num_points[:, None]).astype(x.dtype)[..., None]
        x = x * pmask
        for width in self.num_filters:
            x = nn.Dense(width, use_bias=False)(x)
            x = nn.LayerNorm()(x)  # stand-in for BatchNorm1d: per-feature norm
            x = nn.relu(x)
            x = x * pmask
        return jnp.max(x, axis=1)


@READERS.register_module
class PointPillarsScatter(nn.Module):
    """Scatter pillar features onto a dense BEV canvas.

    __call__(voxel_features, coors, valid, grid_yx) -> (B?, Y, X, C).
    Single-sample fixed-shape formulation: scatter-add at flat y*X+x indices
    (padding voxels carry valid=0 and are dropped via a zero weight).
    """

    num_input_features: int = 64

    @nn.compact
    def __call__(self, voxel_features, coors, valid, grid_yx):
        ny, nx = grid_yx
        C = voxel_features.shape[-1]
        flat = (coors[:, 1] * nx + coors[:, 2]).astype(jnp.int32)
        flat = jnp.where(valid, flat, 0)
        w = valid.astype(voxel_features.dtype)[:, None]
        canvas = jnp.zeros((ny * nx, C), voxel_features.dtype)
        canvas = canvas.at[flat].add(voxel_features * w)
        return canvas.reshape(ny, nx, C)
