"""Second-stage feature extraction: bilinear BEV sampling at box centers.

Parity with ``det3d/models/second_stage/bird_eye_view.py:10-41``: world
centers -> feature-map coords via (c - pc_start)/voxel/out_stride, then
bilinear interpolation of the BEV feature map; multi-point variant
concatenates per-point sections on channels.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.grid_sample import grid_sample_2d
from ..registry import SECOND_STAGE


def bilinear_interpolate(im: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray):
    """(H, W, C) sampled at unnormalized pixel coords — clamped-edge
    semantics of the reference ``bilinear_interpolate_torch``
    (center_utils.py:130-159)."""
    H, W, C = im.shape
    x0 = jnp.clip(jnp.floor(xs), 0, W - 1)
    y0 = jnp.clip(jnp.floor(ys), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    xi0, yi0, xi1, yi1 = (a.astype(jnp.int32) for a in (x0, y0, x1, y1))
    Ia, Ib, Ic, Id = im[yi0, xi0], im[yi1, xi0], im[yi0, xi1], im[yi1, xi1]
    wa = (x1 - xs) * (y1 - ys)
    wb = (x1 - xs) * (ys - y0)
    wc = (xs - x0) * (y1 - ys)
    wd = (xs - x0) * (ys - y0)
    return (Ia * wa[:, None] + Ib * wb[:, None] + Ic * wc[:, None]
            + Id * wd[:, None])


@SECOND_STAGE.register_module
class BEVFeatureExtractor(nn.Module):
    pc_start: Sequence[float] = (0.0, 0.0)
    voxel_size: Sequence[float] = (0.1, 0.1)
    out_stride: int = 1

    def absl_to_relative(self, absolute: jnp.ndarray):
        a1 = (absolute[..., 0] - self.pc_start[0]) / self.voxel_size[0] / self.out_stride
        a2 = (absolute[..., 1] - self.pc_start[1]) / self.voxel_size[1] / self.out_stride
        return a1, a2

    @nn.compact
    def __call__(self, bev_feature: jnp.ndarray, batch_centers: jnp.ndarray,
                 num_point: int = 1) -> jnp.ndarray:
        """bev_feature: (B, H, W, C); batch_centers: (B, N*num_point, 2+)
        world xy.  Returns (B, N, C*num_point)."""

        def one(feat, centers):
            xs, ys = self.absl_to_relative(centers)
            fm = bilinear_interpolate(feat, xs, ys)      # (N*np, C)
            if num_point > 1:
                sec = fm.shape[0] // num_point
                fm = jnp.concatenate([fm[i * sec:(i + 1) * sec]
                                      for i in range(num_point)], axis=1)
            return fm

        return jax.vmap(one)(bev_feature, batch_centers)
