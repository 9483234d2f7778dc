"""Feature transforms: polar (range-azimuth-elevation) -> cartesian resample.

Parity with ``det3d/models/feat_transforms/polar_to_cart.py:10-47``: a
precomputed sampling grid (built from the cartesian ROI and the polar
extent) bilinearly resamples polar feature maps onto a cartesian grid.

Note on fidelity: the reference computes grid coordinates as [0, 1] ratios
but feeds them to ``F.grid_sample``, which expects [-1, 1] — so it only
ever samples the upper-right quadrant of the polar map.  This
implementation exposes both behaviors: ``normalized='torch_ratio'``
reproduces the reference bit-for-bit (config parity), the default
``normalized='minus1_1'`` maps the ratios to [-1, 1] (the presumably
intended math).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import grid_sample_2d, grid_sample_3d
from ..registry import FEAT_TRANSFORMS

DEG2RAD = np.pi / 180.0


@FEAT_TRANSFORMS.register_module
class PolarToCart(nn.Module):
    cart_roi: dict = None          # {'z': [...], 'y': [...], 'x': [...]}
    voxel_size: float = 0.1
    polar_range: Sequence[float] = (0, 100, -60, 60, -20, 20)  # r, a(deg), e(deg)
    dimension: str = "2"           # '2' (BEV) or '3'
    normalized: str = "minus1_1"   # 'minus1_1' | 'torch_ratio'

    @property
    def transform_dim(self) -> str:
        return self.dimension

    def _grids(self):
        z_min, z_max = self.cart_roi["z"]
        y_min, y_max = self.cart_roi["y"]
        x_min, x_max = self.cart_roi["x"]
        r_min, r_max, a_min, a_max, e_min, e_max = self.polar_range
        a_min, a_max, e_min, e_max = np.array([a_min, a_max, e_min, e_max]) * DEG2RAD
        xs = np.arange(x_min, x_max, self.voxel_size)
        ys = np.arange(y_min, y_max, self.voxel_size)
        if self.dimension == "2":
            yy, xx = np.meshgrid(ys, xs, indexing="ij")
            r = np.sqrt(yy ** 2 + xx ** 2)
            r_ratio = (r - r_min) / (r_max - r_min)
            a_ratio = (np.arctan2(yy, xx) - a_min) / (a_max - a_min)
            grid = np.stack([a_ratio, r_ratio], axis=-1)          # (H, W, 2)
        else:
            zs = np.arange(z_min, z_max, self.voxel_size)
            zz, yy, xx = np.meshgrid(zs, ys, xs, indexing="ij")
            r = np.sqrt(zz ** 2 + yy ** 2 + xx ** 2)
            r_ratio = (r - r_min) / (r_max - r_min)
            a_ratio = (np.arctan2(yy, xx) - a_min) / (a_max - a_min)
            e_ratio = (np.arctan2(zz, xx) - e_min) / (e_max - e_min)
            grid = np.stack([e_ratio, a_ratio, r_ratio], axis=-1)  # (D, H, W, 3)
        if self.normalized == "minus1_1":
            grid = grid * 2.0 - 1.0
        return jnp.asarray(grid.astype(np.float32))

    @nn.compact
    def __call__(self, polar_feature: jnp.ndarray) -> jnp.ndarray:
        """polar_feature: (B, [D,] H, W, C) channels-last."""
        grid = self._grids()
        import jax
        if self.dimension == "2":
            return jax.vmap(lambda f: grid_sample_2d(f, grid))(polar_feature)
        return jax.vmap(lambda f: grid_sample_3d(f, grid))(polar_feature)
