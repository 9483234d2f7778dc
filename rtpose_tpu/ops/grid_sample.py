"""Bilinear/trilinear grid sampling with torch ``F.grid_sample`` semantics
(align_corners=False, zero padding).

Used by the polar->cartesian feature transform
(``det3d/models/feat_transforms/polar_to_cart.py:43-47``) and the BEV
second-stage feature extractor.  Channels-last.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    """[-1, 1] normalized -> pixel index, align_corners=False."""
    return ((coord + 1.0) * size - 1.0) / 2.0


def grid_sample_2d(x: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """x: (H, W, C); grid: (..., 2) with (gx, gy) normalized. -> (..., C)."""
    H, W, C = x.shape
    ix = _unnormalize(grid[..., 0], W)
    iy = _unnormalize(grid[..., 1], H)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = ix - x0
    wy = iy - y0

    def tap(yi, xi, w):
        inside = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        v = x[jnp.clip(yi, 0, H - 1).astype(jnp.int32),
              jnp.clip(xi, 0, W - 1).astype(jnp.int32)]
        return v * (w * inside.astype(x.dtype))[..., None]

    return (tap(y0, x0, (1 - wy) * (1 - wx)) + tap(y0, x0 + 1, (1 - wy) * wx)
            + tap(y0 + 1, x0, wy * (1 - wx)) + tap(y0 + 1, x0 + 1, wy * wx))


def grid_sample_3d(x: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """x: (D, H, W, C); grid: (..., 3) with (gx, gy, gz) normalized."""
    D, H, W, C = x.shape
    ix = _unnormalize(grid[..., 0], W)
    iy = _unnormalize(grid[..., 1], H)
    iz = _unnormalize(grid[..., 2], D)
    x0, y0, z0 = jnp.floor(ix), jnp.floor(iy), jnp.floor(iz)
    wx, wy, wz = ix - x0, iy - y0, iz - z0

    def tap(zi, yi, xi, w):
        inside = ((zi >= 0) & (zi < D) & (yi >= 0) & (yi < H)
                  & (xi >= 0) & (xi < W))
        v = x[jnp.clip(zi, 0, D - 1).astype(jnp.int32),
              jnp.clip(yi, 0, H - 1).astype(jnp.int32),
              jnp.clip(xi, 0, W - 1).astype(jnp.int32)]
        return v * (w * inside.astype(x.dtype))[..., None]

    out = 0
    for dz, fz in ((0, 1 - wz), (1, wz)):
        for dy, fy in ((0, 1 - wy), (1, wy)):
            for dx, fx in ((0, 1 - wx), (1, wx)):
                out = out + tap(z0 + dz, y0 + dy, x0 + dx, fz * fy * fx)
    return out
