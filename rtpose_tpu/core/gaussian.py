"""Gaussian heatmap target math.

Semantics match the reference CenterNet-style target drawing
(``det3d/core/utils/center_utils.py:17-99`` in ipl-uw/RT-POSE): a truncated
isotropic gaussian splatted with element-wise max into a (Z, Y, X) heatmap,
centered at an *integer* voxel, with window half-width ``radius`` and
``sigma = (2 * radius + 1) / 6``.  The 3-D variant uses the reference's
(unusual) normalization ``exp(-r^2 / (2 sigma^2)^(3/2))``.

Two implementations are provided:

* ``draw_gaussian3d`` — host-side numpy splat (per-object window write), used
  by the host data-pipeline path for exact reference parity.
* ``dense_pose_heatmap`` — device-side jnp formulation: instead of scattering
  a small window per object (a serial, dynamic-shape pattern that maps poorly
  to TPU), it evaluates the truncated gaussian *densely* over the fixed-shape
  grid for up to ``max_objects`` centers and max-reduces over objects.  For the
  RT-Pose feature map (16 x 64 x 160 = 163k voxels, <= a handful of objects)
  this is a trivially vectorized VPU workload and lives inside the jitted
  train step, removing the host target-assignment bottleneck.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp


def gaussian_radius(det_size, min_overlap: float = 0.5) -> float:
    """Minimal gaussian radius keeping IoU >= min_overlap for a (h, w) box.

    Same closed-form three-case solution as the reference
    (center_utils.py:17-37).
    """
    height, width = det_size

    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = np.sqrt(b1 ** 2 - 4 * a1 * c1)
    r1 = (b1 + sq1) / 2

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = np.sqrt(b2 ** 2 - 4 * a2 * c2)
    r2 = (b2 + sq2) / 2

    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = np.sqrt(b3 ** 2 - 4 * a3 * c3)
    r3 = (b3 + sq3) / 2
    return min(r1, r2, r3)


def gaussian2d(shape, sigma: float = 1.0, modulation_coef: float = 1.0) -> np.ndarray:
    """(h, w) gaussian window, standard 2-D normalization (center_utils.py:41-47)."""
    m, n = [(ss - 1.0) / 2.0 for ss in shape]
    y, x = np.ogrid[-m : m + 1, -n : n + 1]
    h = np.exp(-(x * x + y * y) / (2 * sigma * sigma)) * modulation_coef
    h[h < np.finfo(h.dtype).eps * h.max()] = 0
    return h


def gaussian3d(shape, sigma: float = 1.0, modulation_coef: float = 1.0) -> np.ndarray:
    """(d, h, w) gaussian window with the reference's ``(2 sigma^2)^(3/2)``
    denominator (center_utils.py:67-72)."""
    m, n, p = [(ss - 1.0) / 2.0 for ss in shape]
    z, y, x = np.ogrid[-m : m + 1, -n : n + 1, -p : p + 1]
    h = np.exp(-(x * x + y * y + z * z) / (2 * sigma * sigma) ** 1.5) * modulation_coef
    h[h < np.finfo(h.dtype).eps * h.max()] = 0
    return h


def draw_gaussian3d(heatmap: np.ndarray, center, radius: int, k: float = 1.0,
                    modulation_coef: float = 1.0) -> np.ndarray:
    """Splat a truncated 3-D gaussian into ``heatmap`` (Z, Y, X) in place.

    ``center`` is (x, y, z) integer voxel coordinates (reference ordering,
    center_utils.py:74-91).  Window is clipped at the volume boundary; merge
    rule is element-wise max.
    """
    diameter = 2 * radius + 1
    gaussian = gaussian3d((diameter,) * 3, sigma=diameter / 6.0,
                          modulation_coef=modulation_coef)

    x, y, z = int(center[0]), int(center[1]), int(center[2])
    nz, ny, nx = heatmap.shape[:3]

    x_lo, x_hi = min(x, radius), min(nx - x, radius + 1)
    y_lo, y_hi = min(y, radius), min(ny - y, radius + 1)
    z_lo, z_hi = min(z, radius), min(nz - z, radius + 1)

    masked_hm = heatmap[z - z_lo : z + z_hi, y - y_lo : y + y_hi, x - x_lo : x + x_hi]
    masked_g = gaussian[radius - z_lo : radius + z_hi,
                        radius - y_lo : radius + y_hi,
                        radius - x_lo : radius + x_hi]
    if min(masked_g.shape) > 0 and min(masked_hm.shape) > 0:
        np.maximum(masked_hm, masked_g * k, out=masked_hm)
    return heatmap


def draw_point3d(heatmap: np.ndarray, center) -> np.ndarray:
    """Single-voxel peak (center_utils.py:94-99)."""
    x, y, z = int(center[0]), int(center[1]), int(center[2])
    nz, ny, nx = heatmap.shape[:3]
    if 0 <= x < nx and 0 <= y < ny and 0 <= z < nz:
        heatmap[z, y, x] = 1.0
    return heatmap


def dense_pose_heatmap(centers_zyx: jnp.ndarray, valid: jnp.ndarray,
                       grid_zyx: tuple[int, int, int], radius: int) -> jnp.ndarray:
    """Fixed-shape on-device equivalent of repeated ``draw_gaussian3d`` calls.

    Args:
      centers_zyx: (M, 3) int32 integer voxel centers in (z, y, x) order.
      valid: (M,) bool — which of the M padded centers are real objects.
      grid_zyx: static (Z, Y, X) heatmap shape.
      radius: static truncation half-width.

    Returns:
      (Z, Y, X) float32 heatmap = max over valid objects of the truncated
      gaussian, exactly matching the splat semantics (window clipping at the
      boundary falls out of the dense formulation for free).
    """
    nz, ny, nx = grid_zyx
    diameter = 2 * radius + 1
    sigma = diameter / 6.0
    denom = (2.0 * sigma * sigma) ** 1.5

    zs = jnp.arange(nz, dtype=jnp.int32)[:, None, None]
    ys = jnp.arange(ny, dtype=jnp.int32)[None, :, None]
    xs = jnp.arange(nx, dtype=jnp.int32)[None, None, :]

    def one(center, ok):
        dz = zs - center[0]
        dy = ys - center[1]
        dx = xs - center[2]
        r2 = (dx * dx + dy * dy + dz * dz).astype(jnp.float32)
        g = jnp.exp(-r2 / denom)
        inside = (jnp.abs(dz) <= radius) & (jnp.abs(dy) <= radius) & (jnp.abs(dx) <= radius)
        return jnp.where(inside & ok, g, 0.0)

    per_obj = jax.vmap(one)(centers_zyx, valid)  # (M, Z, Y, X)
    return jnp.max(per_obj, axis=0)
