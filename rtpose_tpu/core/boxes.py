"""3-D box geometry (jnp + numpy duals of the det3d box-op surface).

Covers the load-bearing subset of ``det3d/core/bbox/box_np_ops.py`` /
``box_torch_ops.py`` (the reference carries ~40 functions, most dormant
det3d inheritance): corner computation, yaw rotation, point-in-box tests,
axis-aligned IoU, range masking, and camera<->lidar frame changes.
Rotated-IoU / NMS live in ``rtpose_tpu.ops.nms``.

Box convention: (x, y, z, dx, dy, dz, yaw), z = box center (PCDet, as used
by the reference's active wrappers in iou3d_nms_utils).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rotation_matrix_z(yaw):
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, -s, zeros], -1),
        jnp.stack([s, c, zeros], -1),
        jnp.stack([zeros, zeros, ones], -1),
    ], -2)


def box_corners_3d(boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, 7) -> (N, 8, 3) corners (box_np_ops.center_to_corner_box3d
    semantics, z-center origin)."""
    template = jnp.asarray([
        [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
        [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
    ], jnp.float32) / 2.0
    corners = template[None] * boxes[:, None, 3:6]
    rot = rotation_matrix_z(boxes[:, 6])                  # (N, 3, 3)
    corners = jnp.einsum("nij,nkj->nki", rot, corners)
    return corners + boxes[:, None, :3]


def rotate_points_z(points: jnp.ndarray, yaw) -> jnp.ndarray:
    """Rotate (..., 3) points around z by yaw (box_torch_ops.rotate_points_along_z)."""
    rot = rotation_matrix_z(jnp.asarray(yaw))
    return jnp.einsum("ij,...j->...i", rot, points)


def points_in_box(points: jnp.ndarray, box: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) points inside one (7,) rotated box -> (N,) bool
    (box_np_ops.points_in_rbbox semantics)."""
    local = points - box[:3]
    c, s = jnp.cos(-box[6]), jnp.sin(-box[6])
    lx = local[:, 0] * c - local[:, 1] * s
    ly = local[:, 0] * s + local[:, 1] * c
    lz = local[:, 2]
    return ((jnp.abs(lx) <= box[3] / 2) & (jnp.abs(ly) <= box[4] / 2)
            & (jnp.abs(lz) <= box[5] / 2))


def iou_aligned(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray, eps: float = 0.0
                ) -> jnp.ndarray:
    """Axis-aligned 2-D IoU for (N, 4)/(M, 4) [x1, y1, x2, y2] boxes
    (box_np_ops.iou_jit parity, including the +eps area convention)."""
    area_a = ((boxes_a[:, 2] - boxes_a[:, 0] + eps)
              * (boxes_a[:, 3] - boxes_a[:, 1] + eps))[:, None]
    area_b = ((boxes_b[:, 2] - boxes_b[:, 0] + eps)
              * (boxes_b[:, 3] - boxes_b[:, 1] + eps))[None, :]
    iw = jnp.clip(jnp.minimum(boxes_a[:, None, 2], boxes_b[None, :, 2])
                  - jnp.maximum(boxes_a[:, None, 0], boxes_b[None, :, 0]) + eps, 0)
    ih = jnp.clip(jnp.minimum(boxes_a[:, None, 3], boxes_b[None, :, 3])
                  - jnp.maximum(boxes_a[:, None, 1], boxes_b[None, :, 1]) + eps, 0)
    inter = iw * ih
    return inter / jnp.clip(area_a + area_b - inter, 1e-9)


def mask_boxes_outside_range(boxes: jnp.ndarray, limit_range) -> jnp.ndarray:
    """(N, 7) -> (N,) bool: center within [xmin, ymin, zmin, xmax, ymax, zmax]
    (box_np_ops.limit_period-range masking / post_center_limit_range)."""
    lo = jnp.asarray(limit_range[:3])
    hi = jnp.asarray(limit_range[3:])
    return jnp.all((boxes[:, :3] >= lo) & (boxes[:, :3] <= hi), axis=1)


def limit_period(val, offset: float = 0.5, period: float = np.pi):
    """Wrap angles into [-offset*period, (1-offset)*period) (box_np_ops)."""
    return val - jnp.floor(val / period + offset) * period


def camera_to_lidar(points: jnp.ndarray, r_rect: jnp.ndarray,
                    velo2cam: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) camera-frame -> lidar-frame (box_np_ops.camera_to_lidar)."""
    N = points.shape[0]
    pts = jnp.concatenate([points, jnp.ones((N, 1), points.dtype)], axis=1)
    inv = jnp.linalg.inv(r_rect @ velo2cam)
    return (pts @ inv.T)[:, :3]


def lidar_to_camera(points: jnp.ndarray, r_rect: jnp.ndarray,
                    velo2cam: jnp.ndarray) -> jnp.ndarray:
    N = points.shape[0]
    pts = jnp.concatenate([points, jnp.ones((N, 1), points.dtype)], axis=1)
    return (pts @ (r_rect @ velo2cam).T)[:, :3]
