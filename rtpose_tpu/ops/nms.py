"""NMS and rotated-box overlap ops — XLA-native, fixed shapes.

TPU-native equivalents of two reference native components:

* ``circle_nms`` (numba, ``det3d/core/utils/circle_nms_jit.py:4-28``):
  greedy center-distance suppression.  Here a ``lax.fori_loop`` over a
  precomputed pairwise distance matrix — fixed shapes, fully on-device.
* ``iou3d_nms`` CUDA extension (``det3d/ops/iou3d_nms``): rotated-box BEV
  overlap / IoU (polygon clipping) and greedy rotated NMS.  The polygon
  intersection is Sutherland–Hodgman with static vertex buffers (a 4-gon
  clipped by a 4-gon has <= 8 vertices), vmapped over box pairs — the
  VPU-friendly replacement for the reference's per-pair CUDA kernel
  (``iou3d_nms_kernel.cu:236-328``).

Boxes follow the PCDet convention of the reference wrappers
(``iou3d_nms_utils.py:13-120``): (x, y, z, dx, dy, dz, heading), z the
box CENTER.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_CLIP_VERTS = 8


def circle_nms(dets: jnp.ndarray, thresh: float, post_max_size: int = 83):
    """Greedy center-distance NMS.

    Args:
      dets: (N, 3) — x, y, score.
      thresh: squared-distance threshold (reference semantics: suppress when
        ``dist**2 <= thresh``).
      post_max_size: fixed output length.

    Returns (keep_indices, num_kept): (post_max_size,) int32 padded with -1.
    """
    N = dets.shape[0]
    order = jnp.argsort(-dets[:, 2])
    xs = dets[order, 0]
    ys = dets[order, 1]
    d2 = (xs[:, None] - xs[None, :]) ** 2 + (ys[:, None] - ys[None, :]) ** 2
    idx = jnp.arange(N)

    def body(i, suppressed):
        row = (idx > i) & (d2[i] <= thresh) & ~suppressed[i]
        return suppressed | row

    suppressed = jax.lax.fori_loop(0, N, body, jnp.zeros((N,), bool))
    keep_sorted = ~suppressed
    # stable-compact kept indices (original numbering) into fixed output
    kept_rank = jnp.cumsum(keep_sorted) - 1
    out = jnp.full((post_max_size,), -1, jnp.int32)
    src = jnp.where(keep_sorted & (kept_rank < post_max_size), kept_rank,
                    post_max_size)
    out = jnp.zeros((post_max_size + 1,), jnp.int32).at[src].set(
        order.astype(jnp.int32))[:post_max_size]
    num = jnp.minimum(jnp.sum(keep_sorted.astype(jnp.int32)), post_max_size)
    out = jnp.where(jnp.arange(post_max_size) < num, out, -1)
    return out, num


# ---------------------------------------------------------------------------
# rotated-box geometry


def box_corners_bev(boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, 7) PCDet boxes -> (N, 4, 2) BEV corners (counterclockwise)."""
    x, y, dx, dy, rz = boxes[:, 0], boxes[:, 1], boxes[:, 3], boxes[:, 4], boxes[:, 6]
    cx = jnp.stack([dx, dx, -dx, -dx], axis=1) / 2.0
    cy = jnp.stack([-dy, dy, dy, -dy], axis=1) / 2.0
    c, s = jnp.cos(rz)[:, None], jnp.sin(rz)[:, None]
    rx = cx * c - cy * s + x[:, None]
    ry = cx * s + cy * c + y[:, None]
    return jnp.stack([rx, ry], axis=-1)


def _clip_poly_by_edge(verts, nverts, p0, p1):
    """Sutherland–Hodgman: clip a polygon (fixed buffer) by the half-plane
    left of edge p0->p1.  verts: (MAX_CLIP_VERTS, 2), nverts: scalar."""
    M = verts.shape[0]
    edge = p1 - p0
    idx = jnp.arange(M)
    nxt = jnp.where(idx + 1 >= nverts, 0, idx + 1)
    cur = verts
    nxtv = verts[nxt]

    def side(pt):
        return edge[0] * (pt[..., 1] - p0[1]) - edge[1] * (pt[..., 0] - p0[0])

    s_cur = side(cur)
    s_nxt = side(nxtv)
    in_cur = s_cur >= 0
    in_nxt = s_nxt >= 0

    denom = s_cur - s_nxt
    t = jnp.where(jnp.abs(denom) > 1e-12, s_cur / jnp.where(denom == 0, 1.0, denom), 0.0)
    inter = cur + (nxtv - cur) * t[:, None]

    # each input edge emits up to 2 points: (cur if in_cur), (inter if crossing)
    emit1 = in_cur & (idx < nverts)
    emit2 = (in_cur ^ in_nxt) & (idx < nverts)
    pts = jnp.concatenate([cur, inter], axis=0)          # (2M, 2)
    emits = jnp.concatenate([emit1, emit2])
    # interleave in edge order: out order = for each i: [cur_i, inter_i]
    order = jnp.arange(2 * M).reshape(2, M).T.reshape(-1)
    pts = pts[order]
    emits = emits[order]

    rank = jnp.cumsum(emits) - 1
    out = jnp.zeros((M, 2), verts.dtype)
    dst = jnp.where(emits & (rank < M), rank, M)
    out = jnp.zeros((M + 1, 2), verts.dtype).at[dst].set(
        jnp.where(emits[:, None], pts, 0.0))[:M]
    return out, jnp.minimum(jnp.sum(emits.astype(jnp.int32)), M)


def _poly_area(verts, nverts):
    M = verts.shape[0]
    idx = jnp.arange(M)
    nxt = jnp.where(idx + 1 >= nverts, 0, idx + 1)
    mask = (idx < nverts).astype(verts.dtype)
    cross = verts[:, 0] * verts[nxt, 1] - verts[nxt, 0] * verts[:, 1]
    return 0.5 * jnp.abs(jnp.sum(cross * mask))


def _pair_overlap(corners_a, corners_b):
    """Intersection area of two convex quads (each (4, 2))."""
    verts = jnp.zeros((MAX_CLIP_VERTS, 2), corners_a.dtype).at[:4].set(corners_a)
    n = jnp.asarray(4, jnp.int32)

    def clip_edge(i, carry):
        verts, n = carry
        p0 = corners_b[i]
        p1 = corners_b[(i + 1) % 4]
        return _clip_poly_by_edge(verts, n, p0, p1)

    verts, n = jax.lax.fori_loop(0, 4, clip_edge, (verts, n))
    return jnp.where(n >= 3, _poly_area(verts, n), 0.0)


def boxes_overlap_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise BEV intersection area, (N, M)."""
    ca = box_corners_bev(boxes_a)
    cb = box_corners_bev(boxes_b)
    f = jax.vmap(lambda a: jax.vmap(lambda b: _pair_overlap(a, b))(cb))
    return f(ca)


def boxes_iou_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise rotated BEV IoU (iou3d_nms_utils.boxes_iou_bev parity)."""
    inter = boxes_overlap_bev(boxes_a, boxes_b)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return inter / jnp.clip(area_a + area_b - inter, 1e-6)


def boxes_iou3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise 3-D IoU with z-extent overlap (boxes_iou3d_gpu parity)."""
    inter_bev = boxes_overlap_bev(boxes_a, boxes_b)
    za1 = boxes_a[:, 2] - boxes_a[:, 5] / 2
    za2 = boxes_a[:, 2] + boxes_a[:, 5] / 2
    zb1 = boxes_b[:, 2] - boxes_b[:, 5] / 2
    zb2 = boxes_b[:, 2] + boxes_b[:, 5] / 2
    zo = jnp.clip(jnp.minimum(za2[:, None], zb2[None, :])
                  - jnp.maximum(za1[:, None], zb1[None, :]), 0.0)
    inter = inter_bev * zo
    va = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vb = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return inter / jnp.clip(va + vb - inter, 1e-6)


def rotate_nms(boxes: jnp.ndarray, scores: jnp.ndarray, thresh: float,
               pre_max_size: int | None = None, post_max_size: int = 83):
    """Greedy rotated-BEV-IoU NMS (nms_gpu parity, lax-looped).

    Returns (keep_indices, num_kept) with fixed (post_max_size,) output.
    """
    N = boxes.shape[0]
    if pre_max_size is not None and pre_max_size < N:
        top = jnp.argsort(-scores)[:pre_max_size]
        boxes, scores = boxes[top], scores[top]
        remap = top
        N = pre_max_size
    else:
        remap = jnp.arange(N)

    order = jnp.argsort(-scores)
    iou = boxes_iou_bev(boxes[order], boxes[order])
    idx = jnp.arange(N)

    def body(i, suppressed):
        row = (idx > i) & (iou[i] > thresh) & ~suppressed[i]
        return suppressed | row

    suppressed = jax.lax.fori_loop(0, N, body, jnp.zeros((N,), bool))
    keep_sorted = ~suppressed
    kept_rank = jnp.cumsum(keep_sorted) - 1
    dst = jnp.where(keep_sorted & (kept_rank < post_max_size), kept_rank,
                    post_max_size)
    out = jnp.zeros((post_max_size + 1,), jnp.int32).at[dst].set(
        remap[order].astype(jnp.int32))[:post_max_size]
    num = jnp.minimum(jnp.sum(keep_sorted.astype(jnp.int32)), post_max_size)
    out = jnp.where(jnp.arange(post_max_size) < num, out, -1)
    return out, num
