"""Two-stage RoI refinement head (PV-RCNN style).

Parity with ``det3d/models/roi_heads/roi_head.py:17-111`` (+ template):
pooled per-RoI features -> shared FC stack -> class + box-residual
branches.  The proposal-target assignment (IoU-matched sampling of fg/bg
rois, ``target_assigner/proposal_target_layer.py``) is provided as a pure
function over fixed-shape padded proposals.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.nms import boxes_iou3d
from ..registry import ROI_HEAD


@ROI_HEAD.register_module
class RoIHead(nn.Module):
    input_channels: int = 256
    shared_fc: Sequence[int] = (256, 256)
    cls_fc: Sequence[int] = (256, 256)
    reg_fc: Sequence[int] = (256, 256)
    num_class: int = 1
    code_size: int = 7
    dp_ratio: float = 0.0
    add_box_param: bool = False

    @nn.compact
    def __call__(self, roi_features: jnp.ndarray, rois: jnp.ndarray = None,
                 roi_scores: jnp.ndarray = None, train: bool = False):
        """roi_features: (B, N, C). Returns dict(rcnn_cls (B,N,num_class),
        rcnn_reg (B,N,code_size))."""
        h = roi_features
        if self.add_box_param:
            h = jnp.concatenate([h, rois, roi_scores[..., None]], axis=-1)

        for i, width in enumerate(self.shared_fc):
            h = nn.Dense(width, use_bias=False, name=f"shared_fc{i}")(h)
            h = nn.LayerNorm(name=f"shared_ln{i}")(h)
            h = nn.relu(h)

        def branch(x, widths, out_dim, name, final_std):
            for i, w in enumerate(widths):
                x = nn.Dense(w, use_bias=False, name=f"{name}_fc{i}")(x)
                x = nn.LayerNorm(name=f"{name}_ln{i}")(x)
                x = nn.relu(x)
            return nn.Dense(out_dim, name=f"{name}_out",
                            kernel_init=nn.initializers.normal(final_std))(x)

        rcnn_cls = branch(h, self.cls_fc, self.num_class, "cls", 0.01)
        rcnn_reg = branch(h, self.reg_fc, self.code_size, "reg", 0.001)
        return dict(rcnn_cls=rcnn_cls, rcnn_reg=rcnn_reg)


def assign_roi_targets(rois: jnp.ndarray, roi_scores: jnp.ndarray,
                       gt_boxes: jnp.ndarray, num_gt: jnp.ndarray,
                       fg_thresh: float = 0.55, bg_thresh: float = 0.1):
    """Proposal-target assignment (proposal_target_layer semantics, fixed
    shapes): each padded RoI gets its best-IoU ground truth, an fg/bg/ignore
    label, and the matched box as the regression target.

    Args:
      rois: (N, 7); roi_scores: (N,); gt_boxes: (M, 7); num_gt: ().
    Returns dict(labels (N,), target_boxes (N, 7), max_iou (N,)).
    """
    iou = boxes_iou3d(rois, gt_boxes)                   # (N, M)
    gt_valid = jnp.arange(gt_boxes.shape[0]) < num_gt
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best = jnp.argmax(iou, axis=1)
    max_iou = jnp.take_along_axis(iou, best[:, None], axis=1)[:, 0]
    labels = jnp.where(max_iou >= fg_thresh, 1,
                       jnp.where(max_iou < bg_thresh, 0, -1))
    target_boxes = gt_boxes[best]
    return dict(labels=labels, target_boxes=target_boxes, max_iou=max_iou)
