"""CenterPoint/CenterNet-style pose head (flax.linen, channels-last).

Parity with the reference ``det3d/models/pose_heads/center_head.py``:

* optional shared conv (GN8 + 3x3x3 conv + ReLU) when the backbone output
  width differs from ``share_conv_channel`` (lines 203-211);
* per-task ``SepHead``: each named head ('reg', 'hm', ...) is a small conv
  tower — (num_conv-1) x [3x3x3 conv(head_conv) + ReLU] then a final 3x3x3
  conv to the target width; the heatmap head's final bias initializes to
  ``init_bias`` = -2.19 (lines 66-109);
* ``loss`` = FastFocalLoss(clamped sigmoid hm) + weight * sum(code_weights *
  per-dim masked-L1) (lines 244-270);
* ``predict`` = dense decode + per-sample argmax post-processing — see
  ``rtpose_tpu.core.decode`` (lines 272-360).

The deformable-conv head variant (DCNSepHead) lives in
``rtpose_tpu.models.dcn_head`` and is selected with ``dcn_head=True``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.fold_conv import FOLD, unfold_x
from ..registry import HEADS
from .layers import GroupNorm8, TorchConv3d
from .losses import clamped_sigmoid, fast_focal_loss_logits, reg_loss


class SepHead(nn.Module):
    """Separate conv tower per named output head."""

    heads: Dict[str, Tuple[int, int]]      # name -> (out_channels, num_conv)
    head_conv: int = 64
    final_kernel: int = 3
    init_bias: float = -2.19
    dtype: Any = None
    folded: bool = False
    final_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, branch: str | None = None,
                 folded: bool | None = None,
                 inner_mask: jnp.ndarray | None = None) -> Dict[str, jnp.ndarray]:
        """Compute all heads, or only ``branch``.  ``folded`` overrides the
        field (the sparse-inference path feeds small UNFOLDED patches through
        the same canonical params).  ``inner_mask`` zeroes intermediate
        activations at positions outside the original volume so a patch
        reproduces the dense path's inter-conv zero padding exactly."""
        folded = self.folded if folded is None else folded
        out = {}
        for head, (classes, num_conv) in self.heads.items():
            if branch is not None and head != branch:
                continue
            h = x
            for i in range(num_conv - 1):
                h = TorchConv3d(self.head_conv, kernel=self.final_kernel,
                                name=f"{head}_conv{i}", dtype=self.dtype,
                                folded=folded)(h)
                h = nn.relu(h)
                if inner_mask is not None:
                    h = h * inner_mask
            bias_init = (nn.initializers.constant(self.init_bias)
                         if "hm" in head else nn.initializers.zeros_init())
            # final projection defaults to f32 (heatmap logits feed log
            # terms, regression feeds an L1); final_dtype='bfloat16' trades
            # ~0.4% logit precision for lane-starved f32 conv time.
            fdt = self.final_dtype
            h = TorchConv3d(classes, kernel=self.final_kernel, use_bias=True,
                            bias_init=bias_init, dtype=fdt,
                            folded=folded,
                            name=f"{head}_out")(h.astype(
                                jnp.float32 if fdt in (None, jnp.float32) else h.dtype))
            h = h.astype(jnp.float32)
            if folded:
                h = unfold_x(h)
            out[head] = h
        return out


@HEADS.register_module
class CenterHead(nn.Module):
    """Multi-task center head."""

    tasks: Sequence[dict]                  # [{'num_class': n, 'class_names': [...]}]
    in_channels: int = 128
    share_conv_channel: int = 64
    common_heads: Dict[str, Tuple[int, int]] = None
    weight: float = 0.1                    # hm-loss vs loc-loss balance
    code_weights: Sequence[float] = ()
    init_bias: float = -2.19
    num_hm_conv: int = 2
    dataset: str = "cruw_pose"
    dcn_head: bool = False
    dtype: Any = None
    fold_x: bool = True
    final_dtype: Any = jnp.float32
    # "logits": numerically-stable logits-form focal (default — same math as
    # the reference wherever its clamp is inactive, but no gradient dead
    # zone).  "clamped": the reference's exact clamp(sigmoid, 1e-4, 1-1e-4)
    # form (centernet_loss.py:6-31) — used by the end-to-end training
    # trajectory parity suite.
    focal_form: str = "logits"

    @property
    def num_classes(self) -> List[int]:
        return [len(t["class_names"]) for t in self.tasks]

    def _is_folded(self, x) -> bool:
        return bool(self.fold_x and x.ndim == 5 and x.shape[-1] % FOLD == 0
                    and self.in_channels * FOLD == x.shape[-1])

    @nn.compact
    def __call__(self, x: jnp.ndarray, branch: str | None = None,
                 patch: bool = False,
                 inner_mask: jnp.ndarray | None = None) -> List[Dict[str, jnp.ndarray]]:
        """Full dense heads, or a single ``branch``; ``patch=True`` marks a
        small unfolded input (sparse-inference reg patches) with
        ``inner_mask`` carrying in-volume validity."""
        folded = False if patch else self._is_folded(x)
        if self.in_channels != self.share_conv_channel:
            h = GroupNorm8(name="shared_gn", folded=folded)(x)
            h = TorchConv3d(self.share_conv_channel, kernel=3, use_bias=False,
                            name="shared_conv", dtype=self.dtype,
                            folded=folded)(h)
            x = nn.relu(h)
        ret = []
        for ti, num_cls in enumerate(self.num_classes):
            heads = dict(self.common_heads or {})
            if self.dcn_head:
                from .dcn_head import DCNSepHead
                # deformable sampling needs the true (Y, X) grid — unfold
                # the X-folded backbone layout back to dense spatial
                xd = unfold_x(x) if folded else x
                ret.append(DCNSepHead(num_cls=num_cls, heads=heads,
                                      head_conv=32, init_bias=self.init_bias,
                                      name=f"task{ti}")(xd))
            else:
                heads["hm"] = (num_cls, self.num_hm_conv)
                ret.append(SepHead(heads=heads, head_conv=32, final_kernel=3,
                                   init_bias=self.init_bias, name=f"task{ti}",
                                   dtype=self.dtype, folded=folded,
                                   final_dtype=self.final_dtype)(
                               x, branch=branch,
                               folded=None if not patch else False,
                               inner_mask=inner_mask))
        return ret

    # ---- loss / predict are pure functions of the module outputs ----

    def loss(self, example: Dict[str, Any], preds_dicts: List[Dict[str, jnp.ndarray]]):
        """Compute per-task losses.

        ``example`` carries per-task lists: hm (B,Z,Y,X,C), anno_pose (B,M,D),
        ind (B,M), mask (B,M), cat (B,M)  (channels-last).
        """
        code_w = jnp.asarray(self.code_weights, jnp.float32)
        rets = []
        for task_id, preds in enumerate(preds_dicts):
            if self.focal_form == "clamped":
                from .losses import fast_focal_loss
                hm_loss = fast_focal_loss(clamped_sigmoid(preds["hm"]),
                                          example["hm"][task_id],
                                          example["ind"][task_id],
                                          example["mask"][task_id],
                                          example["cat"][task_id])
            else:
                # logits-form focal loss: same math as the reference's clamped
                # sigmoid wherever the clamp is inactive, but no gradient dead
                # zone (see fast_focal_loss_logits)
                hm_loss = fast_focal_loss_logits(preds["hm"],
                                                 example["hm"][task_id],
                                                 example["ind"][task_id],
                                                 example["mask"][task_id],
                                                 example["cat"][task_id])
            rl = reg_loss(preds["reg"].astype(jnp.float32),
                          example["mask"][task_id],
                          example["ind"][task_id],
                          example["anno_pose"][task_id])
            loc_loss = jnp.sum(rl * code_w)
            loss = hm_loss + self.weight * loc_loss
            rets.append(dict(loss=loss, hm_loss=hm_loss, loc_loss=loc_loss,
                             loc_loss_elem=rl,
                             num_positive=jnp.sum(example["mask"][task_id].astype(jnp.float32))))
        merged: Dict[str, list] = {}
        for r in rets:
            for k, v in r.items():
                merged.setdefault(k, []).append(v)
        return merged

    def predict(self, preds_dicts: List[Dict[str, jnp.ndarray]], decode_spec):
        """Decode each task's dense output; returns per-task (kpts, scores,
        labels) device arrays (host formatting happens in the engine)."""
        from ..core.decode import decode_pose_preds
        out = []
        for preds in preds_dicts:
            out.append(decode_pose_preds(preds["hm"], preds["reg"], decode_spec))
        return out
