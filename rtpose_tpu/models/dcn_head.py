"""Deformable-conv head (dcn_head=True capability).

Parity with the reference (``center_head.py:24-163``):

* ``FeatureAdaption`` — a 1x1 conv (zero-init) predicts offsets, a
  DeformConv applies them, ReLU (lines 24-62; offset conv zero-init at 56-57
  so the module starts as a plain conv).
* ``DCNSepHead`` — separate deformable feature adaption for the
  classification and regression branches; cls head is conv+norm+relu+conv
  with the -2.19 bias; the task head is a regular SepHead (lines 111-163).

The reference's DCN modules are 2-D (inherited from CenterPoint's BEV
head) and would crash on this repo's 5-D radar features; here 3-D inputs
fold Z into the batch for the 2-D deformable ops and unfold after, so
``dcn_head=True`` actually runs.  Deformable sampling is the XLA
gather+matmul op in ``rtpose_tpu.ops.deform_conv``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.deform_conv import deform_conv2d


class DeformConv2d(nn.Module):
    """DeformConv module (v1) with externally supplied offsets."""

    features: int
    kernel: int = 3
    padding: int = 1
    deformable_groups: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        w = self.param("kernel", nn.initializers.he_normal(),
                       (self.kernel, self.kernel, C, self.features))
        return deform_conv2d(x, offset, w.astype(x.dtype), padding=self.padding,
                             deformable_groups=self.deformable_groups)


class FeatureAdaption(nn.Module):
    out_features: int
    kernel: int = 3
    deformable_groups: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        offset = nn.Conv(self.deformable_groups * self.kernel * self.kernel * 2,
                         (1, 1), use_bias=True,
                         kernel_init=nn.initializers.zeros_init(),
                         name="conv_offset")(x)
        x = DeformConv2d(self.out_features, kernel=self.kernel,
                         padding=(self.kernel - 1) // 2,
                         deformable_groups=self.deformable_groups,
                         name="conv_adaption")(x, offset)
        return nn.relu(x)


class DCNSepHead(nn.Module):
    """Deformable separate head; accepts (B, Z, Y, X, C) or (B, H, W, C)."""

    num_cls: int
    heads: Dict[str, Tuple[int, int]]
    head_conv: int = 64
    final_kernel: int = 3
    init_bias: float = -2.19
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        from .center_head import SepHead

        is_3d = x.ndim == 5
        if is_3d:
            B, Z, Y, X, C = x.shape
            x2 = x.reshape(B * Z, Y, X, C)
        else:
            x2 = x

        center_feat = FeatureAdaption(x2.shape[-1], name="feature_adapt_cls")(x2)
        reg_feat = FeatureAdaption(x2.shape[-1], name="feature_adapt_reg")(x2)

        h = nn.Conv(self.head_conv, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=True, name="cls_conv0")(center_feat)
        h = nn.relu(nn.LayerNorm(name="cls_norm")(h))
        cls_score = nn.Conv(self.num_cls, (3, 3), padding=((1, 1), (1, 1)),
                            use_bias=True,
                            bias_init=nn.initializers.constant(self.init_bias),
                            name="cls_out")(h)

        if is_3d:
            reg_feat = reg_feat.reshape(B, Z, Y, X, -1)
            cls_score = cls_score.reshape(B, Z, Y, X, -1)
        ret = SepHead(heads=self.heads, head_conv=self.head_conv,
                      final_kernel=self.final_kernel, init_bias=self.init_bias,
                      dtype=self.dtype, name="task_head")(reg_feat)
        ret["hm"] = cls_score
        return ret
