"""3-D High-Resolution Network backbone (flax.linen, channels-last).

Structural parity with the reference
(``det3d/models/backbones/hr_util/hr3d.py`` + ``hrnet3D_config.py`` +
``hrnet3d.py`` in ipl-uw/RT-POSE): a full-resolution stem block, then stages
2..4 each adding a 2x-downsampled branch via transition layers, with an
all-pairs multi-resolution fuse inside every HighResolutionModule
(1x1 GN-conv + trilinear align-corners upsample for lower-res -> higher-res,
chains of strided 3x3 GN-convs for higher-res -> lower-res, sum + ReLU).

Everything here is static-shape and jit-friendly; upsampling uses the
matmul-based align-corners resize from ``rtpose_tpu.ops.interpolate``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

from ..ops.fold_conv import FOLD, fold_x, unfold_x
from ..ops.interpolate import (resize_trilinear_align_corners,
                               resize_trilinear_folded)
from ..registry import BACKBONES
from .layers import GNConv, ResNetBlock, TorchConv3d, canonical_dtype


def _stage(num_modules=1, num_branches=2, num_blocks=(1, 1), num_channels=(32, 32)):
    return dict(num_modules=num_modules, num_branches=num_branches,
                num_blocks=tuple(num_blocks), num_channels=tuple(num_channels))


# Arch dicts — parity with hrnet3D_config.py:8-187 (yacs replaced by dicts).
MODEL_CONFIGS: Dict[str, Dict[str, Any]] = {
    "hr_tiny_feat32": dict(
        layer1=dict(inplanes=32), stage2_inplanes=32,
        stage2=_stage(1, 2, (1, 1), (32, 64)),
        stage3=_stage(1, 3, (1, 1, 1), (32, 64, 128)),
    ),
    "hr_tiny_feat16_zyx": dict(
        layer1=dict(inplanes=1), stage2_inplanes=16,
        stage2=_stage(1, 2, (1, 1), (16, 32)),
        stage3=_stage(1, 3, (1, 1, 1), (16, 32, 64)),
    ),
    "hr_tiny_feat16_zyx_l4": dict(
        layer1=dict(inplanes=1), stage2_inplanes=16,
        stage2=_stage(1, 2, (1, 1), (16, 32)),
        stage3=_stage(1, 3, (1, 1, 1), (16, 32, 64)),
        stage4=_stage(1, 4, (1, 1, 1, 1), (16, 32, 64, 64)),
    ),
    "hr_tiny_feat32_zyx_l4": dict(
        layer1=dict(inplanes=1), stage2_inplanes=32,
        stage2=_stage(1, 2, (1, 1), (32, 32)),
        stage3=_stage(1, 3, (1, 1, 1), (32, 32, 64)),
        stage4=_stage(1, 4, (1, 1, 1, 1), (32, 32, 64, 64)),
    ),
    "hr_tiny_feat32_zyx_l4_in32": dict(
        layer1=dict(inplanes=32), stage2_inplanes=32,
        stage2=_stage(1, 2, (1, 1), (32, 32)),
        stage3=_stage(1, 3, (1, 1, 1), (32, 32, 64)),
        stage4=_stage(1, 4, (1, 1, 1, 1), (32, 32, 64, 64)),
    ),
    "hr_tiny_feat64_zyx_l4_in64": dict(
        layer1=dict(inplanes=64), stage2_inplanes=64,
        stage2=_stage(1, 2, (1, 1), (64, 64)),
        stage3=_stage(1, 3, (1, 1, 1), (64, 64, 128)),
        stage4=_stage(1, 4, (1, 1, 1, 1), (64, 64, 128, 128)),
    ),
}


class HighResolutionModule(nn.Module):
    """Per-branch residual blocks followed by the all-pairs fuse
    (hr3d.py:5-229)."""

    num_branches: int
    num_blocks: Sequence[int]
    num_channels: Sequence[int]          # == num_inchannels (expansion 1)
    multi_scale_output: bool = True
    dtype: Dtype = None
    folded: bool = False

    @nn.compact
    def __call__(self, x: List[jnp.ndarray]) -> List[jnp.ndarray]:
        nb = self.num_branches
        chans = list(self.num_channels)
        if nb == 1:
            out = x[0]
            for b in range(self.num_blocks[0]):
                out = ResNetBlock(chans[0], name=f"branch0_block{b}",
                                  dtype=self.dtype, folded=self.folded)(out)
            return [out]

        # branches
        feats = []
        for i in range(nb):
            h = x[i]
            for b in range(self.num_blocks[i]):
                h = ResNetBlock(chans[i], name=f"branch{i}_block{b}",
                                dtype=self.dtype, folded=self.folded)(h)
            feats.append(h)

        # fuse
        n_out = nb if self.multi_scale_output else 1
        x_fuse = []
        for i in range(n_out):
            if i == 0:
                y = feats[0]
            else:
                # j=0 < i: downsample chain from branch 0
                y = self._down_chain(feats[0], 0, i, chans)
            for j in range(1, nb):
                if j == i:
                    y = y + feats[j]
                elif j > i:
                    up = GNConv(chans[i], kernel=1, name=f"fuse{i}_{j}",
                                dtype=self.dtype, folded=self.folded)(feats[j])
                    y = y + self._resize(up, feats[i])
                else:
                    y = y + self._down_chain(feats[j], j, i, chans)
            x_fuse.append(nn.relu(y))
        return x_fuse

    def _down_chain(self, h: jnp.ndarray, j: int, i: int, chans: List[int]) -> jnp.ndarray:
        """j < i: chain of (i-j) strided GN-convs; last one maps to chans[i]
        without ReLU, earlier ones keep chans[j] with ReLU (hr3d.py:162-197)."""
        for k in range(i - j):
            last = k == i - j - 1
            h = GNConv(chans[i] if last else chans[j], kernel=3, stride=2,
                       relu=not last, name=f"fuse{i}_{j}_k{k}",
                       dtype=self.dtype, folded=self.folded)(h)
        return h

    def _resize(self, x, target):
        tz, ty, txf = target.shape[1:4]
        if self.folded:
            return resize_trilinear_folded(x, (tz, ty, txf * FOLD))
        return resize_trilinear_align_corners(x, (tz, ty, txf))


class HighResolution3DNet(nn.Module):
    """The staged HRNet trunk (hr3d.py:234-399)."""

    cfg: Dict[str, Any]
    dtype: Dtype = None
    folded: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        cfg = self.cfg
        stage2 = cfg["stage2"]

        # layer1: full-res stem block lifting input channels to stage2 inplanes
        x = ResNetBlock(cfg["stage2_inplanes"], name="layer1", dtype=self.dtype,
                        folded=self.folded)(x)

        # ---- transition1 + stage2
        x_list = self._transition([cfg["stage2_inplanes"]],
                                  list(stage2["num_channels"]),
                                  [x], from_single=True, name="transition1")
        y_list = self._run_stage(stage2, x_list, "stage2")

        # ---- transition2 + stage3
        stage3 = cfg["stage3"]
        x_list = self._transition(list(stage2["num_channels"]),
                                  list(stage3["num_channels"]),
                                  y_list, name="transition2")
        y_list = self._run_stage(stage3, x_list, "stage3")

        # ---- transition3 + stage4 (optional)
        stage4 = cfg.get("stage4")
        if stage4 is not None:
            x_list = self._transition(list(stage3["num_channels"]),
                                      list(stage4["num_channels"]),
                                      y_list, name="transition3")
            y_list = self._run_stage(stage4, x_list, "stage4")

        return y_list

    def _run_stage(self, scfg, x_list, name):
        for m in range(scfg["num_modules"]):
            x_list = HighResolutionModule(
                num_branches=scfg["num_branches"],
                num_blocks=scfg["num_blocks"],
                num_channels=scfg["num_channels"],
                name=f"{name}_m{m}",
                dtype=self.dtype,
                folded=self.folded,
            )(x_list)
        return x_list

    def _transition(self, pre_ch: List[int], cur_ch: List[int],
                    y_list: List[jnp.ndarray], from_single: bool = False,
                    name: str = "transition") -> List[jnp.ndarray]:
        """Reference transition semantics (hr3d.py:286-331, 373-397):
        existing branches get a 3x3 GN-conv only on channel mismatch; each new
        branch is built from the LAST previous branch via strided GN-convs.
        Non-identity transitions read from the last previous output."""
        out = []
        n_pre = len(pre_ch)
        for i in range(len(cur_ch)):
            if i < n_pre:
                if cur_ch[i] != pre_ch[i]:
                    src = y_list[0] if from_single else y_list[-1]
                    out.append(GNConv(cur_ch[i], kernel=3, stride=1, relu=True,
                                      name=f"{name}_b{i}", dtype=self.dtype,
                                      folded=self.folded)(src))
                else:
                    out.append(y_list[0] if from_single else y_list[i])
            else:
                h = y_list[0] if from_single else y_list[-1]
                for j in range(i + 1 - n_pre):
                    outc = cur_ch[i] if j == i - n_pre else pre_ch[-1]
                    h = GNConv(outc, kernel=3, stride=2, relu=True,
                               name=f"{name}_b{i}_j{j}", dtype=self.dtype,
                               folded=self.folded)(h)
                out.append(h)
        return out


@BACKBONES.register_module
class HRNet3D(nn.Module):
    """Backbone wrapper with the final multi-branch fuse (hrnet3d.py:8-56).

    final_fuse:
      'top'        — take the full-resolution branch only.
      'conat_conv' — trilinear-upsample all branches to full res, concat
                     channels, then a 1x1x1 conv to ``final_conv_out``
                     (the reference's spelling of 'concat_conv' is kept for
                     config parity).
    """

    backbone_cfg: str = "hr_tiny_feat16_zyx_l4"
    final_conv_in: int = 192
    final_conv_out: int = 128
    final_fuse: str = "conat_conv"
    ds_factor: int = 1
    feat_transform: Optional[dict] = None
    dtype: Dtype = None
    fold_x: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Returns the fused feature map.  In folded mode the OUTPUT STAYS
        FOLDED — (B, Z, Y, X/4, 4C) — and the head unfolds after its final
        convs (unfolding a 128-channel full-res tensor here would cost more
        than the entire head)."""
        dtype = canonical_dtype(self.dtype)
        if dtype is not None:
            x = x.astype(dtype)
        # fold needs every branch resolution X/8 to stay divisible by 4
        folded = self.fold_x and (x.shape[3] % (8 * FOLD) == 0)
        if folded:
            x = fold_x(x)
        cfg = MODEL_CONFIGS[self.backbone_cfg]
        feats = HighResolution3DNet(cfg, name="backbone", dtype=dtype,
                                    folded=folded)(x)
        top = feats[0]
        if self.final_fuse == "top":
            out = top
            if self.final_conv_in != self.final_conv_out:
                out = TorchConv3d(self.final_conv_out, kernel=1,
                                  name="final_conv", dtype=dtype,
                                  folded=folded)(out)
            return out
        if folded:
            from ..ops import quant as quant_ops
            from ..ops.interpolate import resize_trilinear_folded_int8
            tz, ty, txf = top.shape[1:4]
            ups = []
            for i, f in enumerate(feats[1:]):
                ff = f.astype(top.dtype)
                scale = None
                if quant_ops.current() is not None:
                    # final-fuse resizes are MXU matmuls over folded lanes —
                    # int8-eligible like the convs; consult the quant
                    # context per branch (inline site, like final_conv)
                    rpath = ("/".join(self.path) + "/" if self.path
                             else "") + f"final_fuse{i + 1}_resize"
                    scale = quant_ops.consult(rpath, ff)
                if scale is not None:
                    ups.append(resize_trilinear_folded_int8(
                        ff, (tz, ty, txf * FOLD), scale))
                else:
                    ups.append(resize_trilinear_folded(
                        ff, (tz, ty, txf * FOLD)))
        else:
            ups = [resize_trilinear_align_corners(f.astype(top.dtype),
                                                  top.shape[1:4])
                   for f in feats[1:]]
        out = jnp.concatenate([top, *ups], axis=-1)
        if self.final_fuse == "conat_conv" and self.final_conv_in != self.final_conv_out:
            denom = FOLD if folded else 1
            block_ch = [f.shape[-1] // denom for f in [top, *ups]]
            # canonical (1,1,1,Cin,Cout) param shared by both layouts
            w = self.param("final_conv_kernel", nn.initializers.he_normal(),
                           (1, 1, 1, sum(block_ch), self.final_conv_out))
            b = self.param("final_conv_bias", nn.initializers.zeros_init(),
                           (self.final_conv_out,))
            if folded:
                from ..ops import quant as quant_ops
                from ..ops.fold_conv import conv3d_folded_concat
                if quant_ops.current() is not None:
                    # the final fuse conv is an inline-param site (not a
                    # TorchConv3d) — consult the quant context directly so
                    # its ~8 GFLOP/frame contraction calibrates + quantizes
                    path = "/".join(self.path + ("final_conv",)) if self.path \
                        else "final_conv"
                    scale = quant_ops.consult(path, out)
                    if scale is not None:
                        return quant_ops.conv3d_int8_concat_1x1(
                            out, w, b, block_ch, scale, out.dtype)
                out = conv3d_folded_concat(out, w.astype(out.dtype), block_ch, b)
            else:
                from ..ops.fold_conv import conv3d_naive
                out = conv3d_naive(out, w.astype(out.dtype), b)
        return out
