"""Building-block layers for the 3-D HRNet (flax.linen, channels-last).

Structural parity with the reference blocks
(``det3d/models/backbones/hr_util/common.py``):

* ``SingleConv`` — order-string composition, e.g. 'gcr' = GroupNorm(8) ->
  Conv3d -> ReLU; conv bias only when there is no norm in the order.
* ``ResNetBlock`` — 1x1 channel lift (identity when channels match) + two
  SingleConvs ('gcr' then 'gc') + residual + ReLU.

TPU notes: tensors are (B, Z, Y, X, C) so the channel dim rides the 128-wide
lane dimension; convs use explicit torch-style padding (pad 1 each side for
k=3) so strided shapes match the reference exactly (XLA 'SAME' places pads
differently for even sizes).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

# torch-equivalent explicit paddings
PAD_K3 = ((1, 1), (1, 1), (1, 1))
PAD_K1 = ((0, 0), (0, 0), (0, 0))


def canonical_dtype(dtype):
    """Accept 'bfloat16'/'float32' strings from config files."""
    return jnp.dtype(dtype) if isinstance(dtype, str) else dtype


def conv3d(features: int, kernel: int = 3, stride: int = 1, bias: bool = True,
           name: str | None = None, dtype: Dtype = None) -> nn.Conv:
    dtype = canonical_dtype(dtype)
    pad = PAD_K3 if kernel == 3 else PAD_K1
    return nn.Conv(features, kernel_size=(kernel,) * 3, strides=(stride,) * 3,
                   padding=pad, use_bias=bias, name=name, dtype=dtype,
                   kernel_init=nn.initializers.he_normal())


class GN(nn.Module):
    """GroupNorm(8) with f32 statistics and compute-dtype output.

    The per-sample reduction spans the whole ~160k-voxel volume, so
    statistics accumulate in float32 regardless of the bf16 compute dtype —
    but the OUTPUT is cast back to the input dtype: leaving GN outputs f32
    doubles HBM traffic on every norm->conv edge of the network, and on TPU
    this model is HBM-bandwidth-bound.
    """

    num_groups: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = nn.GroupNorm(num_groups=self.num_groups, dtype=jnp.float32,
                           name="gn")(x)
        return out.astype(x.dtype)


def group_norm(channels: int, num_groups: int = 8, name: str | None = None) -> GN:
    """GroupNorm(8) with the reference's one-group fallback for thin tensors."""
    if channels < num_groups:
        num_groups = 1
    return GN(num_groups=num_groups, name=name)


class SingleConv(nn.Module):
    """Order-string conv block; default 'gcr' (GN8 -> Conv3d -> ReLU)."""

    features: int
    kernel: int = 3
    stride: int = 1
    order: str = "gcr"
    num_groups: int = 8
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        order = self.order
        assert "c" in order
        has_norm = "g" in order or "b" in order
        for i, ch in enumerate(order):
            if ch == "g":
                # norm over input channels if it precedes the conv
                before = i < order.index("c")
                x = group_norm(x.shape[-1] if before else self.features,
                               self.num_groups)(x)
            elif ch == "c":
                x = conv3d(self.features, self.kernel, self.stride,
                           bias=not has_norm, dtype=self.dtype)(x)
            elif ch == "r":
                x = nn.relu(x)
            elif ch == "l":
                x = nn.leaky_relu(x, 0.01)
            elif ch == "e":
                x = nn.elu(x)
            else:
                raise ValueError(f"unsupported order char {ch!r}")
        return x


class ResNetBlock(nn.Module):
    """Residual block (common.py:98-148): conv1 channel lift, 'gcr' conv,
    'gc' conv, residual add, ReLU."""

    features: int
    stride: int = 1
    order: str = "gcr"
    use_downsample: bool = False  # GN + 1x1 strided conv on the residual
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.shape[-1] != self.features:
            residual = conv3d(self.features, kernel=1, bias=True, name="conv1",
                              dtype=self.dtype)(x)
        else:
            residual = x
        out = SingleConv(self.features, stride=self.stride, order=self.order,
                         name="conv2", dtype=self.dtype)(residual)
        n_order = self.order
        for c in "rel":
            n_order = n_order.replace(c, "")
        out = SingleConv(self.features, order=n_order, name="conv3",
                         dtype=self.dtype)(out)
        if self.use_downsample:
            r = group_norm(residual.shape[-1], name="down_gn")(residual)
            r = nn.Conv(self.features, (1, 1, 1), strides=(self.stride,) * 3,
                        padding=PAD_K1, use_bias=False, name="down_conv")(r)
            residual = r
        out = out + residual
        return nn.relu(out)


class GNConv(nn.Module):
    """GroupNorm(8) -> Conv3d(bias=False) [-> ReLU], the transition/fuse
    primitive of the reference HRNet (hr3d.py:82-92, 145-197, 296-328)."""

    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = group_norm(x.shape[-1])(x)
        x = conv3d(self.features, self.kernel, self.stride, bias=False,
                   dtype=self.dtype)(x)
        if self.relu:
            x = nn.relu(x)
        return x
