"""Building-block layers for the 3-D HRNet (flax.linen, channels-last).

Structural parity with the reference blocks
(``det3d/models/backbones/hr_util/common.py``):

* ``SingleConv`` — order-string composition, e.g. 'gcr' = GroupNorm(8) ->
  Conv3d -> ReLU; conv bias only when there is no norm in the order.
* ``ResNetBlock`` — 1x1 channel lift (identity when channels match) + two
  SingleConvs ('gcr' then 'gc') + residual + ReLU.

TPU notes:

* tensors are (B, Z, Y, X, C) so the channel dim rides the 128-wide lane
  dimension; convs use explicit torch-style padding (pad k//2 each side) so
  strided shapes match the reference exactly;
* every layer supports the FOLDED layout (4 X-positions packed into
  channels, see ``rtpose_tpu.ops.fold_conv``) — thin-channel 3-D convs
  waste the 128-lane MXU, and the folded network runs its dominant convs
  ~3x faster.  Parameters are identical between modes (canonical
  (k, k, k, C, Co) kernels; folding happens at apply time).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import quant as quant_ops
from ..ops.fold_conv import (FOLD, conv3d_folded, conv3d_folded_gather,
                             conv3d_naive, group_norm_folded)

Dtype = Any


def canonical_dtype(dtype):
    """Accept 'bfloat16'/'float32' strings from config files."""
    return jnp.dtype(dtype) if isinstance(dtype, str) else dtype


class TorchConv3d(nn.Module):
    """Conv3d with torch padding/stride semantics, canonical params, and a
    folded-layout fast path."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    folded: bool = False
    dtype: Dtype = None
    bias_init: Callable = nn.initializers.zeros_init()
    kernel_init: Callable = nn.initializers.he_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dt = canonical_dtype(self.dtype)
        cin = x.shape[-1] // (FOLD if self.folded else 1)
        w = self.param("kernel", self.kernel_init,
                       (self.kernel, self.kernel, self.kernel, cin, self.features))
        b = (self.param("bias", self.bias_init, (self.features,))
             if self.use_bias else None)
        if dt is not None:
            x = x.astype(dt)
        if quant_ops.current() is not None:
            # flax Module.path is () for a root-applied module; fall back to
            # the module name so scales key stably in unit-level usage too.
            # consult() records a traced absmax under calibration (max-
            # accumulated across repeated applications of a shared module)
            # and returns the activation scale under int8 mode.
            path = "/".join(self.path) or (self.name or "")
            scale = quant_ops.consult(path, x)
            if scale is not None:
                return quant_ops.conv3d_int8(
                    x, w, b, self.stride, scale, self.folded, x.dtype)
        if self.folded:
            if self.stride == 1 and self.kernel > 1:
                # tap-gather formulation: half the issued FLOPs of the
                # folded-kernel form at the same MXU lane utilization
                return conv3d_folded_gather(x, w.astype(x.dtype),
                                            None if b is None else b)
            return conv3d_folded(x, w.astype(x.dtype),
                                 None if b is None else b, self.stride)
        return conv3d_naive(x, w.astype(x.dtype),
                            None if b is None else b, self.stride)


class GroupNorm8(nn.Module):
    """GroupNorm with f32 statistics, compute-dtype output, torch eps, the
    reference's one-group fallback for thin tensors, and a folded path that
    reduces over fold lanes without relayout."""

    num_groups: int = 8
    epsilon: float = 1e-5
    folded: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1] // (FOLD if self.folded else 1)
        groups = self.num_groups if C >= self.num_groups else 1
        scale = self.param("scale", nn.initializers.ones_init(), (C,))
        bias = self.param("bias", nn.initializers.zeros_init(), (C,))
        if self.folded:
            return group_norm_folded(x, scale, bias, groups, self.epsilon)
        x32 = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        xg = x32.reshape(*x.shape[:-1], groups, C // groups)
        # reduce over all spatial dims AND the within-group channel axis
        # (axis x.ndim of the grouped view), NOT the groups axis
        red = tuple(range(1, x.ndim - 1)) + (x.ndim,)
        mean = jnp.mean(xg, axis=red, keepdims=True)
        var = jnp.mean(jnp.square(xg - mean), axis=red, keepdims=True)
        out = (xg - mean) * jax.lax.rsqrt(var + self.epsilon)
        out = out.reshape(x32.shape) * scale.astype(x32.dtype) + bias.astype(x32.dtype)
        return out.astype(x.dtype)


# back-compat helpers (older call sites / tests)
def conv3d(features: int, kernel: int = 3, stride: int = 1, bias: bool = True,
           name: str | None = None, dtype: Dtype = None,
           folded: bool = False) -> TorchConv3d:
    return TorchConv3d(features, kernel=kernel, stride=stride, use_bias=bias,
                       name=name, dtype=dtype, folded=folded)


def group_norm(channels: int, num_groups: int = 8, name: str | None = None,
               folded: bool = False) -> GroupNorm8:
    return GroupNorm8(num_groups=num_groups, name=name, folded=folded)


class SingleConv(nn.Module):
    """Order-string conv block; default 'gcr' (GN8 -> Conv3d -> ReLU)."""

    features: int
    kernel: int = 3
    stride: int = 1
    order: str = "gcr"
    num_groups: int = 8
    dtype: Dtype = None
    folded: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        order = self.order
        assert "c" in order
        has_norm = "g" in order or "b" in order
        for i, ch in enumerate(order):
            if ch == "g":
                x = GroupNorm8(self.num_groups, folded=self.folded)(x)
            elif ch == "c":
                x = TorchConv3d(self.features, kernel=self.kernel,
                                stride=self.stride, use_bias=not has_norm,
                                dtype=self.dtype, folded=self.folded)(x)
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
    folded: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1] // (FOLD if self.folded else 1)
        if cin != self.features:
            residual = TorchConv3d(self.features, kernel=1, use_bias=True,
                                   name="conv1", dtype=self.dtype,
                                   folded=self.folded)(x)
        else:
            residual = x
        out = SingleConv(self.features, stride=self.stride, order=self.order,
                         name="conv2", dtype=self.dtype,
                         folded=self.folded)(residual)
        n_order = self.order
        for c in "rel":
            n_order = n_order.replace(c, "")
        out = SingleConv(self.features, order=n_order, name="conv3",
                         dtype=self.dtype, folded=self.folded)(out)
        if self.use_downsample:
            r = GroupNorm8(name="down_gn", folded=self.folded)(residual)
            r = TorchConv3d(self.features, kernel=1, stride=self.stride,
                            use_bias=False, name="down_conv",
                            dtype=self.dtype, folded=self.folded)(r)
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
    folded: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = GroupNorm8(folded=self.folded)(x)
        x = TorchConv3d(self.features, kernel=self.kernel, stride=self.stride,
                        use_bias=False, dtype=self.dtype,
                        folded=self.folded)(x)
        if self.relu:
            x = nn.relu(x)
        return x
