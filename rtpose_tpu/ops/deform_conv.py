"""Deformable convolution v1/v2 — XLA-native bilinear-gather formulation.

TPU equivalent of the reference's 1.5k-line CUDA im2col extension
(``det3d/ops/dcn/src/deform_conv_cuda.cpp`` + ``deform_conv.py`` wrappers):

* v1 (``DeformConvFunction``): per-location predicted offsets deform the
  sampling grid of a KxK conv.
* v2 (``ModulatedDeformConvFunction``): adds a per-tap sigmoid mask.

Design: instead of a hand-written im2col kernel, sampling is expressed as
a vectorized bilinear gather (4 gathers + lerp per tap — pure VPU work)
building the deformed im2col tensor, followed by ONE big matmul with the
flattened conv weights (MXU work).  XLA fuses the gathers; autodiff is
automatic through gather/scatter (replacing the reference's three custom
backward kernels).  Channels-last layout throughout.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _bilinear_gather(x: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample x (H, W, C) at float coords ys/xs (...,) -> (..., C).

    Bilinear taps outside the feature map contribute zero, and samples whose
    deformed center leaves the map entirely are dropped — the reference CUDA
    kernel's boundary semantics (deform_conv_cuda_kernel.cu bilinear guard).
    """
    H, W, C = x.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0).astype(x.dtype)
    wx = (xs - x0).astype(x.dtype)

    def tap(yi, xi, w):
        inside = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        v = x[yc, xc]                                   # (..., C)
        return v * (w * inside.astype(x.dtype))[..., None]

    valid = (ys > -1) & (ys < H) & (xs > -1) & (xs < W)
    out = (tap(y0, x0, (1 - wy) * (1 - wx))
           + tap(y0, x0 + 1, (1 - wy) * wx)
           + tap(y0 + 1, x0, wy * (1 - wx))
           + tap(y0 + 1, x0 + 1, wy * wx))
    return out * valid[..., None].astype(x.dtype)


def deform_conv2d(x: jnp.ndarray, offset: jnp.ndarray, weight: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None, stride: int = 1,
                  padding: int = 1, dilation: int = 1,
                  deformable_groups: int = 1,
                  mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Deformable 2-D convolution (v1; v2 when ``mask`` is given).

    Args:
      x: (B, H, W, C) input.
      offset: (B, Ho, Wo, dg*K*2) offsets, channel order [group, tap,
        {dy, dx}] (reference layout).
      weight: (Kh, Kw, C, Cout) kernel.
      bias: optional (Cout,).
      mask: optional (B, Ho, Wo, dg*K) modulation weights (already through
        sigmoid — the reference applies sigmoid in the module wrapper).

    Returns (B, Ho, Wo, Cout) in x.dtype.
    """
    B, H, W, C = x.shape
    Kh, Kw, _, Cout = weight.shape
    K = Kh * Kw
    dg = deformable_groups
    assert C % dg == 0, (C, dg)
    Cg = C // dg

    Ho = (H + 2 * padding - dilation * (Kh - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (Kw - 1) - 1) // stride + 1

    base_y = jnp.arange(Ho) * stride - padding
    base_x = jnp.arange(Wo) * stride - padding
    tap_y = jnp.repeat(jnp.arange(Kh) * dilation, Kw)   # (K,)
    tap_x = jnp.tile(jnp.arange(Kw) * dilation, Kh)     # (K,)
    grid_y = (base_y[:, None, None] + tap_y[None, None, :]).astype(x.dtype)  # (Ho,1,K)
    grid_x = (base_x[None, :, None] + tap_x[None, None, :]).astype(x.dtype)  # (1,Wo,K)

    off = offset.reshape(B, Ho, Wo, dg, K, 2)
    msk = None if mask is None else mask.reshape(B, Ho, Wo, dg, K)

    def per_sample(xs, offs, ms):
        xsg = xs.reshape(H, W, dg, Cg)

        def per_group(xg, og, mg):
            ys = grid_y + og[..., 0]                    # (Ho, Wo, K)
            xs_ = grid_x + og[..., 1]
            s = _bilinear_gather(xg, ys, xs_)           # (Ho, Wo, K, Cg)
            if mg is not None:
                s = s * mg[..., None]
            return s

        if ms is None:
            return jax.vmap(per_group, in_axes=(2, 2, None), out_axes=3)(
                xsg, offs, None)                        # (Ho, Wo, K, dg, Cg)
        return jax.vmap(per_group, in_axes=(2, 2, 2), out_axes=3)(
            xsg, offs, ms)

    cols = jax.vmap(lambda xs, o, m: per_sample(xs, o, m))(
        x, off, msk) if msk is not None else jax.vmap(
        lambda xs, o: per_sample(xs, o, None))(x, off)
    # cols: (B, Ho, Wo, K, dg, Cg) -> contract with (K, C, Cout)
    cols = cols.reshape(B, Ho, Wo, K, C)
    wmat = weight.reshape(K, C, Cout)
    out = jnp.einsum("bhwkc,kco->bhwo", cols, wmat,
                     preferred_element_type=jnp.promote_types(x.dtype,
                                                              jnp.float32))
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)
