"""Trilinear resize with PyTorch ``align_corners=True`` semantics.

The HRNet fuse layers and the final multi-branch fuse upsample low-resolution
branches with ``F.interpolate(mode='trilinear', align_corners=True)``
(reference hr3d.py:219-224, hrnet3d.py:39).  ``jax.image.resize`` implements
half-pixel (align_corners=False) sampling, so it canNOT be used for parity.

TPU-first formulation: 1-D linear interpolation along one axis is a linear
map ``out = W @ in`` with a static (S_out, S_in) matrix; a full 3-D resize is
three consecutive single-axis contractions.  On TPU these lower to MXU
matmuls instead of gather chains — both exact and fast.  Matrices are built
at trace time from static shapes and folded into the compiled program.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _interp_matrix_np(s_in: int, s_out: int) -> np.ndarray:
    """(S_out, S_in) align-corners linear interpolation matrix."""
    w = np.zeros((s_out, s_in), dtype=np.float32)
    if s_out == 1 or s_in == 1:
        # degenerate: sample position 0 (align_corners maps everything to 0)
        w[:, 0] = 1.0
        return w
    scale = (s_in - 1) / (s_out - 1)
    pos = np.arange(s_out, dtype=np.float64) * scale
    lo = np.floor(pos).astype(np.int64)
    lo = np.clip(lo, 0, s_in - 2)
    frac = (pos - lo).astype(np.float32)
    w[np.arange(s_out), lo] = 1.0 - frac
    w[np.arange(s_out), lo + 1] = frac
    return w


def interp_matrix(s_in: int, s_out: int) -> jnp.ndarray:
    return jnp.asarray(_interp_matrix_np(s_in, s_out))


def resize_trilinear_folded(xf: jnp.ndarray, size_zyx: tuple[int, int, int],
                            fold: int = 4) -> jnp.ndarray:
    """Align-corners trilinear resize of an X-FOLDED tensor.

    xf: (B, Z, Y, X_in/fold, fold*C); size_zyx is the ORIGINAL target size
    (tx % fold == 0).  Z and Y resize as usual; the X resize mixes fold
    lanes, expressed as one einsum over the (out-cell, out-lane, in-cell,
    in-lane)-reshaped interpolation matrix — no unfold of the activation.
    """
    B, Z, Y, Xf, Cf = xf.shape
    C = Cf // fold
    X = Xf * fold
    tz, ty, tx = size_zyx
    assert tx % fold == 0, (tx, fold)
    dt = xf.dtype
    out = xf
    # X first: it is the cheapest point (before Z/Y grow the tensor)
    if X != tx:
        w = interp_matrix(X, tx).astype(dt)                 # (tx, X)
        wr = w.reshape(tx // fold, fold, Xf, fold)          # [o', fo, i', fi]
        xs = out.reshape(B, Z, Y, Xf, fold, C)
        out = jnp.einsum("ofig,bzyigc->bzyofc", wr, xs)
        out = out.reshape(B, Z, Y, tx // fold, Cf)
    if Z != tz:
        wz = interp_matrix(Z, tz).astype(dt)
        out = jnp.einsum("oz,bzyxc->boyxc", wz, out)
    if Y != ty:
        wy = interp_matrix(Y, ty).astype(dt)
        out = jnp.einsum("oy,bzyxc->bzoxc", wy, out)
    return out


@functools.lru_cache(maxsize=None)
def _quantized_interp_np(s_in: int, s_out: int):
    """Per-output-row symmetric int8 quantization of the interp matrix.
    Rows are nonnegative and sum to 1 (convex combination), so absmax
    equals the row max and every scale is <= 1/127."""
    w = _interp_matrix_np(s_in, s_out)
    absmax = w.max(axis=1)
    sw = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    wq = np.clip(np.round(w / sw[:, None]), -127, 127).astype(np.int8)
    return wq, sw


def resize_trilinear_folded_int8(xf: jnp.ndarray,
                                 size_zyx: tuple[int, int, int],
                                 act_scale: float, fold: int = 4,
                                 out_dtype=None) -> jnp.ndarray:
    """Int8 form of :func:`resize_trilinear_folded` (serving path, consulted
    through the quant context at the HRNet final-fuse call site).

    The resize matmuls run the MXU at its 2x int8 rate: activations are
    per-tensor symmetric (ONE calibrated scale is valid across all three
    axis passes — align-corners interpolation is a convex combination, so
    intermediate absmax never exceeds the input's), interp matrices
    per-output-row symmetric (rows sum to 1 -> scales <= 1/127).  Max
    error ~1.5 input quanta (act rounding + weight rounding), bounded by
    the exactness test in tests/test_quant.py.
    """
    B, Z, Y, Xf, Cf = xf.shape
    C = Cf // fold
    X = Xf * fold
    tz, ty, tx = size_zyx
    assert tx % fold == 0, (tx, fold)
    out_dtype = out_dtype or xf.dtype
    inv = 1.0 / act_scale

    def q(v):
        r = jnp.round(v.astype(jnp.float32) * inv)
        return jnp.clip(r, -127, 127).astype(jnp.int8)

    out = xf
    if X != tx:
        wq, sw = _quantized_interp_np(X, tx)
        wr = jnp.asarray(wq.reshape(tx // fold, fold, Xf, fold))
        swr = jnp.asarray(act_scale * sw.reshape(tx // fold, fold))
        xs = q(out).reshape(B, Z, Y, Xf, fold, C)
        acc = jnp.einsum("ofig,bzyigc->bzyofc", wr, xs,
                         preferred_element_type=jnp.int32)
        out = (acc.astype(jnp.float32)
               * swr[None, None, None, :, :, None]).reshape(
                   B, Z, Y, tx // fold, Cf)
    if Z != tz:
        wq, sw = _quantized_interp_np(Z, tz)
        acc = jnp.einsum("oz,bzyxc->boyxc", jnp.asarray(wq), q(out),
                         preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * (
            act_scale * jnp.asarray(sw))[None, :, None, None, None]
    if Y != ty:
        wq, sw = _quantized_interp_np(Y, ty)
        acc = jnp.einsum("oy,bzyxc->bzoxc", jnp.asarray(wq), q(out),
                         preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * (
            act_scale * jnp.asarray(sw))[None, None, :, None, None]
    return out.astype(out_dtype)


def resize_trilinear_align_corners(x: jnp.ndarray, size_zyx: tuple[int, int, int]) -> jnp.ndarray:
    """Resize (B, Z, Y, X, C) -> (B, *size_zyx, C), align_corners=True.

    Bit-matches torch ``F.interpolate(x, size, mode='trilinear',
    align_corners=True)`` up to float accumulation order.
    """
    B, Z, Y, X, C = x.shape
    tz, ty, tx = size_zyx
    dt = x.dtype
    if (Z, Y, X) == (tz, ty, tx):
        return x
    out = x
    if Z != tz:
        wz = interp_matrix(Z, tz).astype(dt)
        out = jnp.einsum("oz,bzyxc->boyxc", wz, out)
    if Y != ty:
        wy = interp_matrix(Y, ty).astype(dt)
        out = jnp.einsum("oy,bzyxc->bzoxc", wy, out)
    if X != tx:
        wx = interp_matrix(X, tx).astype(dt)
        out = jnp.einsum("ox,bzyxc->bzyoc", wx, out)
    return out
