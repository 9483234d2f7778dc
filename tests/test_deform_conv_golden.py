"""Independent numpy golden for the deformable convolution (v1 + v2).

The reference implements DCN as a CUDA im2col kernel
(``det3d/ops/dcn/src/deform_conv_cuda_kernel.cu:191-280`` — the
``deformable_im2col_gpu_kernel`` / ``dmcn_im2col_bilinear`` pair).  That
kernel cannot run here and torchvision is absent, so this file ports its
INDEXING MATH to a ~50-line straight-loop numpy implementation and pins
``rtpose_tpu.ops.deform_conv`` forward (v1 and v2) against it, plus a
finite-difference check of the JAX gradients in f64 — the last native op
without an independent golden.

Semantics ported from the CUDA kernel:
  * sampling position of tap (i, j) at output (ho, wo):
      y = ho*stride - pad + i*dil + offset_y,  x likewise
  * a sample whose center leaves the map entirely contributes zero
    (the ``h_im > -1 && w_im > -1 && h_im < H && w_im < W`` guard);
  * bilinear corners outside the map contribute zero individually;
  * v2 multiplies each sampled tap by its (sigmoid-activated) mask value.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtpose_tpu.ops.deform_conv import deform_conv2d


def bilinear_np(x, y, xx):
    """Sample x (H, W, C) at float (y, xx) with the CUDA kernel's guards."""
    H, W, _ = x.shape
    if not (-1 < y < H and -1 < xx < W):
        return np.zeros(x.shape[-1], x.dtype)
    y0, x0 = int(np.floor(y)), int(np.floor(xx))
    wy, wx = y - y0, xx - x0
    out = np.zeros(x.shape[-1], x.dtype)
    for dy, dx, w in ((0, 0, (1 - wy) * (1 - wx)), (0, 1, (1 - wy) * wx),
                      (1, 0, wy * (1 - wx)), (1, 1, wy * wx)):
        yi, xi = y0 + dy, x0 + dx
        if 0 <= yi < H and 0 <= xi < W:
            out += w * x[yi, xi]
    return out


def deform_conv2d_np(x, offset, weight, bias=None, stride=1, padding=1,
                     dilation=1, dg=1, mask=None):
    """Straight-loop port of deformable_im2col + the weight contraction.

    x: (B, H, W, C); offset: (B, Ho, Wo, dg*K*2); weight: (Kh, Kw, C, Co);
    mask: (B, Ho, Wo, dg*K) or None.
    """
    B, H, W, C = x.shape
    Kh, Kw, _, Co = weight.shape
    K = Kh * Kw
    Cg = C // dg
    Ho = (H + 2 * padding - dilation * (Kh - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (Kw - 1) - 1) // stride + 1
    out = np.zeros((B, Ho, Wo, Co), x.dtype)
    off = offset.reshape(B, Ho, Wo, dg, K, 2)
    msk = None if mask is None else mask.reshape(B, Ho, Wo, dg, K)
    for b in range(B):
        for ho in range(Ho):
            for wo in range(Wo):
                for g in range(dg):
                    xg = x[b, :, :, g * Cg:(g + 1) * Cg]
                    for i in range(Kh):
                        for j in range(Kw):
                            k = i * Kw + j
                            y = ho * stride - padding + i * dilation \
                                + off[b, ho, wo, g, k, 0]
                            xx = wo * stride - padding + j * dilation \
                                + off[b, ho, wo, g, k, 1]
                            s = bilinear_np(xg, y, xx)
                            if msk is not None:
                                s = s * msk[b, ho, wo, g, k]
                            wslice = weight[i, j, g * Cg:(g + 1) * Cg]
                            out[b, ho, wo] += s @ wslice
    if bias is not None:
        out = out + bias
    return out


def _rand_case(rng, B=2, H=5, W=6, C=4, Co=3, K=3, dg=1, v2=False,
               stride=1, dilation=1):
    pad = dilation  # torch-style same-ish padding for k=3
    Ho = (H + 2 * pad - dilation * (K - 1) - 1) // stride + 1
    Wo = (W + 2 * pad - dilation * (K - 1) - 1) // stride + 1
    x = rng.normal(size=(B, H, W, C))
    # offsets up to ~1.7 voxels, some samples pushed off the map
    offset = rng.normal(size=(B, Ho, Wo, dg * K * K * 2)) * 1.7
    weight = rng.normal(size=(K, K, C, Co))
    bias = rng.normal(size=(Co,))
    mask = 1 / (1 + np.exp(-rng.normal(size=(B, Ho, Wo, dg * K * K)))) \
        if v2 else None
    return x, offset, weight, bias, mask, pad


@pytest.mark.parametrize("v2", [False, True], ids=["v1", "v2"])
@pytest.mark.parametrize("stride,dilation,dg",
                         [(1, 1, 1), (2, 1, 1), (1, 2, 2)])
def test_forward_matches_numpy_golden(v2, stride, dilation, dg):
    rng = np.random.default_rng(0 if not v2 else 1)
    x, offset, weight, bias, mask, pad = _rand_case(
        rng, v2=v2, stride=stride, dilation=dilation, dg=dg)
    want = deform_conv2d_np(x, offset, weight, bias, stride=stride,
                            padding=pad, dilation=dilation, dg=dg, mask=mask)
    got = deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(weight),
        jnp.asarray(bias), stride=stride, padding=pad, dilation=dilation,
        deformable_groups=dg,
        mask=None if mask is None else jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("v2", [False, True], ids=["v1", "v2"])
def test_gradients_match_finite_differences(v2):
    """f64 FD check of d(loss)/d(x, offset, weight[, mask]) — the reference
    ships three hand-written backward kernels (deform_conv_cuda.cpp:687-700);
    here autodiff provides them, FD provides the independent check."""
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(7)
        x, offset, weight, bias, mask, pad = _rand_case(
            rng, B=1, H=4, W=4, C=2, Co=2, v2=v2)
        # keep offsets away from integer lattice points where bilinear
        # weights are non-differentiable (floor discontinuity)
        offset = np.clip(offset, -1.4, 1.4) + 0.23
        ct = rng.normal(size=(1, 4, 4, 2))

        def loss(x_, o_, w_, m_):
            out = deform_conv2d(x_, o_, w_, jnp.asarray(bias), padding=pad,
                                mask=m_ if v2 else None)
            return jnp.sum(out * ct)

        args = [jnp.asarray(a) for a in
                (x, offset, weight, mask if v2 else np.zeros(1))]
        grads = jax.grad(loss, argnums=(0, 1, 2, 3) if v2 else (0, 1, 2))(
            *args)
        eps = 1e-6
        for ai, g in zip((0, 1, 2, 3) if v2 else (0, 1, 2), grads):
            a = np.asarray(args[ai], np.float64)
            flat = a.reshape(-1)
            # probe a subset of coordinates (FD is O(2 evals) each)
            idxs = np.linspace(0, flat.size - 1, min(12, flat.size)).astype(int)
            for i in idxs:
                ap, am = flat.copy(), flat.copy()
                ap[i] += eps
                am[i] -= eps
                a_p = [np.asarray(v, np.float64) for v in args]
                a_m = [np.asarray(v, np.float64) for v in args]
                a_p[ai] = ap.reshape(a.shape)
                a_m[ai] = am.reshape(a.shape)
                fd = (float(loss(*map(jnp.asarray, a_p)))
                      - float(loss(*map(jnp.asarray, a_m)))) / (2 * eps)
                got = float(np.asarray(g).reshape(-1)[i])
                assert abs(fd - got) < 1e-4 * max(1.0, abs(fd)), \
                    (ai, i, fd, got)
    finally:
        jax.config.update("jax_enable_x64", False)
