"""Hand-scheduled Pallas kernel for the folded stride-1 3x3x3 conv.

The dominant FLOPs of HRRadarPose are thin-channel (C=32) stride-1 3^3
convs on the folded (B, Z, Y, X/4, 4C) layout.  The best XLA lowerings
measured on v5e (tools/perf_lab.py):

  fold4   — block-diagonal (4C, 4Co) kernel, 4.00x issued FLOPs, 88% of
            issued peak  -> 1.56 ms / conv (B8 full grid);
  gather  — tap-grouped (6C, 4Co) kernel, 2.0x issue but the 192-lane
            contraction pads to 256 and XLA reaches only ~59% of that
            bound -> 1.67 ms.

This kernel reaches a LOWER issue factor than either by splitting each
(dz, dy) tap's contraction into
  * a main matmul over the cell's own 4C lanes (exactly the VMEM-resident
    input tile — no relayout at all), and
  * a boundary matmul over the 2C lanes imported from the x'+-1 cells,
    PAIRING consecutive taps so two 2C=64 blocks fill one 128-lane
    contraction tile;
total issued = 9*(4C) + 5*(128/ (4C)) ... for C=32: (9*128 + 5*128) lanes
= 2.07x algorithmic, every matmul a full (M, 128) x (128, 128) MXU tile.

Layout notes (guide: /opt/skills/guides/pallas_guide.md):
  * grid (B, Z); each step owns one output z-row, all of (Y, X');
  * the input arrives z/y-padded so the three z-taps are three
    block-indexed views of the same array — Mosaic pipelines the
    HBM->VMEM streaming automatically, no manual DMA;
  * the x'+-1 neighbor lanes ride a pre-shifted 2C-lane companion array
    (volume-edge zeros baked in at the XLA level), loaded at the same
    flat-row bases as the main taps so every piece shares a sublane
    offset and the tap concat is pure layout bookkeeping;
  * the 14 tap matmuls fuse into two K-concatenated dots so the MXU
    accumulates internally (a per-tap `acc_ref += dot` round-trips the
    f32 accumulator through VMEM 14x and measured 1.9x slower).

Forward-only; the backward runs the same kernel on the cotangent with the
tap-flipped, channel-transposed weights (grad-input of a stride-1 conv is
itself a stride-1 conv), and grad-weight stays on XLA's conv-transpose
lowering via ``jax.linear_transpose`` — see ``conv3d_folded_gather_fast``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fold_conv import FOLD, conv3d_folded_gather

_ENABLED = True  # module switch (tests flip it to compare paths)


def _supported(xf, w) -> bool:
    if not _ENABLED:
        return False
    kz, ky, kx, C, Co = w.shape
    if (kz, ky, kx) != (3, 3, 3) or C != 32 or Co not in (32,):
        return False
    if xf.dtype != jnp.bfloat16:
        return False
    B, Z, Y, Xf, L = xf.shape
    if L != FOLD * C or Xf % 8 or Y < 8:
        # Xf % 8: the per-dy tap bases must share a sublane offset or the
        # boundary-pair lane concat cannot be laid out (Mosaic restriction)
        return False
    # per-step VMEM: (3 z-rows + 2 neighbor arrays) double-buffered + acc
    vmem = 5 * 2 * (Y + 4) * Xf * L * 2 + Y * Xf * FOLD * Co * 4
    return vmem < 12 * 1024 * 1024


def _prep_weights(w: jnp.ndarray):
    """(3,3,3,C,Co) -> W1 (9, 4C, 4Co) main taps, W2P (5, 128, 4Co) paired
    boundary taps (C=32 layout)."""
    kz, ky, kx, C, Co = w.shape
    L, Lo = FOLD * C, FOLD * Co
    w1 = jnp.zeros((9, L, Lo), w.dtype)
    for t in range(9):
        dz, dy = divmod(t, 3)
        for fo in range(FOLD):
            for fi in range(FOLD):
                dx = fi - fo + 1
                if 0 <= dx < kx:
                    w1 = w1.at[t, fi * C:(fi + 1) * C,
                               fo * Co:(fo + 1) * Co].set(w[dz, dy, dx])
    # boundary: rows 0:C <- cell x'-1 lane (FOLD-1) feeding fo=0 via dx=0;
    #           rows C:2C <- cell x'+1 lane 0 feeding fo=FOLD-1 via dx=2
    w2 = jnp.zeros((9, 2 * C, Lo), w.dtype)
    for t in range(9):
        dz, dy = divmod(t, 3)
        w2 = w2.at[t, 0:C, 0:Co].set(w[dz, dy, 0])
        w2 = w2.at[t, C:2 * C, (FOLD - 1) * Co:FOLD * Co].set(w[dz, dy, 2])
    # pair taps 2t/2t+1 into one 128-row contraction tile (tap 8 rides solo)
    w2p = jnp.zeros((5, 4 * C, Lo), w.dtype)
    for p in range(4):
        w2p = w2p.at[p, 0:2 * C].set(w2[2 * p])
        w2p = w2p.at[p, 2 * C:4 * C].set(w2[2 * p + 1])
    w2p = w2p.at[4, 0:2 * C].set(w2[8])
    return w1, w2p


def _kernel(Y, Xf, L, Lo, C, x0_ref, x1_ref, x2_ref, n0_ref, n1_ref, n2_ref,
            w1_ref, w2p_ref, b_ref, out_ref, acc_ref):
    """One output z-row.  Main taps read the VMEM-resident folded tile
    directly; the x'+-1 boundary lanes come from the XLA-pre-shifted xl/xr
    arrays (volume-edge zeros baked in), loaded at the SAME flat-row bases
    as the main taps so every piece shares a sublane offset and the
    boundary-pair lane concat lays out cleanly."""
    M = Y * Xf

    zrefs = (x0_ref, x1_ref, x2_ref)
    nrefs = (n0_ref, n1_ref, n2_ref)

    # K-concatenated dots (lane-concat of tap tiles is layout bookkeeping:
    # every piece shares sublane offset 0 and lands on a 128-lane boundary)
    # let the MXU accumulate internally — per-tap `acc += dot(...)` round-
    # trips the f32 accumulator through VMEM 14x per step and measured 1.9x
    # slower.  Two chunks keep the concatenated operand under the VMEM cap.
    pieces = []
    halves = []
    for t in range(9):
        dz, dy = divmod(t, 3)
        xflat = zrefs[dz][0, 0].reshape((Y + 4) * Xf, L)
        base = (dy + 1) * Xf
        pieces.append(xflat[base: base + M, :])
        nflat = nrefs[dz][0, 0].reshape((Y + 4) * Xf, 2 * C)
        halves.append(nflat[base: base + M, :])
    halves.append(jnp.zeros_like(halves[0]))        # tap 8's empty pair slot
    pieces.extend(jnp.concatenate(halves[i:i + 2], axis=1)
                  for i in range(0, 10, 2))
    wbig = jnp.concatenate(
        [w1_ref[t] for t in range(9)] + [w2p_ref[p] for p in range(5)], axis=0)
    half = 7
    A1 = jnp.concatenate(pieces[:half], axis=1)        # (M, 7*4C)
    acc_ref[:] = jnp.dot(A1, wbig[:half * L],
                         preferred_element_type=jnp.float32)
    A2 = jnp.concatenate(pieces[half:], axis=1)
    acc_ref[:] += jnp.dot(A2, wbig[half * L:],
                          preferred_element_type=jnp.float32)

    out = acc_ref[:] + b_ref[0].astype(jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype).reshape(Y, Xf, Lo)


@functools.partial(jax.jit, static_argnames=())
def _pallas_forward(xf: jnp.ndarray, w: jnp.ndarray,
                    bias: jnp.ndarray | None) -> jnp.ndarray:
    B, Z, Y, Xf, L = xf.shape
    kz, ky, kx, C, Co = w.shape
    Lo = FOLD * Co
    w1, w2p = _prep_weights(w.astype(xf.dtype))
    bfull = jnp.tile(jnp.zeros((Co,), jnp.float32) if bias is None
                     else bias.astype(jnp.float32), FOLD)[None]
    # z: +-1 halo; y: two extra rows each side so every dy tap's flat-row
    # base stays in range; xl/xr carry the x'-1 / x'+1 neighbor lanes with
    # the volume-edge zeros baked in (keeps all kernel loads offset-aligned)
    xp = jnp.pad(xf, [(0, 0), (1, 1), (2, 2), (0, 0), (0, 0)])
    xl = jnp.pad(xp[..., (FOLD - 1) * C:],
                 [(0, 0), (0, 0), (0, 0), (1, 0), (0, 0)])[:, :, :, :Xf, :]
    xr = jnp.pad(xp[..., :C],
                 [(0, 0), (0, 0), (0, 0), (0, 1), (0, 0)])[:, :, :, 1:, :]
    xn = jnp.concatenate([xl, xr], axis=-1)            # (..., 2C) neighbors

    kern = functools.partial(_kernel, Y, Xf, L, Lo, C)

    def zmap(dz):
        return lambda b, z: (b, z + dz, 0, 0, 0)

    zspec = [pl.BlockSpec((1, 1, Y + 4, Xf, L), zmap(dz),
                          memory_space=pltpu.VMEM) for dz in range(3)]
    nspec = [pl.BlockSpec((1, 1, Y + 4, Xf, 2 * C), zmap(dz),
                          memory_space=pltpu.VMEM) for dz in range(3)]
    return pl.pallas_call(
        kern,
        grid=(B, Z),
        in_specs=zspec + nspec + [
            pl.BlockSpec((9, L, Lo), lambda b, z: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, 4 * C, Lo), lambda b, z: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lo), lambda b, z: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Y, Xf, Lo),
                               lambda b, z: (b, z, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Z, Y, Xf, Lo), xf.dtype),
        scratch_shapes=[
            pltpu.VMEM((Y * Xf, Lo), jnp.float32),
        ],
    )(xp, xp, xp, xn, xn, xn, w1, w2p, bfull)


def _flip_transpose(w: jnp.ndarray) -> jnp.ndarray:
    """Weights of the grad-input conv: taps flipped, C<->Co swapped."""
    return jnp.transpose(w[::-1, ::-1, ::-1], (0, 1, 2, 4, 3))


@jax.custom_vjp
def _fused(xf, w):
    return _pallas_forward(xf, w, None)


def _fused_fwd(xf, w):
    return _pallas_forward(xf, w, None), (xf, w)


def _fused_bwd(res, ct):
    xf, w = res
    ct = ct.astype(xf.dtype)
    wT = _flip_transpose(w)
    # grad-input: itself a stride-1 folded 3^3 conv -> same Pallas kernel
    if _supported(ct, wT):
        gx = _fused(ct, wT)
    else:
        gx = conv3d_folded_gather(ct, wT)
    # grad-weight: XLA's batch-contraction conv via the linear transpose of
    # the gather formulation (no forward recompute: the map is linear in w)
    gw = jax.linear_transpose(
        lambda w_: conv3d_folded_gather(xf, w_.astype(xf.dtype)),
        jnp.zeros_like(w))(ct)[0]
    return gx, gw.astype(w.dtype)


_fused.defvjp(_fused_fwd, _fused_bwd)


def conv3d_folded_gather_fast(xf: jnp.ndarray, w: jnp.ndarray,
                              bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Pallas-fused stride-1 folded conv with XLA fallback.

    Exact same math/layout as ``conv3d_folded_gather`` (tested in interpret
    mode and on-chip); used automatically by ``TorchConv3d`` for supported
    shapes on TPU.
    """
    if not _supported(xf, w):
        return conv3d_folded_gather(xf, w, bias)
    out = _fused(xf, w)
    if bias is not None:
        out = out + jnp.tile(bias, FOLD).astype(out.dtype)
    return out
