"""Space-to-depth (fold-X) 3-D convolution — the MXU-saturating formulation.

Measured on v5e: a stride-1 3x3x3 conv over the RT-Pose grid takes the SAME
wall time for 32 output channels as for 128 (9.4 vs 36.7 vs 165.6 TFLOP/s
for C32->C32 / C32->C128 / C128->C128) — the MXU is 128 lanes wide and
thin-channel convs waste it.  This module reformulates a thin conv as an
EXACT wide conv by folding 4 X-positions into channels:

  x: (B, Z, Y, X, C)  --reshape-->  (B, Z, Y, X/4, 4C)
  w: (3, 3, 3, C, Co) --rearrange-> (3, 3, 3, 4C, 4Co)  (2/3 zeros)

Derivation: output sub-position fo reads input x + dx = 4(x' + s) + fi with
s = floor((fo + dx)/4), fi = (fo + dx) mod 4, so original tap dx lands at
folded tap s+1, input sub-lane fi, output sub-lane fo.  The folded kernel's
zero structure guarantees the folded padding (4 zeros) contributes exactly
the original padding (1 zero) — boundary-exact, verified by tests.

Parameters stay in the canonical (3, 3, 3, C, Co) layout (checkpoints are
identical to the naive path); the rearrangement is a tiny scatter at apply
time and folds into the compiled program.  2.67x redundant FLOPs at ~4-17x
better MXU rate; net ~4-6x on the network's dominant convs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

FOLD = 4


@functools.lru_cache(maxsize=None)
def _fold_scatter_indices(kx: int):
    """For each (fo, dx): the folded tap s+pad and input sub-lane fi."""
    entries = []
    for fo in range(FOLD):
        for dx in range(kx):
            d = dx - kx // 2                      # signed offset
            s = (fo + d) // FOLD                  # floor div
            fi = (fo + d) % FOLD
            entries.append((fo, dx, s + 1, fi))   # folded kernel has width 3
    return entries


def fold_weights_x4(w: jnp.ndarray) -> jnp.ndarray:
    """(kz, ky, kx, C, Co) -> (kz, ky, 3, 4C, 4Co) folded kernel."""
    kz, ky, kx, C, Co = w.shape
    out = jnp.zeros((kz, ky, 3, FOLD, C, FOLD, Co), w.dtype)
    for fo, dx, s, fi in _fold_scatter_indices(kx):
        out = out.at[:, :, s, fi, :, fo, :].set(w[:, :, dx])
    return out.reshape(kz, ky, 3, FOLD * C, FOLD * Co)


def conv3d_fold4(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray | None = None
                 ) -> jnp.ndarray:
    """Stride-1 3-D conv with torch pad (k//2) via X-fold-4.

    x: (B, Z, Y, X, C) with X % 4 == 0; w: (kz, ky, kx, C, Co).
    """
    B, Z, Y, X, C = x.shape
    kz, ky, kx, _, Co = w.shape
    assert X % FOLD == 0, X
    xf = x.reshape(B, Z, Y, X // FOLD, FOLD * C)
    wf = fold_weights_x4(w.astype(x.dtype))
    pad = [(kz // 2, kz // 2), (ky // 2, ky // 2), (1, 1)]
    of = lax.conv_general_dilated(
        xf, wf, (1, 1, 1), pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    out = of.reshape(B, Z, Y, X, Co)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv3d_naive(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray | None = None,
                 stride: int = 1) -> jnp.ndarray:
    """Plain lax conv3d with torch padding (reference semantics)."""
    kz, ky, kx = w.shape[:3]
    pad = [(kz // 2, kz // 2), (ky // 2, ky // 2), (kx // 2, kx // 2)]
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride,) * 3, pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
