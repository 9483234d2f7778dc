"""Fused radar-cube preprocessing: ROI crop + normalize + clamp + layout.

The BASELINE.json north star: the reference's host-side
``get_cube`` (np.load -> ROI slice -> (x-n0)/(n1-n0) -> clamp>=0,
cruw_pose.py:167-185) becomes a single Pallas kernel running where the data
lands in HBM, so the host ships the RAW (D, Z, Y, X) cube bytes and the
chip does crop+scale+clamp+transpose in one VMEM pass.

Two entry points:

* ``fused_preprocess`` — the Pallas kernel.  The raw cube stays in HBM
  (memory_space=ANY); the grid walks output Z-slabs, and each step DMAs
  exactly the cropped (D, Y', X') slab into VMEM (element-offset slicing a
  BlockSpec cannot express), applies the affine+clamp on the VPU, and
  writes the channels-last (Y', X', D) slab.  Uncropped data never moves.
* ``preprocess_reference`` — plain-XLA equivalent (slice+scale+max+
  transpose): the golden check and the CPU fallback.

Both accept half-precision input (the on-disk f16 format) and produce the
model's compute layout (Z', Y', X', D) float32.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def preprocess_reference(cube: jnp.ndarray, roi_idx, norm_start: float,
                         norm_scale: float) -> jnp.ndarray:
    """XLA reference: (D, Z, Y, X) raw -> (Z', Y', X', D) normalized."""
    z0, z1, y0, y1, x0, x1 = roi_idx
    c = cube[:, z0 : z1 + 1, y0 : y1 + 1, x0 : x1 + 1].astype(jnp.float32)
    c = (c - norm_start) / norm_scale
    c = jnp.maximum(c, 0.0)
    return jnp.transpose(c, (1, 2, 3, 0))


def _make_kernel(z0, y0, x0, yo, xo, norm_start, inv_scale, in_dtype):
    def kernel(cube_hbm, out_ref):
        i = pl.program_id(0)
        D = cube_hbm.shape[0]
        X = cube_hbm.shape[3]

        def inner(scratch, sem):
            # DMA full X rows: the lane-dim slice must be 128-aligned, the
            # ROI x-offset is not — crop X in-register instead.
            dma = pltpu.make_async_copy(
                cube_hbm.at[:, z0 + i, pl.ds(y0, yo), :], scratch, sem)
            dma.start()
            dma.wait()
            x = scratch[:, :, x0 : x0 + xo].astype(jnp.float32)  # (D, Y', X')
            x = (x - norm_start) * inv_scale
            x = jnp.maximum(x, 0.0)
            out_ref[0] = jnp.transpose(x, (1, 2, 0))             # (Y', X', D)

        pl.run_scoped(
            inner,
            scratch=pltpu.VMEM((D, yo, X), in_dtype),
            sem=pltpu.SemaphoreType.DMA,
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("roi_idx", "norm_start", "norm_scale"))
def fused_preprocess(cube: jnp.ndarray,
                     roi_idx: Tuple[int, int, int, int, int, int],
                     norm_start: float, norm_scale: float) -> jnp.ndarray:
    """Pallas fused crop+normalize+clamp+transpose.

    Args:
      cube: (D, Z, Y, X) raw radar cube (float32/float16/bfloat16).
      roi_idx: static (z0, z1, y0, y1, x0, x1) INCLUSIVE crop indices.
      norm_start, norm_scale: static normalization window.

    Returns (Z', Y', X', D) float32.
    """
    D, Z, Y, X = cube.shape
    z0, z1, y0, y1, x0, x1 = roi_idx
    zo, yo, xo = z1 - z0 + 1, y1 - y0 + 1, x1 - x0 + 1

    if cube.dtype == jnp.float16:
        # Mosaic has no f16; the loader ships bf16/f32 to the fused path
        # (f16 disk format is converted host-side), XLA handles the rest.
        return preprocess_reference(cube, roi_idx, norm_start, norm_scale)

    kernel = _make_kernel(z0, y0, x0, yo, xo, float(norm_start),
                          1.0 / float(norm_scale), cube.dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((zo, yo, xo, D), jnp.float32),
        grid=(zo,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, yo, xo, D), lambda i: (i, 0, 0, 0)),
    )(cube)


def _make_batch_kernel(z0, y0, x0, yo, xo, zo, norm_start, inv_scale, in_dtype):
    """Double-buffered: while slab k computes, slab k+1 streams HBM->VMEM.

    The grid walks (batch, z-slab) in row-major order, so the 'next' slab of
    the flat index is either the next z of the same sample or z0 of the next
    sample — both expressible as .at[] slices of the HBM ref.
    """
    yh = yo // 2  # half-Y slabs keep 2x-buffered VMEM under the 16MB budget

    def kernel(cube_hbm, out_ref, scratch, sems):
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        B = pl.num_programs(0)

        def slab(bb, zz, jj):
            return cube_hbm.at[bb, :, z0 + zz, pl.ds(y0 + jj * yh, yh), :]

        def start(slot, bb, zz, jj):
            pltpu.make_async_copy(slab(bb, zz, jj), scratch.at[slot],
                                  sems.at[slot]).start()

        flat = (b * zo + i) * 2 + j
        slot = jax.lax.rem(flat, 2)
        nxt_slot = jax.lax.rem(flat + 1, 2)

        # warm-up: the very first program starts its own slab
        @pl.when(flat == 0)
        def _():
            start(slot, b, i, j)

        # prefetch the next slab (if any) before waiting on ours
        nj = jnp.where(j + 1 < 2, j + 1, 0)
        carry_i = (j + 1 >= 2).astype(jnp.int32)
        ni = jnp.where(i + carry_i < zo, i + carry_i, 0)
        nb = jnp.where(i + carry_i < zo, b, b + 1)

        @pl.when(flat + 1 < B * zo * 2)
        def _():
            start(nxt_slot, nb, ni, nj)

        pltpu.make_async_copy(slab(b, i, j), scratch.at[slot],
                              sems.at[slot]).wait()
        x = scratch[slot, :, :, x0 : x0 + xo].astype(jnp.float32)
        x = (x - norm_start) * inv_scale
        x = jnp.maximum(x, 0.0)
        out_ref[0, 0] = jnp.transpose(x, (1, 2, 0))

    return kernel


@functools.partial(jax.jit, static_argnames=("roi_idx", "norm_start", "norm_scale"))
def fused_preprocess_batch(cubes: jnp.ndarray,
                           roi_idx: Tuple[int, int, int, int, int, int],
                           norm_start: float, norm_scale: float) -> jnp.ndarray:
    """Batched Pallas path: (B, D, Z, Y, X) -> (B, Z', Y', X', D).

    Grid (B, Z') — Pallas cannot vmap an ANY-memory-space kernel, so the
    batch dimension rides the grid instead.
    """
    B, D, Z, Y, X = cubes.shape
    z0, z1, y0, y1, x0, x1 = roi_idx
    zo, yo, xo = z1 - z0 + 1, y1 - y0 + 1, x1 - x0 + 1
    if cubes.dtype == jnp.float16:
        return jax.vmap(lambda c: preprocess_reference(
            c, roi_idx, norm_start, norm_scale))(cubes)
    assert yo % 2 == 0, yo
    kernel = _make_batch_kernel(z0, y0, x0, yo, xo, zo, float(norm_start),
                                1.0 / float(norm_scale), cubes.dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, zo, yo, xo, D), jnp.float32),
        grid=(B, zo, 2),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 1, yo // 2, xo, D),
                               lambda b, i, j: (b, i, j, 0, 0)),
        scratch_shapes=[pltpu.VMEM((2, D, yo // 2, X), cubes.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
    )(cubes)


def preprocess_batch(cubes: jnp.ndarray, roi_idx, norm_start: float,
                     norm_scale: float, use_pallas: bool = True) -> jnp.ndarray:
    """(B, D, Z, Y, X) raw -> (B, Z', Y', X', D); Pallas on TPU, XLA elsewhere."""
    if use_pallas and jax.default_backend() == "tpu":
        return fused_preprocess_batch(cubes, tuple(roi_idx), norm_start,
                                      norm_scale)
    f = lambda c: preprocess_reference(c, tuple(roi_idx), norm_start, norm_scale)
    return jax.vmap(f)(cubes)
