"""Serving export: self-contained deployment artifacts via ``jax.export``.

TPU-new capability.  The reference's deployment story is re-running
``tools/test.py`` against a ``.pth`` checkpoint through the full det3d
stack (reference ``tools/test.py:1-210``); here the whole predict path —
forward + peak decode — lowers ONCE to StableHLO and serializes to a single
artifact with the trained parameters baked in as constants.  Serving needs
only ``jax`` and the artifact bytes: no model code, no config, no
checkpoint format, and the artifact is portable across the platforms it
was lowered for (``cpu``/``tpu``) — the standard XLA AOT deployment shape.

    blob = export_predict(asm, state.params, batch_size=8)
    predict = load_predict(blob)          # anywhere: predict(batch) -> pytree

Artifacts are versioned by jax.export's own serialization (backward
compatibility guarantees follow jax's, not ours).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp

from .engine.steps import make_eval_step
from .ops import quant


def make_predict_fn(asm, params, preprocess: Optional[tuple] = None,
                    int8_scales: Optional[dict] = None,
                    int8_exclude: tuple = quant.DEFAULT_EXCLUDE,
                    final_dtype=None):
    """The serving closure: ``model_input -> decoded predictions``.

    ``model_input`` is the normalized radar cube (B, Z, Y, X, C) for dense
    configs, or the voxel sub-dict (VoxelNet batch layout) for lidar
    configs.  Parameters are closed over (baked into the export as
    constants).

    ``int8_scales`` (from :func:`calibrate_predict`) switches every
    non-excluded conv to the MXU int8 path (2x bf16 rate on v5e) — the
    quant context is entered per call so it is active at trace time
    wherever the closure is jitted or exported.

    ``final_dtype`` (e.g. ``'bfloat16'``) overrides the head output convs'
    compute dtype on the serving path only (:func:`..api.serving_variant`).
    """
    if final_dtype is not None:
        from .api import serving_variant
        asm = serving_variant(asm, final_dtype)
    eval_step = make_eval_step(asm.model, asm.head, asm.decode_spec,
                               input_key=asm.input_key,
                               sparse=asm.sparse_head,
                               preprocess=preprocess,
                               multi_poses=asm.multi_poses)

    def run(batch):
        if int8_scales is None:
            return eval_step(params, batch)
        with quant.int8_mode(int8_scales, exclude=int8_exclude):
            return eval_step(params, batch)

    if asm.input_key is None:
        def predict(voxel_batch):
            return run(dict(voxel_batch))
    else:
        def predict(cube):
            return run({asm.input_key: cube})
    return predict


def calibrate_predict(asm, params, batches, preprocess: Optional[tuple] = None,
                      exclude: tuple = quant.DEFAULT_EXCLUDE,
                      final_dtype=None,
                      quantile: Optional[float] = None) -> dict:
    """Activation-scale calibration for the int8 predict path: one jitted
    forward per batch over the SAME graph served by :func:`make_predict_fn`.
    ``batches`` yields model inputs (cubes, or voxel sub-dicts for lidar).
    ``quantile`` switches the per-site statistic from absmax to a clipped
    quantile of |x| (PTQ outlier defense — see quant.calibrate).
    """
    predict = make_predict_fn(asm, params, preprocess=preprocess,
                              final_dtype=final_dtype)
    return quant.calibration_scales(predict, batches, exclude=exclude,
                                    quantile=quantile)


def _input_spec(asm, batch_size: int):
    ex = asm.example_input(batch_size)
    return jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), ex)


def export_predict(asm, params, batch_size: int = 1,
                   platforms: Sequence[str] = ("cpu", "tpu"),
                   preprocess: Optional[tuple] = None,
                   int8_scales: Optional[dict] = None,
                   int8_exclude: tuple = quant.DEFAULT_EXCLUDE,
                   final_dtype=None) -> bytes:
    """Lower + serialize the predict path for the given static batch size.

    ``platforms`` lists every backend the artifact must run on;
    cross-platform lowering happens on whatever host runs the export (no
    TPU needed to produce a TPU artifact).  With ``int8_scales`` the
    artifact carries the int8-quantized program (weights already rounded,
    scales baked in as constants); ``final_dtype`` bakes bf16 head output
    convs in (serving-only override, see :func:`make_predict_fn`).
    """
    predict = make_predict_fn(asm, params, preprocess=preprocess,
                              int8_scales=int8_scales,
                              int8_exclude=int8_exclude,
                              final_dtype=final_dtype)
    exp = jax.export.export(jax.jit(predict), platforms=list(platforms))(
        _input_spec(asm, batch_size))
    return exp.serialize()


def save_exported(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def load_predict(blob_or_path):
    """Deserialize an artifact into a callable ``model_input -> pytree``."""
    if isinstance(blob_or_path, (bytes, bytearray)):
        blob = bytes(blob_or_path)
    else:
        with open(blob_or_path, "rb") as f:
            blob = f.read()
    exp = jax.export.deserialize(blob)

    def predict(model_input):
        return exp.call(model_input)

    predict.platforms = tuple(exp.platforms)
    predict.in_avals = exp.in_avals
    return predict
