"""Post-training int8 quantization for the serving path.

The v5e MXU runs int8 x int8 -> int32 contractions at 2x the bf16 rate
(394 TOPS vs 197 TFLOP/s), so a weight+activation-quantized forward can
roughly double conv throughput IF XLA lowers the int8 conv onto the MXU
int8 path (measured in tools/perf_lab.py, cases ``i8``/``f4i8``).

Design (classic symmetric PTQ, zero-point 0 everywhere):

* **Weights**: per-output-channel symmetric scales ``sw[co] =
  absmax(w[..., co]) / 127``, quantized at apply time from the canonical
  f32 checkpoint params (weights are tiny; the rounding is fused into the
  compiled program and checkpoints stay unchanged).
* **Activations**: per-conv-input per-tensor scales from a calibration
  pass.  Calibration runs the SAME jitted method under ``calibrate()`` —
  each ``TorchConv3d`` records a traced absmax which the wrapper returns,
  so calibration is one compiled forward per batch, not an eager walk.
* Zero-point-0 symmetric quant keeps the folded/gather conv formulations
  (ops/fold_conv.py) EXACT: their structural zero padding quantizes to 0,
  so boundary handling is unchanged.

Why a context and not a module flag: the quant mode only exists at trace
time of a serving function (export / bench / eval), and threading a field
through every HRNet submodule would touch ~15 constructors for a purely
cross-cutting concern.  The context is consulted by ``TorchConv3d`` at
apply time; tracing a jit/export inside the context bakes the (host
float) scales in as constants — the artifact is self-contained.

Reference being replaced: the CUDA baseline has no quantized path; this is
a TPU-native serving extension (BASELINE.json production-serving goal).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np
from jax import lax

from .fold_conv import (FOLD, _fold_entries, fold_weights_concat,
                        fold_weights_x4, gather_taps_x, gather_weights_x)

_state = threading.local()


class QuantState:
    def __init__(self, mode: str, scales: Optional[Dict[str, float]] = None,
                 exclude: tuple = (), quantile: Optional[float] = None):
        self.mode = mode                    # 'calib' | 'int8'
        self.scales = scales or {}          # path -> float (act absmax/127)
        self.exclude = exclude              # leaf-name suffixes left unquantized
        self.quantile = quantile            # calib: clip statistic (None=absmax)
        self.traced = {}                    # calib: path -> traced absmax

    def excluded(self, path: str) -> bool:
        # match the FINAL path component by suffix: a parent module whose
        # name merely contains an exclude string must not silently exclude
        # its whole subtree
        leaf = path.rsplit("/", 1)[-1]
        return any(leaf.endswith(s) for s in self.exclude)


def current() -> Optional[QuantState]:
    return getattr(_state, "q", None)


@contextmanager
def calibrate(exclude: tuple = (), quantile: Optional[float] = None):
    """Trace a forward inside this context; each conv records a traced
    input statistic into ``state.traced``: the absmax (default), or the
    ``quantile``-th quantile of |x| over a strided subsample.  Quantile
    clipping is the standard PTQ outlier defense — an absmax blown up by a
    few activation outliers crushes the useful int8 signal range (measured
    on the 1920-frame checkpoint: absmax calibration costs 49.7 -> 414.7 mm
    MPJPE; see BASELINE.md round-5).  The wrapper function should return
    ``state.traced`` so the per-batch statistics come out of the jit."""
    prev = current()
    q = QuantState("calib", exclude=exclude, quantile=quantile)
    _state.q = q
    try:
        yield q
    finally:
        _state.q = prev


@contextmanager
def int8_mode(scales: Dict[str, float], exclude: tuple = ()):
    """Trace a forward inside this context to get the int8-quantized
    program; ``scales`` maps conv paths to activation scales (absmax/127,
    host floats — baked in as constants)."""
    prev = current()
    _state.q = QuantState("int8", dict(scales), exclude=exclude)
    try:
        yield _state.q
    finally:
        _state.q = prev


def scales_from_calib(batch_maxima) -> Dict[str, float]:
    """Reduce per-batch calibration maxima (list of {path: absmax arrays})
    to activation scales.  absmax 0 (dead input) falls back to scale 1."""
    out: Dict[str, float] = {}
    for rec in batch_maxima:
        for k, v in rec.items():
            v = float(np.asarray(v))
            out[k] = max(out.get(k, 0.0), v)
    return {k: (v / 127.0 if v > 0 else 1.0) for k, v in out.items()}


# Head output convs (SepHead names them "<branch>_out") stay float by
# default: the hm logits feed a sigmoid+argmax and the reg values are used
# verbatim in metric space, so their quant error lands 1:1 in the metric,
# while they carry <2% of the FLOPs.  The final-fuse resize matmuls
# ("<site>_resize") are also excluded by default — quantizing them is a
# measured speed/accuracy trade (opt in with INT8_RESIZE_EXCLUDE, e.g.
# tools/export.py --int8_resize).  Entries match by SUFFIX of the final
# path component only (QuantState.excluded).
DEFAULT_EXCLUDE = ("_out", "_resize")

# opt-in variant: int8 resizes too (only the head out-convs stay float)
INT8_RESIZE_EXCLUDE = ("_out",)


def calibration_scales(fn, batches, exclude: tuple = DEFAULT_EXCLUDE,
                       extra_args: tuple = (),
                       quantile: Optional[float] = None) -> Dict[str, float]:
    """Run ``fn(batch, *extra_args)`` under calibration over ``batches`` and
    return activation scales for :func:`int8_mode`.

    ``fn`` must be jit-traceable; each conv's input statistic (absmax, or
    the ``quantile``-clipped absmax) is recorded as a traced value and
    returned OUT of the jit, so calibration is one compiled forward per
    batch (no eager walk).
    """
    import jax

    def wrapped(batch, *a):
        with calibrate(exclude, quantile=quantile) as q:
            fn(batch, *a)
            return dict(q.traced)

    wj = jax.jit(wrapped)
    maxima = [jax.device_get(wj(b, *extra_args)) for b in batches]
    return scales_from_calib(maxima)


def consult(path: str, x: jnp.ndarray) -> Optional[float]:
    """Quant-context hook for a conv call site keyed by ``path``.

    Under calibration, records the input absmax (max-accumulated across
    repeated applications) and returns None; under int8 mode returns the
    activation scale if one was calibrated for this path; otherwise None
    (caller runs its float path).  Mirrors TorchConv3d's inline logic so
    non-module conv sites (e.g. the HRNet final fuse conv) participate."""
    q = current()
    if q is None or q.excluded(path):
        return None
    if q.mode == "calib":
        flat = jnp.abs(x.astype(jnp.float32)).reshape(-1)
        if q.quantile is not None:
            # strided subsample keeps the traced sort ~O(200k log) per site
            stride = max(1, flat.shape[0] // 200_000)
            stat = jnp.quantile(flat[::stride], q.quantile)
        else:
            stat = jnp.max(flat)
        prev = q.traced.get(path)
        q.traced[path] = stat if prev is None else jnp.maximum(prev, stat)
        return None
    if q.mode == "int8":
        return q.scales.get(path)
    return None


def _quantize_act(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    q = jnp.round(x.astype(jnp.float32) * (1.0 / scale))
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def _quantize_weight(w: jnp.ndarray):
    """Per-output-channel symmetric int8: returns (wq int8, sw (Co,) f32)."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=tuple(range(w.ndim - 1)))
    sw = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    wq = jnp.clip(jnp.round(w32 / sw), -127, 127).astype(jnp.int8)
    return wq, sw


def conv3d_int8(x: jnp.ndarray, w: jnp.ndarray, bias, stride: int,
                act_scale: float, folded: bool, out_dtype) -> jnp.ndarray:
    """Int8 conv matching TorchConv3d semantics (folded or naive layout).

    ``x`` is the UNquantized activation (any float dtype); ``w`` the
    canonical (kz, ky, kx, C, Co) float kernel.  Returns dequantized output
    in ``out_dtype`` — bit-layout-identical to the float path's output so
    downstream GN/ReLU/decode are untouched.
    """
    kz, ky, kx, C, Co = w.shape
    xq = _quantize_act(x, act_scale)
    wq, sw = _quantize_weight(w)

    if folded:
        if stride == 1 and kx > 1 and kx % 2 == 1 and Co <= C:
            # measured (tools/perf_lab.py + round-4 probe): gather-i8 wins
            # at fat-input convs (C128->C32: 1.59x over bf16), f4-i8 wins
            # at expanding convs (C32->C128: 1.44x over gather-i8)
            g = gather_taps_x(xq, kx)                  # zero pad == zp 0
            wf = gather_weights_x(wq)                  # int8, zeros exact
            pad = [(kz // 2, kz // 2), (ky // 2, ky // 2), (0, 0)]
            acc = lax.conv_general_dilated(
                g, wf, (1, 1, 1), pad,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.int32)
        else:
            _, s_min, s_max = _fold_entries(kx, stride)
            wf = fold_weights_x4(wq, stride)
            pad = [(kz // 2, kz // 2), (ky // 2, ky // 2), (-s_min, s_max)]
            acc = lax.conv_general_dilated(
                xq, wf, (stride,) * 3, pad,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.int32)
        lane_scale = jnp.tile(sw, FOLD) * act_scale
        out = acc.astype(jnp.float32) * lane_scale
        if bias is not None:
            out = out + jnp.tile(bias.astype(jnp.float32), FOLD)
    else:
        pad = [(kz // 2, kz // 2), (ky // 2, ky // 2), (kx // 2, kx // 2)]
        acc = lax.conv_general_dilated(
            xq, wq, (stride,) * 3, pad,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * (sw * act_scale)
        if bias is not None:
            out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def conv3d_int8_concat_1x1(x: jnp.ndarray, w: jnp.ndarray, bias,
                           block_channels, act_scale: float,
                           out_dtype) -> jnp.ndarray:
    """Int8 form of the HRNet final fuse conv (concat-of-folded input) in
    the BLOCK-DIAGONAL folded-kernel form, measured 1.82x its bf16 rate
    on-chip.  A lane-regrouping matmul form (unfold_concat_lanes + one
    K=sum(C) dot) is 4.5x SLOWER despite x4 fewer issued ops: splitting
    the folded lane dim produces a (…, FOLD, C) minor layout the TPU has
    to transpose around (see BASELINE.md negative results)."""
    xq = _quantize_act(x, act_scale)
    wq, sw = _quantize_weight(w)
    wf = fold_weights_concat(wq, tuple(block_channels))
    acc = lax.conv_general_dilated(
        xq, wf, (1, 1, 1), [(0, 0), (0, 0), (0, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (jnp.tile(sw, FOLD) * act_scale)
    if bias is not None:
        out = out + jnp.tile(bias.astype(jnp.float32), FOLD)
    return out.astype(out_dtype)
