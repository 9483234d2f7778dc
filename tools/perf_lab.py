#!/usr/bin/env python
"""Microbenchmark lab: candidate TPU formulations of the HRNet hot convs.

Times individual conv formulations at the model's dominant shapes on the
real chip using the chained-scan methodology (see bench.py — the tunnel
makes single-dispatch timing unreliable).  Used to drive the issued-FLOP
reduction work: the production folded layout (ops/fold_conv.py) issues 4x
the algorithmic FLOPs on k=3 convs; this lab measures whether lower-issue
formulations (FOLD=2, tap-concat, naive) beat it per wall-clock.

Run: python tools/perf_lab.py [case ...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timer(fn_builder, *args, k_lo=2, k_hi=8, reps=3):
    """Seconds per op via chained-scan slope."""
    import jax

    ts = {}
    for K in (k_lo, k_hi):
        f = fn_builder(K)
        float(f(*args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0)
        ts[K] = best
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)


def chain_conv(conv_fn, x, w, length_outer):
    """Builder: K chained applications of conv_fn (feedback via cheap sum)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def build(K):
        @jax.jit
        def run(x, w):
            def body(c, _):
                out = conv_fn(c, w)
                fb = (out.astype(jnp.float32).sum() * 1e-24).astype(c.dtype)
                return c + fb, None
            xK, _ = lax.scan(body, x, None, length=K)
            return xK.astype(jnp.float32).sum()
        return run
    return build


# --------------------------------------------------------------------------
# FOLD-parametric folded conv (generalization of ops/fold_conv.py, F=2/4)
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def fold_entries(kx, stride, F):
    entries = []
    s_min = s_max = 0
    for fo in range(F):
        for dx in range(kx):
            d = dx - kx // 2
            pos = stride * fo + d
            s, fi = pos // F, pos % F
            entries.append((fo, dx, s, fi))
            s_min, s_max = min(s_min, s), max(s_max, s)
    return entries, s_min, s_max


def fold_weights(w, stride, F):
    import jax.numpy as jnp
    kz, ky, kx, C, Co = w.shape
    entries, s_min, s_max = fold_entries(kx, stride, F)
    width = s_max - s_min + 1
    out = jnp.zeros((kz, ky, width, F, C, F, Co), w.dtype)
    for fo, dx, s, fi in entries:
        out = out.at[:, :, s - s_min, fi, :, fo, :].set(w[:, :, dx])
    return out.reshape(kz, ky, width, F * C, F * Co)


def conv_folded_F(F):
    from jax import lax

    def conv(xf, w):
        kz, ky, kx, C, Co = w.shape
        entries, s_min, s_max = fold_entries(kx, 1, F)
        wf = fold_weights(w.astype(xf.dtype), 1, F)
        pad = [(kz // 2, kz // 2), (ky // 2, ky // 2), (-s_min, s_max)]
        return lax.conv_general_dilated(
            xf, wf, (1, 1, 1), pad,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return conv


def conv_naive(x, w):
    from jax import lax
    kz, ky, kx = w.shape[:3]
    pad = [(kz // 2, kz // 2), (ky // 2, ky // 2), (kx // 2, kx // 2)]
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv_int8(x, w):
    """int8 x int8 -> int32 conv: probes whether XLA:TPU lowers to the MXU's
    2x-rate int8 path (v5e: 394 int8 TOPS vs 197 bf16 TFLOP/s).  Inputs are
    expected already-quantized int8; output stays int32 (dequant fuses into
    the consumer in a real quantized pipeline)."""
    import jax.numpy as jnp
    from jax import lax
    kz, ky, kx = w.shape[:3]
    pad = [(kz // 2, kz // 2), (ky // 2, ky // 2), (kx // 2, kx // 2)]
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.int32)


def conv_tapconcat(x, w):
    """1x-issue formulation: gather the kx taps into channels, then a
    (kz, ky, 1) conv with kx*C input channels."""
    import jax.numpy as jnp
    from jax import lax
    kz, ky, kx, C, Co = w.shape
    shifts = []
    h = kx // 2
    for dx in range(kx):
        shifts.append(jnp.roll(x, h - dx, axis=3))
    xc = jnp.concatenate(shifts, axis=-1)                    # (B,Z,Y,X,kx*C)
    # kernel layout: tap-major channels matching the concat order
    wc = jnp.concatenate([w[:, :, dx][:, :, None] for dx in range(kx)], axis=3)
    pad = [(kz // 2, kz // 2), (ky // 2, ky // 2), (0, 0)]
    return lax.conv_general_dilated(
        xc, wc, (1, 1, 1), pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def grad_chain_conv(conv_fn):
    """Builder: K chained conv applications differentiated wrt (x, w).

    The VJP of each chained conv runs its grad-input (transposed-tap) and
    grad-weight convs, so the slope over K prices one full fwd+bwd of the
    formulation; backward-alone = this slope minus the forward slope.  The
    1e-30-scaled grad sum keeps the backward live against DCE without
    perturbing the loss.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    def build(K):
        def chain(x, w):
            def body(c, _):
                out = conv_fn(c, w)
                fb = (out.astype(jnp.float32).sum() * 1e-24).astype(c.dtype)
                return c + fb, None
            xK, _ = lax.scan(body, x, None, length=K)
            return xK.astype(jnp.float32).sum()

        @jax.jit
        def run(x, w):
            loss, grads = jax.value_and_grad(chain, argnums=(0, 1))(x, w)
            keep = sum(g.astype(jnp.float32).sum()
                       for g in jax.tree.leaves(grads))
            return loss + keep * 1e-30
        return run
    return build


def main():
    from rtpose_tpu.utils import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    print(f"# backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    B, Z, Y, X = 8, 16, 64, 160
    if os.environ.get("PERFLAB_SHAPE"):          # tiny-shape CPU smoke mode
        B, Z, Y, X = map(int, os.environ["PERFLAB_SHAPE"].split(","))
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    argv = sys.argv[1:]
    bwd = "--bwd" in argv
    argv = [a for a in argv if a != "--bwd"]
    cases = argv or (["naive", "f4", "gather", "tap"] if bwd
                     else ["naive", "f4", "f2", "tap"])
    shapes = [(32, 32), (32, 128), (64, 64), (96, 128)]

    for C, Co in shapes:
        x = jax.device_put(rng.normal(size=(B, Z, Y, X, C)).astype(np.float32)).astype(dt)
        w = jax.device_put(rng.normal(size=(3, 3, 3, C, Co)).astype(np.float32)).astype(dt)
        alg_tflop = 2 * 27 * C * Co * B * Z * Y * X / 1e12
        float(x.astype(jnp.float32).sum())
        for case in cases:
            try:
                warg = w
                if case == "naive":
                    conv_fn, arg0, issue = conv_naive, x, 1.0
                elif case in ("f2", "f4"):
                    F = int(case[1])
                    if X % F or C * F > 512:
                        continue
                    arg0 = x.reshape(B, Z, Y, X // F, F * C)
                    conv_fn = conv_folded_F(F)
                    _, s_min, s_max = fold_entries(3, 1, F)
                    issue = (s_max - s_min + 1) * F / 3.0
                elif case == "gather":
                    from rtpose_tpu.ops.fold_conv import FOLD, conv3d_folded_gather
                    if X % FOLD or C * FOLD > 512:
                        continue
                    arg0 = x.reshape(B, Z, Y, X // FOLD, FOLD * C)
                    conv_fn = conv3d_folded_gather
                    issue = (FOLD + 3 - 1) / 3.0
                elif case == "tap":
                    conv_fn, arg0, issue = conv_tapconcat, x, 1.0
                elif case in ("i8", "f4i8"):
                    # values are timing-only; a real pipeline would carry scales
                    xi = jnp.clip(x.astype(jnp.float32) * 8, -127, 127).astype(jnp.int8)
                    warg = jnp.clip(w.astype(jnp.float32) * 8, -127, 127).astype(jnp.int8)
                    if case == "i8":
                        conv_fn, arg0, issue = conv_int8, xi, 1.0
                    else:
                        F = 4
                        if X % F or C * F > 512:
                            continue
                        arg0 = xi.reshape(B, Z, Y, X // F, F * C)
                        issue = 4.0

                        def conv_fn(xf, wq8, _F=F):
                            entries, s_min, s_max = fold_entries(3, 1, _F)
                            wf = fold_weights(wq8, 1, _F)
                            pad = [(1, 1), (1, 1), (-s_min, s_max)]
                            from jax import lax
                            return lax.conv_general_dilated(
                                xf, wf, (1, 1, 1), pad,
                                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                                preferred_element_type=jnp.int32)
                else:
                    continue
                per = timer(chain_conv(conv_fn, arg0, warg, None), arg0, warg)
                if bwd:
                    per_vjp = timer(grad_chain_conv(conv_fn), arg0, warg)
                    per_b = per_vjp - per
                    # backward = grad-input + grad-weight ~= 2x the forward's
                    # algorithmic FLOPs
                    eff_b = 2 * alg_tflop / max(per_b, 1e-12)
                    print(f"C{C:>3}->C{Co:>3} {case:>6}: fwd {per*1e3:7.3f} ms"
                          f"  fwd+bwd {per_vjp*1e3:7.3f} ms  bwd "
                          f"{per_b*1e3:7.3f} ms  bwd-alg {eff_b:6.1f} TFLOP/s"
                          f"  (fwd x{issue:.2f})")
                else:
                    eff = alg_tflop / per
                    print(f"C{C:>3}->C{Co:>3} {case:>6}: {per*1e3:7.3f} ms  "
                          f"alg {eff:6.1f} TFLOP/s  issued {eff*issue:6.1f} "
                          f"(x{issue:.2f})")
            except Exception as e:
                print(f"C{C}->C{Co} {case}: FAILED {type(e).__name__}: {str(e)[:90]}")


if __name__ == "__main__":
    main()
