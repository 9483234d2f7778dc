#!/usr/bin/env python
"""Backward-pass microbenchmarks of the hot conv formulations.

For each formulation (gather / fold4) and shape, times four jitted chains:
  fwd            — forward conv only
  fwd+gx         — forward + grad wrt input     (transposed conv)
  fwd+gw         — forward + grad wrt weights   (batch-contraction conv)
  fwd+gx+gw      — the full training pattern
so the marginal cost of each backward component is the difference.  Each
chain consumes its outputs (feedback scalar) so nothing is DCE'd.

Run: python tools/perf_lab_bwd.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_BF16_PEAK = 197e12


def chained(loss_grads, consume_w):
    import jax
    import jax.numpy as jnp
    from jax import lax

    def build(K):
        @jax.jit
        def run(x, w):
            def body(c, _):
                outs = loss_grads(c, w)
                s = sum(o.astype(jnp.float32).sum() for o in outs)
                return c + (s * 1e-24).astype(c.dtype), None
            xK, _ = lax.scan(body, x, None, length=K)
            return xK.reshape(-1)[0]
        return run
    return build


def slope(build, x, w, k_lo=2, k_hi=6, reps=3):
    ts = {}
    for K in (k_lo, k_hi):
        f = build(K)
        float(f(x, w))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(x, w))
            best = min(best, time.perf_counter() - t0)
        ts[K] = best
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rtpose_tpu.ops.fold_conv import (FOLD, conv3d_folded,
                                          conv3d_folded_gather)

    print(f"# backend {jax.default_backend()}")
    B, Z, Y, X = 8, 16, 64, 160
    rng = np.random.default_rng(0)

    for C, Co in [(32, 32), (128, 32), (32, 128)]:
        xf = jax.device_put(rng.random((B, Z, Y, X // FOLD, FOLD * C),
                                       np.float32)).astype(jnp.bfloat16)
        w = jax.device_put(rng.normal(size=(3, 3, 3, C, Co))
                           .astype(np.float32)).astype(jnp.bfloat16)
        float(xf.astype(jnp.float32).sum())
        alg = 2 * 27 * C * Co * B * Z * Y * X / 1e12  # TFLOP, forward

        for name, conv in [("gather", conv3d_folded_gather),
                           ("fold4", lambda a, b: conv3d_folded(a, b))]:
            def loss(x_, w_):
                return conv(x_, w_).astype(jnp.float32).sum()

            cases = {
                "fwd": lambda x_, w_: (conv(x_, w_),),
                "fwd+gx": lambda x_, w_: (jax.value_and_grad(loss, 0)(x_, w_)[1],),
                "fwd+gw": lambda x_, w_: (jax.value_and_grad(loss, 1)(x_, w_)[1],),
                "fwd+gx+gw": lambda x_, w_: jax.value_and_grad(
                    loss, (0, 1))(x_, w_)[1],
            }
            res = {}
            for cname, fn in cases.items():
                try:
                    res[cname] = slope(chained(fn, "w" in cname), xf, w)
                except Exception as e:
                    print(f"C{C}->C{Co} {name} {cname}: FAIL {str(e)[:80]}")
                    res[cname] = float("nan")
            t_f = res["fwd"]
            t_gx = res["fwd+gx"] - t_f
            t_gw = res["fwd+gw"] - t_f
            t_all = res["fwd+gx+gw"]
            print(f"C{C:>3}->C{Co:>3} {name:>6}: fwd {t_f*1e3:6.2f}  "
                  f"gx +{t_gx*1e3:6.2f}  gw +{t_gw*1e3:6.2f}  "
                  f"full {t_all*1e3:6.2f} ms   "
                  f"(fwd alg {alg/t_f:5.1f} TF, gx {alg/max(t_gx,1e-9):5.1f}, "
                  f"gw {alg/max(t_gw,1e-9):5.1f})")


if __name__ == "__main__":
    main()
