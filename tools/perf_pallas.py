#!/usr/bin/env python
"""On-chip microbench: Pallas fused folded conv vs the XLA formulations."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rtpose_tpu.ops import pallas_conv
    from rtpose_tpu.ops.fold_conv import (FOLD, conv3d_folded,
                                          conv3d_folded_gather)

    print(f"# backend {jax.default_backend()}")
    rng = np.random.default_rng(0)

    def bench(fn, xf, w, k_lo=2, k_hi=8, reps=3):
        def build(K):
            @jax.jit
            def run(x, w):
                def body(c, _):
                    o = fn(c, w)
                    return c + (o.astype(jnp.float32).sum() * 1e-24
                                ).astype(c.dtype), None
                xK, _ = lax.scan(body, x, None, length=K)
                return xK.reshape(-1)[0]
            return run
        ts = {}
        for K in (k_lo, k_hi):
            f = build(K)
            float(f(xf, w))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(f(xf, w))
                best = min(best, time.perf_counter() - t0)
            ts[K] = best
        return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)

    shapes = [(8, 16, 64, 40, 32, 32), (8, 8, 32, 20, 32, 32)]
    for B, Z, Y, Xf, C, Co in shapes:
        xf = jax.device_put(rng.random((B, Z, Y, Xf, FOLD * C), np.float32)
                            ).astype(jnp.bfloat16)
        w = jax.device_put(rng.normal(size=(3, 3, 3, C, Co))
                           .astype(np.float32)).astype(jnp.bfloat16)
        float(xf.astype(jnp.float32).sum())
        alg = 2 * 27 * C * Co * B * Z * Y * Xf * FOLD / 1e12
        assert pallas_conv._supported(xf, w), (xf.shape,)
        for name, fn in [
            ("pallas", lambda x_, w_: pallas_conv._fused(x_, w_)),
            ("gather", lambda x_, w_: conv3d_folded_gather(x_, w_)),
            ("fold4", lambda x_, w_: conv3d_folded(x_, w_)),
        ]:
            try:
                t = bench(fn, xf, w)
                print(f"({B},{Z},{Y},{Xf})xC{C} {name:>7}: {t*1e3:7.3f} ms  "
                      f"alg {alg/t:6.1f} TF")
            except Exception as e:
                print(f"({B},{Z},{Y},{Xf})xC{C} {name}: FAIL {str(e)[:120]}")


if __name__ == "__main__":
    main()
