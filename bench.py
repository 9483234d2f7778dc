#!/usr/bin/env python
"""Benchmark: HRRadarPose inference throughput (radar frames/sec/chip).

Measures the flagship hr3d_one_hm_doppler model (bf16 compute, full
16x64x160x32 post-ROI cube, forward + dense heads) in steady state.

Methodology: this environment reaches the TPU through a tunnel where
``block_until_ready`` is unreliable and per-call RTT is tens of ms, so the
benchmark times K forward passes CHAINED INSIDE ONE jitted ``lax.scan``
(each iteration's input depends on the previous output, so XLA cannot
elide or overlap them) and reads a scalar.  Per-forward time is the slope
between two K values, which cancels dispatch/fetch RTT exactly.

Prints ONE JSON line:
  {"metric": "radar frames/sec/chip (HRRadarPose infer)",
   "value": N, "unit": "frames/s", "vs_baseline": N/5000}

Baseline: the BASELINE.json north star of 5,000 frames/sec/chip (the
reference never published per-frame latency; see BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NORTH_STAR = 5000.0


def main():
    import jax

    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    import __graft_entry__ as graft

    asm = graft._flagship()
    z, y, x, c = asm.input_shape_zyxc
    model = asm.model

    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, z, y, x, c)))

    def make_chained(K):
        @jax.jit
        def run(params, x0):
            def body(carry, _):
                # full inference: sparse-head forward + on-device decode
                hm, reg_pk, ind = model.apply(params, carry,
                                              method="predict_sparse")
                d = (hm.astype(jnp.float32).sum()
                     + reg_pk.astype(jnp.float32).sum()) * 1e-20
                return carry + d, None
            xK, _ = lax.scan(body, x0, None, length=K)
            return xK[0, 0, 0, 0, 0] + xK.sum() * 0e0
        return run

    def measure(B, k_lo=2, k_hi=6, reps=3):
        xb = jax.device_put(
            np.random.default_rng(0).random((B, z, y, x, c), np.float32))
        float(jnp.sum(xb[0, 0, 0, 0]))  # force upload before timing
        times = {}
        for K in (k_lo, k_hi):
            f = make_chained(K)
            float(f(params, xb))  # compile + warm
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(f(params, xb))
                best = min(best, time.perf_counter() - t0)
            times[K] = best
        per_iter = (times[k_hi] - times[k_lo]) / (k_hi - k_lo)
        return B / per_iter, per_iter

    results = {}
    for B in (8, 32):
        fps, per_iter = measure(B)
        results[B] = fps
        print(f"# batch={B}: {fps:.1f} frames/s ({1000 * per_iter:.2f} ms/fwd)",
              file=sys.stderr)

    best = max(results.values())
    print(json.dumps({
        "metric": "radar frames/sec/chip (HRRadarPose infer)",
        "value": round(best, 1),
        "unit": "frames/s",
        "vs_baseline": round(best / NORTH_STAR, 4),
    }))


if __name__ == "__main__":
    main()
