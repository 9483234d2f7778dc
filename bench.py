#!/usr/bin/env python
"""Benchmark: HRRadarPose inference throughput (radar frames/sec/chip).

Runs the flagship hr3d_one_hm_doppler model (bf16 compute, full
16x64x160x32 post-ROI cube, forward + on-device decode) on the available
chip, sweeps batch sizes for steady-state throughput, and prints ONE JSON
line:

  {"metric": "radar frames/sec/chip (HRRadarPose infer)",
   "value": N, "unit": "frames/s", "vs_baseline": N/5000}

Baseline: the BASELINE.json north star of 5,000 frames/sec/chip (the
reference never published its per-frame latency — tools/test.py measures
but does not report it; see BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NORTH_STAR = 5000.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as graft
    from rtpose_tpu.engine import make_eval_step

    asm = graft._flagship()
    z, y, x, c = asm.input_shape_zyxc

    eval_step = make_eval_step(asm.model, asm.head, asm.decode_spec)
    eval_jit = jax.jit(eval_step)

    params = asm.model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, z, y, x, c), jnp.float32))
    rng = np.random.default_rng(0)

    results = {}
    for batch in (8, 16, 32):
        xb = jnp.asarray(rng.random((batch, z, y, x, c), np.float32))
        batch_dict = {"rdr_tensor": xb}
        # warmup + compile
        out = eval_jit(params, batch_dict)
        jax.block_until_ready(out)
        # steady state
        iters = max(4, int(64 // batch) * 4)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = eval_jit(params, batch_dict)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        fps = batch * iters / dt
        results[batch] = fps
        print(f"# batch={batch}: {fps:.1f} frames/s "
              f"({1000 * dt / iters:.2f} ms/iter)", file=sys.stderr)

    best = max(results.values())
    print(json.dumps({
        "metric": "radar frames/sec/chip (HRRadarPose infer)",
        "value": round(best, 1),
        "unit": "frames/s",
        "vs_baseline": round(best / NORTH_STAR, 4),
    }))


if __name__ == "__main__":
    main()
