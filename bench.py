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
V5E_BF16_PEAK = 197e12  # TFLOP/s, one v5e chip


def report_mfu(asm, model, params, fps, np):
    """Issued vs algorithmic FLOPs/frame + utilization at the measured fps.

    issued  = XLA cost_analysis of the shipped predict_sparse executable
              (counts the folded layout's structural zeros);
    algorithmic = cost_analysis of the same model with fold_x disabled
              (1x-issue lowering of the identical math);
    MFU     = fps * algorithmic / peak;  issued-util = fps * issued / peak.
    """
    import jax
    import jax.numpy as jnp

    from rtpose_tpu.utils import estimate_flops

    z, y, x, c = asm.input_shape_zyxc
    x1 = jnp.zeros((1, z, y, x, c), jnp.float32)
    issued = estimate_flops(
        lambda p, xx: model.apply(p, xx, method="predict_sparse"), params, x1)

    cfg_model = dict(asm.model_cfg)
    cfg_model["backbone"] = dict(cfg_model["backbone"], fold_x=False)
    cfg_model["pose_head"] = dict(cfg_model["pose_head"], fold_x=False)
    from rtpose_tpu.models import build_detector
    naive = build_detector(cfg_model)
    alg = estimate_flops(
        lambda p, xx: naive.apply(p, xx, method="predict_sparse"),
        naive.init(jax.random.PRNGKey(0), x1), x1)

    out = {}
    if issued:
        out["issued_gflop_per_frame"] = round(issued / 1e9, 1)
        out["issued_util"] = round(fps * issued / V5E_BF16_PEAK, 4)
    if alg:
        out["algorithmic_gflop_per_frame"] = round(alg / 1e9, 1)
        out["mfu"] = round(fps * alg / V5E_BF16_PEAK, 4)
    if issued and alg:
        out["issue_factor"] = round(issued / alg, 2)
    print(f"# flops/frame: issued {out.get('issued_gflop_per_frame')} GF, "
          f"algorithmic {out.get('algorithmic_gflop_per_frame')} GF "
          f"(x{out.get('issue_factor')}); at {fps:.0f} f/s: "
          f"issued-util {100 * out.get('issued_util', 0):.1f}%, "
          f"MFU {100 * out.get('mfu', 0):.1f}% of 197 bf16 TFLOP/s",
          file=sys.stderr)
    return out


def measure_pipeline(np, B=8, epochs=2):
    """End-to-end sustained throughput: disk .npy (native fused loader) ->
    host batch -> H2D -> predict_sparse -> host keypoint decode.

    This is the number tools/test.py --speed_test measures on real data
    (reference harness tools/test.py:186-201); the kernel-only chained-scan
    number excludes the host path.  Also measures the loader alone to name
    the bottleneck stage.  NOTE: this machine exposes ONE host core; the
    host stages scale with cores on real TPU-VM hosts (~100+).
    """
    import time

    import jax

    root = "/tmp/rtpose_bench_data"
    if not os.path.exists(os.path.join(root, "Test.json")):
        from rtpose_tpu.data import generate_synthetic_dataset
        generate_synthetic_dataset(root, num_seqs=3, frames_per_seq=8,
                                   rdr_type="dzyx_real", seed=0)
    os.environ["RTPOSE_DATA_ROOT"] = root

    from rtpose_tpu.api import assemble, build_dataset_from_cfg
    from rtpose_tpu.config import Config
    from rtpose_tpu.core.decode import post_process_pose
    from rtpose_tpu.data import BatchLoader
    from rtpose_tpu.engine import make_eval_step
    from rtpose_tpu.engine.evaluator import device_prefetch

    cfg = Config.fromfile(os.path.join(os.path.dirname(__file__),
                                       "configs/cruw_pose/hr3d_one_hm_doppler.py"))
    asm = assemble(cfg)
    ds = build_dataset_from_cfg(cfg.data, "test",
                                max_poses=asm.target_spec.max_poses)
    import jax.numpy as jnp
    z, y, x, c = asm.input_shape_zyxc
    params = asm.model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, z, y, x, c), jnp.float32))
    eval_jit = jax.jit(make_eval_step(asm.model, asm.head, asm.decode_spec,
                                      sparse=True))

    def one_epoch(dataset=ds, eval_fn=eval_jit):
        """Full eval pipeline pass through the production path: threaded
        host loader -> double-buffered H2D (device_prefetch, so transfer of
        batch k+1 overlaps batch k's compute) -> jitted forward+decode ->
        host post-processing."""
        loader = BatchLoader(dataset, batch_size=B, shuffle=False,
                             drop_last=False)
        frames = 0
        last = None
        for batch in device_prefetch(loader):
            # "valid" must stay host-side (device_prefetch passes it
            # through untransferred); a device array here would make this
            # int() a blocking fetch that distorts the sustained number.
            assert not isinstance(batch["valid"], jax.Array), \
                "batch['valid'] became a device array — fix device_prefetch"
            valid = int(batch["valid"])
            metas = batch["meta"][:valid]
            dev = {k: v for k, v in batch.items()
                   if k not in ("meta", "valid")}
            per_task = eval_fn(params, dev)
            last = per_task
            for kpts, scores, labels in per_task:
                post_process_pose(kpts[:valid], scores[:valid],
                                  labels[:valid], asm.decode_spec,
                                  metas=metas, one_hm=True)
            frames += valid
        if last is not None:
            jax.block_until_ready(last)
        return frames

    one_epoch()  # compile + page cache warm
    t0 = time.perf_counter()
    n = sum(one_epoch() for _ in range(epochs))
    pipeline_fps = n / (time.perf_counter() - t0)

    # --device_preprocess variant: ship ROI-cropped RAW (half-size f16)
    # cubes; cast + normalize + layout run on-chip (Pallas fused preprocess)
    dp_fps = None
    try:
        ds_dp = build_dataset_from_cfg(cfg.data, "test",
                                       max_poses=asm.target_spec.max_poses,
                                       device_preprocess=True)
        eval_dp = jax.jit(make_eval_step(
            asm.model, asm.head, asm.decode_spec, sparse=True,
            preprocess=(ds_dp.norm_start, ds_dp.norm_scale)))
        one_epoch(ds_dp, eval_dp)  # compile warm
        t0 = time.perf_counter()
        n_dp = sum(one_epoch(ds_dp, eval_dp) for _ in range(epochs))
        dp_fps = n_dp / (time.perf_counter() - t0)
    except Exception as e:
        print(f"# device-preprocess pipeline skipped: {e!r:.120}",
              file=sys.stderr)

    # ---- per-stage split (ms/frame) ----
    # Stages are measured independently and DISJOINTLY (no subtraction: the
    # native fused loader reads only the ROI slice of each .npy, so
    # "full-file read time" is not a component of the sample load and
    # subtracting it produced a negative stage in round 3).  The page cache
    # is warmed for every probe file first, untimed, so read probes and
    # load probes see the same cache state.
    stages = {}
    n_probe = min(len(ds), 16)

    def probe_path(i):
        s = ds.samples[i]
        return os.path.join(ds.root_dir, ds.seq_id_to_name[s["seq"]],
                            ds.rdr_dirname, f"{s['rdr_frame']}.npy")

    nbytes = 0
    for i in range(n_probe):                      # warm page cache, untimed
        with open(probe_path(i), "rb") as f:
            nbytes += len(f.read())

    t0 = time.perf_counter()       # full-file read (informational: the
    for i in range(n_probe):       # loader itself reads only the ROI slice)
        with open(probe_path(i), "rb") as f:
            f.read()
    raw_read = (time.perf_counter() - t0) / n_probe

    t0 = time.perf_counter()       # 1. host load (read+decode+crop+norm)
    for i in range(n_probe):
        ds[i]
    stages["host load"] = (time.perf_counter() - t0) / n_probe

    items = [ds[i] for i in range(min(B, n_probe))]
    hb = {k: np.stack([it[k] for it in items]) for k in
          ("rdr_tensor", "poses", "num_poses")}
    dev = {k: jax.device_put(v) for k, v in hb.items()}
    jax.block_until_ready(dev)
    t0 = time.perf_counter()                      # 3. H2D transfer
    for _ in range(3):
        dev = {k: jax.device_put(v) for k, v in hb.items()}
        jax.block_until_ready(dev)
    stages["H2D"] = (time.perf_counter() - t0) / (3 * len(items))

    eval_jit(params, dev)                         # warm
    t0 = time.perf_counter()                      # 4. device forward+decode
    for _ in range(3):
        jax.block_until_ready(eval_jit(params, dev))
    stages["device model"] = (time.perf_counter() - t0) / (3 * len(items))

    per_task = jax.device_get(eval_jit(params, dev))
    metas = [it["meta"] for it in items]
    t0 = time.perf_counter()                      # 5. host post-process
    for _ in range(3):
        for kpts, scores, labels in per_task:
            post_process_pose(kpts, scores, labels, asm.decode_spec,
                              metas=metas, one_hm=True)
    stages["host post"] = (time.perf_counter() - t0) / (3 * len(items))

    for k, v in stages.items():     # a corrupted split must fail loudly
        assert v >= 0.0, f"negative stage time: {k} = {v}"
    worst = max(stages, key=stages.get)
    detail = ", ".join(f"{k} {1e3 * v:.1f}" for k, v in stages.items())
    dp_msg = (f"; with --device_preprocess: {dp_fps:.0f} frames/s"
              if dp_fps else "")
    print(f"# pipeline sustained: {pipeline_fps:.0f} frames/s{dp_msg}; "
          f"per-stage ms/frame: {detail} (full-file read {1e3 * raw_read:.1f}, "
          f"warm cache) -> bottleneck: {worst} "
          f"({1e3 * stages[worst]:.1f} ms/frame; NOTE 1-core host — host "
          f"stages parallelize ~linearly with cores on real TPU-VM hosts)",
          file=sys.stderr)
    return pipeline_fps, stages


def measure_train(asm, np, B=8, k_lo=2, k_hi=4):
    """Sparse-reg train steps/sec via chained scan (state threads the chain)."""
    import time

    import jax
    import jax.numpy as jnp
    from jax import lax

    from rtpose_tpu.engine import create_train_state, make_train_step
    from rtpose_tpu.solver import adam_one_cycle, make_one_cycle_fns

    z, y, x, c = asm.input_shape_zyxc
    rng = np.random.default_rng(0)
    pelvis = np.asarray(asm.target_spec.pc_range_min_xyz, np.float32) + \
        np.array([1.0, 2.0, 1.0], np.float32)
    batch = {
        "rdr_tensor": jax.device_put(rng.normal(size=(B, z, y, x, c)).astype(np.float32)),
        "poses": jax.device_put(np.tile(pelvis, (B, 1, 15, 1)).astype(np.float32)),
        "num_poses": jax.device_put(np.ones((B,), np.int32)),
    }
    float(batch["rdr_tensor"].sum())
    lr_fn, mom_fn = make_one_cycle_fns(1000, 2e-3)
    opt = adam_one_cycle(lr_fn, mom_fn)
    state = create_train_state(asm.model, opt, jnp.zeros((1, z, y, x, c)))
    step = make_train_step(asm.model, asm.head, asm.target_spec, opt,
                           lr_fn=lr_fn, sparse_reg=True)

    def chained(K):
        @jax.jit
        def run(state, batch):
            def body(s, _):
                s2, m = step(s, batch)
                return s2, m["loss"]
            s2, losses = lax.scan(body, state, None, length=K)
            return losses[-1]
        return run

    ts = {}
    for K in (k_lo, k_hi):
        g = chained(K)
        float(g(state, batch))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(g(state, batch))
            best = min(best, time.perf_counter() - t0)
        ts[K] = best
    return (k_hi - k_lo) / (ts[k_hi] - ts[k_lo])


def measure_preprocess(np, B=16, k_lo=2, k_hi=8):
    """Fused Pallas crop+normalize throughput on raw full cubes."""
    import time

    import jax
    import jax.numpy as jnp
    from jax import lax

    from rtpose_tpu.ops.preprocess import fused_preprocess_batch

    ROI = (4, 19, 32, 95, 17, 176)
    raw = jax.device_put(np.random.default_rng(0)
                         .random((B, 32, 32, 128, 256)).astype(np.float32))
    float(raw.sum())

    def chained(K):
        @jax.jit
        def run(x):
            def body(c, _):
                out = fused_preprocess_batch(c, ROI, 0.0, 10.0)
                return c + (out.sum() * 1e-20).astype(c.dtype), None
            xK, _ = lax.scan(body, x, None, length=K)
            return xK[0, 0, 0, 0, 0]
        return run

    ts = {}
    for K in (k_lo, k_hi):
        g = chained(K)
        float(g(raw))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(g(raw))
            best = min(best, time.perf_counter() - t0)
        ts[K] = best
    per = (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)
    return B / per


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

    # --smoke: tiny-grid fast path (CI guard that the headline JSON prints
    # first and the process exits 0 — the round-4 driver capture timed out
    # because the headline used to print after ~8 informational sections)
    smoke = "--smoke" in sys.argv

    asm = graft._flagship(tiny=smoke)
    z, y, x, c = asm.input_shape_zyxc
    model = asm.model
    batches = (2,) if smoke else (8, 32)

    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, z, y, x, c)))

    def make_chained(K, m=None):
        m = m if m is not None else model
        @jax.jit
        def run(params, x0):
            def body(carry, _):
                # full inference: sparse-head forward + on-device decode
                hm, reg_pk, ind = m.apply(params, carry,
                                          method="predict_sparse")
                d = (hm.astype(jnp.float32).sum()
                     + reg_pk.astype(jnp.float32).sum()) * 1e-20
                return carry + d, None
            xK, _ = lax.scan(body, x0, None, length=K)
            return xK[0, 0, 0, 0, 0] + xK.sum() * 0e0
        return run

    def measure(B, k_lo=2, k_hi=6, reps=3, use_model=None):
        m = use_model if use_model is not None else model
        xb = jax.device_put(
            np.random.default_rng(0).random((B, z, y, x, c), np.float32))
        float(jnp.sum(xb[0, 0, 0, 0]))  # force upload before timing
        times = {}
        for K in (k_lo, k_hi):
            f = make_chained(K, m)
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
    for B in batches:
        fps, per_iter = measure(B)
        results[B] = fps
        print(f"# batch={B}: {fps:.1f} frames/s ({1000 * per_iter:.2f} ms/fwd)",
              file=sys.stderr)
    best_bf16 = max(results.values())

    # ---- int8 serving path (v5e MXU int8 = 2x bf16 rate) ----
    # Same chained-scan harness; tracing under int8_mode dispatches every
    # non-excluded conv to the int8 kernel (ops/quant.py).  Scales come from
    # a random-cube calibration — the throughput is scale-independent.
    int8_best = None
    scales = None
    try:
        from rtpose_tpu.ops import quant
        xcal = jax.device_put(
            np.random.default_rng(1).random((batches[0], z, y, x, c),
                                            np.float32))
        scales = quant.calibration_scales(
            lambda b: model.apply(params, b, method="predict_sparse"), [xcal])
        with quant.int8_mode(scales):
            int8_res = {}
            for B in batches:
                fps8, per8 = measure(B)
                int8_res[B] = fps8
                print(f"# int8 batch={B}: {fps8:.1f} frames/s "
                      f"({1000 * per8:.2f} ms/fwd)", file=sys.stderr)
        int8_best = max(int8_res.values())
        print(f"# int8 vs bf16: {int8_best / best_bf16:.2f}x "
              f"({len(scales)} quantized convs)", file=sys.stderr)
    except Exception as e:
        print(f"# int8 bench skipped: {e!r:.200}", file=sys.stderr)

    # ---- HEADLINE — printed BEFORE the informational sections so the
    # driver capture always gets it (round-4 lesson: BENCH_r04 rc=124 with
    # parsed:null because this line used to print last).  Headline = best
    # shipped serving path (bf16 or int8); every variant ships end-to-end
    # via tools/export.py [--int8] [--final_dtype bfloat16] + tools/test.py
    # --exported, with accuracy deltas recorded in BASELINE.md's round-5
    # serving-variant MPJPE table.
    best = max([best_bf16] + ([int8_best] if int8_best else []))
    print(json.dumps({
        "metric": "radar frames/sec/chip (HRRadarPose infer)",
        "value": round(best, 1),
        "unit": "frames/s",
        "vs_baseline": round(best / NORTH_STAR, 4),
    }), flush=True)

    if smoke:
        return

    # ================= informational follow-on sections =================
    # Everything below is stderr-only diagnostics; the headline is already
    # out, so a driver timeout here can no longer lose the round's metric.

    # ---- bf16-final serving variant (head OUTPUT convs in bf16) ----
    # Ships via tools/export.py --final_dtype bfloat16 (accuracy delta
    # measured by tools/test.py --final_dtype); trims the lane-starved
    # C32->K f32 out-convs (~1.4 ms of the 4.3 ms frame, BASELINE.md r3).
    fdt_model = None
    try:
        from rtpose_tpu.api import serving_variant
        fdt_model = serving_variant(asm, "bfloat16").model
        fdt_res = {}
        for B in (8, 32):
            fpsf, perf = measure(B, use_model=fdt_model)
            fdt_res[B] = fpsf
            print(f"# bf16-final batch={B}: {fpsf:.1f} frames/s "
                  f"({1000 * perf:.2f} ms/fwd)", file=sys.stderr)
        print(f"# bf16-final vs f32-final: "
              f"{max(fdt_res.values()) / best_bf16:.2f}x", file=sys.stderr)
        if scales is not None:
            from rtpose_tpu.ops import quant
            with quant.int8_mode(scales):
                # int8 convs + bf16 head out-convs — the full serving stack
                # (tools/export.py --int8 --final_dtype bfloat16)
                fps8f, per8f = measure(8, use_model=fdt_model)
                print(f"# int8+bf16-final batch=8: {fps8f:.1f} frames/s "
                      f"({1000 * per8f:.2f} ms/fwd)", file=sys.stderr)
    except Exception as e:
        print(f"# bf16-final bench skipped: {e!r:.200}", file=sys.stderr)

    try:
        report_mfu(asm, model, params, best_bf16, np)
    except Exception as e:
        print(f"# mfu report skipped: {e!r:.120}", file=sys.stderr)

    # ---- exported-artifact latency (artifact-vs-live, batch 8) ----
    try:
        from rtpose_tpu.export import (export_predict, load_predict,
                                       make_predict_fn)

        def measure_fn(fn, B, k_lo=2, k_hi=6, reps=3):
            """Chained-scan f/s for any cube->pytree predict callable."""
            xb = jax.device_put(
                np.random.default_rng(0).random((B, z, y, x, c), np.float32))
            float(jnp.sum(xb[0, 0, 0, 0]))
            def chained(K):
                @jax.jit
                def run(x0):
                    def body(carry, _):
                        leaves = jax.tree.leaves(fn(carry))
                        d = sum(l.astype(jnp.float32).sum() for l in leaves)
                        return carry + (d * 1e-20).astype(carry.dtype), None
                    xK, _ = lax.scan(body, x0, None, length=K)
                    return xK[0, 0, 0, 0, 0]
                return run
            ts = {}
            for K in (k_lo, k_hi):
                g = chained(K)
                float(g(xb))
                best = float("inf")
                for _ in range(reps):
                    t0 = time.perf_counter()
                    float(g(xb))
                    best = min(best, time.perf_counter() - t0)
                ts[K] = best
            return B / ((ts[k_hi] - ts[k_lo]) / (k_hi - k_lo))

        live_fps = measure_fn(make_predict_fn(asm, params), 8)
        backend = jax.default_backend()
        art = load_predict(export_predict(asm, params, batch_size=8,
                                          platforms=(backend,)))
        art_fps = measure_fn(art, 8)
        print(f"# serving artifact vs live (batch 8, full predict+decode): "
              f"artifact {art_fps:.1f} f/s, live {live_fps:.1f} f/s",
              file=sys.stderr)
        if int8_best is not None:
            art8 = load_predict(export_predict(asm, params, batch_size=8,
                                               platforms=(backend,),
                                               int8_scales=scales))
            art8_fps = measure_fn(art8, 8)
            print(f"# int8 serving artifact: {art8_fps:.1f} f/s",
                  file=sys.stderr)
    except Exception as e:
        print(f"# artifact bench skipped: {e!r:.200}", file=sys.stderr)
    try:
        measure_pipeline(np)
    except Exception as e:
        print(f"# pipeline bench skipped: {e!r:.120}", file=sys.stderr)

    # ---- secondary metrics (BASELINE.json configs), stderr only ----
    try:
        train_sps = measure_train(asm, np)
        print(f"# train: {train_sps:.2f} steps/s "
              f"({train_sps * 8:.1f} samples/s, batch 8, sparse-reg)",
              file=sys.stderr)
    except Exception as e:  # secondary metrics must never break the bench
        print(f"# train bench skipped: {e!r:.120}", file=sys.stderr)
    try:
        pp = measure_preprocess(np)
        print(f"# preprocess (Pallas fused crop+norm): {pp:.0f} frames/s",
              file=sys.stderr)
    except Exception as e:
        print(f"# preprocess bench skipped: {e!r:.120}", file=sys.stderr)


if __name__ == "__main__":
    main()
