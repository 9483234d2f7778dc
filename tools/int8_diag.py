#!/usr/bin/env python
"""Root-cause the int8 serving-path accuracy loss on a trained checkpoint.

Round-5 measurement: the r4 int8 path (51 convs, absmax calibration) costs
49.7 -> 414.7 mm MPJPE on the 1920-frame checkpoint — far beyond a usable
serving delta.  This tool attributes the loss:

1. prints the calibrated activation-scale spectrum (an absmax blown up by
   outliers crushes the useful signal range — the classic PTQ failure);
2. evaluates MPJPE on a test subset for exclusion bisections (quantize
   backbone-only / head-only / all-but-one-group) and for percentile-
   clipped calibration (--quantile).

Usage:
  python tools/int8_diag.py CONFIG --checkpoint DIR [--frames 64]
         [--quantile 0.999] [--groups]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--frames", type=int, default=64,
                   help="test-subset size for the MPJPE probes")
    p.add_argument("--calib_batches", type=int, default=8)
    p.add_argument("--quantile", type=float, default=None,
                   help="also probe percentile-clipped calibration")
    p.add_argument("--groups", action="store_true",
                   help="run the exclusion-group bisection probes")
    return p.parse_args()


def main():
    args = parse_args()
    from rtpose_tpu.utils import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rtpose_tpu.api import assemble, build_dataset_from_cfg
    from rtpose_tpu.config import Config
    from rtpose_tpu.core.decode import decode_pose_sparse
    from rtpose_tpu.engine import create_train_state, load_checkpoint
    from rtpose_tpu.ops import quant
    from rtpose_tpu.solver import adam_one_cycle

    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = Config.fromfile(args.config)
    asm = assemble(cfg)
    dummy_opt = adam_one_cycle(lambda s: 0.0, None, weight_decay=0.0,
                               grad_clip_norm=None)
    template = create_train_state(asm.model, dummy_opt, asm.example_input())
    state, _ = load_checkpoint(args.checkpoint, template)
    params = state.params
    model = asm.model

    # ---- data: calibration batches (train split) + eval subset (test) ----
    B = 8
    train_ds = build_dataset_from_cfg(cfg.data, "val")
    test_ds = build_dataset_from_cfg(cfg.data, "test")

    def batch_of(ds, lo):
        xs, poses = [], []
        for i in range(lo, lo + B):
            it = ds[i % len(ds)]
            xs.append(np.asarray(it["rdr_tensor"]))
            poses.append(np.asarray(it["poses"][0]))
        return (jax.device_put(np.stack(xs)), np.stack(poses))

    calib = [batch_of(train_ds, i * B)[0]
             for i in range(args.calib_batches)]
    n_eval = min(args.frames, len(test_ds)) // B * B
    eval_batches = [batch_of(test_ds, i) for i in range(0, n_eval, B)]
    print(f"# calib {len(calib)}xB{B} train, eval {n_eval} test frames")

    def predict(p, x):
        hm, reg_at_peak, peak_ind = model.apply(p, x,
                                                method="predict_sparse")
        kpts, _, _ = decode_pose_sparse(hm, reg_at_peak, peak_ind,
                                        asm.decode_spec)
        return kpts

    def mpjpe_of(predict_jit):
        errs = []
        for x, gt in eval_batches:
            kp = np.asarray(predict_jit(params, x), np.float32)
            errs.append(np.linalg.norm(kp - gt, axis=-1).mean(axis=1))
        return float(np.concatenate(errs).mean() * 1000.0)

    base = mpjpe_of(jax.jit(predict))
    print(f"bf16 live subset MPJPE: {base:.2f} mm")

    # ---- calibration + scale spectrum ----
    scales = quant.calibration_scales(
        lambda b: model.apply(params, b, method="predict_sparse"), calib)
    items = sorted(scales.items(), key=lambda kv: -kv[1])
    print(f"\n# {len(scales)} calibrated sites; act absmax spectrum "
          f"(scale*127), largest first:")
    for k, v in items:
        print(f"  {v * 127.0:12.3f}  {k}")

    def int8_mpjpe(sc, exclude, label):
        def predict8(p, x):
            with quant.int8_mode(sc, exclude=exclude):
                return jax.jit(predict)(p, x)
        m = mpjpe_of(lambda p, x: predict8(p, x))
        print(f"{label:<44} MPJPE {m:9.2f} mm  (+{m - base:.2f})")
        return m

    int8_mpjpe(scales, quant.DEFAULT_EXCLUDE, "int8 ALL (r4 semantics)")

    if args.groups:
        # Site groups by path substring (backbone stages vs head towers)
        GROUPS = [
            ("reader/first convs", ("reader", "stem", "layer1")),
            ("stage2", ("stage2",)),
            ("stage3", ("stage3",)),
            ("stage4", ("stage4",)),
            ("transitions", ("transition",)),
            ("final_conv", ("final_conv",)),
            ("head shared conv", ("shared_conv",)),
            ("hm tower", ("hm",)),
            ("reg tower", ("reg",)),
        ]

        def subset(pred):
            return {k: v for k, v in scales.items() if pred(k)}

        print("\n# ONLY-group probes (everything else float):")
        for name, pats in GROUPS:
            sc = subset(lambda k, ps=pats: any(p in k for p in ps))
            if sc:
                int8_mpjpe(sc, quant.DEFAULT_EXCLUDE,
                           f"only {name} ({len(sc)} sites)")
        print("\n# ALL-BUT-group probes:")
        for name, pats in GROUPS:
            sc = subset(lambda k, ps=pats: not any(p in k for p in ps))
            if len(sc) != len(scales):
                int8_mpjpe(sc, quant.DEFAULT_EXCLUDE,
                           f"all but {name} ({len(sc)} sites)")

    if args.quantile:
        q = args.quantile
        qscales = quant.calibration_scales(
            lambda b: model.apply(params, b, method="predict_sparse"),
            calib, quantile=q)
        shrink = [scales[k] / qscales[k] for k in qscales
                  if qscales[k] > 0 and k in scales]
        print(f"\n# quantile {q}: median absmax shrink "
              f"{float(np.median(shrink)):.2f}x, max "
              f"{float(np.max(shrink)):.2f}x")
        int8_mpjpe(qscales, quant.DEFAULT_EXCLUDE, f"int8 ALL @ q={q}")


if __name__ == "__main__":
    main()
