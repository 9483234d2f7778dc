#!/usr/bin/env python
"""Export a trained checkpoint as a self-contained serving artifact.

The predict path (forward + decode) lowers to StableHLO with the trained
parameters baked in; the artifact runs on any listed platform with only
``jax`` installed (see rtpose_tpu/export.py).  TPU-new capability — the
reference serves by re-running tools/test.py against a .pth checkpoint.

    python tools/export.py cfg.py --checkpoint work_dir --out model.jaxexp
    # serving side:
    #   from rtpose_tpu.export import load_predict   (or inline the 6-line
    #   jax.export.deserialize wrapper — the artifact has no rtpose dep)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Export a serving artifact")
    p.add_argument("config", help="config file path")
    p.add_argument("--checkpoint", required=True,
                   help="checkpoint dir (or work_dir with a 'latest' pointer)")
    p.add_argument("--out", required=True, help="output artifact path")
    p.add_argument("--batch_size", type=int, default=1,
                   help="static serving batch size")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering targets")
    p.add_argument("--int8", action="store_true",
                   help="post-training int8 quantization: calibrate "
                        "activation scales on real data, then bake the "
                        "int8-quantized program into the artifact (2x MXU "
                        "rate on v5e; head output convs stay float)")
    p.add_argument("--calib_batches", type=int, default=8,
                   help="number of calibration batches for --int8")
    p.add_argument("--int8_resize", action="store_true",
                   help="with --int8: ALSO quantize the HRNet final-fuse "
                        "resize matmuls (2x MXU rate; adds ~1 activation "
                        "quantum of resize error — measure the MPJPE delta "
                        "with tools/test.py --exported before shipping)")
    p.add_argument("--calib_split", default="val", choices=("train", "val", "test"),
                   help="dataset split the calibration batches come from")
    p.add_argument("--calib_quantile", type=float, default=None,
                   help="clip activation scales at this quantile of |x| "
                        "instead of absmax (PTQ outlier defense; e.g. "
                        "0.999 — measure the MPJPE delta with tools/"
                        "test.py --exported)")
    p.add_argument("--final_dtype", default=None,
                   choices=("bfloat16", "float32"),
                   help="compute dtype of the head OUTPUT convs in the "
                        "artifact (serving-only override; training keeps "
                        "f32 head outputs)")
    return p.parse_args()


def collect_calib_batches(cfg, asm, batch_size: int, n_batches: int,
                          split: str):
    """Model inputs for activation calibration: the first N batches of the
    given split through the SAME host path the eval loader uses."""
    from rtpose_tpu.api import build_dataset_from_cfg
    from rtpose_tpu.data import BatchLoader
    from rtpose_tpu.engine.steps import VOXEL_KEYS

    dataset = build_dataset_from_cfg(cfg.data, split,
                                     max_poses=asm.target_spec.max_poses)
    loader = BatchLoader(dataset, batch_size=batch_size, shuffle=False,
                         drop_last=False)
    batches = []
    for batch in loader:
        if asm.input_key is not None:
            batches.append(batch[asm.input_key])
        else:
            batches.append({k: batch[k] for k in VOXEL_KEYS})
        if len(batches) >= n_batches:
            break
    if not batches:
        raise SystemExit(f"--int8: no calibration data in split {split!r}")
    return batches


def main():
    args = parse_args()
    from rtpose_tpu.utils import apply_platform_env
    apply_platform_env()

    import jax

    from rtpose_tpu.api import assemble
    from rtpose_tpu.config import Config
    from rtpose_tpu.engine import create_train_state, load_checkpoint
    from rtpose_tpu.export import export_predict, save_exported
    from rtpose_tpu.solver import adam_one_cycle

    cfg = Config.fromfile(args.config)
    asm = assemble(cfg)

    dummy_opt = adam_one_cycle(lambda s: 0.0, None, weight_decay=0.0,
                               grad_clip_norm=None)
    template = create_train_state(asm.model, dummy_opt, asm.example_input())
    state, _ = load_checkpoint(args.checkpoint, template)

    from rtpose_tpu.ops import quant
    exclude = (quant.INT8_RESIZE_EXCLUDE if args.int8_resize
               else quant.DEFAULT_EXCLUDE)
    int8_scales = None
    if args.int8:
        from rtpose_tpu.export import calibrate_predict
        batches = collect_calib_batches(cfg, asm, args.batch_size,
                                        args.calib_batches, args.calib_split)
        int8_scales = calibrate_predict(asm, state.params, batches,
                                        exclude=exclude,
                                        final_dtype=args.final_dtype,
                                        quantile=args.calib_quantile)
        print(f"int8 calibration: {len(int8_scales)} conv scales from "
              f"{len(batches)} x batch-{args.batch_size} "
              f"{args.calib_split} batches")

    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    blob = export_predict(asm, state.params, batch_size=args.batch_size,
                          platforms=platforms, int8_scales=int8_scales,
                          int8_exclude=exclude,
                          final_dtype=args.final_dtype)
    save_exported(args.out, blob)
    n_params = sum(p.size for p in jax.tree.leaves(state.params))
    print(f"exported {args.out}: {len(blob) / 1e6:.2f} MB, "
          f"batch={args.batch_size}, platforms={','.join(platforms)}, "
          f"params={n_params}" + (", int8" if int8_scales else ""))


if __name__ == "__main__":
    main()
