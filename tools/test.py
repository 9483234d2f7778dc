#!/usr/bin/env python
"""Evaluate a checkpoint.

Same CLI surface as the reference ``tools/test.py``: required --checkpoint,
--testset to use Test.json, --speed_test for batch-1 middle-third
throughput timing.  Writes {split}_prediction.json and the per-sequence
results JSON in the reference's format.
"""

import argparse
import copy
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Test a detector")
    p.add_argument("config", help="config file path")
    p.add_argument("--work_dir", help="output dir")
    p.add_argument("--checkpoint",
                   help="checkpoint dir (or work_dir with a 'latest' "
                        "pointer); required unless --exported (artifacts "
                        "bake their parameters)")
    p.add_argument("--speed_test", action="store_true")
    p.add_argument("--testset", action="store_true")
    p.add_argument("--multihost", action="store_true")
    p.add_argument("--device_preprocess", action="store_true",
                   help="ship ROI-cropped RAW cubes; cast/normalize/layout "
                        "run on-chip (fused Pallas preprocess)")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of the whole eval "
                        "into <work_dir>/profile")
    p.add_argument("--final_dtype", default=None,
                   choices=("bfloat16", "float32"),
                   help="override the head OUTPUT convs' compute dtype for "
                        "this eval (serving-side knob — measures the "
                        "accuracy delta of bf16 head outputs)")
    p.add_argument("--exported", default=None, metavar="ARTIFACT",
                   help="evaluate a serving artifact (tools/export.py) "
                        "instead of the live model: parameters come baked "
                        "into the artifact; --checkpoint is only used to "
                        "name the outputs")
    return p.parse_args()


def main():
    args = parse_args()
    from rtpose_tpu.utils import apply_platform_env
    apply_platform_env()
    if args.multihost:
        import jax
        jax.distributed.initialize()

    import jax
    import jax.numpy as jnp

    from rtpose_tpu.api import assemble, build_dataset_from_cfg
    from rtpose_tpu.config import Config
    from rtpose_tpu.data import BatchLoader
    from rtpose_tpu.engine import (create_train_state, get_root_logger,
                                   load_checkpoint, make_eval_step, run_eval,
                                   save_predictions)
    from rtpose_tpu.parallel import make_mesh, process_count, process_index, replicate
    from rtpose_tpu.solver import adam_one_cycle

    cfg = Config.fromfile(args.config)
    if not args.checkpoint and not args.exported:
        raise SystemExit("one of --checkpoint or --exported is required")
    work_dir = args.work_dir or os.path.dirname(
        os.path.abspath(args.checkpoint or args.exported))
    logger = get_root_logger(cfg.get("log_level", "INFO"))
    asm = assemble(cfg)
    if args.final_dtype:
        if args.exported:
            raise SystemExit("--final_dtype applies to the live model; "
                             "exported artifacts bake their own "
                             "(tools/export.py --final_dtype)")
        from rtpose_tpu.api import serving_variant
        asm = serving_variant(asm, args.final_dtype)
        logger.info(f"head output convs overridden to {args.final_dtype}")

    split = "test" if args.testset else "val"
    print("Use Test Set" if args.testset else "Use Val Set")
    dataset = build_dataset_from_cfg(cfg.data, split,
                                     max_poses=asm.target_spec.max_poses,
                                     device_preprocess=args.device_preprocess)
    preprocess = ((dataset.norm_start, dataset.norm_scale)
                  if getattr(dataset, "device_preprocess", False) else None)
    exported_predict = None
    if args.exported:
        if args.device_preprocess:
            raise SystemExit(
                "--exported artifacts bake the normalized-input predict "
                "path; --device_preprocess (raw cubes) would feed them "
                "un-normalized data — drop one of the flags")
        from rtpose_tpu.export import load_predict
        exported_predict = load_predict(args.exported)
        in0 = jax.tree.leaves(exported_predict.in_avals)[0]
        batch_size = int(in0.shape[0])
        logger.info(f"serving artifact: platforms="
                    f"{','.join(exported_predict.platforms)}, "
                    f"batch={batch_size}")
        if args.speed_test and batch_size != 1:
            logger.warning(
                f"--speed_test with --exported times the artifact's baked "
                f"batch size ({batch_size}), NOT the reference's batch-1 "
                f"protocol — export with --batch_size 1 for comparable "
                f"numbers")
    else:
        batch_size = 1 if args.speed_test else int(cfg.data["samples_per_gpu"])
    loader = BatchLoader(dataset, batch_size=batch_size, shuffle=False,
                         drop_last=False, num_shards=process_count(),
                         shard_id=process_index(),
                         num_workers=int(cfg.data.get("workers_per_gpu", 0)))

    if exported_predict is not None:
        # parameters are baked into the artifact; the fixed-shape exported
        # call runs unsharded (export a bigger batch for multi-chip serving)
        mesh = None
        params = None
        if asm.input_key is None:
            from rtpose_tpu.engine.steps import VOXEL_KEYS

            def eval_step(params, batch):
                return exported_predict({k: batch[k] for k in VOXEL_KEYS})
        else:
            def eval_step(params, batch):
                return exported_predict(batch[asm.input_key])
    else:
        # template state (opt state is discarded; checkpoints store it too)
        dummy_opt = adam_one_cycle(lambda s: 0.0, None, weight_decay=0.0,
                                   grad_clip_norm=None)
        template = create_train_state(asm.model, dummy_opt, asm.example_input())
        state, meta = load_checkpoint(args.checkpoint, template)
        n_params = sum(p.size for p in jax.tree.leaves(state.params))
        logger.info(f"Model parameter count: {n_params}")

        mesh = make_mesh() if batch_size % jax.local_device_count() == 0 else make_mesh(1)
        params = replicate(state.params, mesh)
        eval_step = make_eval_step(asm.model, asm.head, asm.decode_spec,
                                   input_key=asm.input_key,
                                   sparse=asm.sparse_head,
                                   preprocess=preprocess,
                                   multi_poses=asm.multi_poses,
                                   tta_double_flip=asm.tta_double_flip)
        if asm.tta_double_flip:
            logger.info("double-flip TTA: averaging 4 unflipped forwards "
                        "per frame (test_cfg.double_flip)")
    if args.profile:
        profile_dir = os.path.join(work_dir, "profile")
        os.makedirs(profile_dir, exist_ok=True)
        jax.profiler.start_trace(profile_dir)
    try:
        detections, sec_per_frame = run_eval(
            eval_step, params, loader, asm.decode_spec, one_hm=asm.one_hm,
            mesh=mesh, speed_test=args.speed_test, logger=logger)
    finally:
        if args.profile:
            jax.profiler.stop_trace()
            logger.info(f"profiler trace written to {work_dir}/profile")

    if sec_per_frame is not None:
        print(f"\n Total time per frame: {sec_per_frame}")

    if jax.process_index() != 0:
        return

    os.makedirs(work_dir, exist_ok=True)
    if args.checkpoint:
        from rtpose_tpu.engine import resolve_checkpoint
        ckpt_name = os.path.basename(
            os.path.normpath(resolve_checkpoint(args.checkpoint))).split(".")[0]
    else:   # artifact eval: name outputs after the artifact file
        ckpt_name = os.path.basename(args.exported).split(".")[0]
    save_predictions(detections, work_dir, ckpt_name,
                     "test" if args.testset else "train")

    result_dict, _ = dataset.evaluation(copy.deepcopy(detections),
                                        output_dir=work_dir,
                                        testset=args.testset)
    for k, v in result_dict["results"].items():
        print(f"Evaluation {k}: {v}")
    seq_path = os.path.join(work_dir, ckpt_name,
                            f"{ckpt_name}_seq_results_"
                            f"{'test' if args.testset else 'train'}.json")
    with open(seq_path, "w") as f:
        json.dump(dict(sorted(result_dict["seq_results"].items())), f, indent=2)


if __name__ == "__main__":
    main()
