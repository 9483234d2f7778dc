#!/usr/bin/env python
"""Train a radar/LiDAR pose detector.

Same CLI surface as the reference ``tools/train.py`` (config path, work_dir,
resume_from, seed, validate); the launcher/local_rank NCCL plumbing
collapses into the JAX runtime (``jax.distributed.initialize`` for
multi-host — SURVEY.md §2.9).
"""

import argparse
import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Train a detector")
    p.add_argument("config", help="train config file path")
    p.add_argument("--work_dir", help="dir to save logs and models")
    p.add_argument("--resume_from", help="checkpoint to resume from")
    p.add_argument("--validate", action="store_true",
                   help="evaluate on the val set during training")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--total_epochs", type=int, default=None,
                   help="override cfg.total_epochs")
    p.add_argument("--stop_epoch", type=int, default=None,
                   help="stop training after this many epochs WITHOUT "
                        "shortening the lr schedule (total_epochs still "
                        "sizes one-cycle) — partial runs comparable to the "
                        "full run's trajectory (tools/trajectory_gate.py)")
    p.add_argument("--lr_max", type=float, default=None,
                   help="override cfg.lr_config.lr_max (one-cycle peak)")
    p.add_argument("--pct_start", type=float, default=None,
                   help="override cfg.lr_config.pct_start (one-cycle warmup "
                        "fraction)")
    p.add_argument("--div_factor", type=float, default=None,
                   help="override cfg.lr_config.div_factor (start lr = "
                        "lr_max / div_factor)")
    p.add_argument("--loc_weight", type=float, default=None,
                   help="override the head's hm-vs-loc loss balance weight")
    p.add_argument("--loc_weight_early", type=float, default=None,
                   help="use THIS loc weight for the first "
                        "--loc_weight_early_steps optimizer steps (multi-task "
                        "stall lever, see BASELINE.md)")
    p.add_argument("--loc_weight_early_steps", type=int, default=0)
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() (multi-host pods)")
    p.add_argument("--profile", type=int, default=0, metavar="N",
                   help="capture a jax.profiler trace of N train steps "
                        "into <work_dir>/profile")
    p.add_argument("--device_preprocess", action="store_true",
                   help="ship ROI-cropped RAW cubes (disk dtype, half the "
                        "bytes for f16 data) and run cast/normalize/layout "
                        "on-chip (fused Pallas preprocess)")
    p.add_argument("--device_cache", action="store_true",
                   help="upload the whole training set to HBM once and "
                        "build batches with on-device gathers (small "
                        "datasets only; removes all per-step H2D traffic)")
    p.add_argument("--cache_dtype", default=None,
                   help="store the device cache compressed (bfloat16 halves "
                        "it; float8_e4m3fn quarters it — ~31 dB input SNR, "
                        "run the 480-frame trajectory check before trusting "
                        "a new dtype); only LARGE float keys (the cubes) "
                        "compress — pose labels always stay full precision; "
                        "batches are cast back after the gather")
    p.add_argument("--stream_cache_gb", type=float, default=None,
                   help="device-resident batches for datasets larger than "
                        "HBM: split the set into chunks of this many GB, "
                        "double-buffer chunk uploads behind device compute "
                        "(block-shuffle semantics)")
    p.add_argument("--cache_shard", action="store_true",
                   help="shard the device cache P('data') across the mesh "
                        "(cacheable set scales with devices instead of one "
                        "chip's HBM; batch gathers ride ICI collectives)")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint the forward: backward recomputes "
                        "activations instead of keeping them in HBM "
                        "(enables larger batches / the device cache)")
    p.add_argument("--fuse_epochs", action="store_true",
                   help="with --device_cache: run each epoch as ONE compiled "
                        "lax.scan (no per-step host dispatch; per-iteration "
                        "hooks do not fire)")
    return p.parse_args()


def main():
    args = parse_args()
    if args.loc_weight_early is not None and args.loc_weight_early_steps <= 0:
        raise SystemExit("--loc_weight_early needs --loc_weight_early_steps N "
                         "(> 0); with the default 0 the early weight would "
                         "never apply")
    from rtpose_tpu.utils import apply_platform_env
    apply_platform_env()
    if args.multihost:
        import jax
        jax.distributed.initialize()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rtpose_tpu.api import assemble, build_dataset_from_cfg
    from rtpose_tpu.config import Config
    from rtpose_tpu.data import BatchLoader
    from rtpose_tpu.engine import (Trainer, create_train_state, get_root_logger,
                                   make_train_step)
    from rtpose_tpu.parallel import make_mesh, process_count, process_index
    from rtpose_tpu.solver import adam_one_cycle, make_one_cycle_fns

    cfg = Config.fromfile(args.config)
    if args.cache_shard and not (args.device_cache
                                 or cfg.data.get("device_cache", False)):
        raise SystemExit("--cache_shard shards the device cache: it requires "
                         "--device_cache")
    if args.fuse_epochs and args.stream_cache_gb:
        raise SystemExit("--fuse_epochs needs the whole dataset resident "
                         "(--device_cache); the streaming loader runs "
                         "per-step — drop one of the flags")
    work_dir = args.work_dir or os.path.join(
        "./work_dirs", os.path.basename(args.config)[:-3],
        datetime.now().strftime("%Y%m%d_%H%M%S"))
    os.makedirs(work_dir, exist_ok=True)
    logger = get_root_logger(cfg.get("log_level", "INFO"), work_dir=work_dir)

    # config backup (reference: tools/train.py:150-152)
    with open(os.path.join(work_dir, "exp_config.py"), "w") as f:
        f.write(cfg.text)

    if args.seed is not None:
        logger.info(f"Set random seed to {args.seed}")
        np.random.seed(args.seed)

    asm = assemble(cfg)
    total_epochs = args.total_epochs or int(cfg.total_epochs)

    dataset = build_dataset_from_cfg(cfg.data, "train",
                                     max_poses=asm.target_spec.max_poses,
                                     device_preprocess=args.device_preprocess)
    preprocess = ((dataset.norm_start, dataset.norm_scale)
                  if getattr(dataset, "device_preprocess", False) else None)
    per_host_bs = int(cfg.data["samples_per_gpu"]) * jax.local_device_count()
    mesh = make_mesh()
    if args.device_cache or cfg.data.get("device_cache", False):
        from rtpose_tpu.data import DeviceCachedLoader
        cache_sharding = None
        cache_cap = 12_000_000_000
        if args.cache_shard:
            from jax.sharding import NamedSharding, PartitionSpec as P
            cache_sharding = NamedSharding(mesh, P("data"))
            cache_cap *= mesh.devices.size
        loader = DeviceCachedLoader(dataset, batch_size=per_host_bs,
                                    shuffle=True, num_shards=process_count(),
                                    shard_id=process_index(),
                                    seed=args.seed or 0,
                                    cache_dtype=args.cache_dtype,
                                    sharding=cache_sharding,
                                    max_bytes=cache_cap)
        logger.info(f"device-cached {len(dataset)} samples "
                    f"({loader.nbytes / 1e9:.2f} GB in HBM)")
    elif args.stream_cache_gb:
        from rtpose_tpu.data import StreamingDeviceLoader
        loader = StreamingDeviceLoader(
            dataset, batch_size=per_host_bs,
            chunk_bytes=int(args.stream_cache_gb * 1e9), shuffle=True,
            seed=args.seed or 0, cache_dtype=args.cache_dtype,
            num_shards=process_count(), shard_id=process_index())
        logger.info(f"streaming device cache: {len(loader.chunks)} chunks x "
                    f"{loader.samples_per_chunk} samples (double-buffered)")
    else:
        loader = BatchLoader(dataset, batch_size=per_host_bs, shuffle=True,
                             num_shards=process_count(),
                             shard_id=process_index(), seed=args.seed or 0,
                             num_workers=int(cfg.data.get("workers_per_gpu", 0)))
    steps_per_epoch = len(loader)
    total_steps = steps_per_epoch * total_epochs

    lr_cfg = dict(cfg.lr_config)
    for k in ("lr_max", "pct_start", "div_factor"):
        if getattr(args, k) is not None:
            lr_cfg[k] = getattr(args, k)
            cfg.lr_config[k] = getattr(args, k)   # build_optimizer reads cfg
    lr_fn, mom_fn = make_one_cycle_fns(
        total_steps, float(lr_cfg["lr_max"]),
        tuple(lr_cfg.get("moms", (0.95, 0.85))),
        float(lr_cfg.get("div_factor", 10.0)),
        float(lr_cfg.get("pct_start", 0.4)))
    from rtpose_tpu.solver import build_optimizer_from_cfg
    optimizer = build_optimizer_from_cfg(cfg, total_steps)

    rng = jax.random.PRNGKey(args.seed or 0)
    state = create_train_state(asm.model, optimizer, asm.example_input(), rng)
    n_params = sum(p.size for p in jax.tree.leaves(state.params))
    logger.info(f"Model parameter count: {n_params}")

    loc_weight_fn = None
    if args.loc_weight is not None or args.loc_weight_early is not None:
        from rtpose_tpu.solver import piecewise_weight
        base_w = (args.loc_weight if args.loc_weight is not None
                  else float(asm.head.weight))
        loc_weight_fn = piecewise_weight(base_w, args.loc_weight_early,
                                         args.loc_weight_early_steps)
        logger.info(f"loc-weight schedule: base={base_w} "
                    f"early={args.loc_weight_early}"
                    f"@{args.loc_weight_early_steps} steps")
    train_step = make_train_step(asm.model, asm.head, asm.target_spec,
                                 optimizer, lr_fn=lr_fn,
                                 input_key=asm.input_key,
                                 sparse_reg=asm.sparse_head, remat=args.remat,
                                 preprocess=preprocess,
                                 loc_weight_fn=loc_weight_fn)
    trainer = Trainer(
        train_step, state, work_dir=work_dir, total_epochs=total_epochs,
        lr_fn=lr_fn, mesh=mesh,
        log_interval=int(dict(cfg.log_config).get("interval", 20)),
        checkpoint_interval=int(dict(cfg.checkpoint_config).get("interval", 5)),
        meta=dict(config=cfg.text), fuse_epochs=args.fuse_epochs,
        stop_epoch=args.stop_epoch)
    if args.profile:
        from rtpose_tpu.engine import ProfilerHook
        trainer.register_hook(ProfilerHook(num_steps=args.profile))
    if args.resume_from or cfg.get("resume_from"):
        trainer.resume(args.resume_from or cfg.resume_from)

    eval_fn = None
    val_loader = None
    if args.validate:
        val_dataset = build_dataset_from_cfg(cfg.data, "val",
                                             max_poses=asm.target_spec.max_poses)
        val_loader = BatchLoader(val_dataset, batch_size=per_host_bs,
                                 shuffle=False, drop_last=False,
                                 num_shards=process_count(),
                                 shard_id=process_index(),
                                 num_workers=int(cfg.data.get("workers_per_gpu", 0)))

        from rtpose_tpu.engine import make_eval_step, run_eval
        eval_step = make_eval_step(asm.model, asm.head, asm.decode_spec,
                                   input_key=asm.input_key,
                                   multi_poses=asm.multi_poses)

        def eval_fn(state, loader, epoch):
            dets, _ = run_eval(eval_step, state.params, loader, asm.decode_spec,
                               one_hm=asm.one_hm, mesh=trainer.mesh,
                               logger=logger)
            res, _ = val_dataset.evaluation(dets)
            for k, v in res["results"].items():
                logger.info(f"[val epoch {epoch}] {k}: {v:.2f}")

    workflow = [tuple(w) for w in cfg.get("workflow", [("train", 1)])]
    if args.validate and ("val", 1) not in workflow:
        workflow.append(("val", 1))
    trainer.run(loader, val_loader, workflow=workflow, eval_fn=eval_fn)
    logger.info("training complete")


if __name__ == "__main__":
    main()
