"""Training loop.

The runtime counterpart of the reference Trainer
(``det3d/torchie/trainer/trainer.py:143-609``) reshaped for JAX: the hot
path is one jitted ``train_step``; the Python loop only feeds batches,
buffers device metrics, and fires prioritized hooks (``engine/hooks.py``) —
text/TensorBoard logging every ``log_interval`` iters, checkpoints every
``checkpoint_interval`` epochs, loader epoch reseeding, per-phase timing.
Users can ``register_hook`` their own (EMA, visualization, profiling)
without touching the loop, mirroring ``Trainer.register_hook``
(trainer/trainer.py:312-332).

Metric reads (``float(...)``) force a device sync, so the loop keeps the
last ``log_interval`` metric pytrees unresolved and only materializes them
at logging time — the device never waits on the host between steps.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import numpy as np

from ..parallel import make_mesh, replicate, shard_batch
from .checkpoint import load_checkpoint, save_checkpoint
from .hooks import CheckpointHook, Hook, LoggerHook, SamplerSeedHook
from .log_buffer import LogBuffer
from .steps import TrainState


def get_root_logger(log_level="INFO", work_dir: Optional[str] = None):
    logger = logging.getLogger("rtpose_tpu")
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("%(asctime)s - %(levelname)s - %(message)s"))
        logger.addHandler(h)
    logger.setLevel(log_level)
    if work_dir:
        os.makedirs(work_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(
            work_dir, f"exp_{time.strftime('%Y%m%d_%H%M%S')}.log"))
        fh.setFormatter(logging.Formatter("%(asctime)s - %(levelname)s - %(message)s"))
        logger.addHandler(fh)
    return logger


class TensorboardWriter:
    """Thin optional TB writer (TensorboardLoggerHook parity)."""

    def __init__(self, log_dir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter
            self.writer = SummaryWriter(log_dir)
        except Exception:
            self.writer = None

    def add_scalars(self, scalars: Dict[str, float], step: int):
        if self.writer is not None:
            for k, v in scalars.items():
                self.writer.add_scalar(k, v, step)

    def close(self):
        if self.writer is not None:
            self.writer.close()


class Preempted(Exception):
    """Raised inside the train loop after a preemption checkpoint is saved."""


class Trainer:
    def __init__(self, train_step: Callable, state: TrainState, *,
                 work_dir: str, total_epochs: int,
                 lr_fn: Optional[Callable] = None,
                 mesh=None, log_interval: int = 20,
                 checkpoint_interval: int = 5,
                 meta: Optional[dict] = None,
                 enable_tensorboard: bool = True,
                 logger=None,
                 default_hooks: bool = True,
                 fuse_epochs: bool = False,
                 stop_epoch: Optional[int] = None):
        self.work_dir = os.path.abspath(work_dir)
        os.makedirs(self.work_dir, exist_ok=True)
        self.logger = logger or get_root_logger(work_dir=self.work_dir)
        self.mesh = mesh or make_mesh()
        # host-side mirror of state.step: emit_log must not pay a blocking
        # device fetch per log interval (the deferred-fetch design)
        self._host_step = int(jax.device_get(state.step))
        self.state = replicate(state, self.mesh)
        self._raw_train_step = train_step
        self.train_step = jax.jit(train_step, donate_argnums=0)
        self.fuse_epochs = fuse_epochs
        self._epoch_jit = None
        self.total_epochs = total_epochs
        # early exit WITHOUT shortening the lr schedule (total_epochs still
        # sizes one-cycle): partial runs whose trajectory is comparable to
        # the full run's — the 480-frame trajectory gate's mechanism
        self.stop_epoch = stop_epoch
        self.lr_fn = lr_fn
        self.log_interval = log_interval
        self.checkpoint_interval = checkpoint_interval
        self.meta = meta or {}
        self.epoch = 0
        self.inner_iter = 0
        self.loader = None
        self.timings: Dict[str, float] = {}
        self.log_buffer = LogBuffer()
        self.tb = (TensorboardWriter(os.path.join(self.work_dir, "tf_logs"))
                   if enable_tensorboard else None)
        self.json_log = os.path.join(
            self.work_dir, f"{time.strftime('%Y%m%d_%H%M%S')}.log.json")
        self._eval_fn: Optional[Callable] = None
        self._pending: List[Any] = []
        self._epoch_t0 = 0.0
        self._hooks: List[Hook] = []
        self._preempted = False
        if default_hooks:
            self.register_hook(SamplerSeedHook())
            self.register_hook(LoggerHook(log_interval))
            self.register_hook(CheckpointHook(checkpoint_interval))

    # -- hook machinery (trainer/trainer.py:312-332 parity) -------------

    def register_hook(self, hook: Hook, priority: Optional[int] = None):
        """Insert keeping ascending priority order (lower = earlier);
        equal-priority hooks keep registration order."""
        if priority is not None:
            hook.priority = priority
        idx = len(self._hooks)
        for i, h in enumerate(self._hooks):
            if h.priority > hook.priority:
                idx = i
                break
        self._hooks.insert(idx, hook)
        return hook

    def call_hook(self, event: str):
        for h in self._hooks:
            getattr(h, event)(self)

    # ------------------------------------------------------------------

    def resume(self, path: str):
        self.state, meta = load_checkpoint(path, jax.device_get(self.state))
        self._host_step = int(self.state.step)
        self.state = replicate(self.state, self.mesh)
        self.epoch = int(meta.get("epoch", 0))
        self.logger.info(f"resumed from {path}: epoch {self.epoch}, "
                         f"step {self._host_step}")

    def run(self, train_loader, val_loader=None, workflow=(("train", 1),),
            eval_fn: Optional[Callable] = None):
        """workflow: [('train', k), ('val', 1), ...] — reference semantics."""
        self._eval_fn = eval_fn
        steps_per_epoch = len(train_loader)
        self.logger.info(
            f"start training: {self.total_epochs} epochs x {steps_per_epoch} "
            f"steps, {self.mesh.devices.size} device(s)")
        prev_handler = self._install_preempt_handler()
        self.call_hook("before_run")
        stop_at = (self.total_epochs if self.stop_epoch is None
                   else min(self.stop_epoch, self.total_epochs))
        try:
            while self.epoch < stop_at:
                for mode, times in workflow:
                    for _ in range(times):
                        if mode == "train":
                            if self.epoch >= stop_at:
                                break
                            self.train_epoch(train_loader)
                        elif mode == "val" and val_loader is not None and eval_fn:
                            # runs after the final train epoch too (the epoch
                            # cap must not skip the trailing val phase)
                            eval_fn(self.state, val_loader, self.epoch)
                            self.call_hook("after_val_epoch")
        except Preempted:
            self.logger.warning(
                f"preempted: checkpoint saved at epoch {self.epoch}, "
                f"step {int(jax.device_get(self.state.step))} — resume with "
                f"--resume_from {os.path.join(self.work_dir, 'checkpoints')}")
        finally:
            self._restore_preempt_handler(prev_handler)
        self.call_hook("after_run")
        if self.tb:
            self.tb.close()
        return self.state

    # -- preemption handling (SIGTERM -> checkpoint -> clean exit) -------
    #
    # TPU pods get preempted with a SIGTERM grace window; the reference has
    # no handler (a killed torch run loses the current epoch).  The handler
    # only sets a flag — the loop checkpoints at the next step boundary, so
    # device state is never saved mid-step.  Resume restarts the
    # in-progress epoch from its beginning with the saved params/opt/step
    # (the step-based one-cycle schedule continues exactly).

    def _install_preempt_handler(self):
        import signal
        import threading
        if threading.current_thread() is not threading.main_thread():
            return None

        def _on_term(signum, frame):
            self._preempted = True
            self.logger.warning("SIGTERM: will checkpoint and exit at the "
                                "next step boundary")

        return signal.signal(signal.SIGTERM, _on_term)

    def _restore_preempt_handler(self, prev):
        if prev is not None:
            import signal
            signal.signal(signal.SIGTERM, prev)

    def _check_preempt(self):
        if not self._preempted:
            return
        self.flush_metrics()
        self.save_checkpoint()
        raise Preempted()

    # ------------------------------------------------------------------

    def train_epoch(self, loader):
        if (self.fuse_epochs
                and getattr(loader, "supports_fused_epochs", False)
                and loader.batch_size % self.mesh.devices.size == 0
                and len(loader._indices()) >= len(loader) * loader.batch_size):
            # supports_fused_epochs is the loaders' explicit capability flag
            # (only DeviceCachedLoader: the whole set must be HBM-resident).
            # The fused scan also reshapes idx[:n*bs] -> (n, bs) with no
            # padding/valid handling; a shuffle=False non-divisible dataset
            # (drop_last False) falls back to the per-step loop
            return self.train_epoch_fused(loader)
        self.loader = loader
        self.call_hook("before_train_epoch")
        self._pending = []
        t_iter = time.perf_counter()
        self._epoch_t0 = t_iter
        for i, host_batch in enumerate(loader):
            self.inner_iter = i
            self.call_hook("before_train_iter")
            t_data = time.perf_counter()
            host_batch.pop("meta", None)   # device step takes arrays only
            host_batch.pop("valid", None)  # train batches are always full
            batch = shard_batch(host_batch, self.mesh)
            t_xfer = time.perf_counter()
            self.state, metrics = self.train_step(self.state, batch)
            self._host_step += 1
            self._pending.append(metrics)
            t_done = time.perf_counter()
            self.timings = {
                "data_time": t_data - t_iter,
                "transfer_time": t_xfer - t_data,
                "step_time": t_done - t_xfer,
                "time": t_done - t_iter,
            }
            self.call_hook("after_train_iter")
            self._check_preempt()
            t_iter = time.perf_counter()
        self.epoch += 1
        self.call_hook("after_train_epoch")

    def train_epoch_fused(self, loader):
        """One compiled call per epoch over a device-cached dataset
        (``make_epoch_step``) — no per-iteration host involvement at all.

        Per-iteration hooks cannot fire inside the scan; epoch-level hooks
        and interval logging (from the stacked metrics) are preserved.
        Requires a single-device mesh and a DeviceCachedLoader.
        """
        from .steps import make_epoch_step

        self.loader = loader
        self.call_hook("before_train_epoch")
        bs = loader.batch_size
        n = len(loader)
        idx = loader._indices()[: n * bs].astype(np.int32)
        if self._epoch_jit is None:
            fn = make_epoch_step(self._raw_train_step, bs, loader._shapes,
                                 loader._orig_dtype, mesh=self.mesh)
            self._epoch_jit = jax.jit(fn, donate_argnums=0)
            if (self.mesh.devices.size > 1
                    and getattr(loader, "sharding", None) is None):
                # fused-epoch SPMD gathers read the cache replicated unless
                # the loader was built with an explicit sharding (e.g. the
                # P('data')-sharded cache for sets larger than one chip's HBM)
                from jax.sharding import NamedSharding, PartitionSpec as P
                loader.data = jax.device_put(
                    loader.data, NamedSharding(self.mesh, P()))
        t0 = time.perf_counter()
        self._epoch_t0 = t0
        self.state, ms = self._epoch_jit(self.state, loader.data,
                                         jax.device_put(idx))
        self._host_step += n
        host = {k: np.asarray(v) for k, v in jax.device_get(
            {k: v for k, v in ms.items() if k != "loc_loss_elem"}).items()}
        per_iter = (time.perf_counter() - t0) / max(n, 1)
        for start in range(0, n, self.log_interval):
            end = min(start + self.log_interval, n)
            self.inner_iter = end - 1
            for k, vals in host.items():
                if vals.ndim == 1:
                    for v in vals[start:end]:
                        self.log_buffer.update({k: float(v)})
            self.log_buffer.update({"time": per_iter, "data_time": 0.0,
                                    "transfer_time": 0.0,
                                    "step_time": per_iter})
            self.log_buffer.average(end - start)
            self.emit_log(end, n)
            self.log_buffer.clear_output()
        self.epoch += 1
        self.call_hook("after_train_epoch")
        # fused epochs are one atomic dispatch: preemption is honored at
        # epoch boundaries (the grace window must cover one epoch)
        self._check_preempt()

    # -- helpers used by the built-in hooks ------------------------------

    def flush_metrics(self):
        if not self._pending:
            return
        # ONE batched device fetch for the whole interval: per-scalar
        # float() would pay a blocking device round trip each (hundreds per
        # interval — dominates wall clock on high-latency interconnects)
        host = jax.device_get([
            {k: v for k, v in m.items()
             if k != "loc_loss_elem" and getattr(v, "ndim", 0) == 0}
            for m in self._pending])
        for m in host:
            self.log_buffer.update({k: float(v) for k, v in m.items()})
        self._pending = []

    def save_checkpoint(self):
        path = save_checkpoint(self.work_dir, jax.device_get(self.state),
                               self.epoch, self.meta)
        if path:
            self.logger.info(f"saved checkpoint {path}")
        return path

    def emit_log(self, it: int, n: int):
        out = dict(self.log_buffer.output)
        step = self._host_step
        elapsed = time.perf_counter() - self._epoch_t0
        eta = (n - it) * (elapsed / max(it, 1)) + \
            (self.total_epochs - self.epoch - 1) * n * (elapsed / max(it, 1))
        lr = out.get("lr", float(self.lr_fn(step)) if self.lr_fn else 0.0)
        msg = (f"Epoch [{self.epoch + 1}/{self.total_epochs}][{it}/{n}] "
               f"lr: {lr:.5f}, eta: {int(eta)}s, "
               f"loss: {out.get('loss', 0):.4f}, hm: {out.get('hm_loss', 0):.4f}, "
               f"loc: {out.get('loc_loss', 0):.4f}, "
               f"time: {out.get('time', 0)*1000:.0f}ms "
               f"(data {out.get('data_time', 0)*1000:.0f} / "
               f"step {out.get('step_time', 0)*1000:.0f})")
        self.logger.info(msg)
        if jax.process_index() == 0:
            rec = dict(out, mode="train", epoch=self.epoch + 1, iter=it, step=step)
            with open(self.json_log, "a") as f:
                f.write(json.dumps(rec) + "\n")
            if self.tb:
                self.tb.add_scalars({f"train/{k}": v for k, v in out.items()}, step)
