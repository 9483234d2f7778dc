"""Prioritized trainer hooks.

The runtime counterpart of the reference's 13-event hook system
(``det3d/torchie/trainer/hooks/hook.py:1-63``, priority registration
``trainer/trainer.py:312-332`` + ``priority.py:4-53``) reshaped for the
JAX loop: the fused jitted train step leaves no per-phase device events to
hook (transfer/forward/loss all happen inside one XLA program), so the
surviving events are the loop-structure ones below.  Built-in behaviors
(loader epoch reseed, interval logging, checkpoint cadence) are themselves
registered hooks, and users can register their own (e.g. EMA, visualization,
profiling) without editing the trainer.

Hooks read and mutate trainer state through the ``trainer`` argument:
``trainer.epoch``, ``trainer.inner_iter``, ``trainer.state``,
``trainer.log_buffer``, ``trainer.timings`` (last iter's phase seconds),
``trainer.loader``.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

PRIORITIES = {
    "HIGHEST": 0, "VERY_HIGH": 10, "HIGH": 30, "NORMAL": 50,
    "LOW": 70, "VERY_LOW": 90, "LOWEST": 100,
}


class Hook:
    """Base hook: override any subset of events (hook.py:1-63 parity)."""

    priority: int = PRIORITIES["NORMAL"]

    def before_run(self, trainer):
        pass

    def after_run(self, trainer):
        pass

    def before_train_epoch(self, trainer):
        pass

    def after_train_epoch(self, trainer):
        pass

    def before_train_iter(self, trainer):
        pass

    def after_train_iter(self, trainer):
        pass

    def after_val_epoch(self, trainer):
        pass

    # cadence helpers (reference Hook.every_n_* utilities)
    @staticmethod
    def every_n_epochs(trainer, n: int) -> bool:
        return n > 0 and trainer.epoch % n == 0

    @staticmethod
    def every_n_inner_iters(trainer, n: int) -> bool:
        return n > 0 and (trainer.inner_iter + 1) % n == 0

    @staticmethod
    def end_of_epoch(trainer) -> bool:
        return trainer.inner_iter + 1 == len(trainer.loader)


class SamplerSeedHook(Hook):
    """Reseed the loader's shuffle each epoch (hooks/sampler_seed.py:4-6)."""

    priority = PRIORITIES["HIGH"]

    def before_train_epoch(self, trainer):
        trainer.loader.set_epoch(trainer.epoch)


class LoggerHook(Hook):
    """Interval console/json/TensorBoard logging (TextLoggerHook +
    TensorboardLoggerHook parity).

    Materializes the deferred metric pytrees only at logging time so the
    device never waits on the host between steps.
    """

    priority = PRIORITIES["VERY_LOW"]

    def __init__(self, interval: int = 20):
        self.interval = interval

    def after_train_iter(self, trainer):
        if self.every_n_inner_iters(trainer, self.interval) or self.end_of_epoch(trainer):
            trainer.flush_metrics()
            trainer.log_buffer.update(trainer.timings)
            trainer.log_buffer.average(self.interval)
            trainer.emit_log(trainer.inner_iter + 1, len(trainer.loader))
            trainer.log_buffer.clear_output()


class HTTPLoggerHook(Hook):
    """Interval metric POST to an HTTP endpoint (PaviLoggerHook parity,
    ``det3d/torchie/trainer/hooks/logger/pavi.py`` — the reference's
    SenseTime-internal metrics server generalized to any JSON collector).

    Posts ``{"session": ..., "step": ..., "epoch": ..., "metrics": {...}}``
    after each log interval.  Network failures are logged once and never
    interrupt training."""

    priority = PRIORITIES["LOWEST"]

    def __init__(self, url: str, interval: int = 20, session: str = "",
                 timeout: float = 2.0):
        self.url = url
        self.interval = interval
        self.session = session
        self.timeout = timeout
        self._warned = False

    def _post(self, payload: dict):
        import json
        import urllib.request
        req = urllib.request.Request(
            self.url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        urllib.request.urlopen(req, timeout=self.timeout).read()

    def after_train_iter(self, trainer):
        if not (self.every_n_inner_iters(trainer, self.interval)
                or self.end_of_epoch(trainer)):
            return
        trainer.flush_metrics()
        metrics = {k: float(np.mean(v)) for k, v in
                   trainer.log_buffer.val_history.items()
                   if v and isinstance(v[-1], (int, float))}
        try:
            self._post({"session": self.session, "step": trainer._host_step,
                        "epoch": trainer.epoch, "metrics": metrics})
        except Exception as e:
            if not self._warned:
                trainer.logger.warning(f"HTTPLoggerHook: {e!r} (suppressing "
                                       f"further warnings)")
                self._warned = True


class CheckpointHook(Hook):
    """Every-N-epochs checkpoint, plus always at the final epoch
    (hooks/checkpoint.py:5-21; master-only inside save_checkpoint)."""

    priority = PRIORITIES["LOWEST"]

    def __init__(self, interval: int = 5):
        self.interval = interval

    def after_train_epoch(self, trainer):
        if (self.every_n_epochs(trainer, self.interval)
                or trainer.epoch == trainer.total_epochs):
            trainer.save_checkpoint()


class ProfilerHook(Hook):
    """Capture a ``jax.profiler`` trace of the first ``num_steps`` train
    iters into ``<work_dir>/profile`` (SURVEY §5.1 TPU-equivalent of the
    reference's IterTimerHook/cuda timing; view with TensorBoard or
    xprof)."""

    priority = PRIORITIES["VERY_HIGH"]

    def __init__(self, num_steps: int = 10, log_dir: Optional[str] = None,
                 skip_steps: int = 3):
        # skip_steps lets the first compiles/warmup fall outside the trace
        self.num_steps = num_steps
        self.skip_steps = skip_steps
        self.log_dir = log_dir
        self._seen = 0
        self._active = False
        self._done = False

    def before_train_iter(self, trainer):
        if self._done or self._active or self._seen < self.skip_steps:
            return
        import jax

        self.log_dir = self.log_dir or os.path.join(trainer.work_dir, "profile")
        os.makedirs(self.log_dir, exist_ok=True)
        jax.profiler.start_trace(self.log_dir)
        self._active = True
        self._t0 = time.perf_counter()

    def after_train_iter(self, trainer):
        self._seen += 1
        if not self._active:
            return
        if self._seen >= self.skip_steps + self.num_steps:
            import jax

            jax.block_until_ready(trainer.state.params)
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            trainer.logger.info(
                f"profiler: traced {self.num_steps} steps "
                f"({time.perf_counter() - self._t0:.2f}s) -> {self.log_dir}")

    def after_run(self, trainer):
        if self._active:  # run ended before the window filled
            import jax

            jax.profiler.stop_trace()
            self._active = False
