"""Trainer hook registry tests (reference hook system parity:
det3d/torchie/trainer/hooks/hook.py:1-63, priority registration
trainer/trainer.py:312-332)."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from rtpose_tpu.engine import (CheckpointHook, Hook, LoggerHook, ProfilerHook,
                               SamplerSeedHook, Trainer, create_train_state,
                               make_train_step)
from rtpose_tpu.solver import adam_one_cycle, make_one_cycle_fns

from test_solver_engine import tiny_model_and_spec


class FakeLoader:
    """Minimal loader: fixed batch repeated n times, set_epoch recorded."""

    def __init__(self, batch, n=3):
        self.batch = batch
        self.n = n
        self.epochs_seen = []

    def __len__(self):
        return self.n

    def __iter__(self):
        for _ in range(self.n):
            yield dict(self.batch)

    def set_epoch(self, epoch):
        self.epochs_seen.append(epoch)


def make_trainer(tmp_path, total_epochs=2, **kw):
    model, head, spec, GRID = tiny_model_and_spec()
    Z, Y, X = GRID
    rng = np.random.default_rng(0)
    batch = {
        "rdr_tensor": rng.normal(size=(2, Z, Y, X, 1)).astype(np.float32),
        "poses": (rng.uniform(0.3, 0.7, size=(2, 1, 15, 3))
                  * np.array([X, Y, Z]) * np.array([0.5, 1.0, 0.5])
                  + np.array([0.0, -4.0, -1.0])).astype(np.float32),
        "num_poses": np.ones((2,), np.int32),
    }
    lr_fn, mom_fn = make_one_cycle_fns(10, 1e-3)
    opt = adam_one_cycle(lr_fn, mom_fn, weight_decay=0.0, grad_clip_norm=None)
    state = create_train_state(model, opt, jnp.asarray(batch["rdr_tensor"]))
    step = make_train_step(model, head, spec, opt, lr_fn=lr_fn)
    from rtpose_tpu.parallel import make_mesh
    trainer = Trainer(step, state, work_dir=str(tmp_path),
                      total_epochs=total_epochs, lr_fn=lr_fn,
                      mesh=make_mesh(1), log_interval=2,
                      checkpoint_interval=1, enable_tensorboard=False, **kw)
    return trainer, FakeLoader(batch)


class RecordingHook(Hook):
    def __init__(self, name, log):
        self.name = name
        self.log = log

    def before_run(self, t):
        self.log.append((self.name, "before_run"))

    def before_train_epoch(self, t):
        self.log.append((self.name, "before_train_epoch", t.epoch))

    def after_train_iter(self, t):
        self.log.append((self.name, "after_train_iter", t.inner_iter))

    def after_train_epoch(self, t):
        self.log.append((self.name, "after_train_epoch", t.epoch))

    def after_run(self, t):
        self.log.append((self.name, "after_run"))


class TestHookRegistry:
    def test_custom_hook_fires_all_events(self, tmp_path):
        trainer, loader = make_trainer(tmp_path, total_epochs=1)
        log = []
        trainer.register_hook(RecordingHook("h", log))
        trainer.run(loader)
        events = [e[1] for e in log]
        assert events[0] == "before_run"
        assert events[-1] == "after_run"
        assert events.count("after_train_iter") == len(loader)
        assert ("h", "before_train_epoch", 0) in log
        assert ("h", "after_train_epoch", 1) in log  # fires post-increment

    def test_priority_ordering(self, tmp_path):
        trainer, loader = make_trainer(tmp_path, total_epochs=1,
                                       default_hooks=False)
        log = []
        late = RecordingHook("late", log)
        early = RecordingHook("early", log)
        trainer.register_hook(late, priority=90)
        trainer.register_hook(early, priority=10)  # registered second, runs first
        trainer.run(loader)
        first_two = [e[0] for e in log[:2]]
        assert first_two == ["early", "late"]

    def test_default_hooks_behavior(self, tmp_path):
        """Defaults reproduce the pre-registry trainer: epoch reseed,
        interval json logging, every-N checkpointing."""
        trainer, loader = make_trainer(tmp_path, total_epochs=2)
        kinds = [type(h).__name__ for h in trainer._hooks]
        assert kinds == ["SamplerSeedHook", "LoggerHook", "CheckpointHook"]
        trainer.run(loader)
        assert loader.epochs_seen == [0, 1]
        assert os.path.exists(trainer.json_log)
        ckpts = glob.glob(os.path.join(str(tmp_path), "checkpoints", "epoch_*"))
        assert len(ckpts) == 2  # interval=1, 2 epochs

    def test_mutating_hook_sees_state(self, tmp_path):
        """A user hook can read/replace trainer.state (EMA-style usage)."""
        captured = {}

        class EmaHook(Hook):
            def after_train_epoch(self, t):
                captured["step"] = int(t.state.step)

        trainer, loader = make_trainer(tmp_path, total_epochs=1)
        trainer.register_hook(EmaHook())
        trainer.run(loader)
        assert captured["step"] == len(loader)


class TestProfilerHook:
    def test_trace_captured(self, tmp_path):
        trainer, loader = make_trainer(tmp_path, total_epochs=1)
        trainer.register_hook(ProfilerHook(num_steps=1, skip_steps=1))
        trainer.run(loader)
        # a trace directory with at least one .xplane.pb must exist
        traces = glob.glob(os.path.join(str(tmp_path), "profile", "**",
                                        "*.xplane.pb"), recursive=True)
        assert traces, "no profiler trace written"
