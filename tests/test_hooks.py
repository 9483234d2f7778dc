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


class DeviceCachedFake:
    """Minimal DeviceCachedLoader-shaped object over an in-memory batch."""

    supports_fused_epochs = True  # the trainer's explicit capability gate

    def __init__(self, batch, n=4, bs=2):
        import jax

        self.batch_size = bs
        self.n_batches = n
        items = {k: np.concatenate([v] * n) for k, v in batch.items()}
        self._shapes = {k: v.shape[1:] for k, v in items.items()}
        self._orig_dtype = {}
        self.data = {k: jax.device_put(v.reshape(v.shape[0], -1))
                     for k, v in items.items()}
        self.metas = [None] * (n * bs)
        self.epochs_seen = []

    def __len__(self):
        return self.n_batches

    def _indices(self):
        return np.arange(self.n_batches * self.batch_size)

    def set_epoch(self, epoch):
        self.epochs_seen.append(epoch)

    def __iter__(self):
        import jax.numpy as jnp
        idx = self._indices()
        for b in range(self.n_batches):
            sel = idx[b * self.batch_size : (b + 1) * self.batch_size]
            yield {k: jnp.take(v, jnp.asarray(sel), axis=0)
                   .reshape(len(sel), *self._shapes[k])
                   for k, v in self.data.items()}


class TestFusedEpochs:
    def test_fused_matches_per_iter(self, tmp_path):
        """fuse_epochs=True must produce the same final params as the
        per-iteration loop over the same device-cached batches."""
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

        from rtpose_tpu.parallel import make_mesh

        def run(fused, workdir):
            lr_fn, mom_fn = make_one_cycle_fns(10, 1e-3)
            opt = adam_one_cycle(lr_fn, mom_fn, weight_decay=0.0,
                                 grad_clip_norm=None)
            state = create_train_state(model, opt,
                                       jnp.asarray(batch["rdr_tensor"]))
            step = make_train_step(model, head, spec, opt, lr_fn=lr_fn)
            trainer = Trainer(step, state, work_dir=str(workdir),
                              total_epochs=2, lr_fn=lr_fn, mesh=make_mesh(1),
                              log_interval=2, checkpoint_interval=10,
                              enable_tensorboard=False, fuse_epochs=fused)
            trainer.run(DeviceCachedFake(batch))
            return jax.device_get(trainer.state)

        s_plain = run(False, tmp_path / "plain")
        s_fused = run(True, tmp_path / "fused")
        assert int(s_plain.step) == int(s_fused.step) == 8
        # scan-body fusion reorders a few f32 accumulations vs the
        # individually-jitted step; tolerance covers that compiler noise
        for a, b in zip(jax.tree.leaves(s_plain.params),
                        jax.tree.leaves(s_fused.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_fused_path_actually_taken(self, tmp_path):
        """The capability gate must select the fused scan for a
        fused-capable loader (guards the test above against silently
        comparing per-iter with per-iter)."""
        model, head, spec, GRID = tiny_model_and_spec()
        Z, Y, X = GRID
        rng = np.random.default_rng(0)
        batch = {
            "rdr_tensor": rng.normal(size=(2, Z, Y, X, 1)).astype(np.float32),
            "poses": rng.uniform(0.3, 0.7, size=(2, 1, 15, 3)).astype(np.float32),
            "num_poses": np.ones((2,), np.int32),
        }
        from rtpose_tpu.parallel import make_mesh
        lr_fn, _ = make_one_cycle_fns(10, 1e-3)
        opt = adam_one_cycle(lr_fn, None, weight_decay=0.0, grad_clip_norm=None)
        state = create_train_state(model, opt, jnp.asarray(batch["rdr_tensor"]))
        step = make_train_step(model, head, spec, opt, lr_fn=lr_fn)
        trainer = Trainer(step, state, work_dir=str(tmp_path), total_epochs=1,
                          lr_fn=lr_fn, mesh=make_mesh(1), log_interval=10,
                          checkpoint_interval=10, enable_tensorboard=False,
                          fuse_epochs=True)
        trainer.run(DeviceCachedFake(batch))
        assert trainer._epoch_jit is not None, "fused epoch path not taken"

    def test_fallback_for_host_loaders(self, tmp_path):
        """--fuse_epochs with a loader that cannot fuse (BatchLoader /
        StreamingDeviceLoader: supports_fused_epochs=False) must take the
        per-step loop, not crash (explicit capability contract — no
        duck-typed private-attribute probing)."""
        from rtpose_tpu.data import BatchLoader, StreamingDeviceLoader

        class DS:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                rng = np.random.default_rng(i)
                model, head, spec, GRID = tiny_model_and_spec()
                Z, Y, X = GRID
                return {
                    "rdr_tensor": rng.normal(size=(Z, Y, X, 1)).astype(np.float32),
                    "poses": rng.uniform(0.3, 0.7, size=(1, 15, 3)).astype(np.float32),
                    "num_poses": np.int32(1),
                }

        assert BatchLoader.supports_fused_epochs is False
        assert StreamingDeviceLoader.supports_fused_epochs is False
        for loader in (
            BatchLoader(DS(), batch_size=2, shuffle=True),
            StreamingDeviceLoader(DS(), batch_size=2, chunk_bytes=10**9),
        ):
            model, head, spec, GRID = tiny_model_and_spec()
            lr_fn, _ = make_one_cycle_fns(10, 1e-3)
            opt = adam_one_cycle(lr_fn, None, weight_decay=0.0,
                                 grad_clip_norm=None)
            ex = DS()[0]["rdr_tensor"][None]
            state = create_train_state(model, opt, jnp.asarray(ex))
            step = make_train_step(model, head, spec, opt, lr_fn=lr_fn)
            from rtpose_tpu.parallel import make_mesh
            trainer = Trainer(step, state,
                              work_dir=str(tmp_path / type(loader).__name__),
                              total_epochs=1, lr_fn=lr_fn, mesh=make_mesh(1),
                              log_interval=10, checkpoint_interval=10,
                              enable_tensorboard=False, fuse_epochs=True)
            trainer.run(loader)
            assert trainer._epoch_jit is None, (
                f"{type(loader).__name__} must NOT take the fused path")
            assert int(jax.device_get(trainer.state.step)) == 2


class TestProfilerHook:
    def test_trace_captured(self, tmp_path):
        trainer, loader = make_trainer(tmp_path, total_epochs=1)
        trainer.register_hook(ProfilerHook(num_steps=1, skip_steps=1))
        trainer.run(loader)
        # a trace directory with at least one .xplane.pb must exist
        traces = glob.glob(os.path.join(str(tmp_path), "profile", "**",
                                        "*.xplane.pb"), recursive=True)
        assert traces, "no profiler trace written"


class TestPreemption:
    def test_sigterm_checkpoints_and_exits(self, tmp_path):
        """A SIGTERM mid-epoch saves a checkpoint at the next step boundary
        and run() returns cleanly; resume continues from the saved state."""
        import os
        import signal

        trainer, loader = make_trainer(tmp_path, total_epochs=50)

        class PreemptAtIter(Hook):
            def after_train_iter(self, t):
                # the real signal, delivered to this process: exercises the
                # installed handler, not just the flag
                if t.epoch == 0 and t.inner_iter == 1:
                    os.kill(os.getpid(), signal.SIGTERM)

        trainer.register_hook(PreemptAtIter())
        state = trainer.run(loader)
        # stopped during epoch 0, after iter 1's boundary check: exactly 2
        # optimizer steps happened out of 50 epochs x 3
        assert int(np.asarray(state.step)) == 2
        ckpts = os.path.join(str(tmp_path), "checkpoints")
        latest = open(os.path.join(ckpts, "latest")).read()
        assert os.path.isdir(os.path.join(ckpts, latest))

        # resume: params/step restored, the in-progress epoch restarts
        trainer2, loader2 = make_trainer(tmp_path, total_epochs=1)
        trainer2.resume(ckpts)
        assert int(np.asarray(trainer2.state.step)) == 2
        trainer2.run(loader2)
        assert int(np.asarray(trainer2.state.step)) == 5  # +3 more iters

    def test_sigterm_handler_restored(self, tmp_path):
        import signal

        before = signal.getsignal(signal.SIGTERM)
        trainer, loader = make_trainer(tmp_path, total_epochs=1)
        trainer.run(loader)
        assert signal.getsignal(signal.SIGTERM) is before


class TestCheckpointOverwrite:
    def test_same_epoch_resave_overwrites(self, tmp_path):
        """Saving epoch_N twice (checkpoint hook then a mid-epoch preempt,
        or a second preemption after resume) must overwrite, not crash."""
        trainer, loader = make_trainer(tmp_path, total_epochs=1)
        trainer.run(loader)
        p1 = trainer.save_checkpoint()
        p2 = trainer.save_checkpoint()   # same epoch number
        assert p1 == p2
        from rtpose_tpu.engine import load_checkpoint
        state, meta = load_checkpoint(p2, jax.device_get(trainer.state))
        assert int(np.asarray(state.step)) == int(np.asarray(trainer.state.step))
