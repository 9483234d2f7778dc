"""Multi-chip (virtual 8-device CPU mesh) data-parallel tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtpose_tpu.parallel import make_mesh, replicate, shard_batch
from rtpose_tpu.engine import create_train_state, make_train_step
from rtpose_tpu.solver import adam_one_cycle, make_one_cycle_fns

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __graft_entry__ as graft


class TestMesh:
    def test_make_mesh_8(self):
        mesh = make_mesh(8)
        assert mesh.devices.size == 8

    def test_shard_batch_layout(self):
        mesh = make_mesh(4)
        batch = {"rdr_tensor": np.zeros((8, 2, 2, 2, 1), np.float32),
                 "num_poses": np.ones((8,), np.int32),
                 "valid": np.int32(8),
                 "meta": [{"seq": "0"}] * 8}
        dev = shard_batch(batch, mesh)
        assert dev["rdr_tensor"].sharding.spec == jax.sharding.PartitionSpec("data")
        assert dev["meta"] == batch["meta"]

    def test_shard_batch_rejects_misaligned_batch(self):
        """A wrong global batch size must raise, not silently replicate the
        whole batch onto every device (VERDICT round-1 finding)."""
        mesh = make_mesh(4)
        batch = {"rdr_tensor": np.zeros((6, 2, 2, 2, 1), np.float32)}
        with pytest.raises(ValueError, match="not\\s+divisible|divisible"):
            shard_batch(batch, mesh)

    def test_shard_batch_device_resident_passthrough(self):
        """Device-resident (DeviceCachedLoader) batches reshard d2d."""
        mesh = make_mesh(4)
        batch = {"rdr_tensor": jnp.zeros((8, 2, 2, 2, 1), jnp.float32)}
        dev = shard_batch(batch, mesh)
        assert dev["rdr_tensor"].sharding.spec == jax.sharding.PartitionSpec("data")


class TestDataParallel:
    def test_dp_matches_single_device(self):
        """The 8-way sharded train step must produce the same new params as
        the single-device step on the identical global batch."""
        # f32 model: bit-exactness across device layouts (bf16 convs tile
        # differently per batch size and add ~1e-3 noise)
        asm = graft._flagship(tiny=True, dtype_override="float32")
        z, y, x, c = asm.input_shape_zyxc
        B = 8
        rng = np.random.default_rng(0)
        pelvis = np.asarray(asm.target_spec.pc_range_min_xyz, np.float32) + 0.6
        batch = {
            "rdr_tensor": rng.normal(size=(B, z, y, x, c)).astype(np.float32),
            "poses": np.tile(pelvis, (B, 1, 15, 1)).astype(np.float32),
            "num_poses": np.ones((B,), np.int32),
        }
        opt = adam_one_cycle(lambda s: 1e-3, None, weight_decay=0.0,
                             grad_clip_norm=None)
        train_step = make_train_step(asm.model, asm.head, asm.target_spec, opt)
        x0 = jnp.zeros((1, z, y, x, c), jnp.float32)
        state0 = create_train_state(asm.model, opt, x0)

        # single device
        s1, m1 = jax.jit(train_step)(state0, jax.device_put(batch))

        # 8-device mesh
        mesh = make_mesh(8)
        with mesh:
            stateR = replicate(state0, mesh)
            devb = shard_batch(batch, mesh)
            s8, m8 = jax.jit(train_step)(stateR, devb)

        assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-5)
        # params: identical up to adam knife-edges — elements whose gradient
        # is ~0 get a +-lr*mhat/sqrt(vhat) step whose SIGN flips with
        # reduction-order noise.  Bound: |diff| <= 2*lr everywhere, and the
        # fraction of non-tiny diffs stays negligible.
        lr = 1e-3
        total = mismatched = 0
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
            d = np.abs(np.asarray(a) - np.asarray(b))
            assert d.max() <= 2.05 * lr, d.max()
            total += d.size
            mismatched += int((d > 1e-5).sum())
        assert mismatched / total < 5e-3, (mismatched, total)

    @pytest.mark.slow  # the driver executes dryrun_multichip directly
    def test_graft_dryrun(self):
        graft.dryrun_multichip(8)

    def test_graft_entry_compiles(self):
        fn, args = graft.entry()
        hm, reg = jax.jit(fn)(*args)
        assert hm.shape == (1, 16, 64, 160, 1)
        assert reg.shape == (1, 16, 64, 160, 45)


class TestDataParallelEval:
    def test_sparse_eval_matches_single_device(self):
        from rtpose_tpu.core.decode import DecodeSpec
        from rtpose_tpu.engine import make_eval_step

        asm = graft._flagship(tiny=True, dtype_override="float32")
        z, y, x, c = asm.input_shape_zyxc
        B = 8
        rng = np.random.default_rng(2)
        xb = rng.normal(size=(B, z, y, x, c)).astype(np.float32)
        params = asm.model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, z, y, x, c)))
        step = make_eval_step(asm.model, asm.head, asm.decode_spec, sparse=True)

        (k1, s1, l1), = jax.jit(step)(params, {"rdr_tensor": jnp.asarray(xb)})

        mesh = make_mesh(8)
        with mesh:
            pr = replicate(params, mesh)
            devb = shard_batch({"rdr_tensor": xb}, mesh)
            (k8, s8, l8), = jax.jit(step)(pr, devb)

        np.testing.assert_allclose(np.asarray(k8), np.asarray(k1),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(s8), np.asarray(s1),
                                   rtol=1e-4, atol=1e-5)


class TestFusedEpochMultiDevice:
    def test_fused_epoch_8dev_matches_1dev(self):
        """The one-dispatch-per-epoch scan (make_epoch_step) must produce the
        same loss trajectory on an 8-device mesh (sharded batch gathers, DP
        grad all-reduce via GSPMD) as on a single device."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from rtpose_tpu.engine.steps import make_epoch_step

        asm = graft._flagship(tiny=True, dtype_override="float32")
        z, y, x, c = asm.input_shape_zyxc
        N, B = 16, 8
        rng = np.random.default_rng(1)
        pelvis = np.asarray(asm.target_spec.pc_range_min_xyz, np.float32) + 0.6
        shapes = {"rdr_tensor": (z, y, x, c), "poses": (1, 15, 3),
                  "num_poses": ()}
        host = {
            "rdr_tensor": rng.normal(size=(N, z * y * x * c)).astype(np.float32),
            "poses": np.tile(pelvis, (N, 15)).astype(np.float32).reshape(N, -1),
            "num_poses": np.ones((N,), np.int32),
        }
        idx = np.arange(N, dtype=np.int32)

        opt = adam_one_cycle(lambda s: 1e-3, None, weight_decay=0.0,
                             grad_clip_norm=None)
        step = make_train_step(asm.model, asm.head, asm.target_spec, opt)
        state0 = create_train_state(asm.model, opt,
                                    jnp.zeros((1, z, y, x, c), jnp.float32))

        # single device
        ep1 = jax.jit(make_epoch_step(step, B, shapes, {}))
        s1, ms1 = ep1(state0, jax.device_put(host), jax.device_put(idx))

        # 8-device mesh: replicated cache, per-step sharded gathers
        mesh = make_mesh(8)
        repl = NamedSharding(mesh, P())
        ep8 = jax.jit(make_epoch_step(step, B, shapes, {}, mesh=mesh))
        s8, ms8 = ep8(replicate(state0, mesh),
                      jax.device_put(host, repl), jax.device_put(idx, repl))

        l1 = np.asarray(ms1["loss"])
        l8 = np.asarray(ms8["loss"])
        assert l1.shape == (N // B,) == l8.shape
        # step 1 is computed from identical params; later steps inherit the
        # adam knife-edge noise (±lr on ~zero-grad elements, sign set by
        # reduction order) so the trajectory tolerance is looser
        np.testing.assert_allclose(l8[0], l1[0], rtol=1e-5)
        np.testing.assert_allclose(l8, l1, rtol=5e-3)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
            d = np.abs(np.asarray(a) - np.asarray(b))
            # adam knife-edge bound: up to ~lr per step on ~zero-grad
            # elements (see test_dp_matches_single_device), 2 steps here
            assert d.max() <= 2.05e-3 * len(l1), d.max()


class TestShardedCache:
    def test_fused_epoch_sharded_cache_matches_replicated(self):
        """P('data')-sharded cache (each device holds 1/8 of the dataset)
        must produce the same fused-epoch trajectory as the replicated
        cache: the batch gathers become GSPMD collectives but the math is
        unchanged.  This is the HBM-scaling mode (--cache_shard)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from rtpose_tpu.engine.steps import make_epoch_step

        asm = graft._flagship(tiny=True, dtype_override="float32")
        z, y, x, c = asm.input_shape_zyxc
        N, B = 16, 8
        rng = np.random.default_rng(7)
        pelvis = np.asarray(asm.target_spec.pc_range_min_xyz, np.float32) + 0.6
        shapes = {"rdr_tensor": (z, y, x, c), "poses": (1, 15, 3),
                  "num_poses": ()}
        host = {
            "rdr_tensor": rng.normal(size=(N, z * y * x * c)).astype(np.float32),
            "poses": np.tile(pelvis, (N, 15)).astype(np.float32).reshape(N, -1),
            "num_poses": np.ones((N,), np.int32),
        }
        idx = np.arange(N, dtype=np.int32)

        opt = adam_one_cycle(lambda s: 1e-3, None, weight_decay=0.0,
                             grad_clip_norm=None)
        step = make_train_step(asm.model, asm.head, asm.target_spec, opt)
        state0 = create_train_state(asm.model, opt,
                                    jnp.zeros((1, z, y, x, c), jnp.float32))

        mesh = make_mesh(8)
        repl = NamedSharding(mesh, P())
        shrd = NamedSharding(mesh, P("data"))
        ep = jax.jit(make_epoch_step(step, B, shapes, {}, mesh=mesh))

        s_r, ms_r = ep(replicate(state0, mesh),
                       jax.device_put(host, repl), jax.device_put(idx, repl))
        s_s, ms_s = ep(replicate(state0, mesh),
                       jax.device_put(host, shrd), jax.device_put(idx, repl))

        np.testing.assert_allclose(np.asarray(ms_s["loss"]),
                                   np.asarray(ms_r["loss"]), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(s_r.params), jax.tree.leaves(s_s.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-6)

    def test_loader_sharded_cache_iter_matches(self):
        """DeviceCachedLoader built with a P('data') sharding (uneven N ->
        padded rows) yields the same batches as the default placement."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from rtpose_tpu.data import DeviceCachedLoader

        class DS:
            def __len__(self):
                return 11   # not divisible by 8: exercises the pad path

            def __getitem__(self, i):
                r = np.random.default_rng(100 + i)
                return {"rdr_tensor": r.normal(size=(4, 8, 2)).astype(np.float32),
                        "poses": r.normal(size=(1, 15, 3)).astype(np.float32),
                        "num_poses": np.int32(1), "meta": {"i": i}}

        mesh = make_mesh(8)
        ld_plain = DeviceCachedLoader(DS(), batch_size=4, shuffle=True, seed=3)
        ld_shard = DeviceCachedLoader(DS(), batch_size=4, shuffle=True, seed=3,
                                      sharding=NamedSharding(mesh, P("data")))
        assert ld_shard.sharding is not None
        ld_plain.set_epoch(1)
        ld_shard.set_epoch(1)
        for bp, bs in zip(ld_plain, ld_shard):
            assert bp["valid"] == bs["valid"]
            np.testing.assert_array_equal(np.asarray(bp["rdr_tensor"]),
                                          np.asarray(bs["rdr_tensor"]))
            np.testing.assert_array_equal(np.asarray(bp["poses"]),
                                          np.asarray(bs["poses"]))
