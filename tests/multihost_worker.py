"""Worker process for the multi-host execution test (test_multihost.py).

Each worker is one JAX *process* (the reference's per-rank torch.distributed
worker, ``det3d/torchie/apis/env.py:13-55``): it joins the coordinator,
builds a global 2-device data mesh (1 CPU device per process), runs 2 fused
DP train steps on its shard of a deterministic global batch, exercises
``all_gather_objects``, and (rank 0) writes the loss trajectory + a param
digest for the parity assertion.

Usage: python multihost_worker.py <pid> <nprocs> <port> <config> <outdir>
"""

import json
import os
import sys

pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
cfg_path, outdir = sys.argv[4], sys.argv[5]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # before any backend/distributed init
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nprocs, process_id=pid)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rtpose_tpu.api import assemble
from rtpose_tpu.config import Config
from rtpose_tpu.engine import create_train_state, make_train_step
from rtpose_tpu.parallel.mesh import all_gather_objects, process_count
from rtpose_tpu.solver import adam_one_cycle, make_one_cycle_fns

assert jax.process_count() == nprocs, jax.process_count()
assert process_count() == nprocs

asm = assemble(Config.fromfile(cfg_path))
z, y, x, c = asm.input_shape_zyxc

devices = np.array(jax.devices())              # global device list
mesh = Mesh(devices, ("data",))
data_sh = NamedSharding(mesh, P("data"))
repl_sh = NamedSharding(mesh, P())

B_global = devices.size
rng = np.random.default_rng(0)                 # same seed on every process
g_batch = {
    "rdr_tensor": rng.random((B_global, z, y, x, c)).astype(np.float32),
    "poses": np.tile(np.asarray(asm.target_spec.pc_range_min_xyz, np.float32)
                     + np.float32([1.0, 2.0, 1.0]),
                     (B_global, 1, 15, 1)).astype(np.float32),
    "num_poses": np.ones((B_global,), np.int32),
}
n_local = B_global // nprocs
batch = {k: jax.make_array_from_process_local_data(
    data_sh, v[pid * n_local:(pid + 1) * n_local]) for k, v in g_batch.items()}

lr_fn, mom_fn = make_one_cycle_fns(100, 2e-3)
opt = adam_one_cycle(lr_fn, mom_fn)
state = create_train_state(asm.model, opt, jnp.zeros((1, z, y, x, c)))
state = jax.device_put(state, repl_sh)
step = jax.jit(make_train_step(asm.model, asm.head, asm.target_spec, opt,
                               sparse_reg=True),
               in_shardings=(repl_sh, data_sh),
               out_shardings=(repl_sh, repl_sh))

losses = []
for _ in range(2):
    state, metrics = step(state, batch)
    losses.append(float(metrics["loss"]))

# the pickled byte-allgather branch (parallel/mesh.py multihost path)
gathered = all_gather_objects({"pid": pid, "last_loss": losses[-1]})
assert len(gathered) == nprocs, gathered
assert sorted(g["pid"] for g in gathered) == list(range(nprocs)), gathered
assert all(abs(g["last_loss"] - losses[-1]) < 1e-5 for g in gathered)

if pid == 0:
    leaves = jax.tree.leaves(jax.device_get(state.params))
    digest = float(sum(np.abs(l).sum() for l in leaves))
    with open(os.path.join(outdir, "result.json"), "w") as f:
        json.dump({"losses": losses, "param_digest": digest,
                   "gathered_pids": sorted(g["pid"] for g in gathered)}, f)
print(f"worker {pid} done", flush=True)
