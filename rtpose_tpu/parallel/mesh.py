"""Device-mesh data parallelism.

The reference's distributed stack (NCCL process groups, DDP gradient hooks,
DistributedGroupSampler, SLURM/torchrun env plumbing — SURVEY.md §2.9) maps
to a 1-D ``jax.sharding.Mesh`` over a ``data`` axis:

* the global batch is sharded along its leading axis (NamedSharding
  ``P('data')``); parameters and optimizer state are replicated (``P()``);
* ``jax.jit`` with these shardings makes XLA insert the gradient
  all-reduces over ICI/DCN — there is no DDP wrapper, no allreduce hook,
  no rendezvous code;
* per-host input sharding is handled by the loader (``shard_indices``);
* host-side object gather for eval predictions replaces the reference's
  pickle ``all_gather`` (trainer/utils.py:114-154).

The same code runs single-chip (mesh of 1), on a v5e-8 slice, or on the
8-device virtual CPU platform used by tests and ``dryrun_multichip``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis: str = "data",
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        if num_devices > len(devs):
            raise ValueError(f"requested {num_devices} devices, have {len(devs)}")
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis,))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "data",
                replicate_keys: tuple = ()) -> Dict[str, Any]:
    """Put a host batch on the mesh, leading axis sharded over ``axis``.

    Scalars / metadata are replicated; per-task lists are sharded
    element-wise.  The global batch size must divide the mesh size.
    Keys in ``replicate_keys`` (shared per-batch constants such as a
    calibration matrix) are replicated without the divisibility check.
    """
    data = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    n = mesh.devices.size

    def put(k, v):
        if k in replicate_keys:
            return jax.device_put(v, repl) if isinstance(
                v, (jax.Array, np.ndarray, np.number, int, float)) else v
        if isinstance(v, (jax.Array, np.ndarray)) and v.ndim >= 2 \
                and v.shape[0] % n != 0:
            # a >=2-D array is batch data; silently replicating it would
            # turn a wrong batch size into redundant full-batch compute on
            # every device
            raise ValueError(
                f"shard_batch: '{k}' has leading dim {v.shape[0]}, not "
                f"divisible by the {n}-device mesh — fix the global batch "
                "size (per-device batch x device count)")
        if isinstance(v, jax.Array):
            # already on device (DeviceCachedLoader): reshard in place —
            # a device-to-device move, no host round trip
            tgt = data if v.ndim >= 1 and v.shape[0] % n == 0 else repl
            return jax.device_put(v, tgt)
        if isinstance(v, np.ndarray) and v.ndim >= 1 and v.shape[0] % n == 0:
            return jax.device_put(v, data)
        if isinstance(v, (np.ndarray, np.number, int, float)):
            return jax.device_put(np.asarray(v), repl)
        return v

    out = {}
    for k, v in batch.items():
        if k == "meta":
            out[k] = v
        elif isinstance(v, list):
            out[k] = [put(k, x) for x in v]
        else:
            out[k] = put(k, v)
    return out


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def all_gather_objects(obj: Any) -> list:
    """Gather arbitrary picklable objects from all hosts (eval predictions).

    Single-process: trivially [obj].  Multi-host: uses
    ``jax.experimental.multihost_utils`` byte-array allgather, the JAX
    analog of the reference's pickled ``dist.all_gather``.
    """
    if jax.process_count() == 1:
        return [obj]
    import pickle
    from jax.experimental import multihost_utils
    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(np.array([payload.size]))
    maxlen = int(sizes.max())
    padded = np.zeros(maxlen, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [pickle.loads(gathered[i, : int(sizes[i, 0])].tobytes())
            for i in range(gathered.shape[0])]
