"""Orbax checkpointing with the reference's save/resume contract.

Parity (``det3d/torchie/trainer/checkpoint.py`` + ``trainer.py:354-368,
494-509``): checkpoints carry {params, opt_state, step} plus a meta record
(epoch, config text); saved as ``epoch_N`` under ``work_dir/checkpoints``
with a ``latest`` pointer; resume restores everything including the
optimizer moments and global step.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from .steps import TrainState

LATEST = "latest"


def _ckpt_dir(work_dir: str) -> str:
    return os.path.join(os.path.abspath(work_dir), "checkpoints")


def save_checkpoint(work_dir: str, state: TrainState, epoch: int,
                    meta: Optional[dict] = None) -> str:
    """Save ``epoch_<N>`` and update the ``latest`` pointer (master only)."""
    if jax.process_index() != 0:
        return ""
    base = _ckpt_dir(work_dir)
    os.makedirs(base, exist_ok=True)
    path = os.path.join(base, f"epoch_{epoch}")
    with ocp.StandardCheckpointer() as ckptr:
        # force: an epoch_N from an earlier save of this epoch (a previous
        # preemption, a checkpoint-hook save preceding a mid-epoch SIGTERM)
        # must be overwritten with the newer state, not crash the save —
        # orbax raises on existing destinations by default
        ckptr.save(os.path.join(path, "state"),
                   jax.tree.map(np.asarray, state), force=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(dict(meta or {}, epoch=epoch, step=int(state.step)), f)
    # relative 'latest' pointer (reference uses a symlink)
    with open(os.path.join(base, LATEST), "w") as f:
        f.write(f"epoch_{epoch}")
    return path


def resolve_checkpoint(path: str) -> str:
    """Accept a checkpoint dir, a work_dir, or a dir containing 'latest'."""
    path = os.path.abspath(path)
    for base in (path, _ckpt_dir(path)):
        latest = os.path.join(base, LATEST)
        if os.path.isfile(latest):
            with open(latest) as f:
                return os.path.join(base, f.read().strip())
    return path


def load_checkpoint(path: str, target: TrainState) -> Tuple[TrainState, dict]:
    """Restore a TrainState (shapes/dtypes from ``target``) + meta."""
    path = resolve_checkpoint(path)
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.join(path, "state"),
                              jax.tree.map(ocp.utils.to_shape_dtype_struct, target))
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta
