"""Jitted train / eval steps.

The TPU-first counterpart of the reference's Trainer hot loop
(``det3d/torchie/trainer/trainer.py:370-434``): device transfer, target
assignment, forward, loss, backward, gradient clipping, optimizer step and
the NaN-loss skip guard (``hooks/optimizer.py:15-17``) all fuse into ONE
XLA-compiled function of ``(state, batch) -> (state, metrics)``.

Batches are dicts of fixed-shape arrays:
  rdr_tensor: (B, Z, Y, X, C) float32 radar cube (channels-last)
  poses:      (B, max_poses, 15, 3) float32 world keypoints
  num_poses:  (B,) int32
Targets are assigned on-device from ``poses`` (vmapped
``core.targets.assign_pose_targets``); precomputed host targets (the
reference pipeline path) are used instead when the batch already carries
'hm'/'ind'/'mask'/'cat'/'anno_pose'.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..core.targets import PoseTargetSpec, assign_pose_targets


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray                      # int32 global step


def create_train_state(model, optimizer, example_input, rng=None) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    params = model.init(rng, example_input)
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))


VOXEL_KEYS = ("voxels", "num_points_per_voxel", "coors", "num_voxels")


def preprocess_raw(raw: jnp.ndarray, norm: tuple) -> jnp.ndarray:
    """On-device preprocessing of a ROI-cropped RAW cube batch.

    (B, D, Z', Y', X') disk-dtype -> (B, Z', Y', X', D) f32 normalized —
    the device-side replacement for the reference's host ``get_cube``
    (cruw_pose.py:167-185).  f32/bf16 inputs run the fused Pallas kernel
    (ops/preprocess.py); f16 lowers through XLA (Mosaic has no f16).
    """
    from ..ops.preprocess import fused_preprocess_batch
    B, D, Z, Y, X = raw.shape
    roi = (0, Z - 1, 0, Y - 1, 0, X - 1)
    return fused_preprocess_batch(raw, roi, float(norm[0]), float(norm[1]))


def model_input_of(batch: Dict[str, jnp.ndarray], input_key: Optional[str],
                   preprocess: Optional[tuple] = None):
    """The model's input from a batch: one dense array (``input_key``), or
    the voxel sub-dict when ``input_key`` is None (VoxelNet batch layout).
    A batch carrying 'rdr_raw' is preprocessed on-device first."""
    if input_key is None:
        return {k: batch[k] for k in VOXEL_KEYS}
    if input_key == "rdr_tensor" and "rdr_raw" in batch:
        assert preprocess is not None, \
            "raw batches need the (norm_start, norm_scale) window"
        return preprocess_raw(batch["rdr_raw"], preprocess)
    return batch[input_key]


def targets_from_batch(batch: Dict[str, jnp.ndarray], spec: PoseTargetSpec):
    """Per-task target lists, assigned on-device unless precomputed."""
    if "hm" in batch:
        return {k: batch[k] for k in ("hm", "ind", "mask", "cat", "anno_pose")}
    t = jax.vmap(lambda p, n: assign_pose_targets(p, n, spec))(
        batch["poses"], batch["num_poses"])
    # (B, C, Z, Y, X) -> channels-last (B, Z, Y, X, C)
    hm = jnp.transpose(t["hm"], (0, 2, 3, 4, 1))
    return dict(hm=[hm], ind=[t["ind"]], mask=[t["mask"]], cat=[t["cat"]],
                anno_pose=[t["anno_pose"]])


def make_train_step(model, head, spec: PoseTargetSpec,
                    optimizer: optax.GradientTransformation,
                    lr_fn: Optional[Callable] = None,
                    input_key: str = "rdr_tensor",
                    sparse_reg: bool = False,
                    remat: bool = False,
                    preprocess: Optional[tuple] = None,
                    loc_weight_fn: Optional[Callable] = None) -> Callable:
    """Build the fused train step.

    ``head`` is the (unbound) CenterHead module — its ``loss`` uses only
    static fields so it can be called outside ``apply``.

    ``remat=True`` wraps the forward in ``jax.checkpoint`` so backward
    recomputes activations instead of keeping them in HBM — trades ~1/3 more
    FLOPs for roughly the forward's activation memory, enabling much larger
    per-chip batches (the reference's AMP/GradScaler memory story maps to
    bf16+remat here).

    ``sparse_reg`` (single-task one_hm configs): the regression tower runs
    only on receptive-field patches at the TARGET indices — the reg loss
    gathers exactly those voxels, so loss and gradients are identical to
    the dense step while skipping ~40% of its conv work (forward AND
    backward).

    ``loc_weight_fn``: optional ``step -> weight`` overriding the static
    ``head.weight`` balance between the heatmap and regression losses
    (total = hm_loss + w(step) * loc_loss).  A training-dynamics lever for
    the multi-task stall documented in BASELINE.md (the shared backbone can
    lock into the heatmap task before the regression escapes the
    predict-the-mean basin); only meaningful for pose heads whose loss is
    the hm+loc composition.
    """

    def sparse_losses(params, batch, example):
        from ..models.losses import fast_focal_loss_logits
        ind = example["ind"][0]
        hm_logits, reg_at_ind = model.apply(
            params, model_input_of(batch, input_key, preprocess), ind,
            method="forward_sparse_train")
        hm_loss = fast_focal_loss_logits(hm_logits, example["hm"][0], ind,
                                         example["mask"][0], example["cat"][0])
        maskf = example["mask"][0].astype(jnp.float32)[:, :, None]
        target = example["anno_pose"][0]
        l1 = jnp.abs(reg_at_ind.astype(jnp.float32) * maskf - target * maskf)
        rl = jnp.sum(l1 / (jnp.sum(maskf) + 1e-4), axis=(0, 1))
        code_w = jnp.asarray(head.code_weights, jnp.float32)
        loc_loss = jnp.sum(rl * code_w)
        loss = hm_loss + head.weight * loc_loss
        return {"loss": [loss], "hm_loss": [hm_loss], "loc_loss": [loc_loss],
                "loc_loss_elem": [rl],
                "num_positive": [jnp.sum(example["mask"][0].astype(jnp.float32))]}

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        example = targets_from_batch(batch, spec)

        def compute_losses(params, batch, example):
            if sparse_reg:
                return sparse_losses(params, batch, example)
            preds = model.apply(
                params, model_input_of(batch, input_key, preprocess))
            return head.loss(example, preds)

        if remat:
            compute_losses = jax.checkpoint(compute_losses)

        def loss_fn(params):
            losses = compute_losses(params, batch, example)
            if loc_weight_fn is None:
                total = jnp.sum(jnp.stack(losses["loss"]))
            else:
                total = (jnp.sum(jnp.stack(losses["hm_loss"]))
                         + loc_weight_fn(state.step)
                         * jnp.sum(jnp.stack(losses["loc_loss"])))
            return total, losses

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)

        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # NaN/Inf loss guard: skip the whole step (hooks/optimizer.py:15-17)
        finite = jnp.isfinite(loss)
        new_params = jax.tree.map(lambda n, o: jnp.where(finite, n, o),
                                  new_params, state.params)
        new_opt_state = jax.tree.map(lambda n, o: jnp.where(finite, n, o),
                                     new_opt_state, state.opt_state)

        metrics = dict(
            loss=loss,
            hm_loss=jnp.stack(losses["hm_loss"]).sum(),
            loc_loss=jnp.stack(losses["loc_loss"]).sum(),
            num_positive=jnp.stack(losses["num_positive"]).sum(),
            grad_norm=optax.global_norm(grads),
            skipped=(~finite).astype(jnp.float32),
        )
        # per-coordinate reg losses (reference logs all 45: trainer.py:70-89)
        metrics["loc_loss_elem"] = losses["loc_loss_elem"][0]
        if lr_fn is not None:
            metrics["lr"] = lr_fn(state.step)
        if loc_weight_fn is not None:
            metrics["loc_weight"] = loc_weight_fn(state.step)

        return TrainState(params=new_params, opt_state=new_opt_state,
                          step=state.step + 1), metrics

    return train_step


def make_epoch_step(train_step: Callable, batch_size: int,
                    shapes: Dict[str, tuple], orig_dtypes: Dict[str, Any],
                    mesh=None) -> Callable:
    """Scan a whole epoch of device-cached batches inside ONE compiled call.

    With the dataset resident in HBM (``DeviceCachedLoader``), the only
    per-step host involvement left is dispatch; on high-latency links even
    that dominates.  ``epoch_fn(state, data, idx)`` gathers each batch from
    ``data`` (dict of (N, K) arrays), restores shapes/dtypes, and folds the
    whole epoch into a ``lax.scan`` — one dispatch per EPOCH, metrics
    returned stacked (n_steps, ...).

    Multi-device: with ``mesh`` given (>1 device), the cache is expected
    replicated and every gathered batch is sharding-constrained to
    ``P('data')``, so the scan body runs the same data-parallel layout as
    the per-step path (grad all-reduce inserted by GSPMD).
    """
    import jax.numpy as jnp
    from jax import lax

    spmd = mesh is not None and mesh.devices.size > 1
    if spmd:
        from jax.sharding import NamedSharding, PartitionSpec as P
        data_sh = NamedSharding(mesh, P("data"))

    def epoch_fn(state, data, idx):
        idx2 = idx.reshape(-1, batch_size)

        def body(s, sel):
            batch = {}
            for k, v in data.items():
                g = jnp.take(v, sel, axis=0)
                if k in orig_dtypes:
                    g = g.astype(orig_dtypes[k])
                g = g.reshape(batch_size, *shapes[k])
                if spmd:
                    g = jax.lax.with_sharding_constraint(g, data_sh)
                batch[k] = g
            return train_step(s, batch)

        return lax.scan(body, state, idx2)

    return epoch_fn


def make_eval_step(model, head, decode_spec,
                   input_key: Optional[str] = "rdr_tensor",
                   sparse: bool = False,
                   preprocess: Optional[tuple] = None,
                   multi_poses: int = 0,
                   tta_double_flip: bool = False) -> Callable:
    """Forward + on-device decode; returns per-task (kpts, scores, labels).

    ``sparse=True`` (single-task one_hm configs): the reg tower runs only on
    the receptive-field patch around each heatmap peak — exact, ~1.4x faster
    inference (see RadarPoseNet.predict_sparse).

    ``multi_poses=P`` (one_hm configs with ``max_poses > 1``): CenterNet
    local-max + top-P decode (``core.decode.decode_pose_multi``); the step
    returns ``[(kpts (B,P,K,3), scores (B,P))]`` — the TPU-new multi-person
    path (the reference's decode/eval surface is single-person).
    """
    if multi_poses and multi_poses > 1:
        from ..core.decode import decode_pose_multi

        def eval_step(params, batch):
            preds = model.apply(
                params, model_input_of(batch, input_key, preprocess))
            kpts, scores = decode_pose_multi(
                preds[0]["hm"], preds[0]["reg"], decode_spec,
                max_objects=multi_poses)
            return [(kpts, scores)]

        return eval_step

    if sparse:
        from ..core.decode import decode_pose_sparse

        def eval_step(params, batch):
            hm, reg_at_peak, peak_ind = model.apply(
                params, model_input_of(batch, input_key, preprocess),
                method="predict_sparse")
            return [decode_pose_sparse(hm, reg_at_peak, peak_ind, decode_spec)]

        return eval_step

    if tta_double_flip and input_key is None:
        from ..core.decode import decode_pose_preds, unflip_pose_preds

        # CenterPoint double-flip TTA consumer: one forward per voxel set
        # (original + yflip + xflip + double_flip, produced by the
        # Voxelization pipeline at test time), unflip each set's dense
        # outputs back to the original frame, average heatmap PROBABILITIES
        # and regressions, decode once.  Probability averaging keeps the
        # decoded score equal to the ensemble mean (the averaged map rides
        # back through decode's sigmoid via a logit transform).
        _FLIPS = (("", False, False), ("yflip_", False, True),
                  ("xflip_", True, False), ("double_flip_", True, True))

        def eval_step(params, batch):
            per_task_hm, per_task_reg = None, None
            n_sets = 0
            for prefix, fx, fy in _FLIPS:
                if f"{prefix}voxels" not in batch:
                    continue
                preds = model.apply(
                    params, {k: batch[f"{prefix}{k}"] for k in VOXEL_KEYS})
                n_sets += 1
                if per_task_hm is None:
                    per_task_hm = [0.0] * len(preds)
                    per_task_reg = [0.0] * len(preds)
                for t, p in enumerate(preds):
                    hm, reg = unflip_pose_preds(
                        p["hm"].astype(jnp.float32),
                        p["reg"].astype(jnp.float32), fx, fy)
                    per_task_hm[t] += jax.nn.sigmoid(hm)
                    per_task_reg[t] += reg
            out = []
            for hm_sum, reg_sum in zip(per_task_hm, per_task_reg):
                p = jnp.clip(hm_sum / n_sets, 1e-6, 1.0 - 1e-6)
                logits = jnp.log(p) - jnp.log1p(-p)
                out.append(decode_pose_preds(logits, reg_sum / n_sets,
                                             decode_spec))
            return out

        return eval_step

    def eval_step(params, batch):
        preds = model.apply(params,
                            model_input_of(batch, input_key, preprocess))
        return head.predict(preds, decode_spec)

    return eval_step
