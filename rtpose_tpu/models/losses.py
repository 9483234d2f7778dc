"""CenterNet pose losses as pure jnp functions.

Parity targets (ipl-uw/RT-POSE ``det3d/models/losses/centernet_loss.py``):

* ``fast_focal_loss`` — CornerNet-style focal loss (lines 26-54): negative
  term over the full map weighted by ``(1 - target)^4``, positive term
  gathered at object indices for the object's class, normalized by the
  positive count (falling back to the raw negative sum when there are no
  positives).
* ``reg_loss`` — masked L1 at gathered indices, normalized by mask count,
  returning the per-dimension loss vector (lines 6-24).

Inputs are channels-last: predictions are (B, Z, Y, X, C) and gathers use the
flat voxel index ``ind = z*(Y*X) + y*X + x``, which is exactly the row order
of ``reshape(B, Z*Y*X, C)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_feat(feat: jnp.ndarray, ind: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of a (B, N, C) tensor at (B, M) flat indices -> (B, M, C).

    jnp equivalent of the reference ``_transpose_and_gather_feat`` (the
    transpose is a no-op here because we are already channels-last).
    """
    return jnp.take_along_axis(feat, ind[:, :, None].astype(jnp.int32), axis=1)


def clamped_sigmoid(x: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Sigmoid clamped to [eps, 1-eps] (center_head.py:240-242)."""
    return jnp.clip(jax.nn.sigmoid(x), eps, 1.0 - eps)


def fast_focal_loss_logits(logits: jnp.ndarray, target: jnp.ndarray,
                           ind: jnp.ndarray, mask: jnp.ndarray,
                           cat: jnp.ndarray) -> jnp.ndarray:
    """CornerNet focal loss computed FROM LOGITS — numerically stable.

    The reference guards log(0) by clamping the sigmoid to [1e-4, 1-1e-4]
    (center_head.py:240-242); the clamp's zero gradient outside the interval
    is a training trap: on this task's 160k-voxel heatmaps the negative term
    crushes the (single) positive below the floor within the first step and
    learning permanently stalls.  Using log_sigmoid gives the exact same
    loss wherever the reference's clamp is inactive and a live gradient
    where the reference has none.

    Args: logits (B, Z, Y, X, C); target/ind/mask/cat as in fast_focal_loss.
    """
    B = logits.shape[0]
    C = logits.shape[-1]
    x = logits.astype(jnp.float32).reshape(B, -1, C)
    target_flat = target.reshape(B, -1, C)

    maskf = mask.astype(jnp.float32)
    p = jax.nn.sigmoid(x)
    log_p = jax.nn.log_sigmoid(x)
    log_not_p = jax.nn.log_sigmoid(-x)

    gt_weight = jnp.power(1.0 - target_flat, 4)
    neg_loss = jnp.sum(log_not_p * jnp.square(p) * gt_weight)

    pos_log_p = jnp.take_along_axis(gather_feat(log_p, ind),
                                    cat[:, :, None].astype(jnp.int32), axis=2)[..., 0]
    pos_p = jnp.take_along_axis(gather_feat(p, ind),
                                cat[:, :, None].astype(jnp.int32), axis=2)[..., 0]
    num_pos = jnp.sum(maskf)
    pos_loss = jnp.sum(pos_log_p * jnp.square(1.0 - pos_p) * maskf)
    return jnp.where(num_pos == 0, -neg_loss,
                     -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0))


def fast_focal_loss(out: jnp.ndarray, target: jnp.ndarray, ind: jnp.ndarray,
                    mask: jnp.ndarray, cat: jnp.ndarray) -> jnp.ndarray:
    """CornerNet focal loss.

    Args:
      out: (B, Z, Y, X, C) predicted heatmap probabilities (already
        sigmoid-clamped; NOT logits).
      target: (B, Z, Y, X, C) gaussian target heatmap.
      ind: (B, M) flat voxel index of each object.
      mask: (B, M) 1 for real objects.
      cat: (B, M) class id of each object.

    Returns scalar loss.
    """
    B = out.shape[0]
    C = out.shape[-1]
    out_flat = out.reshape(B, -1, C)
    target_flat = target.reshape(B, -1, C)

    maskf = mask.astype(jnp.float32)
    gt_weight = jnp.power(1.0 - target_flat, 4)
    neg_loss = jnp.sum(jnp.log(1.0 - out_flat) * jnp.square(out_flat) * gt_weight)

    pos_pred_pix = gather_feat(out_flat, ind)                       # (B, M, C)
    pos_pred = jnp.take_along_axis(pos_pred_pix, cat[:, :, None].astype(jnp.int32),
                                   axis=2)[..., 0]                  # (B, M)
    num_pos = jnp.sum(maskf)
    pos_loss = jnp.sum(jnp.log(pos_pred) * jnp.square(1.0 - pos_pred) * maskf)

    # Reference: if num_pos == 0 -> -neg_loss, else -(pos+neg)/num_pos.
    # (masked positive entries contribute exactly 0 to pos_loss)
    return jnp.where(num_pos == 0, -neg_loss, -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0))


def reg_loss(output: jnp.ndarray, mask: jnp.ndarray, ind: jnp.ndarray,
             target: jnp.ndarray) -> jnp.ndarray:
    """Masked L1 regression loss, per output dimension.

    Args:
      output: (B, Z, Y, X, D) dense regression prediction.
      mask: (B, M).
      ind: (B, M) flat voxel indices.
      target: (B, M, D) regression targets.

    Returns (D,) per-dimension loss vector (summed over batch and objects,
    normalized by total positive count — reference centernet_loss.py:17-24).
    """
    B = output.shape[0]
    D = output.shape[-1]
    pred = gather_feat(output.reshape(B, -1, D), ind)               # (B, M, D)
    maskf = mask.astype(jnp.float32)[:, :, None]                    # (B, M, 1)
    l1 = jnp.abs(pred * maskf - target * maskf)
    l1 = l1 / (jnp.sum(maskf) + 1e-4)
    return jnp.sum(l1, axis=(0, 1))                                 # (D,)


def jde_embedding_loss(embeddings: jnp.ndarray, ids: jnp.ndarray,
                       mask: jnp.ndarray, margin: float = 0.3) -> jnp.ndarray:
    """Appearance-embedding metric loss (JDELoss capability,
    det3d/models/losses/jde_loss.py:7-54 — the reference delegates to
    pytorch-metric-learning's TripletMarginLoss).

    Batch-hard triplet margin loss over L2-normalized embeddings: for each
    anchor, the hardest positive (same id) and hardest negative (different
    id) form the triplet.  Fixed shapes; padded entries carry mask=0.

    Args:
      embeddings: (N, D); ids: (N,) int; mask: (N,) {0, 1}.
    """
    e = embeddings / jnp.clip(jnp.linalg.norm(embeddings, axis=-1, keepdims=True), 1e-6)
    d = jnp.sum(jnp.square(e[:, None, :] - e[None, :, :]), axis=-1)  # (N, N)
    same = (ids[:, None] == ids[None, :])
    valid = (mask[:, None] > 0) & (mask[None, :] > 0)
    eye = jnp.eye(ids.shape[0], dtype=bool)

    pos_mask = same & valid & ~eye
    neg_mask = ~same & valid

    hardest_pos = jnp.max(jnp.where(pos_mask, d, -jnp.inf), axis=1)
    hardest_neg = jnp.min(jnp.where(neg_mask, d, jnp.inf), axis=1)
    has_triplet = jnp.isfinite(hardest_pos) & jnp.isfinite(hardest_neg)
    loss = jnp.maximum(hardest_pos - hardest_neg + margin, 0.0)
    loss = jnp.where(has_triplet, loss, 0.0)
    denom = jnp.maximum(jnp.sum(has_triplet.astype(jnp.float32)), 1.0)
    return jnp.sum(loss) / denom
