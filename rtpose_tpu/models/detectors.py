"""Detector compositions (reader -> backbone -> [neck] -> pose head).

Parity with ``det3d/models/detectors/`` in ipl-uw/RT-POSE:

* ``RadarPoseNet`` (radar_pose_net.py:10-46) — the flagship HRRadarPose:
  identity reader over the dense radar cube, HRNet3D backbone, CenterHead.
* ``VoxelNet`` (voxelnet.py:8-66) — LiDAR companion: voxel feature extractor,
  dense middle encoder, (neck), CenterHead.  See ``rtpose_tpu.models.voxelnet``.

In JAX the detector is a pure function: ``apply(params, batch) -> preds``;
train/predict behavior (loss vs decode) is chosen by the caller, not by a
``return_loss`` flag threaded through the module.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..registry import BACKBONES, DETECTORS, HEADS, NECKS, READERS, build_from_cfg


def build_submodule(cfg, registry, extra: dict | None = None):
    if cfg is None:
        return None
    cfg = dict(cfg)
    if extra:
        cfg.update(extra)
    return build_from_cfg(cfg, registry)


@DETECTORS.register_module
class RadarPoseNet(nn.Module):
    """HRRadarPose detector over a dense (B, Z, Y, X, C) radar cube."""

    reader: dict = None
    backbone: dict = None
    pose_head: dict = None
    neck: Optional[dict] = None
    pretrained: Optional[str] = None

    def setup(self):
        self.reader_m = build_submodule(self.reader, READERS)
        self.backbone_m = build_submodule(self.backbone, BACKBONES)
        self.neck_m = build_submodule(self.neck, NECKS)
        self.head_m = build_submodule(self.pose_head, HEADS)

    def extract_feat(self, rdr_tensor: jnp.ndarray) -> jnp.ndarray:
        x = self.reader_m(rdr_tensor)
        x = self.backbone_m(x)
        if self.neck_m is not None:
            x = self.neck_m(x)
        return x

    def __call__(self, rdr_tensor: jnp.ndarray) -> List[Dict[str, jnp.ndarray]]:
        feat = self.extract_feat(rdr_tensor)
        return self.head_m(feat)

    # pure helpers usable through module binding (model.apply(..., method=...))
    def loss(self, rdr_tensor, example):
        preds = self(rdr_tensor)
        return self.head_m.loss(example, preds)

    def forward_sparse_train(self, rdr_tensor: jnp.ndarray, ind: jnp.ndarray):
        """Training forward with the reg tower evaluated only at the target
        indices: the reg loss gathers predictions at ``ind`` (B, M) — dense
        regression elsewhere contributes neither loss nor gradient, so this
        is exactly the dense loss, minus ~40% of the step's conv work.

        Returns (hm (B,Z,Y,X,C) logits, reg_at_ind (B, M, D)).
        """
        import jax

        feat = self.extract_feat(rdr_tensor)
        hm = self.head_m(feat, branch="hm")[0]["hm"]
        B, Z, Y, X, C = hm.shape
        M = ind.shape[1]
        z = ind // (Y * X)
        y = (ind % (Y * X)) // X
        x = ind % X
        flatB = lambda a: a.reshape(B * M)
        feat_rep = jnp.repeat(
            feat, M, axis=0) if M > 1 else feat
        reg = self._reg_patches(feat_rep, flatB(z), flatB(y), flatB(x),
                                (Z, Y, X))
        return hm, reg.reshape(B, M, -1)

    def _reg_patches(self, feat, z, y, x, zyx):
        """Reg-tower values at voxel coords via 5^3 receptive-field patches."""
        import jax

        from ..ops.fold_conv import FOLD

        Z, Y, X = zyx
        if min(Z, Y, X) < 5:
            # grid smaller than the receptive field: dense reg + gather
            from .losses import gather_feat
            reg = self.head_m(feat, branch="reg")[0]["reg"]
            flat = (z * Y + y) * X + x
            dense = reg.reshape(reg.shape[0], -1, reg.shape[-1])
            return gather_feat(dense, flat[:, None])[:, 0]
        folded = feat.ndim == 5 and feat.shape[3] * FOLD == X

        def patch_of(featb, zi, yi, xi):
            if folded:
                Xf = featb.shape[2]
                cx = jnp.clip(xi // FOLD - 1, 0, Xf - 3)
                slab = jax.lax.dynamic_slice(
                    featb,
                    (jnp.clip(zi - 2, 0, Z - 5), jnp.clip(yi - 2, 0, Y - 5),
                     cx, 0),
                    (5, 5, 3, featb.shape[-1]))
                slab = slab.reshape(5, 5, 3 * FOLD, featb.shape[-1] // FOLD)
                x_base = cx * FOLD
            else:
                slab = jax.lax.dynamic_slice(
                    featb,
                    (jnp.clip(zi - 2, 0, Z - 5), jnp.clip(yi - 2, 0, Y - 5),
                     jnp.clip(xi - 2, 0, X - 5), 0),
                    (5, 5, 5, featb.shape[-1]))
                x_base = jnp.clip(xi - 2, 0, X - 5)
            slab = jnp.pad(slab, [(2, 2), (2, 2), (2, 2), (0, 0)])
            start = (zi - 2 - jnp.clip(zi - 2, 0, Z - 5) + 2,
                     yi - 2 - jnp.clip(yi - 2, 0, Y - 5) + 2,
                     xi - 2 - x_base + 2, 0)
            return jax.lax.dynamic_slice(slab, start,
                                         (5, 5, 5, slab.shape[-1]))

        def mask_of(zi, yi, xi):
            pz = zi - 2 + jnp.arange(5)
            py = yi - 2 + jnp.arange(5)
            px = xi - 2 + jnp.arange(5)
            mz = ((pz >= 0) & (pz < Z))[:, None, None]
            my = ((py >= 0) & (py < Y))[None, :, None]
            mx = ((px >= 0) & (px < X))[None, None, :]
            return (mz & my & mx)[..., None]

        patches = jax.vmap(patch_of)(feat, z, y, x)
        masks = jax.vmap(mask_of)(z, y, x).astype(patches.dtype)
        reg_p = self.head_m(patches, branch="reg", patch=True,
                            inner_mask=masks)[0]["reg"]
        return reg_p[:, 2, 2, 2, :]

    def predict_sparse(self, rdr_tensor: jnp.ndarray):
        """Sparse single-peak inference: dense heatmap, reg tower evaluated
        ONLY on the receptive-field patch around each sample's heatmap peak.

        At decode time only the peak voxel's regression values are consumed
        (center_head.py:349-355 in the reference), so computing the 45-dim
        reg tower densely is dead work — on v5e it is ~40% of inference.
        The patch evaluation is mathematically exact (k3+k3 convs -> 5^3
        receptive field; boundary zeros reproduced by patch padding).

        Supports the single-task, single-peak (one_hm) configuration.
        Returns (hm (B, Z, Y, X, C) logits, reg_at_peak (B, D), peak_ind (B,)).
        """
        from ..core.decode import flat_argmax

        feat = self.extract_feat(rdr_tensor)
        hm = self.head_m(feat, branch="hm")[0]["hm"]         # (B, Z, Y, X, C)
        B, Z, Y, X, C = hm.shape
        flat = flat_argmax(hm.reshape(B, -1, C)[..., 0])     # pelvis class
        z = flat // (Y * X)
        y = (flat % (Y * X)) // X
        x = flat % X
        reg_at_peak = self._reg_patches(feat, z, y, x, (Z, Y, X))
        return hm, reg_at_peak, flat


def build_detector(cfg: dict, train_cfg=None, test_cfg=None):
    """Factory with the reference builder signature
    (det3d/models/builder.py:17-52)."""
    cfg = dict(cfg)
    cfg.pop("train_cfg", None)
    cfg.pop("test_cfg", None)
    return build_from_cfg(cfg, DETECTORS)
