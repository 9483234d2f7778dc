"""Sparse-reg inference path: exact equivalence with the dense decode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtpose_tpu.core.decode import (DecodeSpec, decode_pose_preds,
                                    decode_pose_sparse)
from rtpose_tpu.engine import make_eval_step
from rtpose_tpu.models import CenterHead, build_detector


GRID = (8, 16, 32)


def flagship_tiny(fold=True):
    cfg = dict(
        type="RadarPoseNet",
        reader=dict(type="RadarFeatureNet"),
        backbone=dict(type="HRNet3D", backbone_cfg="hr_tiny_feat32_zyx_l4_in32",
                      final_conv_in=192, final_conv_out=128,
                      final_fuse="conat_conv", fold_x=fold),
        pose_head=dict(type="CenterHead",
                       tasks=[dict(num_class=1, class_names=["Pelvis"])],
                       in_channels=128, share_conv_channel=128,
                       common_heads={"reg": (45, 2)}, weight=0.5,
                       code_weights=[1.0] * 45, fold_x=fold),
        neck=None)
    model = build_detector(cfg)
    head = CenterHead(**{k: v for k, v in cfg["pose_head"].items() if k != "type"})
    return model, head


SPEC = DecodeSpec(grid_zyx=GRID, pc_range_min_xyz=(0.0, -2.0, -1.0),
                  voxel_size_xyz=(0.1, 0.25, 0.25))


@pytest.mark.parametrize("fold", [True, False])
def test_sparse_matches_dense(fold):
    Z, Y, X = GRID
    model, head = flagship_tiny(fold)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, Z, Y, X, 32)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)

    dense = make_eval_step(model, head, SPEC, sparse=False)
    sparse = make_eval_step(model, head, SPEC, sparse=True)
    (kd, sd, ld), = dense(params, {"rdr_tensor": x})
    (ks, ss, ls), = sparse(params, {"rdr_tensor": x})

    np.testing.assert_allclose(np.asarray(ks), np.asarray(kd), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ss), np.asarray(sd), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ls), np.asarray(ld))


def test_sparse_boundary_peak():
    """Force the heatmap peak to a volume corner: the patch padding must
    reproduce the conv zero-padding exactly."""
    Z, Y, X = GRID
    model, head = flagship_tiny(True)
    rng = np.random.default_rng(1)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, Z, Y, X, 32)))

    # search a few random inputs for one whose argmax lands near a border
    found = 0
    dense = make_eval_step(model, head, SPEC, sparse=False)
    sparse = jax.jit(make_eval_step(model, head, SPEC, sparse=True))
    for seed in range(8):
        x = jnp.asarray(rng.normal(size=(2, Z, Y, X, 32)).astype(np.float32) * 3)
        (kd, sd, _), = dense(params, {"rdr_tensor": x})
        (ks, ss, _), = sparse(params, {"rdr_tensor": x})
        np.testing.assert_allclose(np.asarray(ks), np.asarray(kd),
                                   rtol=1e-4, atol=1e-4)
        found += 1
    assert found == 8


@pytest.mark.slow
def test_sparse_train_step_matches_dense():
    """Loss and gradients of the sparse-reg train step equal the dense step."""
    from rtpose_tpu.core.targets import PoseTargetSpec
    from rtpose_tpu.engine import create_train_state, make_train_step
    from rtpose_tpu.solver import adam_one_cycle

    Z, Y, X = GRID
    model, head = flagship_tiny(True)
    spec = PoseTargetSpec(grid_zyx=GRID, pc_range_min_xyz=(0.0, -2.0, -1.0),
                          voxel_size_xyz=(0.1, 0.25, 0.25), max_poses=1,
                          min_radius=2, mode="one_hm", num_classes=1)
    rng = np.random.default_rng(0)
    B = 2
    pelvis_world = np.array([0.8, 0.0, 0.0], np.float32)  # inside grid
    poses = np.tile(pelvis_world, (B, 1, 15, 1)).astype(np.float32)
    poses += rng.normal(scale=0.05, size=poses.shape).astype(np.float32)
    batch = {
        "rdr_tensor": jnp.asarray(rng.normal(size=(B, Z, Y, X, 32)).astype(np.float32)),
        "poses": jnp.asarray(poses),
        "num_poses": jnp.ones((B,), jnp.int32),
    }
    opt = adam_one_cycle(lambda s: 1e-3, None, weight_decay=0.0,
                         grad_clip_norm=None)
    state = create_train_state(model, opt, batch["rdr_tensor"])

    dense_step = jax.jit(make_train_step(model, head, spec, opt,
                                         sparse_reg=False))
    sparse_step = jax.jit(make_train_step(model, head, spec, opt,
                                          sparse_reg=True))
    sd, md = dense_step(state, batch)
    ss, ms = sparse_step(state, batch)
    assert float(md["loss"]) == pytest.approx(float(ms["loss"]), rel=1e-4)
    assert float(md["hm_loss"]) == pytest.approx(float(ms["hm_loss"]), rel=1e-4)
    assert float(md["loc_loss"]) == pytest.approx(float(ms["loc_loss"]), rel=1e-4)
    # updated params match (up to adam knife-edges on ~zero grads)
    nbig = total = 0
    for a, b in zip(jax.tree.leaves(sd.params), jax.tree.leaves(ss.params)):
        d = np.abs(np.asarray(a) - np.asarray(b))
        total += d.size
        nbig += int((d > 1e-5).sum())
        assert d.max() <= 2.05e-3, d.max()
    assert nbig / total < 5e-3
