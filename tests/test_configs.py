"""The 4 shipped experiment configs assemble and run (schema parity with
configs/cruw_pose/* in the reference — hr3d.py:52-78, hr3d_one_hm.py:51-77,
hr3d_one_hm_doppler.py:54-80, hr3d_one_hm_doppler_phase.py:54-80)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtpose_tpu.api import assemble
from rtpose_tpu.config import Config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs", "cruw_pose")

# (file, mode, num_classes, in_ch, reg_dim)
CASES = [
    ("hr3d.py", "per_joint", 15, 1, 3),
    ("hr3d_one_hm.py", "one_hm", 1, 1, 45),
    ("hr3d_one_hm_doppler.py", "one_hm", 1, 32, 45),
    ("hr3d_one_hm_doppler_phase.py", "one_hm", 1, 64, 45),
]


@pytest.mark.parametrize("fname,mode,ncls,in_ch,reg_dim", CASES,
                         ids=[c[0][:-3] for c in CASES])
def test_config_assembles_and_runs(fname, mode, ncls, in_ch, reg_dim):
    cfg = Config.fromfile(os.path.join(CONFIG_DIR, fname))
    asm = assemble(cfg)
    assert asm.target_spec.mode == mode
    assert asm.target_spec.num_classes == ncls
    assert asm.input_shape_zyxc == (16, 64, 160, in_ch)
    assert asm.target_spec.reg_dim == reg_dim

    # reference schema keys present (Config surface parity)
    for key in ("DATASET", "model", "train_cfg", "test_cfg", "data",
                "optimizer", "lr_config", "checkpoint_config", "log_config",
                "total_epochs", "workflow"):
        assert cfg.get(key) is not None, key

    # tiny-grid forward: hm/reg shapes as the reference model would emit
    tiny = (4, 8, 16)
    asm = dataclasses.replace(
        asm, input_shape_zyxc=(*tiny, in_ch),
        target_spec=dataclasses.replace(asm.target_spec, grid_zyx=tiny),
        decode_spec=dataclasses.replace(asm.decode_spec, grid_zyx=tiny))
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, *tiny, in_ch)).astype(np.float32))
    params = asm.model.init(jax.random.PRNGKey(0), x)
    preds = asm.model.apply(params, x)
    assert preds[0]["hm"].shape == (1, *tiny, ncls)
    assert preds[0]["reg"].shape == (1, *tiny, reg_dim)


def test_mp2_config_assembles_multi():
    """The multi-person experiment config surfaces max_poses=2 through
    Assembly: dense train step (no sparse single-peak path) + top-2 decode."""
    cfg = Config.fromfile(os.path.join(CONFIG_DIR,
                                       "hr3d_one_hm_doppler_skel_mp2.py"))
    asm = assemble(cfg)
    assert asm.target_spec.max_poses == 2
    assert asm.multi_poses == 2
    assert not asm.sparse_head


def test_dcn_config_assembles_and_runs():
    """dcn_head=True config: assembles, disables the sparse single-peak
    path, and the DCNSepHead forward emits reference-shaped hm/reg.

    X=32 so the backbone takes the folded-X layout — the head must unfold
    before deformable sampling (regression: folded features fed straight
    into DCNSepHead shrank the heatmap X by FOLD)."""
    cfg = Config.fromfile(os.path.join(CONFIG_DIR,
                                       "hr3d_one_hm_doppler_dcn.py"))
    asm = assemble(cfg)
    assert asm.model_cfg["pose_head"]["dcn_head"] is True
    assert not asm.sparse_head

    tiny = (4, 8, 32)
    asm = dataclasses.replace(
        asm, input_shape_zyxc=(*tiny, 32),
        target_spec=dataclasses.replace(asm.target_spec, grid_zyx=tiny),
        decode_spec=dataclasses.replace(asm.decode_spec, grid_zyx=tiny))
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, *tiny, 32)).astype(np.float32))
    params = asm.model.init(jax.random.PRNGKey(0), x)
    preds = asm.model.apply(params, x)
    assert preds[0]["hm"].shape == (1, *tiny, 1)
    assert preds[0]["reg"].shape == (1, *tiny, 45)
