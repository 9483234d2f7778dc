"""Default-speed CLI smoke: the tools/train.py -> tools/test.py surface runs
on every fast test pass (the full e2e matrix stays @slow in test_e2e_cli.py).

One sequence, four frames, one epoch (2 steps) on the tiny (8, 16, 32) grid;
relies on the persistent jit cache for steady-state speed.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def smoke_env(tmp_path_factory):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_e2e_cli import CONFIG_TEMPLATE, TINY_ROI

    from rtpose_tpu.data import generate_synthetic_dataset
    root = str(tmp_path_factory.mktemp("smoke_data"))
    generate_synthetic_dataset(
        root, num_seqs=1, frames_per_seq=4, rdr_type="zyx_real",
        pelvis_range={"x": (1.0, 2.0), "y": (-1.0, 1.0), "z": (-0.5, 1.2)},
        offset_scale=(0.08, 0.08, 0.1), z_clip=(-1.0, 1.7),
        test_frames_per_seq=2)
    cfg_path = str(tmp_path_factory.mktemp("cfg") / "smoke.py")
    cfg_text = CONFIG_TEMPLATE.format(root=root, roi=TINY_ROI)
    cfg_text = cfg_text.replace("samples_per_gpu=4", "samples_per_gpu=2")
    cfg_text = cfg_text.replace("checkpoint_config = dict(interval=2)",
                                "checkpoint_config = dict(interval=1)")
    cfg_text = cfg_text.replace("total_epochs = 2", "total_epochs = 1")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)
    return cfg_path, str(tmp_path_factory.mktemp("work"))


def _run(script, *args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", script), *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600)


def test_cli_train_test_smoke(smoke_env):
    cfg_path, work_dir = smoke_env
    r = _run("train.py", cfg_path, "--work_dir", work_dir, "--seed", "0")
    assert r.returncode == 0, r.stderr[-4000:]
    assert os.path.isdir(os.path.join(work_dir, "checkpoints", "epoch_1"))

    r2 = _run("test.py", cfg_path, "--checkpoint", work_dir,
              "--work_dir", work_dir, "--testset")
    assert r2.returncode == 0, r2.stderr[-4000:]
    assert "Evaluation MPJPE" in r2.stdout
