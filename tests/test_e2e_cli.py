"""End-to-end CLI test: synthetic dataset -> tools/train.py -> tools/test.py.

Exercises the full public surface (config file, dataset loading, trainer,
checkpointing, resume pointer, evaluation report) on a small ROI grid so it
runs in seconds on the CPU backend.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_ROI = {"z": [-1.0875, 1.8125], "y": [-1.25625, 1.25625],
            "x": [0.7703125, 2.2203125]}  # -> grid (8, 16, 32)

CONFIG_TEMPLATE = '''
import os
tasks = [dict(num_class=1, class_names=["Pelvis"])]
class_names = ["Pelvis"]
DATASET = dict(
    DIR=dict(ROOT_DIR={root!r}, META_FILE="file_meta.txt"),
    LABEL=dict(IS_CONSIDER_ROI=True, ROI_TYPE="roi1",
               CONSIDER_RADAR_VISIBILITY=False),
    ROI=dict(roi1={roi!r}),
    RDR_TYPE="zyx_real",
    RDR_CUBE=dict(IS_CONSIDER_ROI=True, ROI_TYPE="roi1",
                  GRID_SIZE=[0.0453125, 0.15703125, 0.3625],
                  NORMALIZING_VALUE=(150000, 200000)),
    DZYX=dict(IS_CONSIDER_ROI=True, ROI_TYPE="roi1",
              GRID_SIZE=[0.0453125, 0.15703125, 0.3625],
              NORMALIZING_VALUE=(0.0, 10.0), REDUCE_TYPE="none"),
    ENABLE_SENSOR=["RADAR"],
)
model = dict(
    type="RadarPoseNet",
    reader=dict(type="RadarFeatureNet"),
    backbone=dict(type="HRNet3D", backbone_cfg="hr_tiny_feat16_zyx_l4",
                  final_conv_in=176, final_conv_out=64,
                  final_fuse="conat_conv", ds_factor=1),
    pose_head=dict(type="CenterHead", tasks=tasks, in_channels=64,
                   share_conv_channel=64, dataset="cruw_pose", weight=0.5,
                   code_weights=[1.0] * 45, common_heads={{"reg": (45, 2)}},
                   dcn_head=False),
    neck=None,
)
dataset_type = "CRUW_POSE_Dataset"
target_assigner = dict(tasks=tasks)
out_size_factor = [1, 1, 1]
assigner = dict(target_assigner=target_assigner, out_size_factor=out_size_factor,
                gaussian_overlap=0.1, max_poses=1, min_radius=2)
train_cfg = dict(assigner=assigner)
_r = DATASET["ROI"]["roi1"]
test_cfg = dict(
    post_center_limit_range=[_r["x"][0], _r["y"][0], _r["z"][0],
                             _r["x"][1], _r["y"][1], _r["z"][1]],
    score_threshold=0.0,
    pc_range=[_r["x"][0], _r["y"][0], _r["z"][0]],
    out_size_factor=out_size_factor,
    voxel_size=[0.0453125, 0.15703125, 0.3625],
    input_type="rdr_cube",
)
train_pipeline = []
test_pipeline = []
data = dict(
    samples_per_gpu=4, workers_per_gpu=1,
    train=dict(type=dataset_type, cfg=dict(DATASET=DATASET),
               label_file="Train.json", pipeline=train_pipeline,
               class_names=class_names),
    test=dict(type=dataset_type, cfg=dict(DATASET=DATASET),
              label_file="Test.json", pipeline=test_pipeline,
              class_names=class_names),
    val=dict(type=dataset_type, cfg=dict(DATASET=DATASET),
             label_file="Train.json", pipeline=test_pipeline,
             class_names=class_names),
)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
optimizer = dict(type="adam", amsgrad=0.0, wd=0.01, fixed_wd=True)
lr_config = dict(type="one_cycle", lr_max=0.008, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)
checkpoint_config = dict(interval=2)
log_config = dict(interval=1, hooks=[])
total_epochs = 2
log_level = "INFO"
workflow = [("train", 1)]
'''


@pytest.fixture(scope="module")
def e2e_env(tmp_path_factory):
    from rtpose_tpu.data import generate_synthetic_dataset
    root = str(tmp_path_factory.mktemp("e2e_data"))
    generate_synthetic_dataset(
        root, num_seqs=2, frames_per_seq=6, rdr_type="zyx_real",
        pelvis_range={"x": (1.0, 2.0), "y": (-1.0, 1.0), "z": (-0.5, 1.2)},
        offset_scale=(0.08, 0.08, 0.1), z_clip=(-1.0, 1.7))
    cfg_path = str(tmp_path_factory.mktemp("cfg") / "tiny.py")
    with open(cfg_path, "w") as f:
        f.write(CONFIG_TEMPLATE.format(root=root, roi=TINY_ROI))
    work_dir = str(tmp_path_factory.mktemp("work"))
    return root, cfg_path, work_dir


def run_tool(script, *args):
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", script), *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900)


class TestCLI:
    @pytest.mark.slow
    def test_train_then_test(self, e2e_env):
        root, cfg_path, work_dir = e2e_env
        r = run_tool("train.py", cfg_path, "--work_dir", work_dir, "--seed", "0")
        assert r.returncode == 0, r.stderr[-4000:]
        assert os.path.isfile(os.path.join(work_dir, "exp_config.py"))
        ckpts = os.path.join(work_dir, "checkpoints")
        assert os.path.isdir(os.path.join(ckpts, "epoch_2"))
        assert open(os.path.join(ckpts, "latest")).read() == "epoch_2"

        r2 = run_tool("test.py", cfg_path, "--checkpoint", work_dir,
                      "--work_dir", work_dir, "--testset", "--speed_test")
        assert r2.returncode == 0, r2.stderr[-4000:]
        assert "Evaluation MPJPE" in r2.stdout
        assert "Total time per frame" in r2.stdout
        # artifacts in reference format
        pred = os.path.join(work_dir, "work", "test_prediction.json")
        found = [os.path.join(dp, f) for dp, _, fs in os.walk(work_dir)
                 for f in fs if f == "test_prediction.json"]
        assert found, "missing test_prediction.json"
        preds = json.load(open(found[0]))
        seq0 = next(iter(preds.values()))
        frame0 = next(iter(seq0.values()))
        assert len(frame0["keypoints"]) == 15
        seq_results = [os.path.join(dp, f) for dp, _, fs in os.walk(work_dir)
                       for f in fs if f.endswith("_seq_results_test.json")]
        assert seq_results
        res = json.load(open(seq_results[0]))
        assert "ALL" in res
        assert np.isfinite(res["ALL"]["MPJPE"])

        # serving export from the same checkpoint (tools/export.py)
        artifact = os.path.join(work_dir, "model.jaxexp")
        r3 = run_tool("export.py", cfg_path, "--checkpoint", work_dir,
                      "--out", artifact, "--platforms", "cpu")
        assert r3.returncode == 0, r3.stderr[-4000:]
        assert os.path.getsize(artifact) > 0
        assert "exported" in r3.stdout

        # eval THROUGH the artifact must reproduce the live eval exactly
        r4 = run_tool("test.py", cfg_path, "--checkpoint", work_dir,
                      "--work_dir", os.path.join(work_dir, "exp_eval"),
                      "--testset", "--exported", artifact)
        assert r4.returncode == 0, r4.stderr[-4000:]
        live = [l for l in r2.stdout.splitlines()
                if l.startswith("Evaluation MPJPE")]
        served = [l for l in r4.stdout.splitlines()
                  if l.startswith("Evaluation MPJPE")]
        assert live and live == served, (live, served)

        # int8 serving path end-to-end: calibrate on val batches, export a
        # quantized artifact, evaluate through it (the accuracy delta vs the
        # float path is recorded on a trained checkpoint in BASELINE.md's
        # round-5 serving-variant MPJPE table — not asserted on this
        # 2-epoch model)
        artifact8 = os.path.join(work_dir, "model_int8.jaxexp")
        r5 = run_tool("export.py", cfg_path, "--checkpoint", work_dir,
                      "--out", artifact8, "--platforms", "cpu",
                      "--int8", "--calib_batches", "2")
        assert r5.returncode == 0, r5.stderr[-4000:]
        assert "int8 calibration" in r5.stdout
        assert os.path.getsize(artifact8) > 0
        r6 = run_tool("test.py", cfg_path, "--checkpoint", work_dir,
                      "--work_dir", os.path.join(work_dir, "int8_eval"),
                      "--testset", "--exported", artifact8)
        assert r6.returncode == 0, r6.stderr[-4000:]
        mpjpe8 = [l for l in r6.stdout.splitlines()
                  if l.startswith("Evaluation MPJPE")]
        assert mpjpe8 and np.isfinite(float(mpjpe8[0].split(":")[1]))

    @pytest.mark.slow
    def test_resume(self, e2e_env):
        root, cfg_path, work_dir = e2e_env
        if not os.path.isdir(os.path.join(work_dir, "checkpoints")):
            # self-sufficiency when run standalone (module fixture is shared
            # with test_train_then_test, which normally trains first)
            r0 = run_tool("train.py", cfg_path, "--work_dir", work_dir,
                          "--seed", "0")
            assert r0.returncode == 0, r0.stderr[-4000:]
        r = run_tool("train.py", cfg_path, "--work_dir", work_dir,
                     "--resume_from", os.path.join(work_dir, "checkpoints"),
                     "--total_epochs", "3")
        assert r.returncode == 0, r.stderr[-4000:]
        assert os.path.isdir(os.path.join(work_dir, "checkpoints", "epoch_3"))

    @pytest.mark.slow
    def test_multiperson_train_then_test(self, tmp_path_factory):
        """max_poses=2 CLI surface: frame-grouped loading, dense multi-pose
        train step, top-2 multi-peak decode, greedy-matching evaluation."""
        from rtpose_tpu.data import generate_synthetic_dataset
        root = str(tmp_path_factory.mktemp("mp2_data"))
        generate_synthetic_dataset(
            root, num_seqs=1, frames_per_seq=6, rdr_type="zyx_real", seed=5,
            pelvis_range={"x": (1.0, 2.1), "y": (-1.0, 1.0), "z": (-0.4, 1.0)},
            offset_scale=(0.06, 0.06, 0.08), z_clip=(-1.0, 1.7),
            persons_per_frame=2)
        cfg_path = str(tmp_path_factory.mktemp("mp2_cfg") / "tiny_mp2.py")
        with open(cfg_path, "w") as f:
            f.write(CONFIG_TEMPLATE.format(root=root, roi=TINY_ROI)
                    .replace("max_poses=1", "max_poses=2"))
        work_dir = str(tmp_path_factory.mktemp("mp2_work"))

        r = run_tool("train.py", cfg_path, "--work_dir", work_dir,
                     "--seed", "0")
        assert r.returncode == 0, r.stderr[-4000:]

        r2 = run_tool("test.py", cfg_path, "--checkpoint", work_dir,
                      "--work_dir", work_dir, "--testset")
        assert r2.returncode == 0, r2.stderr[-4000:]
        assert "Evaluation MPJPE" in r2.stdout
        found = [os.path.join(dp, f) for dp, _, fs in os.walk(work_dir)
                 for f in fs if f == "test_prediction.json"]
        assert found, "missing test_prediction.json"
        preds = json.load(open(found[0]))
        frame0 = next(iter(next(iter(preds.values())).values()))
        # two decoded people -> 2*15 keypoints in score-ordered groups
        assert len(frame0["keypoints"]) == 30
