# Flagship architecture on ONE 480-frame synthetic skeleton root: the
# training-dynamics trajectory gate (BASELINE.md process rule) — any change
# to normalization lowering or cache numerics must reproduce the escape
# (train loc << 47 by epoch ~30) on this 24k-step one-cycle before shipping.
# 480 frames / batch 8 = 60 steps/epoch x 400 epochs = 24k steps.
import itertools
import os

BATCH_SIZE = 8

tasks = [
    dict(num_class=1, class_names=["Pelvis"]),
]

class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))


def _dataset(root):
    # RTPOSE_CUBES_ARE_ROI=1 reads roots generated with --roi_only
    # (pre-cropped cubes, byte-equivalent content at ~6x less disk)
    return dict(
        DIR=dict(ROOT_DIR=root, META_FILE="file_meta.txt",
                 CUBES_ARE_ROI=os.environ.get(
                     "RTPOSE_CUBES_ARE_ROI", "0") == "1"),
        LABEL=dict(IS_CONSIDER_ROI=True, ROI_TYPE="roi1",
                   CONSIDER_RADAR_VISIBILITY=False),
        ROI=dict(roi1={"z": [-1.0875000000000021, 4.7125],
                       "y": [-5.0250000000000234, 5.024999999999931],
                       "x": [0.7703125, 8.0203125]}),
        RDR_TYPE="dzyx_real",
        RDR_CUBE=dict(IS_CONSIDER_ROI=True, ROI_TYPE="roi1",
                      GRID_SIZE=[0.0453125, 0.15703125, 0.3625],
                      NORMALIZING_VALUE=(150000, 200000)),
        DZYX=dict(IS_CONSIDER_ROI=True, ROI_TYPE="roi1",
                  GRID_SIZE=[0.0453125, 0.15703125, 0.3625],
                  NORMALIZING_VALUE=(0.0, 10.0), REDUCE_TYPE="none"),
        ENABLE_SENSOR=["RADAR"],
    )


DATASET = _dataset(os.environ.get("RTPOSE_DATA_ROOT", "/tmp/skel_data3"))

hr_final_conv_out = 128

model = dict(
    type="RadarPoseNet",
    pretrained=None,
    reader=dict(type="RadarFeatureNet"),
    backbone=dict(
        type="HRNet3D",
        backbone_cfg="hr_tiny_feat32_zyx_l4_in32",
        final_conv_in=sum([32, 32, 64, 64]),
        final_conv_out=hr_final_conv_out,
        final_fuse="conat_conv",
        ds_factor=1,
        dtype="bfloat16",
    ),
    pose_head=dict(
        type="CenterHead",
        tasks=tasks,
        in_channels=hr_final_conv_out,
        share_conv_channel=128,
        dataset="cruw_pose",
        weight=0.5,
        code_weights=[1.0] * 45,
        common_heads={"reg": (45, 2)},
        dcn_head=False,
        dtype="bfloat16",
    ),
    neck=None,
)

dataset_type = "CRUW_POSE_Dataset"

target_assigner = dict(tasks=tasks)
out_size_factor = [1, 1, 1]
assigner = dict(
    target_assigner=target_assigner,
    out_size_factor=out_size_factor,
    gaussian_overlap=0.1,
    max_poses=1,
    min_radius=2,
)
train_cfg = dict(assigner=assigner)

_roi = DATASET["ROI"]["roi1"]
test_cfg = dict(
    post_center_limit_range=[_roi["x"][0], _roi["y"][0], _roi["z"][0],
                             _roi["x"][1], _roi["y"][1], _roi["z"][1]],
    score_threshold=0.0,
    pc_range=[_roi["x"][0], _roi["y"][0], _roi["z"][0]],
    out_size_factor=out_size_factor,
    voxel_size=[0.0453125, 0.15703125, 0.3625],
    input_type="rdr_cube",
)

train_pipeline = []
test_pipeline = []

data = dict(
    samples_per_gpu=BATCH_SIZE,
    workers_per_gpu=2,
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
optimizer = dict(type="adam", amsgrad=0.0, wd=0.01, fixed_wd=True,
                 moving_average=False)
lr_config = dict(type="one_cycle", lr_max=0.002, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)

checkpoint_config = dict(interval=50)
log_config = dict(interval=40, hooks=[dict(type="TextLoggerHook")])

total_epochs = 400
device_ids = range(1)
log_level = "INFO"
work_dir = "./work_dirs/{}/".format(__file__[__file__.rfind("/") + 1:-3])
load_from = None
resume_from = None
workflow = [("train", 1)]
