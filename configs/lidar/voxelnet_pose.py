# LiDAR-branch experiment: point-cloud voxelization + VoxelNet (dense middle
# encoder + HRNet3D) + CenterPoint-style keypoint head (one_hm).
# Capability parity: the reference's LiDAR path —
# /root/reference/det3d/models/detectors/voxelnet.py:8-66 consuming the
# Preprocess/Voxelization pipeline at
# /root/reference/det3d/datasets/pipelines/pose.py:15-142.
import itertools
import os

BATCH_SIZE = 8

tasks = [
    dict(num_class=1, class_names=["Pelvis"]),
]

class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))

DATASET = dict(
    DIR=dict(
        ROOT_DIR=os.environ.get("RTPOSE_DATA_ROOT", "/mnt/nas_cruw_pose"),
        META_FILE="file_meta.txt",
        LIDAR_DIR="os2-64",
    ),
    LABEL=dict(
        IS_CONSIDER_ROI=True,
        ROI_TYPE="roi1",
        CONSIDER_RADAR_VISIBILITY=False,
    ),
    ROI=dict(
        roi1={"z": [-1.0875000000000021, 4.7125],
              "y": [-5.0250000000000234, 5.024999999999931],
              "x": [0.7703125, 8.0203125]},
    ),
    RDR_TYPE="zyx_real",
    RDR_CUBE=dict(
        IS_CONSIDER_ROI=True,
        ROI_TYPE="roi1",
        GRID_SIZE=[0.0453125, 0.15703125, 0.3625],  # meters, (x, y, z)
        NORMALIZING_VALUE=(150000, 200000),
    ),
    ENABLE_SENSOR=["LIDAR"],
)

_roi = DATASET["ROI"]["roi1"]
pc_range = [_roi["x"][0], _roi["y"][0], _roi["z"][0],
            _roi["x"][1], _roi["y"][1], _roi["z"][1]]
voxel_size = [0.0453125, 0.15703125, 0.3625]  # (x, y, z) -> grid (16, 64, 160)

model = dict(
    type="VoxelNet",
    pretrained=None,
    reader=dict(type="VoxelFeatureExtractorV3", num_input_features=4),
    backbone=dict(
        type="HRNet3D",
        backbone_cfg="hr_tiny_feat16_zyx_l4",
        final_conv_in=sum([16, 32, 64, 64]),
        final_conv_out=64,
        final_fuse="conat_conv",
        ds_factor=1,
        dtype="bfloat16",
    ),
    pose_head=dict(
        type="CenterHead",
        tasks=tasks,
        in_channels=64,
        share_conv_channel=64,
        dataset="cruw_pose",
        weight=0.5,
        code_weights=[1.0] * 45,
        common_heads={"reg": (45, 2)},  # 15 keypoints x (x, y, z)
        dcn_head=False,
        dtype="bfloat16",
    ),
    neck=None,
    grid_zyx=(16, 64, 160),
)

dataset_type = "CRUW_POSE_Lidar_Dataset"

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

test_cfg = dict(
    post_center_limit_range=pc_range,
    score_threshold=0.0,
    pc_range=pc_range[:3],
    out_size_factor=out_size_factor,
    voxel_size=voxel_size,
    input_type="lidar",
)

voxelization = dict(
    type="Voxelization",
    cfg=dict(range=pc_range, voxel_size=voxel_size,
             max_points_in_voxel=8, max_voxel_num=1024,
             max_num_points=2048),
)
train_pipeline = [
    dict(type="Preprocess", cfg=dict(shuffle_points=False, mode="train")),
    voxelization,
]
test_pipeline = [
    dict(type="Preprocess", cfg=dict(shuffle_points=False, mode="test")),
    voxelization,
]

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

checkpoint_config = dict(interval=5)
log_config = dict(interval=20, hooks=[dict(type="TextLoggerHook")])

total_epochs = 100
device_ids = range(1)
log_level = "INFO"
work_dir = "./work_dirs/{}/".format(__file__[__file__.rfind("/") + 1:-3])
load_from = None
resume_from = None
workflow = [("train", 1)]
