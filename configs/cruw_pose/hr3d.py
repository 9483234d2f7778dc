# HRRadarPose: per-joint heatmaps (15 classes) + 3-dim offsets.
# Schema parity: /root/reference/configs/cruw_pose/hr3d.py
import itertools
import os

BATCH_SIZE = 8

tasks = [
    dict(num_class=15, class_names=['Pelvis', 'RHip', 'RKnee', 'RAnkle', 'LHip', 'LKnee', 'LAnkle', 'Torso', 'Neck', 'Head', 'LShoulder', 'LElbow', 'LWrist', 'RShoulder', 'RElbow']),
]

class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))

DATASET = dict(
    DIR=dict(
        ROOT_DIR=os.environ.get("RTPOSE_DATA_ROOT", "/mnt/nas_cruw_pose"),
        META_FILE="file_meta.txt",
        KEYPOINT_META="Keypoints_meta.txt",
    ),
    LABEL=dict(
        IS_CONSIDER_ROI=True,
        ROI_TYPE="roi1",
        ROI_DEFAULT=[],
        IS_CHECK_VALID_WITH_AZIMUTH=False,
        MAX_AZIMUTH_DEGREE=[-50, 50],
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
    DZYX=dict(
        IS_CONSIDER_ROI=True,
        ROI_TYPE="roi1",
        GRID_SIZE=[0.0453125, 0.15703125, 0.3625],
        NORMALIZING_VALUE=(0.0, 10.0),
        REDUCE_TYPE="none",
    ),
    ENABLE_SENSOR=["RADAR"],
)

# reference hr3d.py:52-78: 'top' fuse (branch-0 only, 32ch), share 32,
# weight 0.2, per-axis code_weights
hr_final_conv_out = 32

model = dict(
    type="RadarPoseNet",
    pretrained=None,
    reader=dict(type="RadarFeatureNet"),
    backbone=dict(
        type="HRNet3D",
        backbone_cfg="hr_tiny_feat32_zyx_l4",
        final_conv_in=32,
        final_conv_out=hr_final_conv_out,
        final_fuse="top",
        ds_factor=1,
        dtype="bfloat16",  # TPU compute dtype (params stay f32)
    ),
    pose_head=dict(
        type="CenterHead",
        tasks=tasks,
        in_channels=hr_final_conv_out,
        share_conv_channel=32,
        dataset="cruw_pose",
        weight=0.2,
        code_weights=[1.0, 1.5, 2.0],
        common_heads={"reg": (3, 2)},  # per-joint (x, y, z) offset
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
    min_radius=1,
    consider_radar_visibility=DATASET["LABEL"]["CONSIDER_RADAR_VISIBILITY"],
)

train_cfg = dict(assigner=assigner)

test_cfg_range = DATASET["ROI"][DATASET["LABEL"]["ROI_TYPE"]]
test_cfg = dict(
    post_center_limit_range=[test_cfg_range["x"][0], test_cfg_range["y"][0],
                             test_cfg_range["z"][0], test_cfg_range["x"][1],
                             test_cfg_range["y"][1], test_cfg_range["z"][1]],
    circular_nms=True,
    nms=dict(
        use_rotate_nms=False,
        use_multi_class_nms=False,
        nms_pre_max_size=1,
        nms_post_max_size=1,
        nms_iou_threshold=0.1,
    ),
    score_threshold=0.0,
    pc_range=[test_cfg_range["x"][0], test_cfg_range["y"][0], test_cfg_range["z"][0]],
    out_size_factor=out_size_factor,
    voxel_size=[0.0453125, 0.15703125, 0.3625],
    input_type="rdr_cube",
)

assigner_mode = "per_joint"  # AssignLabelPose semantics (per-joint heatmaps)
train_pipeline = []  # targets are assigned on-device inside the train step
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

checkpoint_config = dict(interval=5)
log_config = dict(interval=20, hooks=[dict(type="TextLoggerHook"),
                                      dict(type="TensorboardLoggerHook")])

total_epochs = 100
device_ids = range(1)
log_level = "INFO"
work_dir = "./work_dirs/{}/".format(__file__[__file__.rfind("/") + 1:-3])
load_from = None
resume_from = None
workflow = [("train", 1)]
