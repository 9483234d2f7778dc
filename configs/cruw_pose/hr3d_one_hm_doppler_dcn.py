# DCN-head variant of the flagship doppler config: the pose head runs
# DCNSepHead (FeatureAdaption offset conv + deformable conv per branch,
# reference center_head.py:24-163).  The reference's DCN modules are 2-D
# and would crash on these 5-D radar features; here Z folds into the batch
# around the 2-D deformable ops (models/dcn_head.py), so dcn_head=True is
# actually runnable.  Dense train/eval paths (no sparse single-peak
# specialization for deformable sampling).
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
    RDR_TYPE="dzyx_real",  # 'zyx_real' | 'dzyx_real' | 'zyx_complex' | 'dzyx_complex'
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
        dtype="bfloat16",  # TPU compute dtype (params stay f32)
    ),
    pose_head=dict(
        type="CenterHead",
        tasks=tasks,
        in_channels=hr_final_conv_out,
        share_conv_channel=128,
        dataset="cruw_pose",
        weight=0.5,
        code_weights=[1.0] * 45,
        common_heads={"reg": (45, 2)},  # 15 keypoints x (x, y, z)
        dcn_head=True,
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
