from .gaussian import (
    gaussian_radius,
    gaussian2d,
    gaussian3d,
    draw_gaussian3d,
    draw_point3d,
    dense_pose_heatmap,
)
from .targets import (
    PoseTargetSpec,
    assign_pose_targets_np,
    assign_pose_targets,
)
from .decode import decode_pose_preds, post_process_pose
from .metrics import pjpe, abs_pjpe
from . import kitti_eval
