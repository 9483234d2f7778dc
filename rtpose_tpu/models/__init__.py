from .layers import SingleConv, ResNetBlock, GNConv, conv3d, group_norm
from .losses import fast_focal_loss, reg_loss, clamped_sigmoid, gather_feat
from .hrnet3d import HRNet3D, HighResolution3DNet, HighResolutionModule, MODEL_CONFIGS
from .center_head import CenterHead, SepHead
from .readers import (
    RadarFeatureNet,
    VoxelFeatureExtractorV3,
    PillarFeatureNet,
    PointPillarsScatter,
)
from .detectors import RadarPoseNet, build_detector
from .necks import RPN
from .voxelnet import VoxelNet
from .feat_transforms import PolarToCart
from .second_stage import BEVFeatureExtractor
from .roi_head import RoIHead, assign_roi_targets
from .dcn_head import DCNSepHead, FeatureAdaption
from .losses import jde_embedding_loss
from .distillation import Distillation
