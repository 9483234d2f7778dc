from .cruw_pose import CRUWPoseDataset, CubeGeometry
from .pipelines import Compose, AssignLabelPose, AssignLabelPose2
from .loader import (BatchLoader, DeviceCachedLoader, StreamingDeviceLoader,
                     shard_indices)
from .synthetic import generate_synthetic_dataset
from .builder import build_dataset
from .wrappers import ConcatDataset, RepeatDataset
from .factory import dataset_factory, get_dataset
from .point_cloud import PointCloudDataset
