"""Dataset factory (det3d/datasets/dataset_factory.py:1-11 parity).

The reference maps short dataset names to classes but is broken as shipped:
it imports ``.nuscenes`` / ``.waymo`` modules that do not exist in the fork.
This framework's factory covers the datasets that actually exist and
resolves late (registry lookup at call time) so it can never break imports.
"""

from __future__ import annotations

from ..registry import DATASETS

# short name -> registry key (reference keys "NUSC"/"WAYMO" have no classes
# behind them in the fork; the real surface is the CRUW family)
dataset_factory = {
    "CRUW_POSE": "CRUW_POSE_Dataset",
    "CRUW_POSE_LIDAR": "CRUW_POSE_Lidar_Dataset",
    "CONCAT": "ConcatDataset",
    "REPEAT": "RepeatDataset",
}


def get_dataset(dataset_name: str):
    """Return the dataset class for a short factory name or a registry key
    (reference ``get_dataset``, dataset_factory.py:10-11)."""
    key = dataset_factory.get(dataset_name, dataset_name)
    cls = DATASETS.get(key)
    if cls is None:
        known = sorted(set(list(dataset_factory) + list(DATASETS.module_dict)))
        raise KeyError(f"unknown dataset {dataset_name!r}; known: {known}")
    return cls
