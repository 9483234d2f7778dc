"""Dataset builder (det3d/datasets/builder.py parity).

Dataset ``type`` strings resolve through :mod:`rtpose_tpu.data.factory`, so
configs can name datasets either by registry key (``CRUW_POSE_Dataset``) or
by the factory's short names (``CRUW_POSE``, ``CRUW_POSE_LIDAR``, ...) —
the working form of the reference's broken ``dataset_factory.get_dataset``
(det3d/datasets/dataset_factory.py:1-11).
"""

from __future__ import annotations

from ..registry import DATASETS, build_from_cfg
from .factory import get_dataset


def build_dataset(cfg: dict, default_args: dict | None = None):
    cfg = dict(cfg)
    if isinstance(cfg.get("type"), str):
        cfg["type"] = get_dataset(cfg["type"])
    return build_from_cfg(cfg, DATASETS, default_args)
