"""Dataset builder (det3d/datasets/builder.py parity)."""

from __future__ import annotations

from ..registry import DATASETS, build_from_cfg


def build_dataset(cfg: dict, default_args: dict | None = None):
    return build_from_cfg(dict(cfg), DATASETS, default_args)
