"""Dataset wrappers (det3d/datasets/dataset_wrappers.py:7-60 parity)."""

from __future__ import annotations

import bisect

import numpy as np

from ..registry import DATASETS


@DATASETS.register_module
class ConcatDataset:
    def __init__(self, datasets, **common):
        """``datasets``: dataset objects or config dicts; ``common`` keys
        (split / max_poses / device_preprocess from the builder) merge into
        every child config."""
        from .builder import build_dataset
        self.datasets = [build_dataset({**d, **common})
                         if isinstance(d, dict) else d for d in datasets]
        self.cumulative_sizes = np.cumsum([len(d) for d in self.datasets]).tolist()
        # flag-aware concat (reference dataset_wrappers.py:24-31): group
        # batching sees the concatenated aspect flags.  Explicitly None when
        # any child lacks them, so __getattr__ can't leak a wrong-length
        # flag array from child 0.
        flags = [getattr(d, "flag", None) for d in self.datasets]
        self.flag = (np.concatenate(flags)
                     if all(f is not None for f in flags) else None)

    def __getattr__(self, name):
        # delegate metadata lookups (norm window, evaluation) to the first child
        return getattr(self.datasets[0], name)

    def __len__(self):
        return self.cumulative_sizes[-1]

    def __getitem__(self, idx):
        ds_idx = bisect.bisect_right(self.cumulative_sizes, idx)
        if ds_idx > 0:
            idx = idx - self.cumulative_sizes[ds_idx - 1]
        return self.datasets[ds_idx][idx]


@DATASETS.register_module
class RepeatDataset:
    def __init__(self, dataset, times, **common):
        """``common`` keys (split / max_poses / device_preprocess from the
        builder) merge into the child config, as in ConcatDataset."""
        from .builder import build_dataset
        self.dataset = (build_dataset({**dataset, **common})
                        if isinstance(dataset, dict) else dataset)
        self.times = times
        self._ori_len = len(self.dataset)
        # flag-aware repeat (reference dataset_wrappers.py:49-55)
        child_flag = getattr(self.dataset, "flag", None)
        self.flag = (np.tile(child_flag, times)
                     if child_flag is not None else None)

    def __getattr__(self, name):
        return getattr(self.dataset, name)

    def __getitem__(self, idx):
        return self.dataset[idx % self._ori_len]

    def __len__(self):
        return self.times * self._ori_len
