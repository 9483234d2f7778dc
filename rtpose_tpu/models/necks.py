"""Necks: SECOND-style RPN 2-D conv pyramid.

Parity with the reference RPN (``det3d/models/necks/rpn.py:22-160``):
downsample blocks (ZeroPad+3x3 stride conv + N 3x3 convs, BN+ReLU) and
upsample deblocks (ConvTranspose for stride>1, strided conv for stride<1),
outputs concatenated on channels.  Channels-last (B, H, W, C); BatchNorm
follows the reference (the RPN path is the dormant det3d LiDAR inheritance;
the active radar path uses GroupNorm throughout).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..registry import NECKS


@NECKS.register_module
class RPN(nn.Module):
    layer_nums: Sequence[int] = (3, 5, 5)
    ds_layer_strides: Sequence[int] = (2, 2, 2)
    ds_num_filters: Sequence[int] = (128, 128, 256)
    us_layer_strides: Sequence[float] = (1, 2, 4)
    us_num_filters: Sequence[int] = (256, 256, 256)
    num_input_features: int = 128
    dtype: Any = None
    sync_bn_axis: str = None   # e.g. 'data': cross-replica BN stats via psum
                               # (NaiveSyncBatchNorm / apex syncBN parity)

    @property
    def downsample_factor(self) -> int:
        factor = int(np.prod(self.ds_layer_strides))
        if len(self.us_layer_strides) > 0:
            factor //= int(self.us_layer_strides[-1])
        return max(factor, 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert len(self.ds_layer_strides) == len(self.layer_nums)
        assert len(self.ds_num_filters) == len(self.layer_nums)
        assert len(self.us_num_filters) == len(self.us_layer_strides)
        up_start = len(self.layer_nums) - len(self.us_layer_strides)

        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                epsilon=1e-3, name=name, dtype=jnp.float32,
                                axis_name=self.sync_bn_axis)(h)

        ups = []
        for i, n_layers in enumerate(self.layer_nums):
            # block: strided 3x3 then n_layers 3x3
            x = nn.Conv(self.ds_num_filters[i], (3, 3),
                        strides=(self.ds_layer_strides[i],) * 2,
                        padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, name=f"block{i}_conv0")(x)
            x = nn.relu(bn(x, f"block{i}_bn0"))
            for j in range(n_layers):
                x = nn.Conv(self.ds_num_filters[i], (3, 3),
                            padding=((1, 1), (1, 1)), use_bias=False,
                            dtype=self.dtype, name=f"block{i}_conv{j + 1}")(x)
                x = nn.relu(bn(x, f"block{i}_bn{j + 1}"))
            k = i - up_start
            if k >= 0:
                stride = self.us_layer_strides[k]
                if stride > 1:
                    h = nn.ConvTranspose(self.us_num_filters[k],
                                         (int(stride),) * 2,
                                         strides=(int(stride),) * 2,
                                         use_bias=False, dtype=self.dtype,
                                         name=f"deblock{k}_deconv")(x)
                else:
                    s = int(round(1 / stride))
                    h = nn.Conv(self.us_num_filters[k], (s, s),
                                strides=(s, s), use_bias=False,
                                dtype=self.dtype, name=f"deblock{k}_conv")(x)
                h = nn.relu(bn(h, f"deblock{k}_bn"))
                ups.append(h)
        if ups:
            x = jnp.concatenate(ups, axis=-1)
        return x
