"""Parameter freezing (PoseNet.freeze / FrozenBatchNorm capability).

The reference freezes module trees in place and swaps BatchNorm for
FrozenBatchNorm (``models/detectors/pose_net.py`` + ``finetune_utils.py``).
In JAX, freezing is an optimizer concern: mask out updates for frozen
subtrees (``optax.masked``) — parameters stay exactly as loaded, which is
precisely FrozenBatchNorm semantics for affine params.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import optax


def freeze_mask(params: Any, frozen_prefixes: Sequence[str]) -> Any:
    """Pytree of bools: True = trainable, False = frozen.

    A leaf is frozen when any of ``frozen_prefixes`` appears in its
    '/'-joined key path (e.g. 'backbone_m' freezes the whole backbone).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def trainable(path):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        return not any(pref in key for pref in frozen_prefixes)

    leaves = {id(leaf): trainable(path) for path, leaf in flat}
    return jax.tree.map(lambda _: True, params) if not frozen_prefixes else \
        jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(params),
            [trainable(path) for path, _ in flat])


def split_frozen(optimizer: optax.GradientTransformation, params: Any,
                 frozen_prefixes: Sequence[str]) -> optax.GradientTransformation:
    """Wrap an optimizer so frozen subtrees receive zero updates."""
    mask = freeze_mask(params, frozen_prefixes)
    return optax.masked(optimizer, mask)
