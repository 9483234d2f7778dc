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
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def trainable(path) -> bool:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        return not any(pref in key for pref in frozen_prefixes)

    return jax.tree_util.tree_unflatten(
        treedef, [trainable(path) for path, _ in flat])


def split_frozen(optimizer: optax.GradientTransformation, params: Any,
                 frozen_prefixes: Sequence[str]) -> optax.GradientTransformation:
    """Wrap an optimizer so frozen subtrees receive zero updates.

    (optax.masked alone passes masked leaves through UNchanged — the raw
    gradient would still be applied; multi_transform routes frozen leaves
    to set_to_zero instead.)
    """
    mask = freeze_mask(params, frozen_prefixes)
    labels = jax.tree.map(lambda t: "trainable" if t else "frozen", mask)
    return optax.multi_transform(
        {"trainable": optimizer, "frozen": optax.set_to_zero()}, labels)
