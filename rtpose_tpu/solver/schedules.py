"""LR schedule family (LrUpdaterHook parity, hooks/lr_updater.py:10-175).

The reference carries fixed/step/exp/poly/inv/cosine schedules with
constant/linear/exp warmup (dormant — the active path uses OneCycle).
Here each is a pure function ``step -> lr`` composable with
``adam_one_cycle``'s ``lr_fn`` slot or any optax optimizer via
``optax.scale_by_schedule``.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp


def with_warmup(base_fn: Callable, warmup: Optional[str] = None,
                warmup_iters: int = 500, warmup_ratio: float = 1.0 / 3.0
                ) -> Callable:
    """Wrap a schedule with the reference's warmup modes."""
    if warmup is None:
        return base_fn

    def fn(step):
        lr = base_fn(step)
        k = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
        if warmup == "constant":
            w = lr * warmup_ratio
        elif warmup == "linear":
            w = lr * (1 - (1 - k) * (1 - warmup_ratio))
        elif warmup == "exp":
            w = lr * warmup_ratio ** (1 - k)
        else:
            raise ValueError(warmup)
        return jnp.where(step < warmup_iters, w, lr)

    return fn


def fixed_lr(base_lr: float) -> Callable:
    return lambda step: jnp.asarray(base_lr, jnp.float32)


def step_lr(base_lr: float, milestones: Sequence[int], gamma: float = 0.1) -> Callable:
    ms = jnp.asarray(sorted(milestones))

    def fn(step):
        exp = jnp.sum((jnp.asarray(step) >= ms).astype(jnp.int32))
        return base_lr * gamma ** exp.astype(jnp.float32)

    return fn


def exp_lr(base_lr: float, gamma: float) -> Callable:
    return lambda step: base_lr * gamma ** jnp.asarray(step, jnp.float32)


def poly_lr(base_lr: float, max_steps: int, power: float = 1.0,
            min_lr: float = 0.0) -> Callable:
    def fn(step):
        pct = jnp.clip(jnp.asarray(step, jnp.float32) / max_steps, 0.0, 1.0)
        return (base_lr - min_lr) * (1 - pct) ** power + min_lr

    return fn


def inv_lr(base_lr: float, gamma: float, power: float = 1.0) -> Callable:
    return lambda step: base_lr * (1 + gamma * jnp.asarray(step, jnp.float32)) ** (-power)


def cosine_lr(base_lr: float, max_steps: int, target_ratio: float = 0.0) -> Callable:
    target = base_lr * target_ratio

    def fn(step):
        pct = jnp.clip(jnp.asarray(step, jnp.float32) / max_steps, 0.0, 1.0)
        return target + 0.5 * (base_lr - target) * (jnp.cos(jnp.pi * pct) + 1)

    return fn


def exponential_decay_staircase(base_lr: float, total_steps: int,
                                decay_length: float, decay_factor: float
                                ) -> Callable:
    """solver/learning_schedules_fastai.py ExponentialDecay(staircase=True)."""
    def fn(step):
        stage = jnp.floor(jnp.asarray(step, jnp.float32)
                          / (decay_length * total_steps))
        return base_lr * decay_factor ** stage

    return fn


def manual_stepping(total_steps: int, boundaries: Sequence[float],
                    rates: Sequence[float]) -> Callable:
    """solver ManualStepping: fractional boundaries, explicit rates."""
    bs = jnp.asarray([b * total_steps for b in boundaries])
    rs = jnp.asarray(rates, jnp.float32)

    def fn(step):
        idx = jnp.sum((jnp.asarray(step) >= bs).astype(jnp.int32))
        return rs[idx]

    return fn


def piecewise_weight(base: float, early: Optional[float] = None,
                     early_steps: int = 0) -> Callable:
    """``step -> weight`` for a loss-balance term: ``early`` for the first
    ``early_steps`` optimizer steps, ``base`` afterwards (constant ``base``
    when ``early`` is None).  Used as ``make_train_step(loc_weight_fn=...)``
    to lift the regression loss out of the predict-the-mean basin before the
    shared backbone commits to the heatmap task (BASELINE.md, round-3
    960-frame stall study)."""
    if early is None:
        return lambda step: jnp.asarray(base, jnp.float32)

    def fn(step):
        return jnp.where(jnp.asarray(step) < early_steps,
                         jnp.float32(early), jnp.float32(base))

    return fn
