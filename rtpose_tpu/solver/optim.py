"""Optimizer + LR schedule: fastai one-cycle Adam with true weight decay.

Parity targets (ipl-uw/RT-POSE):

* ``OneCycle`` schedule (``det3d/solver/learning_schedules_fastai.py:70-95``):
  cosine-anneal lr from ``lr_max/div_factor`` up to ``lr_max`` over the first
  ``pct_start`` of training, then down to ``(lr_max/div_factor)/1e4``;
  momentum (adam beta1) anneals ``moms[0] -> moms[1]`` then back.
* ``OptimWrapper`` true weight decay (``det3d/solver/fastai_optim.py:158-174``):
  ``p *= (1 - wd * lr)`` applied before the Adam step, decoupled from the
  gradient (AdamW-style), on ALL parameters (``bn_wd=True`` default).
* torch.optim.Adam step semantics with time-varying beta1: bias corrections
  use the *current* beta values (``1 - beta^t``), eps inside the sqrt-add.
* gradient clipping by global norm 35 before the step
  (``optimizer_config.grad_clip`` in the configs, applied by OptimizerHook).

Everything is a pure function of the integer step, so the whole optimizer
lives inside the single jitted train step.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax


def _annealing_cos(start, end, pct):
    cos_out = jnp.cos(jnp.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def one_cycle_values(step, total_steps: int, lr_max: float, moms=(0.95, 0.85),
                     div_factor: float = 10.0, pct_start: float = 0.4):
    """lr(step), mom(step) as traced values (step may be a jnp scalar).

    Phase boundary and normalization match LRSchedulerStep.step: phase 1 on
    [0, a1), phase 2 on [a1, total]; pct is (step-start)/(end-start).
    """
    a1 = int(total_steps * pct_start)
    a1 = max(a1, 1)
    low_lr = lr_max / div_factor
    step = jnp.asarray(step, jnp.float32)

    pct1 = step / a1
    # clamp: steps past total_steps hold the final annealed lr/mom instead
    # of cosine-wrapping back up.  The reference never runs past total, but
    # a mid-epoch preemption resume restarts the epoch with the saved step
    # count, so a completed run can overshoot by up to one epoch.
    pct2 = jnp.clip((step - a1) / max(total_steps - a1, 1), 0.0, 1.0)
    in_phase1 = step < a1
    lr = jnp.where(in_phase1,
                   _annealing_cos(low_lr, lr_max, pct1),
                   _annealing_cos(lr_max, low_lr / 1e4, pct2))
    mom = jnp.where(in_phase1,
                    _annealing_cos(moms[0], moms[1], pct1),
                    _annealing_cos(moms[1], moms[0], pct2))
    return lr, mom


def make_one_cycle_fns(total_steps, lr_max, moms=(0.95, 0.85), div_factor=10.0,
                       pct_start=0.4) -> Tuple[Callable, Callable]:
    def lr_fn(step):
        return one_cycle_values(step, total_steps, lr_max, moms, div_factor, pct_start)[0]

    def mom_fn(step):
        return one_cycle_values(step, total_steps, lr_max, moms, div_factor, pct_start)[1]

    return lr_fn, mom_fn


class AdamOneCycleState(NamedTuple):
    step: jnp.ndarray   # int32 global step
    mu: optax.Updates
    nu: optax.Updates


def adam_one_cycle(lr_fn: Callable, mom_fn: Callable | None = None,
                   beta2: float = 0.999, eps: float = 1e-8,
                   weight_decay: float = 0.01, grad_clip_norm: float | None = 35.0,
                   fixed_wd: bool = True) -> optax.GradientTransformation:
    """Adam with scheduled lr/beta1, decoupled true-wd, and grad clipping.

    The returned transformation's ``update(grads, state, params)`` produces
    deltas such that ``p + delta == p*(1 - wd*lr) - lr * mhat/(sqrt(vhat)+eps)``
    (fixed_wd=True, the flagship configs' setting).  With fixed_wd=False the
    decay rides the gradient (classic L2), matching the reference's
    ``true_wd=False`` branch.
    """

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdamOneCycleState(step=jnp.zeros((), jnp.int32), mu=zeros,
                                 nu=jax.tree.map(jnp.zeros_like, params))

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("adam_one_cycle requires params")
        step = state.step
        lr = lr_fn(step)
        b1 = mom_fn(step) if mom_fn is not None else 0.9
        t = (step + 1).astype(jnp.float32)

        if grad_clip_norm is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip_norm / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)

        if not fixed_wd and weight_decay:
            grads = jax.tree.map(lambda g, p: g + weight_decay * p, grads, params)

        mu = jax.tree.map(lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: beta2 * v + (1.0 - beta2) * jnp.square(g),
                          state.nu, grads)
        bc1 = 1.0 - jnp.power(b1, t)
        bc2 = 1.0 - jnp.power(beta2, t)

        def delta(p, m, v):
            upd = -lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            if fixed_wd and weight_decay:
                upd = upd - wd_scale * p
            return upd

        wd_scale = weight_decay * lr
        updates = jax.tree.map(delta, params, mu, nu)
        return updates, AdamOneCycleState(step=step + 1, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer_from_cfg(cfg, total_steps: int) -> optax.GradientTransformation:
    """Build from the reference config schema:

    ``optimizer = dict(type='adam', amsgrad=0.0, wd=0.01, fixed_wd=True, ...)``
    ``lr_config  = dict(type='one_cycle', lr_max=.002, moms=[.95,.85],
                        div_factor=10.0, pct_start=.4)``
    ``optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))``
    """
    opt_cfg = dict(cfg.optimizer)
    lr_cfg = dict(cfg.lr_config)
    clip = None
    oc = cfg.get("optimizer_config", None)
    if oc and oc.get("grad_clip"):
        clip = float(oc["grad_clip"]["max_norm"])

    assert opt_cfg.get("type", "adam") == "adam", "only adam is supported (reference parity)"
    assert lr_cfg.get("type", "one_cycle") == "one_cycle", "only one_cycle is supported"

    lr_fn, mom_fn = make_one_cycle_fns(
        total_steps=total_steps,
        lr_max=float(lr_cfg["lr_max"]),
        moms=tuple(lr_cfg.get("moms", (0.95, 0.85))),
        div_factor=float(lr_cfg.get("div_factor", 10.0)),
        pct_start=float(lr_cfg.get("pct_start", 0.4)),
    )
    fixed_wd = bool(opt_cfg.get("fixed_wd", True))
    # build_one_cycle_optimizer (apis/train.py:157-174): the fixed_wd branch
    # constructs Adam with betas=(0.9, 0.99) and OneCycle only re-sets
    # beta1, so beta2 stays 0.99; the non-fixed branch keeps torch's 0.999.
    return adam_one_cycle(
        lr_fn, mom_fn,
        beta2=0.99 if fixed_wd else 0.999,
        weight_decay=float(opt_cfg.get("wd", 0.01)),
        fixed_wd=fixed_wd,
        grad_clip_norm=clip,
    )
