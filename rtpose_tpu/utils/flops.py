"""Model complexity: parameter count and FLOP estimation.

Replaces the reference's hook-based MAC counter
(``det3d/utils/flops_counter.py:59-446``).  On JAX the compiler already
knows: ``jax.jit(fn).lower(...).cost_analysis()`` returns XLA's own flop
count for the exact compiled program — no per-module hooks needed.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax


def count_parameters(params: Any) -> int:
    """Total parameter count (torchie count_parameters parity)."""
    return int(sum(p.size for p in jax.tree.leaves(params)))


def estimate_flops(fn: Callable, *example_args) -> Optional[float]:
    """XLA-reported FLOPs for one call of ``fn(*example_args)``.

    Returns None when the backend does not report cost analysis.
    """
    try:
        lowered = jax.jit(fn).lower(*example_args)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return None
