"""Optimizer and schedules.

Contract from `/root/reference/main.py:100-115`:

- Adam (torch-style: L2 added to the gradient, not decoupled) with
  weight_decay 1e-4,
- two parameter groups: backbone ('base') trains at ``lr * base_lr_ratio``,
- ``OneCycleLR`` stepped per batch: cosine anneal with warmup
  (pct_start 0.3, div_factor 25, final_div_factor 1e4 — torch defaults) and
  inverse momentum cycling (torch maps momentum onto Adam's beta1:
  0.95 -> 0.85 -> 0.95).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import optax


def onecycle_lr_schedule(
    peak_lr: float, total_steps: int, pct_start: float = 0.3, div_factor: float = 25.0,
    final_div_factor: float = 1e4,
) -> Callable:
    initial = peak_lr / div_factor
    final = initial / final_div_factor
    # torch's phase boundaries: warmup ends at step pct_start*total - 1, the
    # cycle ends at step total - 1 (torch OneCycleLR._schedule_phases)
    warm_end = max(float(pct_start * total_steps) - 1.0, 1.0)
    cycle_end = max(float(total_steps) - 1.0, warm_end + 1.0)

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.minimum(jnp.asarray(step, jnp.float32), cycle_end)
        up = initial + (peak_lr - initial) * 0.5 * (1 - jnp.cos(math.pi * step / warm_end))
        frac_down = jnp.clip((step - warm_end) / (cycle_end - warm_end), 0.0, 1.0)
        down = final + (peak_lr - final) * 0.5 * (1 + jnp.cos(math.pi * frac_down))
        return jnp.where(step <= warm_end, up, down)

    return schedule


def onecycle_b1_schedule(
    total_steps: int, pct_start: float = 0.3, base_momentum: float = 0.85, max_momentum: float = 0.95
) -> Callable:
    warm_end = max(float(pct_start * total_steps) - 1.0, 1.0)
    cycle_end = max(float(total_steps) - 1.0, warm_end + 1.0)

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.minimum(jnp.asarray(step, jnp.float32), cycle_end)
        up = max_momentum + (base_momentum - max_momentum) * 0.5 * (1 - jnp.cos(math.pi * step / warm_end))
        frac_down = jnp.clip((step - warm_end) / (cycle_end - warm_end), 0.0, 1.0)
        down = base_momentum + (max_momentum - base_momentum) * 0.5 * (1 - jnp.cos(math.pi * frac_down))
        return jnp.where(step <= warm_end, up, down)

    return schedule


def _torch_adam(lr_schedule, b1_schedule, weight_decay: float) -> optax.GradientTransformation:
    chain = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
    chain += [
        optax.inject_hyperparams(optax.scale_by_adam)(b1=b1_schedule, b2=0.999, eps=1e-8),
        optax.scale_by_schedule(lambda s: -lr_schedule(s)),
    ]
    return optax.chain(*chain)


def build_optimizer(
    params,
    lr: float,
    total_steps: int,
    base_lr_ratio: float = 0.1,
    weight_decay: float = 1e-4,
    pct_start: float = 0.3,
    cycle_momentum: bool = True,
) -> optax.GradientTransformation:
    """Two-group torch-like Adam + OneCycle, labeled by top-level module name.

    Params whose top-level key is ``'base'`` (the backbone) get
    ``lr * base_lr_ratio`` (`main.py:100-104`).
    """
    lr_sched = onecycle_lr_schedule(lr, total_steps, pct_start)
    base_sched = onecycle_lr_schedule(lr * base_lr_ratio, total_steps, pct_start)
    b1 = onecycle_b1_schedule(total_steps, pct_start) if cycle_momentum else (lambda s: 0.9)

    def label(params_tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "base" if (path and getattr(path[0], "key", None) == "base") else "other",
            params_tree,
        )

    return optax.multi_transform(
        {"base": _torch_adam(base_sched, b1, weight_decay), "other": _torch_adam(lr_sched, b1, weight_decay)},
        label,
    )
