"""Train state construction."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct
from flax.training import train_state

from mvdetr_tpu.train.optim import build_optimizer


class TrainState(train_state.TrainState):
    batch_stats: Any = struct.field(default=None)


def create_train_state(
    model,
    sample_batch: dict,
    lr: float = 5e-4,
    total_steps: int = 1000,
    base_lr_ratio: float = 0.1,
    weight_decay: float = 1e-4,
    seed: int = 2021,
    backbone_variables: dict | None = None,
) -> TrainState:
    """Initialize parameters on a sample batch and build the optimizer.

    ``backbone_variables`` optionally carries converted pretrained weights
    (``{"params": ..., "batch_stats": ...}`` for the ``base`` module) — the
    analogue of torchvision's ImageNet init (`models/resnet.py:211-217`).
    """
    rng = jax.random.PRNGKey(seed)
    imgs = jnp.asarray(sample_batch["imgs"][:1])
    aff = jnp.asarray(sample_batch["affine_mats"][:1])
    variables = model.init({"params": rng, "dropout": rng}, imgs, aff, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    if backbone_variables is not None:
        loaded = jax.tree.map(jnp.asarray, backbone_variables["params"])
        _check_tree_match(params["base"], loaded, "params/base")
        params = dict(params)
        params["base"] = loaded
        if "batch_stats" in backbone_variables and backbone_variables["batch_stats"]:
            loaded_stats = jax.tree.map(jnp.asarray, backbone_variables["batch_stats"])
            _check_tree_match(batch_stats.get("base", {}), loaded_stats, "batch_stats/base")
            batch_stats = dict(batch_stats)
            batch_stats["base"] = loaded_stats

    tx = build_optimizer(params, lr, total_steps, base_lr_ratio, weight_decay)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx, batch_stats=batch_stats)


def load_full_variables(state: TrainState, variables: dict) -> TrainState:
    """Replace the full parameter/batch-stat trees with converted weights
    (e.g. a reference ``MultiviewDetector.pth`` via :mod:`mvdetr_tpu.interop`),
    shape-checked against the initialized model."""
    params = jax.tree.map(jnp.asarray, variables["params"])
    _check_tree_match(state.params, params, "params")
    stats = jax.tree.map(jnp.asarray, variables.get("batch_stats", {}))
    _check_tree_match(state.batch_stats or {}, stats, "batch_stats")
    return state.replace(params=params, batch_stats=stats)


def _check_tree_match(init_tree, loaded_tree, where: str) -> None:
    """Converted pretrained trees must match the initialized structure and
    shapes exactly — a silent mismatch would train from garbage."""
    init_shapes = jax.tree.map(jnp.shape, init_tree)
    loaded_shapes = jax.tree.map(jnp.shape, loaded_tree)
    if init_shapes != loaded_shapes:

        def flat(t):
            return {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_leaves_with_path(t)}

        a, b = flat(init_shapes), flat(loaded_shapes)
        diffs = sorted(set(a.items()) ^ set(b.items()))
        raise ValueError(f"pretrained {where} does not match the model: {diffs[:8]}")
