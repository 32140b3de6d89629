"""Checkpointing via orbax.

Improves on the reference's weights-only per-epoch ``torch.save``
(`/root/reference/main.py:142-147`): the full train state (params, optimizer
moments, batch stats, step) is saved so training resumes exactly; a
weights-only load path is kept for eval-only restores (the reference's
``--resume`` semantics, which reloads weights and tests).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, state, step: Optional[int] = None) -> str:
    ckpt_dir = os.path.abspath(ckpt_dir)
    step = int(state.step) if step is None else step
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        mngr.save(step, args=ocp.args.StandardSave({
            "params": state.params, "batch_stats": state.batch_stats, "opt_state": state.opt_state,
            "step": state.step,
        }))
        mngr.wait_until_finished()
    return os.path.join(ckpt_dir, str(step))


def restore_checkpoint(ckpt_dir: str, state, step: Optional[int] = None):
    """Restore a full train state saved by :func:`save_checkpoint`."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        step = mngr.latest_step() if step is None else step
        template = {
            "params": state.params, "batch_stats": state.batch_stats, "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = mngr.restore(step, args=ocp.args.StandardRestore(template))
    return state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )


def restore_weights(ckpt_dir: str, state, step: Optional[int] = None):
    """Weights-only restore (params + batch stats); optimizer state is fresh."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        step = mngr.latest_step() if step is None else step
        template = {
            "params": state.params, "batch_stats": state.batch_stats, "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = mngr.restore(step, args=ocp.args.StandardRestore(template))
    return state.replace(params=restored["params"], batch_stats=restored["batch_stats"])


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    with ocp.CheckpointManager(os.path.abspath(ckpt_dir)) as mngr:
        return mngr.latest_step()


_ = jax  # imported for side effects (device availability) when orbax saves
