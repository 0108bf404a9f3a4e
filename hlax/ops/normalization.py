"""Masked per-type batch normalization (pure function).

Semantics follow the reference ``batch_normalization``
(/root/reference/HL_VAE/utils.py:88-143):

  * real:    conv mode -> data/255 (no stats); else masked z-score with batch
             mean/var computed over observed entries only.
  * pos:     masked z-score of log1p(data); stats (mean_log, var_log) kept for
             the decoder's affine de-normalization.
  * count:   log(data) on observed entries, 0 elsewhere.
  * cat/ordinal/beta: masked passthrough.

All statistics are plain ``jnp.sum`` reductions over the batch axis, so under
pjit with the batch sharded across a mesh they are *global* moments (XLA
inserts the psum), which preserves the reference's full-batch semantics under
data parallelism (SURVEY.md §5).

Returns (normalized_data [B, n_exp], NormParams).  Division guards use a tiny
epsilon on mask counts instead of the reference's potential 0/0 NaN (only
differs when a column is entirely unobserved in the batch).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from hlax.types import TypeLayout


class NormParams(NamedTuple):
    # per real column (None in conv mode, matching utils.py:99-108)
    real_mean: Optional[jnp.ndarray]
    real_var: Optional[jnp.ndarray]
    # per pos column
    pos_mean_log: Optional[jnp.ndarray]
    pos_var_log: Optional[jnp.ndarray]


def batch_normalization(
    data: jnp.ndarray,          # [B, n_exp] grouped
    mask: jnp.ndarray,          # [B, n_raw] grouped
    layout: TypeLayout,
    conv: bool,
) -> tuple[jnp.ndarray, NormParams]:
    out_blocks = []
    real_mean = real_var = pos_mean_log = pos_var_log = None

    for g in layout.groups:
        d = data[:, g.exp_slice[0]:g.exp_slice[1]]
        m = mask[:, g.raw_slice[0]:g.raw_slice[1]]
        if g.kind == "real":
            obs = d * m
            if conv:
                blk = obs / 255.0
            else:
                cnt = jnp.maximum(m.sum(axis=0), 1e-12)
                mean = obs.sum(axis=0) / cnt
                var = (((obs - mean) * m) ** 2).sum(axis=0) / cnt
                blk = (obs - mean[None, :]) / jnp.sqrt(var + 1e-5) * m
                real_mean, real_var = mean, var
        elif g.kind == "pos":
            obs = d * m
            obs_log = jnp.log1p(obs)
            cnt = jnp.maximum(m.sum(axis=0), 1e-12)
            mean_log = (obs_log * m).sum(axis=0) / cnt
            var_log = (((obs_log - mean_log) * m) ** 2).sum(axis=0) / cnt
            var_log = jnp.clip(var_log, 1e-6, 1e20)
            blk = (obs_log - mean_log[None, :]) / jnp.sqrt(var_log + 1e-5) * m
            pos_mean_log, pos_var_log = mean_log, var_log
        elif g.kind == "count":
            obs = d * m
            # log of observed counts; exact zeros where unobserved (utils.py:118-120)
            blk = jnp.where(m > 0, jnp.log(jnp.maximum(obs, 1e-300)), 0.0)
        elif g.kind in ("cat", "ordinal"):
            m_exp = jnp.repeat(m, g.exp_per_var, axis=1)
            blk = d * m_exp
        else:   # beta
            blk = d * m
        out_blocks.append(blk)

    normalized = jnp.concatenate(out_blocks, axis=1)
    return normalized, NormParams(real_mean, real_var, pos_mean_log, pos_var_log)
