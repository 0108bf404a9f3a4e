"""Device-mesh sharding: data-parallel subjects x latent-parallel GP state.

The reference is strictly single-device (SURVEY.md §2: no torch.distributed,
no collectives).  This module is the TPU-native scaling story built in its
place (SURVEY.md §5 'distributed communication backend'):

  * mesh axes ('data', 'latent'): training batches shard whole subjects over
    'data'; the GP state (inducing points zt [L,M,Q], m [L,M,1], H [L,M,M],
    kernel params with leading L) shards the latent axis over 'latent'.
  * VAE params are replicated; XLA inserts the psums for the global masked
    moments in batch normalization and for the subject-sum accumulators of
    the KLD bound (they are tree-reductions over the data axis).

Multi-host: call ``jax.distributed.initialize()`` before building the mesh —
everything below is expressed against the global device list, so the same
code runs 1-chip, 1-host-N-chip, and N-host over ICI/DCN.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
LATENT_AXIS = "latent"


def make_mesh(n_data: Optional[int] = None, n_latent: int = 1,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = max(1, len(devices) // n_latent)
    devs = np.asarray(devices[: n_data * n_latent]).reshape(n_data, n_latent)
    return Mesh(devs, (DATA_AXIS, LATENT_AXIS))


def batch_sharding(mesh: Mesh) -> Dict[str, NamedSharding]:
    """Shardings for a padded subject-major batch: flat row arrays and the
    [S, T] validity mask both shard the subject axis."""
    row = NamedSharding(mesh, P(DATA_AXIS))
    return {"data": row, "mask": row, "theta_mask": row, "labels": row,
            "valid": row, "idx": row}


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh.get(k, NamedSharding(mesh, P())))
            for k, v in batch.items()}


GP_STATE_FIELDS = ("k0", "k1", "raw_noise", "zt", "m", "H")


def state_shardings(state, mesh: Mesh):
    """GP state (leading latent axis) shards over 'latent'; everything else
    (VAE params, step, rng) is replicated.  The Adam state mirrors the
    trainable dict {'vae','k0','k1','zt',...} — its GP leaves shard too."""
    rep = NamedSharding(mesh, P())
    lat = NamedSharding(mesh, P(LATENT_AXIS))

    def for_trainable_dict(d):
        return {k: jax.tree_util.tree_map(
            lambda _: lat if k in GP_STATE_FIELDS else rep, v)
            for k, v in d.items()}

    def opt_leafs(t):
        # optax.adam state: (ScaleByAdamState(count, mu, nu), EmptyState)
        return jax.tree_util.tree_map(
            lambda x: rep, t)

    repl = {f: jax.tree_util.tree_map(lambda _: rep, getattr(state, f))
            for f in state._fields}
    for f in GP_STATE_FIELDS:
        repl[f] = jax.tree_util.tree_map(lambda _: lat, getattr(state, f))
    # opt_state entries for GP trainables shard on latent where shapes allow;
    # replicating is also valid — jit will reshard as needed.
    repl["opt_state"] = opt_leafs(state.opt_state)
    return type(state)(**repl)


def shard_state(state, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, state_shardings(state, mesh))
