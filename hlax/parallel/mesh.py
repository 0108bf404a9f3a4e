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


def _dim0_fits(x, axis_size: int) -> bool:
    """GSPMD/device_put require the sharded dim to divide evenly; leaves
    whose leading dim doesn't divide fall back to replication."""
    shape = getattr(x, "shape", ())
    return len(shape) >= 1 and shape[0] % axis_size == 0


def batch_sharding(mesh: Mesh, batch: Optional[Dict[str, Any]] = None
                   ) -> Dict[str, NamedSharding]:
    """Shardings for a padded subject-major batch: flat row arrays and the
    [S, T] validity mask both shard the subject axis.  With a ``batch``
    template, non-divisible leaves (e.g. valid [S, T] when S doesn't divide
    the data axis) replicate instead."""
    row = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())
    sh = {"data": row, "mask": row, "theta_mask": row, "labels": row,
          "valid": row, "idx": row}
    if batch is not None:
        n = mesh.shape[DATA_AXIS]
        sh = {k: (sh.get(k, rep) if _dim0_fits(v, n) else rep)
              for k, v in batch.items()}
    return sh


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    sh = batch_sharding(mesh, batch)
    return {k: jax.device_put(v, sh.get(k, NamedSharding(mesh, P())))
            for k, v in batch.items()}


GP_STATE_FIELDS = ("k0", "k1", "raw_noise", "zt", "m", "H")


def state_shardings(state, mesh: Mesh):
    """GP state (leading latent axis) shards over 'latent'; everything else
    (VAE params, step, rng) is replicated.  The Adam state mirrors the
    trainable dict {'vae','k0','k1','zt',...} — its GP leaves (the mu/nu
    moments for zt, kernel params, and non-nat-grad m/H) shard on 'latent'
    too, so no [L,M,M]-sized Adam moment is duplicated per device."""
    rep = NamedSharding(mesh, P())
    lat = NamedSharding(mesh, P(LATENT_AXIS))
    n_lat = mesh.shape[LATENT_AXIS]

    repl = {f: jax.tree_util.tree_map(lambda _: rep, getattr(state, f))
            for f in state._fields}
    for f in GP_STATE_FIELDS:
        repl[f] = jax.tree_util.tree_map(
            lambda x: lat if _dim0_fits(x, n_lat) else rep, getattr(state, f))

    def opt_leaf(path, x):
        # optax.adam state: (ScaleByAdamState(count, mu, nu), EmptyState);
        # mu/nu are dicts keyed like the trainable dict — a leaf under a GP
        # field key shards on 'latent' when its leading dim divides the axis
        keys = {p.key for p in path
                if isinstance(p, jax.tree_util.DictKey)}
        if keys & set(GP_STATE_FIELDS) and _dim0_fits(x, n_lat):
            return lat
        return rep

    repl["opt_state"] = jax.tree_util.tree_map_with_path(
        opt_leaf, state.opt_state)
    return type(state)(**repl)


def shard_state(state, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, state_shardings(state, mesh))


def jit_train_step(step_fn, state, mesh: Mesh, batch, donate: bool = False):
    """jit the train step with EXPLICIT in/out shardings.

    Placement-only sharding (device_put the inputs, jit infers) leaves the
    steady-state layout to XLA's propagation choices; pinning in_shardings +
    out_shardings guarantees the GP state stays latent-sharded and the batch
    data-sharded across every step, so collectives stay where the design put
    them (psum over 'data' for the KLD accumulators and the normalization
    moments; none over 'latent').  Leaves whose leading dim doesn't divide
    the axis size (e.g. L=5 on a 2-device latent axis) replicate instead.

    ``step_fn``: the function from make_train_step.  ``state``: a template
    TrainState (for tree structure).  ``batch``: a template batch dict (for
    its key set).  Returns jitted ``step(state, batch) -> (state, metrics)``.
    """
    st_sh = state_shardings(state, mesh)
    rep = NamedSharding(mesh, P())
    in_b = batch_sharding(mesh, batch)
    return jax.jit(step_fn,
                   in_shardings=(st_sh, in_b),
                   out_shardings=(st_sh, rep),
                   donate_argnums=(0,) if donate else ())


def staged_shardings(mesh: Mesh, staged) -> Dict[str, NamedSharding]:
    """Shardings for a mesh-staged dataset [D, P_local, T, ...]: the leading
    device axis shards over 'data' (D == mesh data size by construction)."""
    row = NamedSharding(mesh, P(DATA_AXIS))
    return {k: row for k in staged}


def shard_staged(staged, mesh: Mesh):
    sh = staged_shardings(mesh, staged)
    return {k: jax.device_put(v, sh[k]) for k, v in staged.items()}


def jit_train_epoch(epoch_fn, state, mesh: Mesh, staged,
                    donate: bool = False):
    """jit the whole-epoch scan (make_train_epoch_mesh) with explicit in/out
    shardings: GP state on 'latent', the staged dataset's device axis on
    'data', the [nb, D, S_loc] index batches replicated.  One dispatch per
    EPOCH on the mesh — the per-step-dispatch data-parallel mode this
    replaces re-entered Python every batch, giving back the dispatch
    latency the epoch scan exists to kill."""
    st_sh = state_shardings(state, mesh)
    rep = NamedSharding(mesh, P())
    return jax.jit(epoch_fn,
                   in_shardings=(st_sh, staged_shardings(mesh, staged), rep),
                   out_shardings=(st_sh, rep),
                   donate_argnums=(0,) if donate else ())
