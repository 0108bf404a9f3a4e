"""Longitudinal (sequence-axis) scaling: canonical training at T=20/50/100.

Honest protocol (NOTES.md round-3 rules): every timing syncs on a VALUE
FETCH (np.asarray) of the epoch metrics — `block_until_ready` through the
axon remote-device relay can return at enqueue and inflated the round-2
numbers quoted in earlier QUALITY.md revisions by ~10x.

Workload: the canonical config (P=200 subjects, subjects_per_batch=20,
latent 32, M=120, conv HLVAE, natural gradients, f32 solve-based chain)
with synthetic D4-shaped data whose longitudinal axis is stretched to T
timepoints per subject; the reference's analogous path is the per-subject
T x T Cholesky loop in elbo_functions.py:242-266, here the padded
[L, S, T, T] batched Cholesky inside the scanned epoch program.

Writes baselines/t_scaling.json: {T: {"steps_per_sec", "rows_per_sec"}}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
import numpy as np
import jax.numpy as jnp

from hlax.data.reader import encode_raw
from hlax.data.dataset import (LongitudinalDataset, subject_batches,
                               stage_dataset, epoch_subject_batches)
from hlax.gp.kernels import build_kernel_specs
from hlax.models import HLVAE, HLVAEConfig
from hlax.train import step as tstep


def run(T, P=200, S_BATCH=20, epochs=10):
    rng = np.random.default_rng(0)
    n = P * T
    types = ([{"type": "real", "dim": 1, "nclass": 1}] * 324
             + [{"type": "cat", "dim": 1, "nclass": 5}] * 972)
    raw = np.column_stack([rng.random((n, 324)) * 255,
                           rng.integers(0, 5, (n, 972)).astype(float)])
    het = encode_raw(raw, types,
                     miss_mask=(rng.random((n, 1296)) > 0.25).astype(float))
    labels = np.zeros((n, 6))
    labels[:, 0] = np.tile(np.arange(T), P)
    labels[:, 1] = np.repeat(rng.integers(-9, 11, P), T)
    labels[:, 2] = np.repeat(np.arange(P), T)
    labels[:, 3] = np.repeat(rng.integers(0, 2, P), T)
    labels[:, 4] = np.repeat(rng.integers(0, 2, P), T)
    ds = LongitudinalDataset(het=het, labels=labels, id_covariate=2, conv=True)
    spec0, spec1 = build_kernel_specs(
        [2], [], [0],
        [{"cont_covariate": 0, "cat_covariate": 2},
         {"cont_covariate": 0, "cat_covariate": 3},
         {"cont_covariate": 1, "cat_covariate": 4}], [], [], 2)
    cfg = tstep.TrainConfig(latent_dim=32, M=120, P_tot=float(P),
                            N_tot=float(n), id_covariate=2,
                            natural_gradient=True, constrain_scales=True,
                            gp_dtype=jnp.float32)
    mcfg = HLVAEConfig(layout=ds.layout, z_dim=32, h_dims=(500,), y_dim=5,
                       conv=True, dtype=jnp.float32)
    model = HLVAE(mcfg)
    state = tstep.init_train_state(model, spec0, spec1,
                                   next(subject_batches(ds, S_BATCH)), cfg,
                                   seed=0)
    epoch_fn = jax.jit(tstep.make_train_epoch(model, spec0, spec1, cfg),
                       donate_argnums=0)
    staged = stage_dataset(ds, jnp.float32)
    rng2 = np.random.default_rng(0)

    def idx():
        return jnp.asarray(
            np.stack(list(epoch_subject_batches(P, S_BATCH, rng2))))

    nb = P // S_BATCH
    state, m = epoch_fn(state, staged, idx())     # compile + warmup
    np.asarray(m["loss"])
    t0 = time.perf_counter()
    for _ in range(epochs):
        state, m = epoch_fn(state, staged, idx())
        np.asarray(m["loss"])                     # value fetch = completion
    dt = time.perf_counter() - t0
    sps = epochs * nb / dt
    # HBM staging footprint (VERDICT r05 ask #5 tail): the whole-dataset
    # [P, T, n_exp] device residency is the large-T memory cliff candidate
    staged_mb = sum(int(v.size) * v.dtype.itemsize
                    for v in staged.values()) / 2**20
    out = {"steps_per_sec": round(sps, 1),
           "rows_per_sec": round(sps * S_BATCH * T, 0),
           "staged_mb": round(staged_mb, 1),
           "final_loss": float(np.asarray(m["loss"])[-1])}
    print(f"T={T}: {out}", flush=True)
    return out


if __name__ == "__main__":
    import bench
    bench.wait_healthy_device_link()   # never time through a degraded relay
    # Beyond T=100 the subject batch shrinks with T (a real T=500
    # longitudinal study has few subjects; holding S_BATCH=20 would put a
    # 6.4 GB [32,20,500,500] block batch in HBM).  rows_per_sec stays the
    # comparable throughput metric.  T=200/500 exercise the mid-kernel
    # diagonal-block path of chol_inv_blocked (2x100 / 4x125 blocks).
    grid = [(20, 200, 20), (50, 200, 20), (100, 200, 20),
            (200, 40, 4), (500, 20, 2)]
    results = {str(T): run(T, P=P, S_BATCH=S) for T, P, S in grid}
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "t_scaling.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("wrote t_scaling.json", flush=True)
