"""Benchmark: Health-MNIST canonical-config training + imputation eval.

Prints TWO JSON lines {"metric", "value", "unit", "vs_baseline"}:
  1. train steps/sec/chip (canonical config, 30 measured steps), and
  2. imputation-eval samples/sec measured on a TRAINED model — after the
     timing window the same state is trained an extra TRAIN_STEPS steps
     (~300 epochs at canonical scale, the QUALITY.md convergence horizon)
     so the eval throughput is quoted at a converged ELBO, not at a random
     init (BASELINE.md "at matched ELBO"); the final net loss is attached.

Configuration matches the reference's canonical run
(/root/reference/config/hlvae_config_file.txt): Heterogeneous Health-MNIST
D4 (324 real + 972 cat(5) pixels), P=200 subjects x T=20, latent_dim=32,
M=120 inducing points, subjects_per_batch=20, conv encoder/decoder,
hidden [500], y_dim=5, type_KL=GPapprox_closed, natural_gradient=True,
constrain_scales=True.

Baseline: the reference cannot run here (gpytorch not installed), so
``baselines/torch_baseline.py`` measures a faithful plain-torch float64 CPU
replica of the same training step (the reference's own device story —
SURVEY.md §6).  Its steps/sec is cached in baselines/baseline_cpu.json.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "baselines", "baseline_cpu.json")

P_SUBJ, T, LATENT, M, S_BATCH = 200, 20, 32, 120, 20
EPOCHS_MEASURED = 30     # 10 steps/epoch at canonical scale -> 300 steps
# extra epochs before the eval measurement: enough to converge the bench
# workload (loss plateaus ~ep100); kept modest so the driver's bench stays
# fast even when the tunnel relay is degraded (NOTES.md)
TRAIN_EPOCHS = 100


def build():
    import jax
    jax.config.update("jax_enable_x64", True)   # f64 natural-gradient chain
    import jax.numpy as jnp

    from hlax.data.reader import encode_raw
    from hlax.data.dataset import (LongitudinalDataset, subject_batches,
                                   stage_dataset)
    from hlax.gp.kernels import build_kernel_specs
    from hlax.models import HLVAE, HLVAEConfig
    from hlax.train import step as tstep

    rng = np.random.default_rng(0)
    n = P_SUBJ * T
    types = ([{"type": "real", "dim": 1, "nclass": 1}] * 324
             + [{"type": "cat", "dim": 1, "nclass": 5}] * 972)
    raw = np.column_stack([
        rng.random((n, 324)) * 255,
        rng.integers(0, 5, (n, 972)).astype(float),
    ])
    miss = (rng.random((n, 1296)) > 0.25).astype(float)
    het = encode_raw(raw, types, miss_mask=miss)
    labels = np.zeros((n, 6))
    labels[:, 0] = np.tile(np.arange(T), P_SUBJ)                 # time_age
    labels[:, 1] = np.repeat(rng.integers(-9, 11, P_SUBJ), T)    # disease_time
    labels[:, 2] = np.repeat(np.arange(P_SUBJ), T)               # subject
    labels[:, 3] = np.repeat(rng.integers(0, 2, P_SUBJ), T)      # gender
    labels[:, 4] = np.repeat(rng.integers(0, 2, P_SUBJ), T)      # disease
    ds = LongitudinalDataset(het=het, labels=labels, id_covariate=2, conv=True)

    spec0, spec1 = build_kernel_specs(
        cat_kernel=[2], bin_kernel=[], sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2},
                        {"cont_covariate": 0, "cat_covariate": 3},
                        {"cont_covariate": 1, "cat_covariate": 4}],
        bin_int_kernel=[], covariate_missing_val=[], id_covariate=2)
    cfg = tstep.TrainConfig(latent_dim=LATENT, M=M, P_tot=float(P_SUBJ),
                            N_tot=float(n), id_covariate=2,
                            natural_gradient=True, constrain_scales=True,
                            gp_dtype=jnp.float32)
    mcfg = HLVAEConfig(layout=ds.layout, z_dim=LATENT, h_dims=(500,), y_dim=5,
                       conv=True, dtype=jnp.float32)
    model = HLVAE(mcfg)
    state = tstep.init_train_state(model, spec0, spec1,
                                   next(subject_batches(ds, S_BATCH)), cfg,
                                   seed=0)
    # the CLI training path: whole-epoch lax.scan over on-device gathered
    # batches, ONE dispatch per epoch (hlax/train/step.py make_train_epoch)
    epoch_fn = jax.jit(tstep.make_train_epoch(model, spec0, spec1, cfg),
                       donate_argnums=0)
    staged = stage_dataset(ds, jnp.float32)
    return epoch_fn, state, staged, model, het, ds


def main():
    import jax
    import jax.numpy as jnp
    from hlax.data.dataset import epoch_subject_batches

    epoch_fn, state, staged, model, het, ds = build()
    nb = (P_SUBJ + S_BATCH - 1) // S_BATCH
    rng = np.random.default_rng(0)

    def idx_mat():
        return jnp.asarray(np.stack(list(
            epoch_subject_batches(ds.P, S_BATCH, rng))))

    # warmup: compile + 2 epochs
    state, metrics = epoch_fn(state, staged, idx_mat())
    state, metrics = epoch_fn(state, staged, idx_mat())
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(EPOCHS_MEASURED):
        state, metrics = epoch_fn(state, staged, idx_mat())
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    steps_per_sec = EPOCHS_MEASURED * nb / dt

    baseline = {}
    if os.path.isfile(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f)
    train_base = baseline.get("steps_per_sec")

    print(json.dumps({
        "metric": "healthmnist_train_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / train_base, 2) if train_base else None,
    }), flush=True)

    # train to convergence so the eval metric is quoted at a real ELBO
    # (sync every few epochs: hundreds of queued async dispatches can wedge
    # a remote-device relay)
    for i in range(TRAIN_EPOCHS):
        state, metrics = epoch_fn(state, staged, idx_mat())
        if i % 10 == 9:
            jax.block_until_ready(metrics["loss"])
    jax.block_until_ready(metrics["loss"])
    final_loss = float(np.asarray(metrics["loss"])[-1])

    eval_throughput(model, state.vae, het,
                    baseline.get("eval_samples_per_sec"), final_loss)




def eval_throughput(model, params, het, eval_base=None, final_loss=None):
    """Secondary metric: imputation-eval samples/sec — full encode->decode +
    masked likelihoods on the canonical-shaped dataset (the reference's
    HLVAETest hot path, model_test.py:135-275), measured with the TRAINED
    parameters handed in by main()."""
    import jax
    import jax.numpy as jnp
    from hlax.eval.jits import forward_fn

    n = het.data.shape[0]
    key = jax.random.PRNGKey(0)
    data = jnp.asarray(het.data, jnp.float32)
    mask = jnp.asarray(het.mask, jnp.float32)
    tmask = jnp.asarray(het.theta_mask, jnp.float32)
    fwd = forward_fn(model)
    out = fwd(params, data, mask, tmask, key, False)
    jax.block_until_ready(out["log_p_x"])
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = fwd(params, data, mask, tmask, key, False)
    jax.block_until_ready(out["log_p_x"])
    dt = time.perf_counter() - t0
    rate = reps * n / dt
    print(json.dumps({
        "metric": "healthmnist_imputation_eval_samples_per_sec",
        "value": round(rate, 1),
        "unit": "samples/sec",
        "vs_baseline": round(rate / eval_base, 2) if eval_base else None,
        "net_loss_at_eval": round(final_loss, 2) if final_loss is not None
        else None,
    }), flush=True)


if __name__ == "__main__":
    main()
