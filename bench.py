"""Benchmark: Health-MNIST canonical-config train steps/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

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
STEPS_MEASURED = 30


def build():
    import jax
    import jax.numpy as jnp

    from hlax.data.reader import encode_raw
    from hlax.data.dataset import LongitudinalDataset, subject_batches
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
    batches = list(subject_batches(ds, S_BATCH))
    state = tstep.init_train_state(model, spec0, spec1, batches[0], cfg, seed=0)
    step = jax.jit(tstep.make_train_step(model, spec0, spec1, cfg), donate_argnums=0)
    # pre-stage all batches in HBM (one host->device transfer total)
    dev_batches = [tstep.device_batch(b, jnp.float32) for b in batches]
    return step, state, dev_batches


def main():
    import jax

    step, state, dev_batches = build()
    nb = len(dev_batches)

    # warmup: compile + 2 steps
    state, metrics = step(state, dev_batches[0])
    state, metrics = step(state, dev_batches[1 % nb])
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(STEPS_MEASURED):
        state, metrics = step(state, dev_batches[i % nb])
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    steps_per_sec = STEPS_MEASURED / dt

    baseline = None
    if os.path.isfile(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f).get("steps_per_sec")
    vs_baseline = steps_per_sec / baseline if baseline else None

    print(json.dumps({
        "metric": "healthmnist_train_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }))




def eval_throughput():
    """Secondary metric: imputation-eval samples/sec — full encode->decode +
    masked likelihoods on the canonical-shaped dataset (the reference's
    HLVAETest hot path, model_test.py:135-275)."""
    import jax
    import jax.numpy as jnp
    from hlax.eval.jits import forward_fn
    from hlax.data.reader import encode_raw
    from hlax.data.dataset import LongitudinalDataset
    from hlax.models import HLVAE, HLVAEConfig

    rng = np.random.default_rng(0)
    n = P_SUBJ * T
    types = ([{"type": "real", "dim": 1, "nclass": 1}] * 324
             + [{"type": "cat", "dim": 1, "nclass": 5}] * 972)
    raw = np.column_stack([rng.random((n, 324)) * 255,
                           rng.integers(0, 5, (n, 972)).astype(float)])
    het = encode_raw(raw, types,
                     miss_mask=(rng.random((n, 1296)) > 0.25).astype(float))
    labels = np.zeros((n, 6))
    labels[:, 2] = np.repeat(np.arange(P_SUBJ), T)
    ds = LongitudinalDataset(het=het, labels=labels, id_covariate=2, conv=True)
    cfg = HLVAEConfig(layout=ds.layout, z_dim=LATENT, h_dims=(500,), y_dim=5,
                      conv=True, dtype=jnp.float32)
    model = HLVAE(cfg)
    key = jax.random.PRNGKey(0)
    data = jnp.asarray(het.data, jnp.float32)
    mask = jnp.asarray(het.mask, jnp.float32)
    tmask = jnp.asarray(het.theta_mask, jnp.float32)
    params = model.init(key, data[:40], mask[:40], tmask[:40], key)
    fwd = forward_fn(model)
    out = fwd(params, data, mask, tmask, key, False)
    jax.block_until_ready(out["log_p_x"])
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = fwd(params, data, mask, tmask, key, False)
    jax.block_until_ready(out["log_p_x"])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "healthmnist_imputation_eval_samples_per_sec",
        "value": round(reps * n / dt, 1),
        "unit": "samples/sec",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "eval":
        eval_throughput()
    else:
        main()
