"""Validation pass: full-set VAE metrics + DUBO GP loss + GP extrapolation.

Reference: ``validate`` (/root/reference/validation.py:78-260).  Same
structure and the same 10-row ``validation_results.csv`` output:

  1. full-set forward -> NLL + per-type reconstruction errors;
  2. GP loss via the deviance upper bound, computed per group of subjects
     with equal sequence length (validation.py:160-174) — note this is the
     reference's estimator, a sum of per-group bounds, not one joint bound;
  3. extrapolation check: condition on training mu + the first
     ``context_frames`` frames of each validation subject, predict z for all
     frames, decode, report GP reconstruction error.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import pandas as pd

from hlax.data.dataset import LongitudinalDataset
from hlax.eval import metrics as mx
from hlax.gp import elbo as gp_elbo
from hlax.gp import kernels as gp_kernels
from hlax.gp.predict import batch_predict_jit, build_test_pred_map
from hlax.eval.jits import decode_fn, encode_fn, forward_fn
from hlax.models.hlvae import nll_from_log_p
from hlax.ops.normalization import batch_normalization


# device-staged (data, mask, theta_mask) per dataset+dtype.  validate() and
# the CLI's encode-train pass run every validation_interval epochs; without
# this cache each call re-uploads the full expanded dataset host->device
# (~120 MB at canonical scale), which measured as 8.8 s of a 17.7 s
# validate() through the remote-device link.  Keyed by id() with a weakref
# finalizer (the dataclass is not hashable); entries die with the dataset.
_DEVICE_HET: dict = {}


def device_het(ds: LongitudinalDataset, dtype):
    import weakref

    key = id(ds)
    entry = _DEVICE_HET.get(key)
    if entry is None or entry[0]() is not ds:
        entry = (weakref.ref(ds, lambda _, k=key: _DEVICE_HET.pop(k, None)),
                 {})
        _DEVICE_HET[key] = entry
    per = entry[1]
    name = jnp.dtype(dtype).name
    if name not in per:
        het = ds.het
        per[name] = tuple(jnp.asarray(a, dtype)
                          for a in (het.data, het.mask, het.theta_mask))
    return per[name]


def encode_dataset(model, vae_params, ds: LongitudinalDataset,
                   chunk: int = 1000):
    """Full-dataset encoder pass in row chunks (normalization stats are
    per-chunk, as in the reference's batch-1000 GP-init pass,
    HLVAE_main.py:171-198).  Returns (mu [N, L], log_var [N, L]) numpy.

    Chunks are device-side slices of the staged dataset (device_het) —
    zero host->device payload on repeat calls."""
    dt = model.cfg.dtype
    n = len(ds)
    mus, lvs = [], []
    enc = encode_fn(model)
    data_d, mask_d, _ = device_het(ds, dt)

    for i in range(0, n, chunk):
        data = data_d[i:i + chunk]
        mask = mask_d[i:i + chunk]
        r = data.shape[0]
        if r < chunk:   # pad for a single compiled shape (device-side)
            data = jnp.pad(data, ((0, chunk - r), (0, 0)))
            mask = jnp.pad(mask, ((0, chunk - r), (0, 0)))
        mu, lv = enc(vae_params, data, mask)
        mus.append(np.asarray(mu)[:r])
        lvs.append(np.asarray(lv)[:r])
    return np.concatenate(mus), np.concatenate(lvs)


def forward_metrics(model, vae_params, ds: LongitudinalDataset, rng_seed=0):
    """Full-set forward -> nll sum, recon error sum, mu/log_var, like
    validation.py:103-135."""
    dt = model.cfg.dtype
    data, mask, tmask = device_het(ds, dt)
    out = forward_fn(model)(vae_params, data, mask, tmask,
                            jax.random.PRNGKey(rng_seed), True)
    nll = float(jnp.sum(nll_from_log_p(out["log_p_x"])))
    mean_rec, _ = mx.statistics(out["params"], ds.layout, ds.conv)
    truth = mx.discrete_transform(data, ds.layout)
    rec_obs, rec_mis, _ = mx.error_computation(
        truth, mean_rec, ds.layout, mask, conv=ds.conv,
        use_ranges=ds.use_ranges)
    return {
        "nll": nll,
        "recon_loss": float(jnp.sum(rec_obs)),
        "miss_recon_loss": float(jnp.sum(rec_mis)),
        "mu": np.asarray(out["mu"]),
        "log_var": np.asarray(out["log_var"]),
    }


def _bucket(n: int) -> int:
    """Next power of two >= n: eval-path group shapes pad to buckets so a
    genuinely ragged dataset compiles the heavy GP bounds O(log shapes)
    times instead of once per unique (S, T) — the bounds mask padding via
    ``valid``, so the values are unchanged (padding contributes exactly
    zero, tests/test_gp.py)."""
    return 1 << max(0, int(n) - 1).bit_length()


# Eval-side GP compute dtype switch (CLI --eval_gp_f64).  The default is the
# checkpoint dtype (float32): the round-3 whitened W factorization
# (gp/elbo.py::whitened_w_factor) removed the f32 NaNs on trained kernels
# (the direct factorization of W = K0zz + KziBK was the culprit), and the
# measured fidelity cost is 0.27% on the worst validation row at a 4.1x
# validate() speedup (baselines/eval_dtype_ab.json; bound enforced by
# tests/test_e2e.py::test_eval_gp_f32_matches_f64).  float64 remains the
# fidelity flag mirroring the reference's all-double evaluation.
EVAL_GP_F64 = False


def set_eval_gp_f64(enabled: bool) -> None:
    global EVAL_GP_F64
    EVAL_GP_F64 = bool(enabled)


def _eval_gp_dtype(zt):
    """float64 when enabled and available, else the checkpoint dtype."""
    import jax
    if EVAL_GP_F64 and jax.config.jax_enable_x64:
        return jnp.float64
    return zt.dtype


def _cast_gp(params, dt):
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, dt), params)


def gp_loss_sampled(spec0, k0, spec1, k1, noise, zt, ds: LongitudinalDataset,
                    mu, log_var, num_samples: int = 1, eps=None, seed=0):
    """type_KL='GPapprox' validation GP loss: negative sample-based sparse-GP
    marginal-likelihood bound averaged over Monte Carlo samples
    (validation.py:140-148)."""
    lengths = ds.subject_end - ds.subject_start
    gdt = _eval_gp_dtype(zt)
    k0, k1 = _cast_gp(k0, gdt), _cast_gp(k1, gdt)
    noise, zt = jnp.asarray(noise, gdt), jnp.asarray(zt, gdt)
    mu, log_var = np.asarray(mu, np.float64), np.asarray(log_var, np.float64)
    if eps is None:
        eps = gp_kernels.default_eps(gdt)
    key = jax.random.PRNGKey(seed)
    total = 0.0
    for s in range(num_samples):
        key, sub = jax.random.split(key)
        z_sample = mu + np.asarray(
            jax.random.normal(sub, mu.shape, gdt)) * np.exp(0.5 * log_var)
        for T in np.unique(lengths):
            sel = np.nonzero(lengths == T)[0]
            S = len(sel)
            Sb, Tb = _bucket(S), _bucket(T)
            x_st = np.zeros((Sb, Tb, ds.Q))
            y_st = np.zeros((Sb, Tb, mu.shape[1]))
            valid = np.zeros((Sb, Tb))
            for i, sj in enumerate(sel):
                a, b = ds.subject_start[sj], ds.subject_end[sj]
                x_st[i, :T], y_st[i, :T] = ds.labels[a:b], z_sample[a:b]
                valid[i, :T] = 1.0
            val = gp_elbo.sample_elbo_jit(
                spec0, k0, spec1, k1, noise, zt,
                jnp.asarray(x_st, gdt), jnp.asarray(valid, gdt),
                jnp.asarray(y_st, gdt), eps)
            total += -float(val)
    return total / num_samples


def gp_loss_dubo(spec0, k0, spec1, k1, noise, zt, ds: LongitudinalDataset,
                 mu, log_var, eps=None):
    """Sum of per-equal-T-group DUBOs (validation.py:160-174)."""
    lengths = ds.subject_end - ds.subject_start
    total = 0.0
    gdt = _eval_gp_dtype(zt)
    k0, k1 = _cast_gp(k0, gdt), _cast_gp(k1, gdt)
    noise, zt = jnp.asarray(noise, gdt), jnp.asarray(zt, gdt)
    if eps is None:
        eps = gp_kernels.default_eps(gdt)
    for T in np.unique(lengths):
        sel = np.nonzero(lengths == T)[0]
        S = len(sel)
        # per-equal-T groups preserved (the reference's estimator is a SUM
        # of per-group bounds, not one joint bound); only the shapes pad
        Sb, Tb = _bucket(S), _bucket(T)
        x_st = np.zeros((Sb, Tb, ds.Q))
        mu_st = np.zeros((Sb, Tb, mu.shape[1]))
        lv_st = np.zeros((Sb, Tb, mu.shape[1]))
        valid = np.zeros((Sb, Tb))
        for i, s in enumerate(sel):
            a, b = ds.subject_start[s], ds.subject_end[s]
            x_st[i, :T], mu_st[i, :T], lv_st[i, :T] = (
                ds.labels[a:b], mu[a:b], log_var[a:b])
            valid[i, :T] = 1.0
        val = gp_elbo.deviance_upper_bound_jit(
            spec0, k0, spec1, k1, noise, zt,
            jnp.asarray(x_st, gdt), jnp.asarray(valid, gdt),
            jnp.asarray(mu_st, gdt), jnp.asarray(lv_st, gdt), eps)
        total += float(val)
    return total


def gp_predict_dataset(spec0, k0, spec1, k1, noise, zt,
                       pred_x: np.ndarray, pred_mu: np.ndarray,
                       pred_subject_col: np.ndarray,
                       test_x: np.ndarray, test_subject_col: np.ndarray,
                       eps=None) -> np.ndarray:
    """Z prediction at test covariates given (pred_x, pred_mu) context.

    Host-side packing of the per-subject padded structures + one device call
    (replaces the subject loops of utils.py:137-188)."""
    gdt = _eval_gp_dtype(zt)
    k0, k1 = _cast_gp(k0, gdt), _cast_gp(k1, gdt)
    noise, zt = jnp.asarray(noise, gdt), jnp.asarray(zt, gdt)
    if eps is None:
        eps = gp_kernels.default_eps(gdt)
    L = zt.shape[0]
    # pack prediction rows subject-major (order of first appearance);
    # bucket-padded shapes so ragged datasets compile O(buckets) times
    _, first = np.unique(pred_subject_col, return_index=True)
    subj = pred_subject_col[np.sort(first)]
    rows = [np.nonzero(pred_subject_col == s)[0] for s in subj]
    Tp = _bucket(max(len(r) for r in rows))
    Sp = _bucket(len(subj))
    x_st = np.zeros((Sp, Tp, pred_x.shape[1]))
    mu_st = np.zeros((Sp, Tp, L))
    valid = np.zeros((Sp, Tp))
    flat_of = np.full((Sp, Tp), 0, dtype=np.int64)
    for i, r in enumerate(rows):
        x_st[i, :len(r)] = pred_x[r]
        mu_st[i, :len(r)] = pred_mu[r]
        valid[i, :len(r)] = 1
        flat_of[i, :len(r)] = np.arange(i * Tp, i * Tp + len(r))

    # map test rows to their subject's prediction rows
    test_subjects, t_first = np.unique(test_subject_col, return_index=True)
    test_subjects = test_subject_col[np.sort(t_first)]
    pred_flat_subj = np.zeros(Sp * Tp)
    for i, s in enumerate(subj):
        pred_flat_subj[i * Tp:(i + 1) * Tp] = s
    # padded pred rows must never match a test subject: mark with NaN-ish id
    pad_rows = (valid.reshape(-1) == 0)
    pred_flat_subj[pad_rows] = np.nan
    idx, val = build_test_pred_map(pred_flat_subj, test_subjects)
    sub_index = {s: i for i, s in enumerate(test_subjects)}
    test_subj_of_row = np.asarray([sub_index[s] for s in test_subject_col])

    z = batch_predict_jit(
        spec0, k0, spec1, k1, noise, zt,
        jnp.asarray(x_st, gdt), jnp.asarray(valid, gdt), jnp.asarray(mu_st, gdt),
        jnp.asarray(test_x, gdt), idx, val, test_subj_of_row, eps)
    return np.asarray(z)


def validate(model, vae_params, spec0, k0, spec1, k1, noise, zt,
             val_ds: LongitudinalDataset,
             train_mu: np.ndarray, train_x: np.ndarray,
             id_covariate: int, results_path: Optional[str],
             context_frames: Optional[int] = None,
             type_KL: str = "GPapprox_closed", num_samples: int = 1,
             eps: Optional[float] = None) -> pd.DataFrame:
    """Full validation pass -> 10-row results frame (validation.py:246-259).

    ``eps=None`` lets each GP helper pick the jitter for its own compute
    dtype (the eval bounds upcast to float64, see _eval_gp_dtype)."""
    fm = forward_metrics(model, vae_params, val_ds)
    nll_loss_sum = fm["nll"]
    recon_loss_sum = float(fm["recon_loss"])
    if type_KL == "GPapprox":
        gp_loss_sum = gp_loss_sampled(spec0, k0, spec1, k1, noise, zt,
                                      val_ds, fm["mu"], fm["log_var"],
                                      num_samples, eps)
    else:
        gp_loss_sum = gp_loss_dubo(spec0, k0, spec1, k1, noise, zt, val_ds,
                                   fm["mu"], fm["log_var"], eps)
    net_loss_sum = gp_loss_sum + nll_loss_sum

    # --- GP extrapolation check (validation.py:182-244) ------------------
    k = context_frames if context_frames is not None else (5 if val_ds.conv else 2)
    ctx_rows = np.concatenate([
        np.arange(val_ds.subject_start[s],
                  min(val_ds.subject_start[s] + k, val_ds.subject_end[s]))
        for s in range(val_ds.P)])
    pred_x = np.concatenate([train_x, val_ds.labels[ctx_rows]])
    pred_mu = np.concatenate([train_mu, fm["mu"][ctx_rows]])
    test_x = val_ds.labels
    z_pred = gp_predict_dataset(
        spec0, k0, spec1, k1, noise, zt,
        pred_x, pred_mu, pred_x[:, id_covariate],
        test_x, test_x[:, id_covariate], eps)

    dt = model.cfg.dtype
    data, mask, tmask = device_het(val_ds, dt)
    norm_data, norm_params = batch_normalization(data, mask, val_ds.layout,
                                                 val_ds.conv)
    log_p_x, _, params, _ = decode_fn(model)(
        vae_params, jnp.asarray(z_pred, dt), data, mask, tmask, norm_params)
    mean_rec, _ = mx.statistics(params, val_ds.layout, val_ds.conv)
    truth = mx.discrete_transform(data, val_ds.layout)
    gp_obs, gp_mis, _ = mx.error_computation(
        truth, mean_rec, val_ds.layout, mask, conv=val_ds.conv,
        use_ranges=val_ds.use_ranges)
    recon_loss_GP = float(jnp.sum(gp_obs))
    miss_recon_loss_GP = float(jnp.sum(gp_mis))
    n_vars = val_ds.layout.n_raw

    results = [
        recon_loss_sum / len(val_ds),
        recon_loss_GP / n_vars,
        0.0,                                  # vae_mse placeholder (reference keeps 0)
        fm["miss_recon_loss"] / len(val_ds),
        miss_recon_loss_GP / n_vars,
        net_loss_sum,
        gp_loss_sum,
        nll_loss_sum,
        recon_loss_sum,
        recon_loss_GP,
    ]
    df = pd.DataFrame(results, index=[
        "vae_error", "GP_error", "vae_mse", "miss_vae_error", "miss_GP_error",
        "net_loss", "GP_loss", "nll_loss", "recon_loss_sum",
        "GP_recon_loss_sum"])
    if results_path:
        os.makedirs(results_path, exist_ok=True)
        df.to_csv(os.path.join(results_path, "validation_results.csv"),
                  header=False)
    return df
