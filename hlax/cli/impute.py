"""Offline imputation CLI: fill missing values in a raw CSV with a trained model.

The reference has no serving-style entry point — its closest operation is
the HLVAETest battery (model_test.py:135-275), which encodes a dataset with
the q(z) mean, decodes, and converts likelihood params to per-type point
estimates (read_functions.py:268-339) — but it only reports errors, never
the imputed data itself.  This tool turns that exact path into a usable
product surface:

    python -m hlax.cli.impute --model_dir <save_path> \
        --data_csv data.csv [--mask_csv mask.csv] --out_csv imputed.csv \
        [--estimator mean|mode] [--early_stopping] [--ll_csv ll.csv]

``model_dir`` is a training run's save_path: its ``arguments.pkl`` supplies
the model/type configuration (the same round-trip the reference's eval-only
reruns use, HLVAE_main.py:52-76) and its orbax checkpoint supplies the
weights.  Observed cells pass through untouched; missing cells are filled
with the decoder's per-type point estimate, mapped back to the input CSV's
own value space:

  * cat/ordinal — the argmax class index is mapped through the column's
    sorted unique values, inverting the encoder's code assignment
    (hlax/data/reader.py::encode_raw);
  * count — the +1 shift the encoder applies to 0-based columns is undone;
  * real/pos/beta — the de-normalized estimate is already in data units.

``--ll_csv`` additionally writes per-row observed/missing log-density sums
(the quantities HLVAETest prints as Observed/Missing Density).
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
from typing import Optional

import numpy as np


def _load_arguments(model_dir: str) -> dict:
    path = os.path.join(model_dir, "arguments.pkl")
    if not os.path.isfile(path):
        raise FileNotFoundError(
            f"{path} not found — --model_dir must be a training run's "
            "save_path (the directory holding arguments.pkl and the orbax "
            "checkpoint)")
    with open(path, "rb") as f:
        return pickle.load(f)


def _restore_state_tree(model_dir: str, early_stopping: bool) -> dict:
    """Restore the TrainState pytree from the run's orbax checkpoint.

    Restores structure-free (no ``item=``) so no example batch / covariate
    width is needed; orbax stores the NamedTuple as a field-name-keyed dict
    ({vae, k0, k1, raw_noise, zt, m, H, ...})."""
    import orbax.checkpoint as ocp

    from hlax.train import checkpoint as ckpt

    name = ckpt.EARLY_BEST_NAME if early_stopping else ckpt.FINAL_NAME
    target = os.path.join(os.path.abspath(model_dir), name)
    if not os.path.isdir(target):
        raise FileNotFoundError(f"no checkpoint at {target}")
    tree = ocp.PyTreeCheckpointer().restore(target)
    if isinstance(tree, dict) and "vae" in tree:
        return tree
    if isinstance(tree, (list, tuple)):   # TrainState field order
        from hlax.train.step import TrainState
        return dict(zip(TrainState._fields, tree))
    raise ValueError(
        f"unrecognized checkpoint structure at {target}: {type(tree)}")


def _decode_discrete(col_raw: np.ndarray, codes: np.ndarray) -> np.ndarray:
    """Map predicted class indices back to the column's own values by
    inverting encode_raw's sorted-unique code assignment."""
    uniques = np.unique(col_raw[~np.isnan(col_raw)])
    if len(uniques) == 0:        # fully-missing column: keep the raw codes
        return codes
    idx = np.clip(codes.astype(int), 0, len(uniques) - 1)
    return uniques[idx]


def _gp_forward(model, vae, tree: dict, opt: dict, het, model_dir: str,
                label_csv: Optional[str], data, mask, tmask) -> dict:
    """Decode from the sparse-GP latent posterior at the rows' covariates."""
    import pickle as pkl

    import jax.numpy as jnp
    import pandas as pd

    from hlax.data.dataset import HEALTH_MNIST_LABEL_ORDER
    from hlax.eval.jits import decode_fn
    from hlax.eval.validate import gp_predict_dataset
    from hlax.gp.kernels import build_kernel_specs, noise_value
    from hlax.ops.normalization import batch_normalization

    if not label_csv:
        raise ValueError("--use_gp needs --label_csv (row covariates)")
    pv_path = os.path.join(model_dir, "plot_values.pkl")
    if not os.path.isfile(pv_path):
        raise FileNotFoundError(
            f"{pv_path} not found — GP mode needs the training run's "
            "encoded context (written at save time by the training CLI)")
    with open(pv_path, "rb") as f:
        train_x, train_mu = pkl.load(f)[:2]

    labels_df = pd.read_csv(label_csv, header=0)
    if het.n_variables == 1296:
        labels_df = labels_df[
            labels_df.columns.values[np.array(HEALTH_MNIST_LABEL_ORDER)]]
    labels = np.nan_to_num(labels_df.to_numpy(dtype=np.float64))

    spec0, spec1 = build_kernel_specs(
        opt.get("cat_kernel") or [], opt.get("bin_kernel") or [],
        opt.get("sqexp_kernel") or [], opt.get("cat_int_kernel") or [],
        opt.get("bin_int_kernel") or [],
        opt.get("covariate_missing_val") or [], opt["id_covariate"])
    noise = noise_value(jnp.asarray(tree["raw_noise"]),
                        opt.get("constrain_scales", False))
    idc = opt["id_covariate"]
    z = gp_predict_dataset(
        spec0, tree["k0"], spec1, tree["k1"], noise, jnp.asarray(tree["zt"]),
        np.asarray(train_x), np.asarray(train_mu),
        np.asarray(train_x)[:, idc], labels, labels[:, idc],
        opt.get("eps"))

    _, norm_params = batch_normalization(data, mask, het.layout,
                                         model.cfg.conv)
    log_p_x, log_p_x_missing, params, _ = decode_fn(model)(
        vae, jnp.asarray(z, model.cfg.dtype), data, mask, tmask, norm_params)
    return {"log_p_x": log_p_x, "log_p_x_missing": log_p_x_missing,
            "params": params}


def run_impute(model_dir: str, data_csv: str, out_csv: str,
               mask_csv: Optional[str] = None, types_csv: Optional[str] = None,
               estimator: str = "mean", early_stopping: bool = False,
               ll_csv: Optional[str] = None, seed: int = 0,
               device: str = "", use_gp: bool = False,
               label_csv: Optional[str] = None) -> np.ndarray:
    import ast

    import jax

    if device:
        # same semantics as the training CLI's --device: pin the jax
        # platform (the axon TPU plugin ignores the JAX_PLATFORMS env var,
        # so this must go through jax.config — NOTES.md)
        jax.config.update("jax_platforms", device)
    import jax.numpy as jnp

    from hlax.cli.main import _resolve_dtype
    from hlax.data.reader import _read_csv_matrix, read_data
    from hlax.eval import metrics as mx
    from hlax.eval.jits import forward_fn
    from hlax.models import HLVAE, HLVAEConfig

    opt = _load_arguments(model_dir)
    if types_csv is None:
        types_csv = os.path.join(opt["data_source_path"],
                                 opt["csv_types_file"])
    range_file = opt.get("csv_range_file")
    if range_file:
        range_file = os.path.join(opt["data_source_path"], range_file)

    het = read_data(data_csv, mask_csv, None, types_csv, range_file,
                    opt.get("logvar_network", False))
    raw = _read_csv_matrix(data_csv)
    if mask_csv is None:
        # no mask file: NaN cells are the missing ones
        mask_raw = (~np.isnan(raw)).astype(np.float64)
        het.mask = np.ascontiguousarray(mask_raw[:, het.layout.raw_perm])
        het.theta_mask = het.layout.expand_raw_to_theta(het.mask)

    hidden_layers = opt.get("hidden_layers") or "[500]"
    if isinstance(hidden_layers, str):
        hidden_layers = ast.literal_eval(hidden_layers)
    mcfg = HLVAEConfig(
        layout=het.layout, z_dim=opt["latent_dim"],
        h_dims=tuple(hidden_layers), y_dim=opt.get("y_dim") or 5,
        conv=opt.get("conv_hivae", False),
        logvar_network=opt.get("logvar_network", False),
        vy_init_real=opt.get("vy_init_real", 1.0),
        vy_init_pos=opt.get("vy_init_pos", 0.5),
        dtype=_resolve_dtype(opt.get("model_dtype", "float32")))
    model = HLVAE(mcfg)
    tree = _restore_state_tree(model_dir, early_stopping)
    vae = tree["vae"]

    dt = mcfg.dtype
    data = jnp.asarray(het.data, dt)
    mask = jnp.asarray(het.mask, dt)
    tmask = jnp.asarray(het.theta_mask, dt)
    if use_gp:
        # GP mode (the MSE_test_GPapprox path, model_test.py:19-133): latent
        # z comes from the sparse-GP posterior at the rows' covariates given
        # the training run's encoded context (plot_values.pkl), so rows the
        # encoder never saw — future timepoints, fully-missing rows — are
        # imputed by longitudinal extrapolation instead of q(z|x).
        out = _gp_forward(model, vae, tree, opt, het, model_dir, label_csv,
                          data, mask, tmask)
    else:
        out = forward_fn(model)(vae, data, mask, tmask,
                                jax.random.PRNGKey(seed), False)
    if estimator == "sample":
        # draw one posterior-predictive sample per cell (the reference heads'
        # `samples` output, loglik.py:68-254) instead of a point estimate
        est_grouped = mx.sampled_reconstruction(
            out["params"], het.layout, jax.random.PRNGKey(seed + 1), mcfg.conv)
    else:
        mean_rec, mode_rec = mx.statistics(out["params"], het.layout,
                                           mcfg.conv)
        est_grouped = mean_rec if estimator == "mean" else mode_rec
    est = np.asarray(est_grouped)[:, het.layout.raw_inv]   # original order

    layout = het.layout
    imputed = np.array(raw, dtype=np.float64)
    mask_orig = np.asarray(het.mask)[:, layout.raw_inv]
    n_filled = 0
    for j in range(raw.shape[1]):
        g = layout.groups[layout.raw_group_of_var[j]]
        col_est = est[:, j]
        if g.kind in ("cat", "ordinal"):
            col_est = _decode_discrete(raw[:, j], col_est)
        elif (g.kind == "count" and not np.all(np.isnan(raw[:, j]))
              and np.nanmin(raw[:, j]) == 0):
            # undo the encoder's +1 shift; rate estimates below the shift
            # floor (possible early in training) clamp to the domain edge
            col_est = np.maximum(col_est - 1.0, 0.0)
        missing = mask_orig[:, j] == 0
        imputed[missing, j] = col_est[missing]
        n_filled += int(missing.sum())

    np.savetxt(out_csv, imputed, delimiter=",", fmt="%.10g")
    print(f"Imputed {n_filled} missing cells across {raw.shape[0]} rows "
          f"-> {out_csv}")

    if ll_csv:
        lp = np.asarray(out["log_p_x"])
        lpm = np.asarray(out["log_p_x_missing"])
        m_np = np.asarray(het.mask)
        obs = (lp * m_np).sum(axis=1)
        mis = (lpm * (1 - m_np)).sum(axis=1)
        np.savetxt(ll_csv, np.column_stack([obs, mis]), delimiter=",",
                   header="observed_ll,missing_ll", comments="")
        print(f"Per-row log-densities -> {ll_csv}")
    return imputed


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Impute missing values in a raw CSV with a trained "
                    "hlax model (see module docstring)")
    p.add_argument("--model_dir", required=True,
                   help="training run's save_path (arguments.pkl + orbax "
                        "checkpoint)")
    p.add_argument("--data_csv", required=True)
    p.add_argument("--mask_csv", default=None,
                   help="observation mask CSV (2-col position list or full "
                        "matrix); default: NaN cells in data_csv are missing")
    p.add_argument("--types_csv", default=None,
                   help="types CSV; default: the training run's")
    p.add_argument("--out_csv", required=True)
    p.add_argument("--estimator", choices=["mean", "mode", "sample"],
                   default="mean",
                   help="point estimate per cell (mean/mode) or one "
                        "posterior-predictive sample (sample)")
    p.add_argument("--early_stopping", action="store_true",
                   help="restore the early_best checkpoint instead of final")
    p.add_argument("--ll_csv", default=None,
                   help="also write per-row observed/missing log-density sums")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--device", default="",
                   help="pin the jax platform, e.g. cpu / tpu (default: "
                        "jax's own device pick)")
    p.add_argument("--use_gp", action="store_true",
                   help="impute from the sparse-GP latent posterior at the "
                        "rows' covariates (needs --label_csv and the "
                        "training run's plot_values.pkl) instead of the "
                        "encoder posterior — handles rows the encoder never "
                        "saw, e.g. future timepoints")
    p.add_argument("--label_csv", default=None,
                   help="covariate CSV for the input rows (training label "
                        "format, with header); required with --use_gp")
    a = p.parse_args(argv)
    run_impute(a.model_dir, a.data_csv, a.out_csv, a.mask_csv, a.types_csv,
               a.estimator, a.early_stopping, a.ll_csv, a.seed, a.device,
               a.use_gp, a.label_csv)


if __name__ == "__main__":
    main()
