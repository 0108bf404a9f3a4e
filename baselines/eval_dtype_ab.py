"""Eval-GP-dtype A/B on a TRAINED canonical checkpoint (TPU).

Measures the full ``validate()`` pass (forward metrics + DUBO + GP
extrapolation predict + decode) with the eval-side GP bounds in float64
(the reference-fidelity default) vs float32 via the whitened W
factorization (gp/elbo.py::whitened_w_factor), on a real trained
checkpoint — the conditioning regime where pre-whitening float32 NaN'd.

Usage: python baselines/eval_dtype_ab.py <save_path-of-trained-run>
Writes baselines/eval_dtype_ab.json.

Timing protocol: each validate() call is timed wall-to-wall (it is a
host-side orchestration of several jitted programs, each of which
materializes values, so wall time IS value-fetch-synced); the first call
per dtype is discarded as compile warmup.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(model_dir: str, device: str = ""):
    import jax
    if device:
        # the axon TPU plugin ignores JAX_PLATFORMS; this works (NOTES.md)
        jax.config.update("jax_platforms", device)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from hlax.cli.impute import _load_arguments, _restore_state_tree
    from hlax.data.dataset import load_dataset
    from hlax.eval import validate as val
    from hlax.gp.kernels import build_kernel_specs, noise_value
    from hlax.models import HLVAE, HLVAEConfig

    opt = _load_arguments(model_dir)
    tree = _restore_state_tree(model_dir, early_stopping=False)

    src = opt["data_source_path"]
    train_ds = load_dataset(
        src, opt["csv_file_data"], opt["csv_file_label"], opt["mask_file"],
        opt["csv_types_file"], id_covariate=opt["id_covariate"],
        conv=opt["conv_hivae"])
    val_ds = load_dataset(
        src, opt["csv_file_validation_data"], opt["csv_file_validation_label"],
        opt["validation_mask_file"], opt["csv_types_file"],
        id_covariate=opt["id_covariate"], conv=opt["conv_hivae"])

    import ast
    hidden = opt.get("hidden_layers") or "[500]"
    if isinstance(hidden, str):
        hidden = ast.literal_eval(hidden)
    mcfg = HLVAEConfig(layout=train_ds.layout, z_dim=opt["latent_dim"],
                       h_dims=tuple(hidden), y_dim=opt["y_dim"],
                       conv=opt["conv_hivae"], dtype=jnp.float32)
    model = HLVAE(mcfg)
    spec0, spec1 = build_kernel_specs(
        cat_kernel=opt["cat_kernel"], bin_kernel=opt["bin_kernel"],
        sqexp_kernel=opt["sqexp_kernel"], cat_int_kernel=opt["cat_int_kernel"],
        bin_int_kernel=opt["bin_int_kernel"],
        covariate_missing_val=opt["covariate_missing_val"],
        id_covariate=opt["id_covariate"])
    vae = tree["vae"]
    k0, k1, zt = tree["k0"], tree["k1"], tree["zt"]
    noise = noise_value(tree["raw_noise"], opt["constrain_scales"])

    # training-set mu for the GP-extrapolation context (as the CLI does)
    train_mu, _ = val.encode_dataset(model, vae, train_ds)

    out = {}
    for f64 in (True, False):
        val.set_eval_gp_f64(f64)
        times, dfs = [], []
        for rep in range(3):
            t0 = time.perf_counter()
            df = val.validate(model, vae, spec0, k0, spec1, k1, noise, zt,
                              val_ds, train_mu, train_ds.labels,
                              opt["id_covariate"], results_path=None,
                              type_KL=opt["type_KL"])
            times.append(time.perf_counter() - t0)
            dfs.append(df)
        key = "f64" if f64 else "f32"
        out[key] = {
            "validate_seconds_warm": round(min(times[1:]), 3),
            "validate_seconds_cold": round(times[0], 3),
            "rows": {name: float(dfs[-1].loc[name].iloc[0])
                     for name in dfs[-1].index},
        }
        print(key, json.dumps(out[key], indent=1), flush=True)

    ref, fast = out["f64"]["rows"], out["f32"]["rows"]
    out["max_rel_delta"] = max(
        abs(fast[k] - ref[k]) / max(abs(ref[k]), 1e-12) for k in ref)
    out["speedup_warm"] = round(
        out["f64"]["validate_seconds_warm"] / out["f32"]["validate_seconds_warm"], 2)
    dst = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "eval_dtype_ab.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"max_rel_delta": out["max_rel_delta"],
                      "speedup_warm": out["speedup_warm"]}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "")
