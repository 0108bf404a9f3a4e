"""End-to-end driver: config -> datasets -> model+GP -> train -> eval.

Reference: /root/reference/HLVAE_main.py:30-423 and the epoch loop of
``hensman_training`` (/root/reference/training.py:23-272).  Same config-file
flags, same artifact names (diagnostics.pkl, validation_results.csv,
result_error_*.csv, recon_complete*.pdf, checkpoints), same console lines.

TPU-native differences: the per-batch step is one jitted XLA program over
static padded shapes; checkpoints are a single orbax pytree; optional mesh
sharding via --data_parallel.
"""

from __future__ import annotations

import ast
import os
import pickle
import sys
import time
from timeit import default_timer as timer

import numpy as np

from hlax.config import ModelArgs


def _resolve_dtype(name):
    import jax
    import jax.numpy as jnp
    if name == "float64":
        jax.config.update("jax_enable_x64", True)
        return jnp.float64
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


def warm_start_candidates(gp_folder: str, save_path: str) -> list:
    """Checkpoint locations to probe for a warm start, in order.

    The reference concatenates save_path + gp_model_folder
    (HLVAE_main.py:46), so reference-style values start with '/'; a
    genuinely machine-absolute path is therefore ambiguous.  Probe the
    absolute location first (concatenation would mangle it), then the
    reference's concatenation, so neither style silently loses its
    checkpoint."""
    gp_folder = gp_folder or "/"
    cands = []
    if gp_folder != "/" and os.path.isabs(gp_folder):
        cands.append(gp_folder)
    cands.append(save_path + gp_folder)
    return cands


def _memory_dbg(enabled: bool, phase: str) -> None:
    """Phase-wise peak-memory prints (HLVAE_main.py:281-283, 303-305,
    327-329, 410-412).  The reference resets the CUDA peak counter after
    each phase; TPU/jax exposes no reset, so the four lines report the
    CUMULATIVE peak up to each phase boundary (monotone non-decreasing)."""
    if not enabled:
        return
    import jax
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            print(f"Max memory allocated after {phase} on {d}: "
                  f"{stats.get('peak_bytes_in_use', 0)/(1024**2):.2f} MBs")


def run(opt: dict) -> dict:
    import jax
    if opt.get("device"):
        # must precede first backend use; the axon TPU plugin ignores the
        # JAX_PLATFORMS env var, but honors the config knob
        jax.config.update("jax_platforms", opt["device"])
    import jax.numpy as jnp

    # x64 stays enabled even for float32 configs: the eval-side GP bounds
    # (DUBO/predict, hlax/eval) compute in float64, and --nat_grad_f64 /
    # --gp_dtype=float64 need it.  All hot-path arrays are explicitly
    # dtyped, so this does not change the f32 training compute.
    jax.config.update("jax_enable_x64", True)

    from hlax.data.dataset import (load_dataset, subject_batches,
                                   stage_dataset, epoch_subject_batches)
    from hlax.eval import images as im
    from hlax.eval import testing as tst
    from hlax.eval import validate as val
    from hlax.gp.kernels import build_kernel_specs, noise_value
    from hlax.models import HLVAE, HLVAEConfig
    from hlax.train import checkpoint as ckpt
    from hlax.train import step as tstep

    save_path = opt["save_path"]
    results_path = save_path + (opt.get("results_path") or "/results")
    os.makedirs(save_path, exist_ok=True)
    os.makedirs(results_path, exist_ok=True)

    # arguments.pkl round-trip for eval-only reruns (HLVAE_main.py:52-76):
    # epochs in [0,1,2] (or early_stopping) reloads the training-time config
    # and only overrides the run-control flags.
    args_pkl = os.path.join(save_path, "arguments.pkl")
    if opt.get("epochs", 0) not in (0, 1, 2) and not opt.get("early_stopping"):
        with open(args_pkl, "wb") as f:
            pickle.dump(opt, f)
    elif os.path.isfile(args_pkl):
        with open(args_pkl, "rb") as f:
            saved = pickle.load(f)
        for k in ("early_stopping", "epochs", "save_interval", "results_path",
                  "save_path", "gp_model_folder", "generate_images",
                  "memory_dbg", "run_tests", "run_validation",
                  "eval_gp_f64"):
            if k in opt:
                saved[k] = opt[k]
        opt = saved

    for key in sorted(opt):
        print(f"{key}: {opt[key]}")

    # eval-side GP compute dtype: checkpoint dtype (f32) by default via the
    # whitened factorization; --eval_gp_f64 is the fidelity flag.  Read after
    # the arguments.pkl merge so eval-only reruns honour the CLI value.
    val.set_eval_gp_f64(opt.get("eval_gp_f64", False))

    model_dtype = _resolve_dtype(opt.get("model_dtype", "float32"))
    gp_dtype = _resolve_dtype(opt.get("gp_dtype", "float32"))

    id_covariate = opt["id_covariate"]
    latent_dim = opt["latent_dim"]

    def mk_ds(data_key, label_key, mask_key, true_key):
        return load_dataset(
            opt["data_source_path"], opt[data_key], opt[label_key],
            opt.get(mask_key), opt["csv_types_file"], opt.get(true_key) or None,
            opt.get("csv_range_file"), id_covariate,
            opt.get("logvar_network", False), opt.get("conv_hivae", False),
            opt.get("use_ranges", False))

    dataset = mk_ds("csv_file_data", "csv_file_label", "mask_file",
                    "true_mask_file")
    print(f"Length of dataset:  {len(dataset)}")
    if not len(dataset):
        print("ERROR: Dataset is empty")
        sys.exit(1)

    test_dataset = (mk_ds("csv_file_test_data", "csv_file_test_label",
                          "test_mask_file", "true_test_mask_file")
                    if opt.get("csv_file_test_data") else None)
    prediction_dataset = (mk_ds("csv_file_prediction_data",
                                "csv_file_prediction_label",
                                "prediction_mask_file",
                                "true_prediction_mask_file")
                          if (opt.get("run_tests") or opt.get("generate_images"))
                          and opt.get("csv_file_prediction_data") else None)
    generation_dataset = (mk_ds("csv_file_generation_data",
                                "csv_file_generation_label",
                                "generation_mask_file",
                                "true_generation_mask_file")
                          if opt.get("generate_images") else None)
    validation_dataset = (mk_ds("csv_file_validation_data",
                                "csv_file_validation_label",
                                "validation_mask_file",
                                "true_validation_mask_file")
                          if opt.get("run_validation") else None)

    hidden_layers = opt.get("hidden_layers") or "[500]"
    if isinstance(hidden_layers, str):
        hidden_layers = ast.literal_eval(hidden_layers)

    mcfg = HLVAEConfig(
        layout=dataset.layout, z_dim=latent_dim, h_dims=tuple(hidden_layers),
        y_dim=opt.get("y_dim") or 5, conv=opt.get("conv_hivae", False),
        logvar_network=opt.get("logvar_network", False),
        vy_init_real=opt.get("vy_init_real", 1.0),
        vy_init_pos=opt.get("vy_init_pos", 0.5), dtype=model_dtype,
        fused_conv=opt.get("fused_conv", False),
        compute_dtype=(_resolve_dtype(opt["compute_dtype"])
                       if opt.get("compute_dtype") else None))
    model = HLVAE(mcfg)

    spec0, spec1 = build_kernel_specs(
        opt.get("cat_kernel") or [], opt.get("bin_kernel") or [],
        opt.get("sqexp_kernel") or [], opt.get("cat_int_kernel") or [],
        opt.get("bin_int_kernel") or [], opt.get("covariate_missing_val") or [],
        id_covariate)

    cfg = tstep.TrainConfig(
        latent_dim=latent_dim, M=opt["M"], P_tot=float(dataset.P),
        N_tot=float(len(dataset)), id_covariate=id_covariate,
        natural_gradient=opt.get("natural_gradient", True),
        natural_gradient_lr=opt.get("natural_gradient_lr", 0.01),
        constrain_scales=opt.get("constrain_scales", False),
        eps=opt.get("eps"), gp_dtype=gp_dtype,
        nat_grad_f64=opt.get("nat_grad_f64", False),
        nat_grad_jitter=opt.get("nat_grad_jitter", 0.0),
        use_pallas_chol=opt.get("use_pallas_chol", True))

    subjects_per_batch = opt.get("subjects_per_batch", 20)
    state = tstep.init_train_state(model, spec0, spec1,
                                   next(subject_batches(dataset,
                                                        subjects_per_batch)),
                                   cfg, seed=opt.get("seed", 0))

    n_params = sum(np.prod(x.shape) for x in
                   jax.tree_util.tree_leaves(state.vae))
    print(f"Total Parameter Number is: {n_params}")

    # warm start (HLVAE_main.py:163-167, 252-269); the canonical config's
    # '/' means "save_path itself" (see warm_start_candidates)
    restored = None
    for warm_base in warm_start_candidates(opt.get("gp_model_folder"),
                                           save_path):
        restored = ckpt.restore(warm_base, state,
                                name=ckpt.EARLY_BEST_NAME
                                if opt.get("early_stopping") else ckpt.FINAL_NAME)
        if restored is not None:
            break
    if restored is not None:
        state = restored
        print("Loaded pre-trained values.")
    else:
        print("Did not load pre-trained values.")

    # optional SPMD: shard subjects over a data mesh axis, GP state (and its
    # Adam moments) over a latent axis (hlax/parallel/mesh.py).  Training is
    # ONE XLA dispatch per EPOCH either way — the mesh path stages the
    # dataset with an explicit leading device axis and gathers each batch
    # per-shard inside the scan body (no collectives for the data movement).
    mesh_ctx = None
    n_dp = max(opt.get("data_parallel") or 0, 1)
    n_lat = max(opt.get("latent_parallel") or 0, 1)
    if n_dp * n_lat > 1:
        from hlax.parallel import distributed as pdist
        from hlax.parallel import mesh as pmesh
        pdist.initialize()
        mesh_ctx = pmesh.make_mesh(n_data=n_dp, n_latent=n_lat)
        mesh_ctx.__enter__()
        print(f"Running on a ({n_dp} data x {n_lat} latent) device mesh")

    if mesh_ctx is not None:
        from hlax.data.dataset import (stage_dataset_mesh,
                                       epoch_subject_batches_mesh)
        from hlax.parallel import mesh as pmesh
        staged = pmesh.shard_staged(
            stage_dataset_mesh(dataset, model_dtype, n_dp), mesh_ctx)
        state = pmesh.shard_state(state, mesh_ctx)
        epoch_fn = pmesh.jit_train_epoch(
            tstep.make_train_epoch_mesh(model, spec0, spec1, cfg),
            state, mesh_ctx, staged)
        epoch_idx = lambda rng: epoch_subject_batches_mesh(
            dataset.P, n_dp, subjects_per_batch, rng)
    else:
        # single-device epoch scan over on-device gathered batches (~7x
        # steps/sec through a remote-device link vs per-step dispatch)
        staged = stage_dataset(dataset, model_dtype)
        epoch_fn = jax.jit(tstep.make_train_epoch(
            model, spec0, spec1, cfg,
            unroll=max(1, opt.get("scan_unroll") or 1)))
        epoch_idx = lambda rng: np.stack(list(
            epoch_subject_batches(dataset.P, subjects_per_batch, rng)))
    epochs = opt.get("epochs", 0)
    validation_interval = 5
    save_interval = opt.get("save_interval", 100)
    rng = np.random.default_rng(opt.get("seed", 0))

    loss_arrs = {k: [] for k in ("net", "nll", "kld", "recon")}
    validation_curve = []
    # per-validation curves (reference training.py:203-216 appends the
    # validate() df rows; validation_values.pkl and the training_VAE_error /
    # test_GP_error plots are fed from these)
    val_arrs = {k: [] for k in ("net", "recon", "gp", "vae_error", "gp_error")}
    last_val_df = None
    best_value, best_epoch = np.inf, 0
    best_epoch_missing_imp_error = -1.0
    miss_recon_loss = 0.0

    noise_fn = lambda s: noise_value(s.raw_noise, cfg.constrain_scales)

    def encode_train():
        mu, _ = val.encode_dataset(model, state.vae, dataset)
        return mu, dataset.labels

    profile_dir = opt.get("profile_dir") or ""

    # multi-epoch chunked dispatch: scan up to k epochs in ONE XLA dispatch,
    # never across a validation/save boundary (those need the state on host).
    # Per-epoch console lines and bookkeeping are unchanged — they are
    # printed from the returned [k*nb] metrics; the Time column is the
    # burst wall time split evenly.  k=1 (default) is exact per-epoch parity.
    epochs_per_dispatch = max(1, opt.get("epochs_per_dispatch") or 1)

    def _boundary(e):
        return (e % save_interval == 0
                or (validation_dataset is not None
                    and e % validation_interval == 0))

    _memory_dbg(opt.get("memory_dbg"), "initialisation")
    start = timer()
    epoch = 1
    while epoch <= epochs:
        burst = 1
        while (burst < epochs_per_dispatch and epoch + burst <= epochs
               and not _boundary(epoch + burst - 1)):
            burst += 1
        t0 = time.time()
        profiling = profile_dir and epoch <= 2 <= epoch + burst - 1
        if profiling:
            jax.profiler.start_trace(profile_dir)
        idx = np.concatenate([np.asarray(epoch_idx(rng))
                              for _ in range(burst)], axis=0)
        state, ms_all = epoch_fn(state, staged, jnp.asarray(idx))
        ms_all = {k: np.asarray(v) for k, v in ms_all.items()}  # [burst*nb]
        if profiling:
            jax.profiler.stop_trace()
        t_per = (time.time() - t0) / burst
        nb_ep = len(ms_all["loss"]) // burst

        for j in range(burst):
            epoch_j = epoch + j
            ms = {k: v[j * nb_ep:(j + 1) * nb_ep] for k, v in ms_all.items()}
            sums = {"net": float(ms["loss"].mean()),
                    "nll": float(ms["nll"].mean()),
                    "kld": float(ms["kld"].mean()),
                    "recon": float(ms["recon"].mean())}
            recon_sum2 = float(ms["recon"].sum())
            miss_recon_sum = float(ms["miss_recon"].sum())
            print("Iter %d/%d - Time: %.3f  - Loss: %.3f  - GP loss: %.3f  "
                  "- NLL Loss: %.3f  - Recon Loss: %.3f"
                  % (epoch_j, epochs, t_per,
                     sums["net"], sums["kld"], sums["nll"], recon_sum2),
                  flush=True)
            for k in loss_arrs:
                loss_arrs[k].append(sums[k])
            miss_recon_loss = miss_recon_sum / len(dataset)
            # reference denominator is N * mask columns (training.py:157)
            print(f"Error for Training: "
                  f"{recon_sum2 / (len(dataset) * dataset.het.mask.shape[1])}")

        # post-epoch actions: only the burst's LAST epoch can be a boundary
        epoch = epoch + burst - 1
        run_val = (validation_dataset is not None
                   and (epoch % validation_interval == 0
                        or epoch % save_interval == 0))
        if run_val:
            tv = time.time()
            try:
                train_mu, train_x = encode_train()
                df = val.validate(
                    model, state.vae, spec0, state.k0, spec1, state.k1,
                    noise_fn(state), state.zt, validation_dataset, train_mu,
                    train_x, id_covariate, results_path,
                    type_KL=opt.get("type_KL") or "GPapprox_closed",
                    num_samples=opt.get("num_samples", 1))
                # extra bookkeeping rows + curves (training.py:203-216)
                df.loc["best_epoch"] = float(best_epoch)
                df.loc["best_epoch_missing_imp_error"] = (
                    best_epoch_missing_imp_error)
                df.loc["missing_imp_error"] = miss_recon_loss
                last_val_df = df
                validation_curve.append(float(df.loc["net_loss"].iloc[0]))
                val_arrs["net"].append(float(df.loc["net_loss"].iloc[0]))
                val_arrs["recon"].append(float(df.loc["nll_loss"].iloc[0]))
                val_arrs["gp"].append(float(df.loc["GP_loss"].iloc[0]))
                val_arrs["vae_error"].append(float(df.loc["vae_error"].iloc[0]))
                val_arrs["gp_error"].append(float(df.loc["GP_error"].iloc[0]))
            except Exception as exc:   # e.g. transient remote-compile failure
                print(f"Validation failed (continuing): {exc}")
            print(f"Validation Duration: {time.time()-tv}")

        if epoch % save_interval == 0:
            im.plot_training_info(save_path, net_loss=loss_arrs["net"],
                                  nll=loss_arrs["nll"], kld=loss_arrs["kld"],
                                  vae_error=val_arrs["vae_error"],
                                  gp_error=val_arrs["gp_error"],
                                  validation_loss=validation_curve)
            # validation_df.csv / .pkl / validation_values.pkl
            # (training.py:205-211; reference gates on epochs > 50)
            if last_val_df is not None and epochs > 50:
                last_val_df.to_pickle(os.path.join(save_path,
                                                   "validation_df.pkl"))
                last_val_df.to_csv(os.path.join(save_path,
                                                "validation_df.csv"))
                with open(os.path.join(save_path, "validation_values.pkl"),
                          "wb") as f:
                    pickle.dump([np.asarray(val_arrs[k]) for k in
                                 ("net", "recon", "gp", "vae_error",
                                  "gp_error")], f)
            # like the reference's try/except-guarded plotting/eval detours
            # (training.py:195-245): a failing save-interval extra must not
            # kill the training run
            try:
                res = tst.hlvae_test(model, state.vae, dataset, test=False,
                                     id_covariate=id_covariate, prnt=False)
                with open(os.path.join(results_path,
                                       "partial_metrics_training_VAE.pickle"),
                          "wb") as f:
                    pickle.dump(res["partial_LL"], f)
                if generation_dataset is not None \
                        and prediction_dataset is not None \
                        and epoch != epochs:
                    pred_mu, _ = val.encode_dataset(model, state.vae,
                                                    prediction_dataset)
                    im.recon_complete_gen(
                        model, state.vae, spec0, state.k0, spec1, state.k1,
                        noise_fn(state), state.zt, generation_dataset,
                        prediction_dataset.labels, pred_mu, id_covariate,
                        results_path, epoch=epoch)
            except Exception as exc:
                print(f"Save-interval eval/image-gen failed (continuing): "
                      f"{exc}")

        if run_val and epoch > 100 and validation_curve:
            if validation_curve[-1] < best_value:
                best_value, best_epoch = validation_curve[-1], epoch
                best_epoch_missing_imp_error = miss_recon_loss
                ckpt.save(save_path, state, name=ckpt.EARLY_BEST_NAME)
        epoch += 1

    if mesh_ctx is not None:
        mesh_ctx.__exit__(None, None, None)
    print("Duration of training: {:.2f} seconds".format(timer() - start))
    print(f"Best epoch is {best_epoch}")
    print(f"Best epoch imputation error is {best_epoch_missing_imp_error}")
    print(f"Imputation error is {miss_recon_loss}")

    _memory_dbg(opt.get("memory_dbg"), "training")

    if epochs > 2 and not opt.get("early_stopping"):
        print("Saving")
        # [penalty, net, nll, recon, kld] — reference order
        # (HLVAE_main.py:313-314; penalty_term_arr is per-epoch zeros,
        # training.py:147)
        with open(os.path.join(save_path, "diagnostics.pkl"), "wb") as f:
            pickle.dump([np.zeros(len(loss_arrs["net"]))]
                        + [np.asarray(loss_arrs[k])
                           for k in ("net", "nll", "recon", "kld")], f)
        # plot_values.pkl: [train_x, mu, log_var, z_sample, row_idx]
        # (HLVAE_main.py:317)
        try:
            pv_mu, pv_lv = val.encode_dataset(model, state.vae, dataset)
            pv_z = pv_mu + np.exp(0.5 * pv_lv) * np.random.default_rng(
                opt.get("seed", 0)).standard_normal(pv_mu.shape)
            with open(os.path.join(save_path, "plot_values.pkl"), "wb") as f:
                pickle.dump([dataset.labels, pv_mu, pv_lv, pv_z,
                             np.arange(len(dataset))], f)
        except Exception as exc:
            print(f"plot_values.pkl skipped: {exc}")
        ckpt.save(save_path, state)
    _memory_dbg(opt.get("memory_dbg"), "saving")

    out = {"state": state, "model": model, "loss_arrs": loss_arrs,
           "spec0": spec0, "spec1": spec1, "noise": noise_fn(state),
           "datasets": {"train": dataset, "validation": validation_dataset,
                        "test": test_dataset,
                        "prediction": prediction_dataset},
           "encode_train": encode_train}

    # final validation (HLVAE_main.py:332-353)
    if opt.get("run_validation") and validation_dataset is not None:
        train_mu, train_x = encode_train()
        val.validate(model, state.vae, spec0, state.k0, spec1, state.k1,
                     noise_fn(state), state.zt, validation_dataset, train_mu,
                     train_x, id_covariate, results_path,
                     type_KL=opt.get("type_KL") or "GPapprox_closed",
                     num_samples=opt.get("num_samples", 1))

    pred_mu = None
    if prediction_dataset is not None:
        pred_mu, _ = val.encode_dataset(model, state.vae, prediction_dataset)

    if test_dataset is not None:
        res = tst.hlvae_test(model, state.vae, test_dataset, test=True,
                             id_covariate=id_covariate,
                             training_indexes=dataset.labels[:, -1])
        with open(os.path.join(results_path,
                               "partial_metrics_test_VAE.pickle"), "wb") as f:
            pickle.dump(res["partial_LL"], f)

    if opt.get("generate_images") and generation_dataset is not None \
            and pred_mu is not None:
        im.recon_complete_gen(
            model, state.vae, spec0, state.k0, spec1, state.k1,
            noise_fn(state), state.zt, generation_dataset,
            prediction_dataset.labels, pred_mu, id_covariate, results_path)

    if opt.get("run_tests") and test_dataset is not None and pred_mu is not None:
        test_type = "early_stopping" if opt.get("early_stopping") else "final"
        tst.mse_test_gp(model, state.vae, spec0, state.k0, spec1, state.k1,
                        noise_fn(state), state.zt, test_dataset,
                        prediction_dataset.labels, pred_mu, id_covariate,
                        results_path, test_type=test_type,
                        training_indexes=dataset.labels[:, -1])
    _memory_dbg(opt.get("memory_dbg"), "tests")
    return out


def main(argv=None):
    opt = ModelArgs().parse_options(argv)
    return run(opt)


if __name__ == "__main__":
    main()
    # hard-exit: the remote-device client can leave non-daemon threads alive
    # after all work and artifacts are complete
    os._exit(0)
