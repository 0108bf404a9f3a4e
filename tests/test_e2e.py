"""End-to-end pipeline: generate Health-MNIST -> CSVs -> CLI train -> eval.

Exercises the same surface as the reference run command
``python HLVAE_main.py --f=config.txt`` (README.MD:19) at toy scale:
conv HLVAE, GP prior with the canonical kernel structure, validation,
tests, image generation, artifacts on disk.
"""
import os

import numpy as np
import pytest

from hlax.data import generate as gen
from hlax.cli import generate as gen_cli
from hlax.cli import main as main_cli


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hm_data")
    gen_cli.main([
        "--destination", str(d), "--num_3", "2", "--num_6", "2",
        "--missing", "25", "--datatype_config", "D4", "--seed", "1",
        "--splits", "prediction,test,validation",
    ])
    return d


def test_generator_output_shapes(data_dir):
    data = np.loadtxt(os.path.join(data_dir, "prediction_data_D4.csv"),
                      delimiter=",")
    assert data.shape == (4 * 20, 1296)
    # D4: region_1 stays real-valued 0..255; regions 2-4 quantized to 5 levels
    r1, r2, r3, r4 = gen.region_indices()
    for reg in (r2, r3, r4):
        assert set(np.unique(data[:, reg])) <= {25., 75., 125., 175., 225.}
    lab = np.loadtxt(os.path.join(data_dir, "prediction_label.csv"),
                     delimiter=",", skiprows=1)
    assert lab.shape == (80, 8)
    # 20 timepoints per subject, 4 subjects
    assert len(np.unique(lab[:, 0])) == 4
    mask = np.loadtxt(os.path.join(data_dir, "prediction_mask.csv"),
                      delimiter=",")
    frac = mask.mean()
    assert 0.70 < frac < 0.80   # 25% missing


@pytest.mark.slow
def test_cli_train_eval_pipeline(data_dir, tmp_path):
    save = tmp_path / "run"
    cfg_file = tmp_path / "cfg.txt"
    # canonical config-file format (config/hlvae_config_file.txt), toy scale
    cfg_file.write_text("\n".join([
        f"--data_source_path={data_dir}",
        f"--save_path={save}",
        "--results_path=/results",
        "--csv_types_file=data_types_D4.csv",
        "--csv_file_data=prediction_data_D4.csv",
        "--csv_file_label=prediction_label.csv",
        "--mask_file=prediction_mask.csv",
        "--csv_file_test_data=test_data_D4.csv",
        "--csv_file_test_label=test_label.csv",
        "--test_mask_file=test_mask.csv",
        "--csv_file_prediction_data=prediction_data_D4.csv",
        "--csv_file_prediction_label=prediction_label.csv",
        "--prediction_mask_file=prediction_mask.csv",
        "--csv_file_validation_data=validation_data_D4.csv",
        "--csv_file_validation_label=validation_label.csv",
        "--validation_mask_file=validation_mask.csv",
        "--csv_file_generation_data=test_data_D4.csv",
        "--csv_file_generation_label=test_label.csv",
        "--generation_mask_file=test_mask.csv",
        "--varying_T=True",
        "--latent_dim=4",
        "--id_covariate=2",
        "--M=8",
        "--P=4",
        "--T=20",
        "--epochs=3",
        "--save_interval=30",
        "--num_dim=1296",
        "--type_KL=GPapprox_closed",
        "--subjects_per_batch=2",
        "--natural_gradient=True",
        "--constrain_scales=True",
        "--run_tests=True",
        "--run_validation=True",
        "--generate_images=True",
        "--cat_kernel=[2]",
        "--bin_kernel=[]",
        "--sqexp_kernel=[0]",
        "--cat_int_kernel=[{'cont_covariate':0,'cat_covariate':2}]",
        "--bin_int_kernel=[]",
        "--covariate_missing_val=[]",
        "--hidden_layers=[32]",
        "--conv_hivae=True",
        "--y_dim=3",
        "--gp_dtype=float64",
        "--model_dtype=float64",
    ]))
    out = main_cli.main([f"--f={cfg_file}"])
    assert np.isfinite(out["loss_arrs"]["net"]).all()
    results = str(save) + "/results"
    assert os.path.exists(os.path.join(results, "validation_results.csv"))
    assert os.path.exists(os.path.join(results, "result_error_final.csv"))
    assert os.path.exists(os.path.join(results,
                                       "partial_metrics_test_VAE.pickle"))
    assert os.path.exists(os.path.join(results,
                                       "partial_metrics_test_future.pickle"))
    assert os.path.exists(os.path.join(results, "recon_complete.pdf"))
    assert os.path.isdir(os.path.join(str(save), "final"))   # orbax checkpoint
    # validation CSV has the reference's 10 named rows
    import pandas as pd
    df = pd.read_csv(os.path.join(results, "validation_results.csv"),
                     header=None, index_col=0)
    assert list(df.index) == [
        "vae_error", "GP_error", "vae_mse", "miss_vae_error", "miss_GP_error",
        "net_loss", "GP_loss", "nll_loss", "recon_loss_sum",
        "GP_recon_loss_sum"]
    # diagnostics.pkl: reference layout [penalty, net, nll, recon, kld]
    # (HLVAE_main.py:313-314), each per-epoch, recon populated and finite
    import pickle
    with open(os.path.join(str(save), "diagnostics.pkl"), "rb") as f:
        diag = pickle.load(f)
    assert len(diag) == 5
    assert all(len(a) == 3 for a in diag)          # epochs=3
    assert np.isfinite(diag[3]).all() and (diag[3] > 0).all()
    # plot_values.pkl: [train_x, mu, log_var, z, idx] (HLVAE_main.py:317)
    with open(os.path.join(str(save), "plot_values.pkl"), "rb") as f:
        pv = pickle.load(f)
    assert len(pv) == 5 and pv[1].shape == (80, 4)


@pytest.mark.slow
def test_cli_data_parallel_smoke(data_dir, tmp_path):
    """--data_parallel x --latent_parallel runs the one-dispatch-per-epoch
    training scan on a (2 data x 2 latent) virtual CPU mesh from flags."""
    save = tmp_path / "dp_run"
    cfg_file = tmp_path / "dp_cfg.txt"
    cfg_file.write_text("\n".join([
        f"--data_source_path={data_dir}",
        f"--save_path={save}",
        "--csv_types_file=data_types_D4.csv",
        "--csv_file_data=prediction_data_D4.csv",
        "--csv_file_label=prediction_label.csv",
        "--mask_file=prediction_mask.csv",
        "--latent_dim=4", "--id_covariate=2", "--M=8", "--P=4", "--T=20",
        "--epochs=3", "--save_interval=50", "--num_dim=1296",
        "--type_KL=GPapprox_closed", "--subjects_per_batch=4",
        "--natural_gradient=True", "--constrain_scales=True",
        "--cat_kernel=[2]", "--bin_kernel=[]", "--sqexp_kernel=[0]",
        "--cat_int_kernel=[]", "--bin_int_kernel=[]",
        "--covariate_missing_val=[]",
        "--hidden_layers=[16]", "--conv_hivae=True", "--y_dim=3",
        "--data_parallel=2", "--latent_parallel=2",
        "--epochs_per_dispatch=2",
        "--gp_dtype=float64", "--model_dtype=float64",
    ]))
    out = main_cli.main([f"--f={cfg_file}"])
    assert np.isfinite(out["loss_arrs"]["net"]).all()
    assert len(out["loss_arrs"]["net"]) == 3   # per-epoch bookkeeping intact


@pytest.mark.slow
def test_eval_gp_f32_matches_f64(data_dir, tmp_path):
    """Regression bound for the round-4 --eval_gp_f64 default flip: on a
    trained float32 checkpoint, every validation row computed with the f32
    whitened-factorization path must agree with the float64 fidelity path
    within 1% (the canonical-scale A/B measured 0.27% worst-row delta,
    baselines/eval_dtype_ab.json)."""
    from hlax.eval import validate as val

    save = tmp_path / "f32_run"
    cfg_file = tmp_path / "f32_cfg.txt"
    cfg_file.write_text("\n".join([
        f"--data_source_path={data_dir}",
        f"--save_path={save}",
        "--csv_types_file=data_types_D4.csv",
        "--csv_file_data=prediction_data_D4.csv",
        "--csv_file_label=prediction_label.csv",
        "--mask_file=prediction_mask.csv",
        "--csv_file_validation_data=validation_data_D4.csv",
        "--csv_file_validation_label=validation_label.csv",
        "--validation_mask_file=validation_mask.csv",
        "--latent_dim=2", "--id_covariate=2", "--M=4", "--P=4", "--T=20",
        "--epochs=30", "--save_interval=100", "--num_dim=1296",
        "--type_KL=GPapprox_closed", "--subjects_per_batch=4",
        "--natural_gradient=True", "--constrain_scales=True",
        "--run_validation=True", "--run_tests=False",
        "--cat_kernel=[2]", "--bin_kernel=[]", "--sqexp_kernel=[0]",
        "--cat_int_kernel=[]", "--bin_int_kernel=[]",
        "--covariate_missing_val=[]",
        "--hidden_layers=[8]", "--conv_hivae=False", "--y_dim=2",
        # checkpoint dtype float32: the non-f64 path must actually run f32
        "--gp_dtype=float32", "--model_dtype=float32",
    ]))
    out = main_cli.main([f"--f={cfg_file}"])
    state, model = out["state"], out["model"]
    val_ds = out["datasets"]["validation"]
    train_mu, train_x = out["encode_train"]()

    def rows(f64: bool):
        val.set_eval_gp_f64(f64)
        df = val.validate(
            model, state.vae, out["spec0"], state.k0, out["spec1"],
            state.k1, out["noise"], state.zt, val_ds, train_mu, train_x,
            id_covariate=2, results_path=None)
        return df[0].to_numpy()

    try:
        r64 = rows(True)
        r32 = rows(False)
    finally:
        val.set_eval_gp_f64(False)   # restore the default for other tests
    assert np.isfinite(r64).all() and np.isfinite(r32).all()
    denom = np.maximum(np.abs(r64), 1e-6)
    rel = np.abs(r32 - r64) / denom
    assert rel.max() < 1e-2, f"f32/f64 validation rows diverge: {rel}"


@pytest.mark.slow
def test_cli_early_stopping_checkpoint_and_rerun(data_dir, tmp_path):
    """Early-stopping flow (training.py:246-264 + HLVAE_main.py:52-76):
    past epoch 100 the best-validation state is checkpointed as early_best,
    and an --early_stopping --epochs=0 rerun restores it and writes
    result_error_early_stopping.csv."""
    save = tmp_path / "es_run"
    cfg_file = tmp_path / "es_cfg.txt"
    cfg_file.write_text("\n".join([
        f"--data_source_path={data_dir}",
        f"--save_path={save}",
        "--csv_types_file=data_types_D4.csv",
        "--csv_file_data=prediction_data_D4.csv",
        "--csv_file_label=prediction_label.csv",
        "--mask_file=prediction_mask.csv",
        "--csv_file_validation_data=validation_data_D4.csv",
        "--csv_file_validation_label=validation_label.csv",
        "--validation_mask_file=validation_mask.csv",
        "--csv_file_test_data=test_data_D4.csv",
        "--csv_file_test_label=test_label.csv",
        "--test_mask_file=test_mask.csv",
        "--csv_file_prediction_data=prediction_data_D4.csv",
        "--csv_file_prediction_label=prediction_label.csv",
        "--prediction_mask_file=prediction_mask.csv",
        "--latent_dim=2", "--id_covariate=2", "--M=4", "--P=4", "--T=20",
        "--epochs=106", "--save_interval=200", "--num_dim=1296",
        "--type_KL=GPapprox_closed", "--subjects_per_batch=4",
        "--natural_gradient=True", "--constrain_scales=True",
        "--run_validation=True", "--run_tests=False",
        "--gp_model_folder=/",
        "--cat_kernel=[2]", "--bin_kernel=[]", "--sqexp_kernel=[0]",
        "--cat_int_kernel=[]", "--bin_int_kernel=[]",
        "--covariate_missing_val=[]",
        "--hidden_layers=[8]", "--conv_hivae=False", "--y_dim=2",
        "--gp_dtype=float64", "--model_dtype=float64",
    ]))
    out = main_cli.main([f"--f={cfg_file}"])
    assert np.isfinite(out["loss_arrs"]["net"]).all()
    assert os.path.isdir(os.path.join(str(save), "early_best"))

    # eval-only rerun from the early-best checkpoint
    out2 = main_cli.main([f"--f={cfg_file}", "--early_stopping=True",
                          "--epochs=0", "--run_tests=True"])
    assert os.path.exists(os.path.join(
        str(save), "results", "result_error_early_stopping.csv"))
