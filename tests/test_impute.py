"""Imputation CLI: trained-checkpoint -> fill missing cells in a raw CSV.

New product surface (no reference counterpart): the HLVAETest decode path
(model_test.py:135-275) + per-type point estimates (read_functions.py:268-339)
turned into a user-facing tool.  Checks value-space round-trips: observed
cells pass through untouched, discrete fills come from the column's own
value set, and the encoder's count +1 shift is undone.
"""
import os

import numpy as np
import pytest

from hlax.cli import impute as impute_cli
from hlax.cli import main as main_cli

TYPES = [{"type": "real", "dim": 1, "nclass": 1},
         {"type": "cat", "dim": 1, "nclass": 3},
         {"type": "count", "dim": 1, "nclass": 1},
         {"type": "pos", "dim": 1, "nclass": 1}]


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("impute_data"))
    rng = np.random.default_rng(11)
    n_subj, T = 6, 5
    n = n_subj * T
    raw = np.column_stack([
        rng.normal(0, 1, n),
        rng.integers(0, 3, n).astype(float),
        rng.poisson(3.0, n).astype(float),
        rng.random(n) * 3,
    ])
    raw[0, 2] = 0.0   # force the count column's +1 encoding shift
    miss = (rng.random((n, 4)) > 0.25).astype(float)
    labels = np.column_stack([
        np.tile(np.arange(T, dtype=float), n_subj),
        rng.normal(0, 1, n),
        np.repeat(np.arange(n_subj, dtype=float), T),
    ])
    with open(os.path.join(d, "types.csv"), "w") as f:
        f.write("type,dim,nclass\n")
        for t in TYPES:
            f.write(f"{t['type']},{t['dim']},{t['nclass']}\n")
    np.savetxt(os.path.join(d, "train_data.csv"), raw, delimiter=",")
    np.savetxt(os.path.join(d, "train_mask.csv"), miss, delimiter=",",
               fmt="%d")
    with open(os.path.join(d, "train_label.csv"), "w") as f:
        f.write("time,extra,subject\n")
        np.savetxt(f, labels, delimiter=",")

    save = os.path.join(d, "run")
    cfg = os.path.join(d, "cfg.txt")
    with open(cfg, "w") as f:
        f.write("\n".join([
            f"--data_source_path={d}",
            f"--save_path={save}",
            "--results_path=/results",
            "--csv_types_file=types.csv",
            "--csv_file_data=train_data.csv",
            "--csv_file_label=train_label.csv",
            "--mask_file=train_mask.csv",
            "--varying_T=True",
            "--latent_dim=4", "--id_covariate=2", "--M=8", "--P=6", "--T=5",
            "--epochs=3", "--save_interval=30", "--num_dim=4",
            "--type_KL=GPapprox_closed", "--subjects_per_batch=3",
            "--natural_gradient=True", "--constrain_scales=True",
            "--run_tests=False", "--run_validation=False",
            "--generate_images=False",
            "--cat_kernel=[2]", "--bin_kernel=[]", "--sqexp_kernel=[0]",
            "--cat_int_kernel=[]", "--bin_int_kernel=[]",
            "--covariate_missing_val=[]",
            "--hidden_layers=[16]", "--conv_hivae=False", "--y_dim=3",
            "--gp_dtype=float64", "--model_dtype=float64",
        ]))
    main_cli.main([f"--f={cfg}"])
    return {"dir": d, "save": save, "raw": raw, "miss": miss}


@pytest.mark.slow
def test_impute_fills_only_missing_cells(trained_run, tmp_path):
    out_csv = str(tmp_path / "imputed.csv")
    ll_csv = str(tmp_path / "ll.csv")
    impute_cli.main([
        "--model_dir", trained_run["save"],
        "--data_csv", os.path.join(trained_run["dir"], "train_data.csv"),
        "--mask_csv", os.path.join(trained_run["dir"], "train_mask.csv"),
        "--out_csv", out_csv, "--ll_csv", ll_csv,
    ])
    raw, miss = trained_run["raw"], trained_run["miss"]
    imp = np.loadtxt(out_csv, delimiter=",")
    assert imp.shape == raw.shape
    assert np.isfinite(imp).all()
    # observed cells pass through untouched
    np.testing.assert_allclose(imp[miss == 1], raw[miss == 1], rtol=1e-9)
    # something was actually imputed, and not with the observed values
    assert (miss == 0).any()
    # cat fills come from the column's own value set (code -> value map)
    assert set(np.unique(imp[:, 1])) <= set(np.unique(raw[:, 1]))
    # count fills are unshifted: model estimates are >= 1 in encoded space,
    # so after undoing the +1 they are >= 0 and below the shifted range
    count_fills = imp[miss[:, 2] == 0, 2]
    assert (count_fills >= 0).all()
    # per-row log-densities written and finite
    ll = np.loadtxt(ll_csv, delimiter=",", skiprows=1)
    assert ll.shape == (raw.shape[0], 2)
    assert np.isfinite(ll).all()


@pytest.mark.slow
def test_impute_gp_mode(trained_run, tmp_path):
    """--use_gp imputes from the sparse-GP latent posterior at the rows'
    covariates (MSE_test_GPapprox path) — works even for rows whose data is
    entirely missing, which the encoder posterior cannot handle."""
    raw, miss = trained_run["raw"], trained_run["miss"]
    # blank out one full row: pure longitudinal extrapolation for that row
    miss_gp = miss.copy()
    miss_gp[7, :] = 0
    mask_csv = str(tmp_path / "mask_gp.csv")
    np.savetxt(mask_csv, miss_gp, delimiter=",", fmt="%d")
    out_csv = str(tmp_path / "imputed_gp.csv")
    impute_cli.main([
        "--model_dir", trained_run["save"],
        "--data_csv", os.path.join(trained_run["dir"], "train_data.csv"),
        "--mask_csv", mask_csv,
        "--label_csv", os.path.join(trained_run["dir"], "train_label.csv"),
        "--out_csv", out_csv, "--use_gp",
    ])
    imp = np.loadtxt(out_csv, delimiter=",")
    assert np.isfinite(imp).all()
    np.testing.assert_allclose(imp[miss_gp == 1], raw[miss_gp == 1],
                               rtol=1e-9)
    # the fully-missing row was filled with in-domain values
    assert set(np.unique(imp[:, 1])) <= set(np.unique(raw[:, 1]))
    assert imp[7, 2] >= 0


@pytest.mark.slow
def test_impute_sample_estimator(trained_run, tmp_path):
    """--estimator sample draws one posterior-predictive sample per missing
    cell (the reference heads' `samples` output, loglik.py:68-254) instead
    of the mean/mode point estimate; observed cells still pass through."""
    raw, miss = trained_run["raw"], trained_run["miss"]
    out_csv = str(tmp_path / "imputed_sample.csv")
    impute_cli.main([
        "--model_dir", trained_run["save"],
        "--data_csv", os.path.join(trained_run["dir"], "train_data.csv"),
        "--mask_csv", os.path.join(trained_run["dir"], "train_mask.csv"),
        "--out_csv", out_csv, "--estimator", "sample",
    ])
    imp = np.loadtxt(out_csv, delimiter=",")
    assert np.isfinite(imp).all()
    np.testing.assert_allclose(imp[miss == 1], raw[miss == 1], rtol=1e-9)
    # fills are value-space-valid: cat codes map to the column's own values,
    # counts are non-negative integers after the +1 unshift, pos is >= 0
    assert set(np.unique(imp[:, 1])) <= set(np.unique(raw[:, 1]))
    count_fills = imp[miss[:, 2] == 0, 2]
    assert (count_fills >= 0).all()
    np.testing.assert_allclose(count_fills, np.round(count_fills))
    assert (imp[miss[:, 3] == 0, 3] >= 0).all()
    # sampling differs from the mean estimate on at least one missing cell
    out_mean = str(tmp_path / "imputed_mean.csv")
    impute_cli.main([
        "--model_dir", trained_run["save"],
        "--data_csv", os.path.join(trained_run["dir"], "train_data.csv"),
        "--mask_csv", os.path.join(trained_run["dir"], "train_mask.csv"),
        "--out_csv", out_mean, "--estimator", "mean",
    ])
    mean_imp = np.loadtxt(out_mean, delimiter=",")
    assert not np.allclose(imp[miss == 0], mean_imp[miss == 0])


@pytest.mark.slow
def test_impute_nan_mask_inference(trained_run, tmp_path):
    """Without --mask_csv, NaN cells are treated as the missing ones."""
    raw, miss = trained_run["raw"], trained_run["miss"]
    holed = raw.copy()
    holed[miss == 0] = np.nan
    data_csv = str(tmp_path / "holed.csv")
    np.savetxt(data_csv, holed, delimiter=",")
    out_csv = str(tmp_path / "imputed_nan.csv")
    impute_cli.main([
        "--model_dir", trained_run["save"],
        "--data_csv", data_csv,
        "--out_csv", out_csv, "--estimator", "mode",
    ])
    imp = np.loadtxt(out_csv, delimiter=",")
    assert np.isfinite(imp).all()
    np.testing.assert_allclose(imp[miss == 1], raw[miss == 1], rtol=1e-9)
