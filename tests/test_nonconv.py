"""Non-conv (tabular) dataset through the full battery.

Exercises the reference's non-conv unseen-row rule: the LAST label column is
a globally unique row index, and test-time metrics are restricted to rows
whose index does not occur in the training set
(/root/reference/model_test.py:69-72, 157-161).
"""
import os

import numpy as np
import pytest

from hlax.cli import main as main_cli
from hlax.data.dataset import LongitudinalDataset
from hlax.data.reader import encode_raw
from hlax.eval.testing import _unseen_rows

TYPES = [{"type": "real", "dim": 1, "nclass": 1},
         {"type": "cat", "dim": 1, "nclass": 3},
         {"type": "count", "dim": 1, "nclass": 1},
         {"type": "pos", "dim": 1, "nclass": 1}]


def _make_split(rng, n_subj, T, uid_start, subj_start):
    n = n_subj * T
    raw = np.column_stack([
        rng.normal(0, 1, n), rng.integers(0, 3, n),
        rng.poisson(3.0, n).astype(float), rng.random(n) * 3,
    ])
    miss = (rng.random((n, 4)) > 0.25).astype(float)
    labels = np.column_stack([
        np.tile(np.arange(T, dtype=float), n_subj),           # time
        rng.normal(0, 1, n),                                  # extra covariate
        np.repeat(np.arange(subj_start, subj_start + n_subj,
                            dtype=float), T),                 # subject id
        np.arange(uid_start, uid_start + n, dtype=float),     # unique row idx
    ])
    return raw, miss, labels


def _write_split(d, name, raw, miss, labels):
    np.savetxt(os.path.join(d, f"{name}_data.csv"), raw, delimiter=",")
    np.savetxt(os.path.join(d, f"{name}_mask.csv"), miss, delimiter=",",
               fmt="%d")
    with open(os.path.join(d, f"{name}_label.csv"), "w") as f:
        f.write("time,extra,subject,uid\n")
        np.savetxt(f, labels, delimiter=",")


@pytest.fixture(scope="module")
def nonconv_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nonconv"))
    rng = np.random.default_rng(3)
    with open(os.path.join(d, "types.csv"), "w") as f:
        f.write("type,dim,nclass\n")
        for t in TYPES:
            f.write(f"{t['type']},{t['dim']},{t['nclass']}\n")
    tr = _make_split(rng, n_subj=6, T=5, uid_start=0, subj_start=0)
    _write_split(d, "train", *tr)
    # test split: first 5 rows reuse train uids 25..29, remaining 15 are new
    te_raw, te_miss, te_lab = _make_split(rng, n_subj=4, T=5, uid_start=25,
                                          subj_start=6)
    _write_split(d, "test", te_raw, te_miss, te_lab)
    va = _make_split(rng, n_subj=3, T=5, uid_start=100, subj_start=10)
    _write_split(d, "validation", *va)
    return d


def test_unseen_rows_label_set_difference():
    rng = np.random.default_rng(0)
    raw, miss, labels = _make_split(rng, n_subj=4, T=5, uid_start=25,
                                    subj_start=6)
    het = encode_raw(raw, TYPES, miss_mask=miss)
    ds = LongitudinalDataset(het=het, labels=labels, id_covariate=2,
                             conv=False)
    training_indexes = np.arange(30.0)   # train uids 0..29
    rows, fallback = _unseen_rows(ds, conv=False,
                                  training_indexes=training_indexes)
    # uids 25..29 are seen, 30..44 are unseen
    assert list(ds.labels[rows, -1].astype(int)) == list(range(30, 45))
    assert not fallback
    # conv=True uses the frames-5..T-1 rule regardless; with T=5 there are
    # no frames past index 4, and the empty set falls back to ALL rows
    # (instead of the reference's silent NaN metrics on empty reductions),
    # with the fallback flagged so CSV consumers can tell
    rows_conv, fallback = _unseen_rows(ds, conv=True,
                                       training_indexes=training_indexes)
    assert len(rows_conv) == len(ds)
    assert fallback


@pytest.mark.slow
def test_nonconv_cli_full_battery(nonconv_dir, tmp_path):
    save = tmp_path / "run"
    cfg = tmp_path / "cfg.txt"
    cfg.write_text("\n".join([
        f"--data_source_path={nonconv_dir}",
        f"--save_path={save}",
        "--results_path=/results",
        "--csv_types_file=types.csv",
        "--csv_file_data=train_data.csv",
        "--csv_file_label=train_label.csv",
        "--mask_file=train_mask.csv",
        "--csv_file_test_data=test_data.csv",
        "--csv_file_test_label=test_label.csv",
        "--test_mask_file=test_mask.csv",
        "--csv_file_prediction_data=train_data.csv",
        "--csv_file_prediction_label=train_label.csv",
        "--prediction_mask_file=train_mask.csv",
        "--csv_file_validation_data=validation_data.csv",
        "--csv_file_validation_label=validation_label.csv",
        "--validation_mask_file=validation_mask.csv",
        "--varying_T=True",
        "--latent_dim=4", "--id_covariate=2", "--M=8", "--P=6", "--T=5",
        "--epochs=3", "--save_interval=30", "--num_dim=4",
        "--type_KL=GPapprox_closed", "--subjects_per_batch=3",
        "--natural_gradient=True", "--constrain_scales=True",
        "--run_tests=True", "--run_validation=True",
        "--generate_images=False",
        "--cat_kernel=[2]", "--bin_kernel=[]", "--sqexp_kernel=[0]",
        "--cat_int_kernel=[{'cont_covariate':0,'cat_covariate':2}]",
        "--bin_int_kernel=[]", "--covariate_missing_val=[]",
        "--hidden_layers=[16]", "--conv_hivae=False", "--y_dim=3",
        "--gp_dtype=float64", "--model_dtype=float64",
    ]))
    out = main_cli.main([f"--f={cfg}"])
    assert np.isfinite(out["loss_arrs"]["net"]).all()
    results = str(save) + "/results"
    assert os.path.exists(os.path.join(results, "validation_results.csv"))
    assert os.path.exists(os.path.join(results, "result_error_final.csv"))
    assert os.path.exists(os.path.join(results,
                                       "partial_metrics_test_future.pickle"))
    import pandas as pd
    err = pd.read_csv(os.path.join(results, "result_error_final.csv"),
                      header=None, index_col=0)
    assert np.isfinite(err.loc["mean_GP_recon_loss"].iloc[0])


@pytest.mark.slow
def test_bfloat16_model_smoke(nonconv_dir, tmp_path):
    """--model_dtype=bfloat16 trains end-to-end with finite losses (the GP
    side stays float32; only the VAE compute path runs in bf16)."""
    save = tmp_path / "bf16_run"
    cfg = tmp_path / "bf16_cfg.txt"
    cfg.write_text("\n".join([
        f"--data_source_path={nonconv_dir}",
        f"--save_path={save}",
        "--csv_types_file=types.csv",
        "--csv_file_data=train_data.csv",
        "--csv_file_label=train_label.csv",
        "--mask_file=train_mask.csv",
        "--varying_T=True",
        "--latent_dim=4", "--id_covariate=2", "--M=8", "--P=6", "--T=5",
        "--epochs=3", "--save_interval=30", "--num_dim=4",
        "--type_KL=GPapprox_closed", "--subjects_per_batch=3",
        "--natural_gradient=True", "--constrain_scales=True",
        "--cat_kernel=[2]", "--bin_kernel=[]", "--sqexp_kernel=[0]",
        "--cat_int_kernel=[]", "--bin_int_kernel=[]",
        "--covariate_missing_val=[]",
        "--hidden_layers=[16]", "--conv_hivae=False", "--y_dim=3",
        "--gp_dtype=float32", "--model_dtype=bfloat16",
    ]))
    out = main_cli.main([f"--f={cfg}"])
    assert np.isfinite(out["loss_arrs"]["net"]).all()
    assert np.isfinite(out["loss_arrs"]["kld"]).all()
