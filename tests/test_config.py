"""Config surface: reference flag names, --f file loading, literal kernels."""
import pytest

from hlax.config import ModelArgs, str2bool


def test_config_file_roundtrip(tmp_path):
    cfg = tmp_path / "c.txt"
    cfg.write_text("\n".join([
        "--latent_dim=32", "--id_covariate=2", "--M=120", "--P=200", "--T=20",
        "--varying_T=True", "--type_KL=GPapprox_closed",
        "--cat_kernel=[2]", "--sqexp_kernel=[0]",
        "--cat_int_kernel=[{'cont_covariate':0,'cat_covariate':2}]",
        "--bin_kernel=[]", "--bin_int_kernel=[]", "--covariate_missing_val=[]",
        "--natural_gradient=True", "--constrain_scales=True",
        "--hidden_layers=[500]", "--conv_hivae=True", "--y_dim=5",
    ]))
    opt = ModelArgs().parse_options([f"--f={cfg}"])
    assert opt["latent_dim"] == 32 and opt["M"] == 120
    assert opt["varying_T"] is True and opt["conv_hivae"] is True
    assert opt["cat_kernel"] == [2]
    assert opt["cat_int_kernel"] == [{"cont_covariate": 0, "cat_covariate": 2}]
    assert opt["type_KL"] == "GPapprox_closed"
    # defaults present (reference parse_model_args.py defaults)
    assert opt["natural_gradient_lr"] == 0.01
    assert opt["subjects_per_batch"] == 20
    assert opt["vy_init_real"] == 1.0 and opt["vy_init_pos"] == 0.5


def test_command_line_overrides_after_file(tmp_path):
    cfg = tmp_path / "c.txt"
    cfg.write_text("--latent_dim=8\n--M=16")
    opt = ModelArgs().parse_options([f"--f={cfg}", "--latent_dim=4"])
    assert opt["latent_dim"] == 4 and opt["M"] == 16


def test_str2bool():
    for v in ("yes", "TRUE", "t", "1"):
        assert str2bool(v) is True
    for v in ("no", "False", "0"):
        assert str2bool(v) is False
    import argparse
    with pytest.raises(argparse.ArgumentTypeError):
        str2bool("maybe")


def test_canonical_config_file_parses():
    opt = ModelArgs().parse_options(["--f=configs/hlvae_config_file.txt"])
    assert opt["latent_dim"] == 32 and opt["P"] == 200 and opt["T"] == 20
    assert opt["cat_int_kernel"][2] == {"cont_covariate": 1, "cat_covariate": 4}


def test_warm_start_candidates():
    """Reference semantics (save_path + gp_model_folder, HLVAE_main.py:46)
    AND machine-absolute paths both stay reachable (round-2 ADVICE)."""
    from hlax.cli.main import warm_start_candidates
    # canonical config's '/': save_path itself, nothing else
    assert warm_start_candidates("/", "/tmp/run") == ["/tmp/run/"]
    assert warm_start_candidates("", "/tmp/run") == ["/tmp/run/"]
    # reference-style subfolder (leading slash): absolute probed first,
    # then the reference concatenation
    assert warm_start_candidates("/pre/", "/tmp/run") == [
        "/pre/", "/tmp/run/pre/"]
    # relative value: concatenation only
    assert warm_start_candidates("pre/", "/tmp/run") == ["/tmp/runpre/"]


def test_compute_dtype_flag_plumbs_to_model_config():
    """--compute_dtype parses (off by default) and _resolve_dtype maps it
    to the jnp dtype HLVAEConfig.compute_dtype expects."""
    import jax.numpy as jnp
    from hlax.cli.main import _resolve_dtype

    opt = ModelArgs().parse_options([])
    assert opt["compute_dtype"] == ""           # policy off by default
    opt = ModelArgs().parse_options(["--compute_dtype=bfloat16"])
    assert _resolve_dtype(opt["compute_dtype"]) == jnp.bfloat16
