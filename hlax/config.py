"""Config / CLI flag surface, compatible with the reference's option set.

Same flag names and ``--f=<file>`` config-file loading as
/root/reference/parse_model_args.py:9-120 (newline-separated ``--key=value``
lines, Python-literal kernel specs via ast.literal_eval), plus TPU-specific
additions (gp_dtype, model_dtype, mesh axes) that default to sane values.
"""

from __future__ import annotations

import argparse
import ast


class LoadFromFile(argparse.Action):
    """Read parameters from a config file (parse_model_args.py:9-15)."""

    def __call__(self, parser, namespace, values, option_string=None):
        with values as f:
            parser.parse_args(f.read().splitlines(), namespace)


def str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


class ModelArgs:
    """Runtime parameters (parse_model_args.py:18-109 + TPU additions)."""

    def __init__(self):
        p = argparse.ArgumentParser(
            description="Enter configuration arguments for the model")
        self.parser = p
        add = p.add_argument

        add("--data_source_path", type=str, default="./data")
        add("--save_path", type=str, default="./results")
        add("--csv_file_data", type=str, required=False)
        add("--csv_file_test_data", type=str, required=False)
        add("--csv_file_label", type=str, required=False)
        add("--csv_file_test_label", type=str, required=False)
        add("--csv_file_prediction_data", type=str, required=False)
        add("--csv_file_prediction_label", type=str, required=False)
        add("--csv_types_file", type=str, required=False)
        add("--true_mask_file", type=str, default="")
        add("--true_test_mask_file", type=str, default="")
        add("--true_prediction_mask_file", type=str, default="")
        add("--true_validation_mask_file", type=str, default="")
        add("--true_generation_mask_file", type=str, default="")
        add("--csv_file_validation_data", type=str, required=False)
        add("--csv_file_validation_label", type=str, required=False)
        add("--csv_file_generation_data", type=str, required=False)
        add("--csv_file_generation_label", type=str, required=False)
        add("--mask_file", type=str, default=None)
        add("--test_mask_file", type=str, default=None)
        add("--prediction_mask_file", type=str, default=None)
        add("--validation_mask_file", type=str, default=None)
        add("--generation_mask_file", type=str, default=None)
        add("--csv_range_file", type=str, required=False)
        add("--dataset_type", required=False,
            choices=["RotatedMNIST", "HealthMNIST", "Physionet",
                     "Physionet2019", "HeteroHealthMNIST", "PPMI"])
        add("--latent_dim", type=int, default=2)
        add("--hidden_dim", type=int, default=64)
        add("--hidden_layers", type=str)
        add("--id_covariate", type=int)
        add("--M", type=int)
        add("--P", type=int)
        add("--T", type=int)
        add("--varying_T", type=str2bool, default=False)
        add("--epochs", type=int, default=1000)
        add("--weight", type=float, default=1)
        add("--num_dim", type=int, required=False)
        add("--y_dim", type=int, required=False)
        add("--num_samples", type=int, default=1)
        add("--type_KL", required=False,
            choices=["closed", "other", "GPapprox", "GPapprox_closed"])
        add("--constrain_scales", type=str2bool, default=False)
        add("--model_params", type=str, default="model_params.pth")
        add("--gp_model_folder", type=str, default="./pretrainedVAE")
        add("--generate_plots", type=str2bool, default=False)
        add("--iter_num", type=int, default=1)
        add("--test_freq", type=int, default=50)
        add("--cat_kernel", type=ast.literal_eval)
        add("--bin_kernel", type=ast.literal_eval)
        add("--sqexp_kernel", type=ast.literal_eval)
        add("--cat_int_kernel", type=ast.literal_eval)
        add("--bin_int_kernel", type=ast.literal_eval)
        add("--covariate_missing_val", type=ast.literal_eval)
        add("--run_tests", type=str2bool, default=False)
        add("--run_validation", type=str2bool, default=False)
        add("--generate_images", type=str2bool, default=False)
        add("--results_path", type=str, required=False)
        add("--f", type=open, action=LoadFromFile)
        add("--variational_inference_training", type=str2bool, default=False)
        add("--memory_dbg", type=str2bool, default=False)
        add("--natural_gradient", type=str2bool, default=True)
        add("--natural_gradient_lr", type=float, default=0.01)
        add("--subjects_per_batch", type=int, default=20)
        add("--save_interval", type=int, default=100)
        add("--vy_init_real", type=float, default=1.0)
        add("--vy_init_pos", type=float, default=0.5)
        add("--logvar_network", type=str2bool, default=False)
        add("--conv_hivae", type=str2bool, default=False)
        add("--conv_range", type=int, default=255)
        add("--early_stopping", type=str2bool, default=False)
        add("--use_ranges", type=str2bool, default=False)

        # TPU-native additions (absent from the reference; safe defaults)
        add("--gp_dtype", type=str, default="float32",
            choices=["float32", "float64"],
            help="dtype for GP/Cholesky math (float64 needs x64 mode)")
        add("--model_dtype", type=str, default="float32",
            choices=["float32", "bfloat16", "float64"])
        add("--compute_dtype", type=str, default="",
            choices=["", "bfloat16"],
            help="selective mixed precision: run ONLY the encoder/decoder "
                 "conv+MLP stacks in this dtype, keeping params, the "
                 "reparameterization layers, observation heads, and all "
                 "GP math in model_dtype (empty = off)")
        add("--data_parallel", type=int, default=0,
            help="shard subjects over this many mesh devices (0/1 = no "
                 "data axis); training stays one XLA dispatch per epoch")
        add("--latent_parallel", type=int, default=1,
            help="shard the GP latent axis (kernels, zt, m, H, their Adam "
                 "moments) over this many mesh devices; total devices = "
                 "data_parallel x latent_parallel")
        add("--device", type=str, default="",
            choices=["", "cpu", "tpu"],
            help="force the jax platform (reference picks cuda-or-cpu, "
                 "HLVAE_main.py:85; empty = jax default)")
        add("--profile_dir", type=str, default="",
            help="write jax profiler traces here (tracing subsystem)")
        add("--epochs_per_dispatch", type=int, default=1,
            help="scan up to this many epochs per XLA dispatch (never "
                 "across a validation/save boundary); amortizes dispatch "
                 "latency through remote-device links, console output "
                 "unchanged")
        add("--scan_unroll", type=int, default=1,
            help="lax.scan unroll factor for the epoch program; >1 removes "
                 "per-trip round-trip cost on relay-attached devices at the "
                 "price of ~unroll x program size")
        add("--seed", type=int, default=0)
        add("--eps", type=float, default=None,
            help="GP jitter (default: 1e-6 for float64, 1e-4 for float32)")
        add("--nat_grad_f64", type=str2bool, default=False,
            help="run the closed-form natural-gradient chain in float64. "
                 "Off by default: the solve-based float32 chain is stable "
                 "at canonical scale (hlax/gp/elbo.py) and f64 is "
                 "software-emulated on TPU (measured 42x slower per epoch "
                 "on a v5e — baselines/ab_natgrad_f64.json)")
        add("--nat_grad_jitter", type=float, default=0.0,
            help="relative diagonal ridge on iH before its Cholesky in the "
                 "natural-gradient update (float32-chain safety margin)")
        add("--fused_conv", type=str2bool, default=False,
            help="lower the conv stack as pool-fused patch matmuls "
                 "(hlax.ops.convfuse) instead of XLA's conv lowerings. "
                 "Default False: the value-fetch-synced full-model A/B on "
                 "a v5e measures VAE fwd+bwd at 1.93 ms with the lax "
                 "lowerings vs 10.25 ms fused (QUALITY.md round-5)")
        add("--use_pallas_chol", type=str2bool, default=True,
            help="Pallas batch-on-lanes Cholesky inside the training KLD "
                 "bound (30%% faster full step on a v5e in the honest A/B; "
                 "falls back to XLA on CPU and for float64)")
        add("--eval_gp_f64", type=str2bool, default=False,
            help="compute the eval-side GP bounds (validation DUBO / "
                 "sampled ELBO / posterior prediction) in float64 for "
                 "reference-fidelity checks. The default (False) runs them "
                 "in the checkpoint dtype via the whitened W factorization "
                 "— 4.1x faster validation on TPU at a measured 0.27% "
                 "worst-row delta (baselines/eval_dtype_ab.json; regression "
                 "bound in tests/test_e2e.py)")

    def parse_options(self, argv=None):
        return vars(self.parser.parse_args(argv))
