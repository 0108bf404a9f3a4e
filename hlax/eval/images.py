"""Image generation & training-curve plotting.

Reference: ``recon_complete_gen`` / plot helpers
(/root/reference/predict_HealthMNIST.py:16-147) and ``plot_training_info``
(/root/reference/utils.py:319-392).  Matplotlib is host-side; all device work
(GP predict + decode) happens before plotting.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from hlax.data.dataset import LongitudinalDataset
from hlax.data.generate import region_indices
from hlax.eval import metrics as mx
from hlax.eval.jits import decode_fn
from hlax.eval.validate import gp_predict_dataset
from hlax.ops.normalization import batch_normalization


def convert_cat5_to_pixels(x: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """5-level codes -> pixel values 0/50/100/150/200 (HL_VAE/utils.py:168-177)."""
    out = x.copy()
    out[:, idx] = x[:, idx] * 50.0
    return out


def seqrecon_plot(X, recon_X, labels_recon, labels_train, save_file,
                  num_sets: int = 8, seq_length: int = 20):
    """Original vs reconstruction grids (predict_HealthMNIST.py:36-61)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(2 * num_sets, seq_length)
    for row in np.atleast_1d(ax).reshape(-1):
        row.set_xticks([])
        row.set_yticks([])
    fig.set_size_inches(3 * num_sets, 3 * num_sets)
    for j in range(num_sets):
        b, e = seq_length * j, seq_length * (j + 1)
        for i, t in enumerate(labels_train[b:e, 0]):
            ax[2 * j, int(t)].imshow(X[b + i].reshape(36, 36), cmap="gray",
                                     interpolation="nearest")
        for i, t in enumerate(labels_recon[b:e, 0]):
            ax[2 * j + 1, int(t)].imshow(recon_X[b + i].reshape(36, 36),
                                         cmap="gray", interpolation="nearest")
    plt.savefig(save_file)
    plt.close("all")


def recon_complete_gen(model, vae_params, spec0, k0, spec1, k1, noise, zt,
                       gen_ds: LongitudinalDataset,
                       prediction_x: np.ndarray, prediction_mu: np.ndarray,
                       id_covariate: int, results_path: str,
                       epoch: int = -1, n_rows: int = 160,
                       eps: Optional[float] = None) -> str:
    """GP-predict z for the first n_rows of the generation set, decode, remap
    5-level quadrants to pixel values, and save the recon grid PDF
    (predict_HealthMNIST.py:64-147)."""
    het = gen_ds.het
    lay = gen_ds.layout
    test_x = gen_ds.labels[:n_rows]
    z_pred = gp_predict_dataset(
        spec0, k0, spec1, k1, noise, zt,
        prediction_x, prediction_mu, prediction_x[:, id_covariate],
        test_x, test_x[:, id_covariate], eps)

    dt = model.cfg.dtype
    data = jnp.asarray(het.data[:n_rows], dt)
    mask = jnp.asarray(het.mask[:n_rows], dt)
    tmask = jnp.asarray(het.theta_mask[:n_rows], dt)
    _, norm_params = batch_normalization(data, mask, lay, gen_ds.conv)
    _, _, params, _ = decode_fn(model)(
        vae_params, jnp.asarray(z_pred, dt), data, mask, tmask, norm_params)
    _, mode_rec = mx.statistics(params, lay, gen_ds.conv)

    # back to original pixel order
    truth = np.asarray(mx.discrete_transform(data, lay))[:, lay.raw_inv]
    recon = np.asarray(mode_rec)[:, lay.raw_inv]
    mask_np = np.asarray(mask)[:, lay.raw_inv]

    # remap quantized quadrants (predict_HealthMNIST.py:105-141)
    for reg in region_indices():
        if truth[:, reg].max() == 4:
            truth = convert_cat5_to_pixels(truth, reg)
            recon = convert_cat5_to_pixels(recon, reg)
        else:
            recon[:, reg] = recon[:, reg] * 255.0

    os.makedirs(results_path, exist_ok=True)
    fname = ("recon_complete.pdf" if epoch == -1
             else f"recon_complete_{epoch}.pdf")
    out = os.path.join(results_path, fname)
    n_sets = min(8, len(test_x) // 20) or 1
    seqrecon_plot(truth * mask_np, recon, test_x, test_x, out,
                  num_sets=n_sets, seq_length=min(20, gen_ds.T_max))
    return out


def plot_training_info(save_path: str, **curves: Optional[np.ndarray]):
    """Training-curve PNGs (utils.py:319-392): net loss, NLL vs KL, VAE
    error, GP error, validation loss — each skipped gracefully if absent."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(save_path, exist_ok=True)

    def _plot(name, series, labels):
        series = [s for s in series if s is not None and len(np.atleast_1d(s))]
        if not series:
            return
        fig, ax1 = plt.subplots()
        ax1.plot(np.asarray(series[0]), color="tab:red", label=labels[0])
        ax1.legend(loc=1)
        if len(series) > 1:
            ax2 = ax1.twinx()
            ax2.plot(np.asarray(series[1]), color="tab:blue", label=labels[1])
            ax2.legend(loc=3)
        fig.tight_layout()
        plt.savefig(os.path.join(save_path, name))
        plt.close(fig)

    _plot("training_net_loss", [curves.get("net_loss")], ["Net Loss"])
    nll = curves.get("nll")
    _plot("training_kl_ll",
          [None if nll is None else -np.asarray(nll), curves.get("kld")],
          ["Training Recon LogLik per Variable", "Training KL z"])
    _plot("training_VAE_error", [curves.get("vae_error")],
          ["Training mean or VAE error"])
    _plot("test_GP_error", [curves.get("gp_error")], ["Test mean/GP error"])
    _plot("validation_net_loss", [curves.get("validation_loss")],
          ["Validation Loss"])
