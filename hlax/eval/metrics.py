"""Metrics/statistics kit: reconstructions, errors, partial log-likelihoods.

Reference semantics: /root/reference/HL_VAE/read_functions.py:206-453
(``statistics``, ``error_computation``, ``partial_loglikelihood``,
``mean_imputation``, ``discrete_variables_transformation``).  All functions
work in grouped column order (hlax.types); use ``layout.raw_inv`` to report
in original variable order.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from hlax.types import TypeLayout


def discrete_transform(data, layout: TypeLayout):
    """Expanded data -> raw-space values [B, n_raw]: cat -> argmax code,
    ordinal -> level (sum of thermometer - 1), others passthrough
    (read_functions.py:221-235)."""
    blocks = []
    for g in layout.groups:
        d = data[:, g.exp_slice[0]:g.exp_slice[1]]
        if g.kind == "cat":
            blocks.append(jnp.argmax(
                d.reshape(d.shape[0], g.n_vars, g.nclass), axis=2).astype(d.dtype))
        elif g.kind == "ordinal":
            blocks.append(jnp.sum(
                d.reshape(d.shape[0], g.n_vars, g.nclass), axis=2) - 1.0)
        else:
            blocks.append(d)
    return jnp.concatenate(blocks, axis=1)


def statistics(params_list, layout: TypeLayout, conv: bool,
               beta_eq_mode_value: float = 0.5):
    """Per-type point estimates from likelihood params
    (read_functions.py:268-339).  params_list is the per-group ``params``
    output of HLVAE.loglik.  Returns (mean [B,n_raw], mode [B,n_raw]).

    Deviation: the reference draws the beta mode uniformly at random when
    alpha == beta == 1 (read_functions.py:334); we use a fixed value.
    """
    means, modes = [], []
    for g, p in zip(layout.groups, params_list):
        if g.kind == "real":
            est_mean, _ = p
            means.append(est_mean)
            modes.append(est_mean)
        elif g.kind == "pos":
            mu, var = p
            means.append(jnp.exp(mu + 0.5 * var) - 1.0)
            modes.append(jnp.exp(mu - var) - 1.0)
        elif g.kind == "count":
            means.append(p)
            modes.append(jnp.floor(p))
        elif g.kind in ("cat", "ordinal"):
            am = jnp.argmax(p, axis=2).astype(p.dtype)
            means.append(am)
            modes.append(am)
        else:   # beta
            alpha, beta = p
            ranges = np.asarray(layout.beta_ranges)
            dmin = jnp.asarray(ranges[:, 0], alpha.dtype)
            dmax = jnp.asarray(ranges[:, 1], alpha.dtype)
            means.append(alpha / (alpha + beta) * (dmax - dmin) + dmin)
            mode = jnp.where(
                (alpha > 1) & (beta > 1),
                (alpha - 1) / jnp.maximum(alpha + beta - 2, 1e-12),
                jnp.where((alpha > 1) & (beta <= 1), 1.0,
                          jnp.where((alpha == 1) & (beta == 1),
                                    beta_eq_mode_value, 0.0)))
            modes.append(mode * (dmax - dmin) + dmin)
    return jnp.concatenate(means, axis=1), jnp.concatenate(modes, axis=1)


def sampled_reconstruction(params_list, layout: TypeLayout, key, conv: bool):
    """Raw-space sampled reconstruction [B, n_raw] from likelihood params.

    The reference's likelihood heads each emit a ``samples`` tensor next to
    the point estimates (loglik.py:68, 118, 141, 184, 211, 254); this is the
    hlax equivalent, built on the tested ``sample_*`` companions
    (hlax.ops.likelihoods) and reported in the same grouped raw space as
    ``statistics`` (cat/ordinal as 0-based class codes, numeric types in
    data units) so it drops into the same error battery.
    """
    import jax

    from hlax.ops import likelihoods as lik

    keys = jax.random.split(key, max(len(layout.groups), 1))
    blocks = []
    for g, p, k in zip(layout.groups, params_list, keys):
        if g.kind == "real":
            blocks.append(lik.sample_real(p, k))
        elif g.kind == "pos":
            blocks.append(lik.sample_pos(p, k))
        elif g.kind == "count":
            blocks.append(lik.sample_count(p, k))
        elif g.kind == "cat":
            # one-hot sample -> class code (discrete_transform semantics)
            oh = lik.sample_cat(p, k)
            blocks.append(jnp.argmax(oh, axis=2).astype(p.dtype))
        elif g.kind == "ordinal":
            # thermometer sample -> level code: sum(therm) - 1
            th = lik.sample_ordinal(p, k)
            blocks.append(jnp.sum(th, axis=2) - 1.0)
        else:   # beta
            ranges = jnp.asarray(np.asarray(layout.beta_ranges), p[0].dtype)
            blocks.append(lik.sample_beta(p, k, ranges))
    return jnp.concatenate(blocks, axis=1)


def get_norm_terms(x, true_mask):
    """Observed-range per column (HL_VAE/utils.py:216-225)."""
    big = jnp.where(true_mask > 0, x, -jnp.inf)
    small = jnp.where(true_mask > 0, x, jnp.inf)
    return jnp.max(big, axis=0) - jnp.min(small, axis=0)


def error_computation(
    x_true, x_hat, layout: TypeLayout, mask,
    conv: bool, use_ranges: bool = False,
    true_mask=None, mean_imp_error: bool = False, dim: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, Dict[str, jnp.ndarray]]]:
    """Per-variable normalized errors split observed/missing/all
    (read_functions.py:342-412).  Inputs in grouped raw space [B, n_raw].
    Returns (error_observed [n_raw], error_missing [n_raw], partial dict)."""
    if true_mask is None:
        true_mask = jnp.ones_like(mask)
    err_blocks = []
    for g in layout.groups:
        sl = slice(g.raw_slice[0], g.raw_slice[1])
        xt, xh = x_true[:, sl], x_hat[:, sl]
        tm = true_mask[:, sl]
        if g.kind == "cat":
            err = (xt != xh).astype(xt.dtype)
        elif g.kind == "ordinal":
            err = jnp.abs(xt - xh) / g.nclass
        else:
            if g.kind == "beta":
                if conv:
                    norm = 255.0
                elif use_ranges:
                    r = np.asarray(layout.beta_ranges)
                    norm = jnp.asarray(r[:, 1] - r[:, 0], xt.dtype)
                else:
                    norm = 1.0
            else:
                if conv:
                    norm = 1.0
                    xt = xt / 255.0
                    if mean_imp_error or g.kind in ("pos", "count"):
                        xh = xh / 255.0
                else:
                    norm = get_norm_terms(xt, tm)
                    norm = jnp.where(norm == 0, 1.0, norm)
            err = ((xh - xt) ** 2) / norm ** 2
        err_blocks.append(err)
    all_error = jnp.concatenate(err_blocks, axis=1)

    known_missing = true_mask * (1.0 - mask)
    def _avg(w):
        s = jnp.sum(w, axis=dim)
        return jnp.sum(all_error * w, axis=dim) / jnp.where(s == 0, 1.0, s)

    error_observed = _avg(mask)
    error_missing = _avg(known_missing)
    error_all = _avg(true_mask)

    # RMSE for non-discrete variables (read_functions.py:388-393)
    kinds = layout.var_kinds_grouped()
    sq = jnp.asarray(~np.isin(kinds, ("cat", "ordinal")))
    rt = lambda e: jnp.where(sq, jnp.sqrt(e), e)
    error_observed, error_missing, error_all = (
        rt(error_observed), rt(error_missing), rt(error_all))

    partial: Dict[str, Dict[str, jnp.ndarray]] = {}
    pos = 0
    for g in layout.groups:
        sl = slice(g.raw_slice[0], g.raw_slice[1])
        d = partial.setdefault(g.kind, {"error_missing": [], "error_observed": [],
                                        "error_all": []})
        d["error_missing"].append(error_missing[sl])
        d["error_observed"].append(error_observed[sl])
        d["error_all"].append(error_all[sl])
        pos += g.n_vars
    for k in partial:
        for kk in partial[k]:
            partial[k][kk] = jnp.concatenate(partial[k][kk])
    return error_observed, error_missing, partial


def partial_loglikelihood(log_p_x, log_p_x_missing, layout: TypeLayout,
                          mask, true_mask=None, dim: int = 0
                          ) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Per-type observed/missing/all mean log-likelihoods per variable
    (read_functions.py:415-446)."""
    if true_mask is None:
        true_mask = jnp.ones_like(mask)
    known_missing = true_mask * (1.0 - mask)
    ms = jnp.sum(mask, axis=dim)
    ms = jnp.where(ms == 0, 1.0, ms)
    kms = jnp.sum(known_missing, axis=dim)
    kms = jnp.where(kms == 0, 1.0, kms)
    ll_obs = jnp.sum(log_p_x * mask, axis=dim) / ms
    ll_mis = jnp.sum(log_p_x_missing * known_missing, axis=dim) / kms
    ll_all = jnp.mean(log_p_x + log_p_x_missing, axis=dim)

    out: Dict[str, Dict[str, jnp.ndarray]] = {}
    for g in layout.groups:
        sl = slice(g.raw_slice[0], g.raw_slice[1])
        d = out.setdefault(g.kind, {"LL_missing": [], "LL_observed": [],
                                    "LL_all": []})
        d["LL_missing"].append(ll_mis[sl])
        d["LL_observed"].append(ll_obs[sl])
        d["LL_all"].append(ll_all[sl])
    for k in out:
        for kk in out[k]:
            out[k][kk] = jnp.concatenate(out[k][kk])
    return out


def mean_imputation(x_true, mask, layout: TypeLayout) -> np.ndarray:
    """Observed-mode (discrete) / observed-mean (numeric) imputation baseline
    (read_functions.py:239-265).  Host-side numpy; grouped raw space."""
    x_true = np.asarray(x_true)
    mask = np.asarray(mask)
    out = x_true.copy()
    kinds = layout.var_kinds_grouped()
    for j in range(x_true.shape[1]):
        obs = x_true[mask[:, j] == 1, j]
        if kinds[j] in ("cat", "ordinal"):
            if obs.size:
                vals, counts = np.unique(obs, return_counts=True)
                fill = vals[np.argmax(counts)]
            else:
                fill = 0.0
        else:
            fill = obs.mean() if obs.size else 0.0
        out[:, j] = x_true[:, j] * mask[:, j] + fill * (1 - mask[:, j])
    return out
