"""Heterogeneous log-likelihood heads as pure JAX functions.

Math parity with the reference heads (/root/reference/HL_VAE/loglik.py:27-256),
re-expressed as fused, mask-weighted XLA ops over grouped blocks:

  * real    (loglik.py:27-70):  Gaussian; variance from a softplus-floored
            shared parameter (``extra``) or the head's logvar columns; affine
            de-normalization by batch stats.
  * pos     (loglik.py:73-121): log-normal on log1p(data), incl. the -log(1+x)
            Jacobian term.
  * cat     (loglik.py:124-146): logits with class 0 pinned at the head,
            log-softmax cross-entropy.  (The reference normalizes twice —
            logsumexp then log_softmax — which is an identity; we normalize
            once.)
  * ordinal (loglik.py:149-188): cumulative-link: softplus-threshold cumsum
            minus softplus mean, sigmoid differences, renormalized.
  * count   (loglik.py:191-213): Poisson with softplus rate.
  * beta    (loglik.py:216-256): mean via the Normal CDF, global dispersion.

Every head returns a dict with keys
  log_p_x          [B, d]  (mask-weighted)
  log_p_x_missing  [B, d]  ((1-mask)-weighted)
  params           per-type point-estimate parameters (for the metrics kit)
and sampling lives in ``sample_*`` companions with explicit PRNG keys.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln, ndtr

MIN_LOG_VY = -8.0
_LOG_2PI = math.log(2.0 * math.pi)


def _softplus(x):
    return jax.nn.softplus(x)


# ---------------------------------------------------------------------------
# real
# ---------------------------------------------------------------------------

def loglik_real(data, mask, theta, norm_mean, norm_var, extra_log_vy, conv):
    """data [B,d] (already /255 in conv mode), theta [B,d] or [B,2d].

    norm_mean/norm_var: per-column batch stats (None in conv mode -> 0/1).
    extra_log_vy: shared per-column raw log-variance [d] or None
    (None -> variance from theta's second half; HLVAE logvar_network mode).
    """
    d = data.shape[1]
    if norm_mean is None:
        data_mean = jnp.zeros((d,), data.dtype)
        data_var = jnp.ones((d,), data.dtype)
    else:
        data_mean = norm_mean
        data_var = jnp.clip(norm_var, 3e-4, jnp.inf)   # epsilon=3e-4, loglik.py:30

    if extra_log_vy is None:
        est_mean, est_raw = theta[:, :d], theta[:, d:]
    else:
        est_mean, est_raw = theta[:, :d], jnp.broadcast_to(extra_log_vy, (1, d))
    est_log_vy = MIN_LOG_VY + _softplus(est_raw - MIN_LOG_VY)
    est_var = jnp.exp(est_log_vy)

    est_mean = jnp.sqrt(data_var) * est_mean + data_mean
    est_var = data_var * est_var

    log_p = (-0.5 * (data - est_mean) ** 2 / est_var
             - 0.5 * _LOG_2PI - 0.5 * jnp.log(est_var))
    return {
        "log_p_x": log_p * mask,
        "log_p_x_missing": log_p * (1.0 - mask),
        "params": (est_mean, jnp.broadcast_to(est_var, est_mean.shape)),
    }


def sample_real(params, key):
    mean, var = params
    return mean + jnp.sqrt(var) * jax.random.normal(key, mean.shape, mean.dtype)


# ---------------------------------------------------------------------------
# pos (log-normal)
# ---------------------------------------------------------------------------

def loglik_pos(data, mask, theta, norm_mean_log, norm_var_log, extra_log_vy):
    d = data.shape[1]
    log_data_var = jnp.clip(norm_var_log, 1e-3, jnp.inf)   # epsilon=1e-3
    log_data = jnp.log1p(data)

    est_mean = theta[:, :d]
    if extra_log_vy is None:   # logvar_network: variance from the head
        est_var = log_data_var * jnp.exp(theta[:, d:])
    else:                       # shared parameter, NO softplus floor (loglik.py:100)
        est_var = log_data_var * jnp.exp(jnp.broadcast_to(extra_log_vy, (1, d)))

    est_mean = jnp.sqrt(log_data_var) * est_mean + norm_mean_log

    log_p = (-0.5 * (log_data - est_mean) ** 2 / est_var
             - 0.5 * jnp.log(2.0 * math.pi * est_var) - log_data)
    return {
        "log_p_x": log_p * mask,
        "log_p_x_missing": log_p * (1.0 - mask),
        "params": (est_mean, jnp.broadcast_to(est_var, est_mean.shape)),
    }


def sample_pos(params, key):
    mean, var = params
    z = mean + jnp.sqrt(var) * jax.random.normal(key, mean.shape, mean.dtype)
    return jnp.clip(jnp.exp(z) - 1.0, 0.0, 1e20)


# ---------------------------------------------------------------------------
# cat
# ---------------------------------------------------------------------------

def loglik_cat(data, mask, theta, nclass):
    """data [B, d*c] one-hot, theta [B, d*c] logits (class 0 pinned to 0)."""
    b = data.shape[0]
    logits = theta.reshape(b, -1, nclass)
    log_pi = jax.nn.log_softmax(logits, axis=2)
    log_p = jnp.sum(data.reshape(b, -1, nclass) * log_pi, axis=-1)
    return {
        "log_p_x": log_p * mask,
        "log_p_x_missing": log_p * (1.0 - mask),
        "params": log_pi,   # [B, d, c]
    }


def sample_cat(params, key):
    log_pi = params
    codes = jax.random.categorical(key, log_pi, axis=-1)
    return jax.nn.one_hot(codes, log_pi.shape[-1], dtype=log_pi.dtype)


# ---------------------------------------------------------------------------
# ordinal (cumulative link)
# ---------------------------------------------------------------------------

def ordinal_probs(theta, nclass):
    """theta [B, d*c] -> class probabilities [B, d, c] (loglik.py:160-178)."""
    b = theta.shape[0]
    th = theta.reshape(b, -1, nclass)
    partition, mean_param = th[:, :, :-1], th[:, :, -1]
    mean_value = _softplus(mean_param)[:, :, None]
    theta_values = jnp.cumsum(jnp.clip(_softplus(partition), 1e-6, 1e20), axis=2)
    sig = jax.nn.sigmoid(theta_values - mean_value)
    ones = jnp.ones(sig.shape[:-1] + (1,), sig.dtype)
    zeros = jnp.zeros_like(ones)
    probs = jnp.concatenate([sig, ones], 2) - jnp.concatenate([zeros, sig], 2)
    probs = jnp.clip(probs, 1e-6, 1.0)
    probs = probs / probs.sum(axis=2, keepdims=True)
    return probs


def loglik_ordinal(data, mask, theta, nclass):
    """data [B, d*c] thermometer, theta [B, d*c] (c-1 thresholds + mean)."""
    b = data.shape[0]
    probs = ordinal_probs(theta, nclass)
    therm = data.reshape(b, -1, nclass)
    # thermometer -> class index: sum(therm) - 1; force 1 where unobserved
    vals = jnp.sum(therm, axis=2).astype(jnp.int32)
    vals = jnp.where(mask == 0, 1, vals)
    true_one_hot = jax.nn.one_hot(vals - 1, nclass, dtype=theta.dtype)
    log_p = jnp.sum(true_one_hot * jnp.log(probs), axis=-1)
    return {
        "log_p_x": log_p * mask,
        "log_p_x_missing": log_p * (1.0 - mask),
        "params": probs,   # [B, d, c]
    }


def sample_ordinal(params, key):
    probs = params
    nclass = probs.shape[-1]
    codes = 1 + jax.random.categorical(
        key, jnp.log(jnp.clip(probs, 1e-6, 1e20)), axis=-1
    )
    # thermometer encoding of the sampled level (sequence_mask, utils.py:79-85)
    ar = jnp.arange(1, nclass + 1)
    return (ar[None, None, :] <= codes[:, :, None]).astype(probs.dtype)


# ---------------------------------------------------------------------------
# count (Poisson)
# ---------------------------------------------------------------------------

def loglik_count(data, mask, theta):
    lam = jnp.clip(_softplus(theta), 1e-6, 1e20)
    log_p = data * jnp.log(lam) - lam - gammaln(data + 1.0)
    return {
        "log_p_x": log_p * mask,
        "log_p_x_missing": log_p * (1.0 - mask),
        "params": lam,
    }


def sample_count(params, key):
    return jax.random.poisson(key, params).astype(params.dtype)


# ---------------------------------------------------------------------------
# beta
# ---------------------------------------------------------------------------

def loglik_beta(data, mask, theta, ranges, extra_disp):
    """data [B,d] in original scale, ranges [d,2] (min, max), extra_disp scalar."""
    data_min, data_max = ranges[:, 0], ranges[:, 1]
    x = (data - data_min) / (data_max - data_min) + 1e-6
    est_mean = ndtr(theta)                     # Normal(0,1) CDF (loglik.py:241-242)
    disp = jnp.clip(_softplus(extra_disp), 1e-6, 1e20)
    alpha = disp * est_mean
    beta = disp * (1.0 - est_mean)
    log_p = ((alpha - 1.0) * jnp.log(x) + (beta - 1.0) * jnp.log(1.0 - x)
             - gammaln(alpha) - gammaln(beta) + gammaln(alpha + beta))
    return {
        "log_p_x": log_p * mask,
        "log_p_x_missing": log_p * (1.0 - mask),
        "params": (alpha, beta),
    }


def sample_beta(params, key, ranges):
    alpha, beta = params
    s = jax.random.beta(key, alpha, beta)
    return s * (ranges[:, 1] - ranges[:, 0]) + ranges[:, 0]
