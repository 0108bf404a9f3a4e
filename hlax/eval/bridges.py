"""Misc Health-MNIST converters + the Gaussian->categorical density bridge.

Reference: /root/reference/HL_VAE/utils.py:146-214.  These helpers let a
real-likelihood (conv) model be scored against the 5-level categorical
encoding of the quantized Health-MNIST quadrants:

  * pixel <-> 5-level code converters (utils.py:156-186)
  * ``gaussian_to_categorical_density``: bucket a Gaussian decoder head into
    the 5 levels via CDF differences and score the one-hot data
    (utils.py:188-214)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import ndtr


def convert_cat5_to_pixels(x, idx):
    """5-level codes -> pixel values 0/50/100/150/200 (utils.py:168-177)."""
    return x.at[..., idx].set(x[..., idx] * 50.0) if hasattr(x, "at") else x


def convert_pixels_to_cat5(x, idx):
    """[0,1]-scaled pixels -> 5-level codes (utils.py:179-186)."""
    v = x[..., idx]
    code = (jnp.where(v >= 200 / 255, 4,
            jnp.where(v >= 150 / 255, 3,
            jnp.where(v >= 100 / 255, 2,
            jnp.where(v >= 50 / 255, 1, 0))))).astype(x.dtype)
    return x.at[..., idx].set(code)


def gaussian_to_categorical_density(est_mean, est_logvar, data01):
    """Log-density of 5-level codes under a bucketed Gaussian head
    (utils.py:188-214).

    est_mean/est_logvar [B, D] (decoder real params, [0,1] scale);
    data01 [B, D] pixels in [0,1].  Returns log_p [B, D].
    """
    codes = (jnp.where(data01 >= 200 / 255, 4,
             jnp.where(data01 >= 150 / 255, 3,
             jnp.where(data01 >= 100 / 255, 2,
             jnp.where(data01 >= 50 / 255, 1, 0))))).astype(jnp.int32)
    one_hot = jax.nn.one_hot(codes, 5, dtype=est_mean.dtype)

    var = jnp.clip(jnp.exp(est_logvar), 0.0, 1e20)
    sd = jnp.sqrt(var)
    cdf = lambda v: ndtr((v - est_mean) / sd)
    p0 = cdf(1 / 5)
    p1 = cdf(2 / 5) - p0
    p2 = cdf(3 / 5) - p0 - p1
    p3 = cdf(4 / 5) - p0 - p1 - p2
    p4 = 1.0 - p0 - p1 - p2 - p3
    pi = jnp.stack([p0, p1, p2, p3, p4], axis=-1)
    pi = jnp.clip(pi, jnp.exp(-10.0), 1e20)
    log_pi = jnp.clip(jnp.log(pi), -10.0, 1e20)
    log_pi = jax.nn.log_softmax(log_pi, axis=-1)
    return jnp.sum(one_hot * log_pi, axis=-1)
