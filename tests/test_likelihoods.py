"""Likelihood heads vs scipy closed forms (float64 on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import scipy.stats as st
from scipy.special import softmax, log_softmax, expit

from hlax.ops import likelihoods as lik


RNG = np.random.default_rng(0)


def _mask(shape):
    return (RNG.random(shape) > 0.3).astype(np.float64)


def test_real_shared_variance():
    B, d = 7, 3
    data = RNG.normal(2.0, 1.5, (B, d))
    mask = _mask((B, d))
    theta = RNG.normal(0, 1, (B, d))
    extra = RNG.normal(0, 1, (d,))
    nm = RNG.normal(0, 1, (d,))
    nv = RNG.random((d,)) + 0.5
    out = lik.loglik_real(jnp.array(data), jnp.array(mask), jnp.array(theta),
                          jnp.array(nm), jnp.array(nv), jnp.array(extra), conv=False)
    # closed form (loglik.py:45-58)
    log_vy = lik.MIN_LOG_VY + np.logaddexp(0, extra - lik.MIN_LOG_VY)
    var = np.clip(nv, 3e-4, np.inf) * np.exp(log_vy)
    mean = np.sqrt(np.clip(nv, 3e-4, np.inf)) * theta + nm
    expect = st.norm.logpdf(data, mean, np.sqrt(var))
    np.testing.assert_allclose(np.asarray(out["log_p_x"]), expect * mask, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out["log_p_x_missing"]),
                               expect * (1 - mask), rtol=1e-10)


def test_real_logvar_network():
    B, d = 5, 2
    data = RNG.normal(0, 1, (B, d))
    mask = _mask((B, d))
    theta = RNG.normal(0, 1, (B, 2 * d))
    out = lik.loglik_real(jnp.array(data), jnp.array(mask), jnp.array(theta),
                          None, None, None, conv=True)
    log_vy = lik.MIN_LOG_VY + np.logaddexp(0, theta[:, d:] - lik.MIN_LOG_VY)
    expect = st.norm.logpdf(data, theta[:, :d], np.sqrt(np.exp(log_vy)))
    np.testing.assert_allclose(np.asarray(out["log_p_x"]), expect * mask, rtol=1e-10)


def test_pos_lognormal():
    B, d = 6, 2
    data = RNG.random((B, d)) * 5
    mask = _mask((B, d))
    theta = RNG.normal(0, 1, (B, d))
    extra = RNG.normal(0, 0.3, (d,))
    nm = RNG.normal(0, 1, (d,))
    nv = RNG.random((d,)) + 0.5
    out = lik.loglik_pos(jnp.array(data), jnp.array(mask), jnp.array(theta),
                         jnp.array(nm), jnp.array(nv), jnp.array(extra))
    var = np.clip(nv, 1e-3, np.inf)
    est_mean = np.sqrt(var) * theta + nm
    est_var = var * np.exp(extra)
    # log-normal on (1+x): N(log1p(x); m, v) - log1p(x)   (loglik.py:102)
    expect = st.norm.logpdf(np.log1p(data), est_mean,
                            np.sqrt(est_var)) - np.log1p(data)
    np.testing.assert_allclose(np.asarray(out["log_p_x"]), expect * mask, rtol=1e-10)


def test_cat_crossentropy():
    B, d, c = 8, 3, 4
    codes = RNG.integers(0, c, (B, d))
    data = np.eye(c)[codes].reshape(B, d * c)
    mask = _mask((B, d))
    theta = RNG.normal(0, 1, (B, d, c))
    theta[:, :, 0] = 0.0   # pinned class
    out = lik.loglik_cat(jnp.array(data), jnp.array(mask),
                         jnp.array(theta.reshape(B, -1)), c)
    expect = np.take_along_axis(log_softmax(theta, axis=2),
                                codes[:, :, None], 2)[:, :, 0]
    np.testing.assert_allclose(np.asarray(out["log_p_x"]), expect * mask, rtol=1e-10)


def test_ordinal_cumulative_link():
    B, d, c = 6, 2, 5
    levels = RNG.integers(0, c, (B, d))
    therm = (np.arange(c)[None, None, :] <= levels[:, :, None]).astype(float)
    mask = _mask((B, d))
    theta = RNG.normal(0, 1, (B, d, c))
    out = lik.loglik_ordinal(jnp.array(therm.reshape(B, -1)), jnp.array(mask),
                             jnp.array(theta.reshape(B, -1)), c)
    # closed form (loglik.py:160-179)
    part, mean_p = theta[:, :, :-1], theta[:, :, -1]
    thr = np.cumsum(np.clip(np.logaddexp(0, part), 1e-6, 1e20), axis=2)
    mv = np.logaddexp(0, mean_p)[:, :, None]
    sig = expit(thr - mv)
    probs = (np.concatenate([sig, np.ones((B, d, 1))], 2)
             - np.concatenate([np.zeros((B, d, 1)), sig], 2))
    probs = np.clip(probs, 1e-6, 1.0)
    probs /= probs.sum(2, keepdims=True)
    expect = np.log(np.take_along_axis(probs, levels[:, :, None], 2))[:, :, 0]
    got = np.asarray(out["log_p_x"])
    np.testing.assert_allclose(got[mask == 1], (expect * mask)[mask == 1], rtol=1e-9)


def test_count_poisson():
    B, d = 6, 2
    data = RNG.integers(1, 10, (B, d)).astype(float)
    mask = _mask((B, d))
    theta = RNG.normal(1, 1, (B, d))
    out = lik.loglik_count(jnp.array(data), jnp.array(mask), jnp.array(theta))
    lam = np.clip(np.logaddexp(0, theta), 1e-6, 1e20)
    expect = st.poisson.logpmf(data, lam)
    np.testing.assert_allclose(np.asarray(out["log_p_x"]), expect * mask, rtol=1e-10)


def test_beta():
    B, d = 6, 2
    ranges = np.array([[0.0, 10.0], [2.0, 4.0]])
    data = RNG.random((B, d)) * (ranges[:, 1] - ranges[:, 0]) * 0.9 + ranges[:, 0]
    mask = _mask((B, d))
    theta = RNG.normal(0, 1, (B, d))
    disp = np.array([1.3])
    out = lik.loglik_beta(jnp.array(data), jnp.array(mask), jnp.array(theta),
                          jnp.array(ranges), jnp.array(disp))
    x = (data - ranges[:, 0]) / (ranges[:, 1] - ranges[:, 0]) + 1e-6
    m = st.norm.cdf(theta)
    dsp = np.clip(np.logaddexp(0, disp), 1e-6, 1e20)
    a, b = dsp * m, dsp * (1 - m)
    expect = st.beta.logpdf(x, a, b)
    np.testing.assert_allclose(np.asarray(out["log_p_x"]), expect * mask,
                               rtol=1e-7, atol=1e-7)


def test_samples_shapes_and_ranges():
    key = jax.random.PRNGKey(0)
    p_cat = jnp.log(jnp.ones((4, 3, 5)) / 5)
    s = lik.sample_cat(p_cat, key)
    assert s.shape == (4, 3, 5)
    np.testing.assert_allclose(np.asarray(s.sum(-1)), 1.0)
    s = lik.sample_ordinal(jnp.ones((4, 3, 5)) / 5, key)
    assert s.shape == (4, 3, 5)
    # thermometer: monotone non-increasing along classes
    sn = np.asarray(s)
    assert (np.diff(sn, axis=-1) <= 0).all()
    lam = jnp.ones((4, 2)) * 3.0
    s = lik.sample_count(lam, key)
    assert (np.asarray(s) >= 0).all()
