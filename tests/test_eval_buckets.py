"""Bucket-padded varying-T eval: same values, O(buckets) compiles.

The eval-path GP bounds (DUBO / sample-ELBO / predict packing) pad each
equal-T group to power-of-two (S, T) buckets; a ragged dataset must
(a) produce the same values as exact-shape calls (padding contributes zero)
and (b) not recompile on a second validation pass.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from hlax.data.reader import encode_raw
from hlax.data.dataset import LongitudinalDataset
from hlax.gp import elbo as gp_elbo
from hlax.gp.kernels import build_kernel_specs, init_kernel_params
from hlax.eval import validate as val

TYPES = [{"type": "real", "dim": 1, "nclass": 1},
         {"type": "real", "dim": 1, "nclass": 1}]


def _ragged_ds(lengths, seed=0):
    rng = np.random.default_rng(seed)
    n = int(sum(lengths))
    raw = rng.normal(0, 1, (n, 2))
    het = encode_raw(raw, TYPES)
    labels = np.zeros((n, 3))
    r = 0
    for s, t in enumerate(lengths):
        labels[r:r + t, 0] = np.arange(t)
        labels[r:r + t, 2] = s
        r += t
    return LongitudinalDataset(het=het, labels=labels, id_covariate=2,
                               conv=False)


@pytest.fixture(scope="module")
def gp_setup():
    L, M, Q = 3, 5, 3
    rng = np.random.default_rng(1)
    spec0, spec1 = build_kernel_specs([2], [], [0], [], [], [], 2)
    k0 = init_kernel_params(spec0, L, jnp.float64)
    k1 = init_kernel_params(spec1, L, jnp.float64)
    noise = jnp.ones((L,), jnp.float64)
    zt = jnp.asarray(rng.normal(0, 1, (L, M, Q)))
    return spec0, k0, spec1, k1, noise, zt, L


def test_bucketed_dubo_matches_exact(gp_setup):
    spec0, k0, spec1, k1, noise, zt, L = gp_setup
    lengths = [3, 5, 5, 7]          # ragged: three distinct T groups
    ds = _ragged_ds(lengths)
    rng = np.random.default_rng(2)
    mu = rng.normal(0, 1, (len(ds), L))
    lv = rng.normal(-1, 0.3, (len(ds), L))

    total_bucketed = val.gp_loss_dubo(spec0, k0, spec1, k1, noise, zt, ds,
                                      mu, lv)

    # exact-shape oracle: per-group direct calls, no padding
    total_exact = 0.0
    lens = ds.subject_end - ds.subject_start
    for T in np.unique(lens):
        sel = np.nonzero(lens == T)[0]
        S = len(sel)
        x = np.zeros((S, T, ds.Q))
        m = np.zeros((S, T, L))
        v = np.zeros((S, T, L))
        for i, s in enumerate(sel):
            a, b = ds.subject_start[s], ds.subject_end[s]
            x[i], m[i], v[i] = ds.labels[a:b], mu[a:b], lv[a:b]
        total_exact += float(gp_elbo.deviance_upper_bound_jit(
            spec0, k0, spec1, k1, noise, zt, jnp.asarray(x),
            jnp.ones((S, T)), jnp.asarray(m), jnp.asarray(v), 1e-6))

    np.testing.assert_allclose(total_bucketed, total_exact, rtol=1e-8)


def test_bucketed_sampled_matches_exact(gp_setup):
    spec0, k0, spec1, k1, noise, zt, L = gp_setup
    ds = _ragged_ds([4, 6])
    rng = np.random.default_rng(3)
    mu = rng.normal(0, 1, (len(ds), L))
    lv = np.full((len(ds), L), -30.0)    # ~deterministic sample = mu

    got = val.gp_loss_sampled(spec0, k0, spec1, k1, noise, zt, ds, mu, lv,
                              num_samples=1)
    # oracle with exact shapes: same z_sample (lv -> exp(0.5*lv) ~ 3e-7)
    total = 0.0
    lens = ds.subject_end - ds.subject_start
    for T in np.unique(lens):
        sel = np.nonzero(lens == T)[0]
        S = len(sel)
        x = np.zeros((S, T, ds.Q))
        y = np.zeros((S, T, L))
        for i, s in enumerate(sel):
            a, b = ds.subject_start[s], ds.subject_end[s]
            x[i], y[i] = ds.labels[a:b], mu[a:b]
        total += -float(gp_elbo.sample_elbo_jit(
            spec0, k0, spec1, k1, noise, zt, jnp.asarray(x),
            jnp.ones((S, T)), jnp.asarray(y), 1e-6))
    np.testing.assert_allclose(got, total, rtol=1e-5)


def test_no_recompile_on_second_pass(gp_setup):
    spec0, k0, spec1, k1, noise, zt, L = gp_setup
    # two ragged datasets with DIFFERENT raggedness but same buckets
    ds1 = _ragged_ds([3, 5, 6, 7], seed=10)
    ds2 = _ragged_ds([2, 5, 6, 8], seed=11)
    rng = np.random.default_rng(4)

    def run(ds):
        mu = rng.normal(0, 1, (len(ds), L))
        lv = rng.normal(-1, 0.3, (len(ds), L))
        val.gp_loss_dubo(spec0, k0, spec1, k1, noise, zt, ds, mu, lv)

    run(ds1)
    n_compiles = gp_elbo.deviance_upper_bound_jit._cache_size()
    run(ds1)              # second validation pass: zero new compiles
    assert gp_elbo.deviance_upper_bound_jit._cache_size() == n_compiles
    run(ds2)              # different raggedness, shared buckets: T=2 - the
    # only new group shape - buckets to (1..4); groups {5},{6},{8} hit the
    # (1, 8) and (1, 16) entries already compiled for ds1
    extra = gp_elbo.deviance_upper_bound_jit._cache_size() - n_compiles
    assert extra <= 1
