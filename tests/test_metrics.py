"""Metrics kit vs hand-computed values (read_functions.py:206-453 semantics)."""
import numpy as np
import jax.numpy as jnp

from hlax.data.reader import encode_raw
from hlax.eval import metrics as mx

TYPES = [
    {"type": "real", "dim": 1, "nclass": 1},
    {"type": "cat", "dim": 1, "nclass": 3},
    {"type": "ordinal", "dim": 1, "nclass": 4},
    {"type": "count", "dim": 1, "nclass": 1},
]

RNG = np.random.default_rng(5)


def _ds(n=20):
    raw = np.column_stack([
        RNG.normal(0, 2, n),
        RNG.integers(0, 3, n).astype(float),
        RNG.integers(0, 4, n).astype(float),
        RNG.integers(1, 9, n).astype(float),
    ])
    miss = (RNG.random((n, 4)) > 0.3).astype(float)
    return raw, encode_raw(raw, TYPES, miss_mask=miss)


def test_discrete_transform_roundtrip():
    raw, ds = _ds()
    lay = ds.layout
    vals = np.asarray(mx.discrete_transform(jnp.asarray(ds.data), lay))
    vals = vals[:, lay.raw_inv]
    # cat/ordinal recover integer codes; count keeps the +1 shift? (no: count
    # raw min is 1 -> no shift); real passthrough
    np.testing.assert_allclose(vals[:, 0], raw[:, 0])
    np.testing.assert_array_equal(vals[:, 1], raw[:, 1])
    np.testing.assert_array_equal(vals[:, 2], raw[:, 2])
    np.testing.assert_array_equal(vals[:, 3], raw[:, 3])


def test_error_computation_values():
    raw, ds = _ds(10)
    lay = ds.layout
    truth = np.asarray(mx.discrete_transform(jnp.asarray(ds.data), lay))
    pred = truth.copy()
    # grouped order: cat, count, ordinal, real
    g_cat = [g for g in lay.groups if g.kind == "cat"][0]
    g_real = [g for g in lay.groups if g.kind == "real"][0]
    pred[0, g_cat.raw_slice[0]] = (pred[0, g_cat.raw_slice[0]] + 1) % 3
    pred[:, g_real.raw_slice[0]] += 1.0   # constant offset
    obs, mis, partial = mx.error_computation(
        jnp.asarray(truth), jnp.asarray(pred), lay, jnp.asarray(ds.mask),
        conv=False)
    obs = np.asarray(obs)
    # cat error = fraction mismatched among observed
    m = ds.mask[:, g_cat.raw_slice[0]]
    expect_cat = ((truth[:, g_cat.raw_slice[0]] != pred[:, g_cat.raw_slice[0]])
                  * m).sum() / max(m.sum(), 1)
    np.testing.assert_allclose(obs[g_cat.raw_slice[0]], expect_cat)
    # real error: offset 1 / observed range, RMSE -> 1/range
    col = truth[:, g_real.raw_slice[0]]
    rng_ = col.max() - col.min()
    np.testing.assert_allclose(obs[g_real.raw_slice[0]], 1.0 / rng_, rtol=1e-9)
    assert set(partial) == {"cat", "count", "ordinal", "real"}


def test_mean_imputation_mode_and_mean():
    raw, ds = _ds(30)
    lay = ds.layout
    truth = np.asarray(mx.discrete_transform(jnp.asarray(ds.data), lay))
    imp = mx.mean_imputation(truth, ds.mask, lay)
    kinds = lay.var_kinds_grouped()
    for j in range(truth.shape[1]):
        obs = truth[ds.mask[:, j] == 1, j]
        missing_rows = ds.mask[:, j] == 0
        if not missing_rows.any():
            continue
        if kinds[j] in ("cat", "ordinal"):
            vals, counts = np.unique(obs, return_counts=True)
            assert np.all(imp[missing_rows, j] == vals[np.argmax(counts)])
        else:
            np.testing.assert_allclose(imp[missing_rows, j], obs.mean())
        # observed entries unchanged
        np.testing.assert_array_equal(imp[~missing_rows, j], truth[~missing_rows, j])


def test_partial_loglikelihood_split():
    raw, ds = _ds(15)
    lay = ds.layout
    lp = RNG.normal(-1, 1, (15, 4)) * ds.mask
    lpm = RNG.normal(-2, 1, (15, 4)) * (1 - ds.mask)
    out = mx.partial_loglikelihood(jnp.asarray(lp), jnp.asarray(lpm), lay,
                                   jnp.asarray(ds.mask))
    for g in lay.groups:
        j = g.raw_slice[0]
        m = ds.mask[:, j]
        want_obs = (lp[:, j] * m).sum() / max(m.sum(), 1)
        got = np.asarray(out[g.kind]["LL_observed"])[0]
        np.testing.assert_allclose(got, want_obs, rtol=1e-12)
        want_mis = (lpm[:, j] * (1 - m)).sum() / max((1 - m).sum(), 1)
        np.testing.assert_allclose(np.asarray(out[g.kind]["LL_missing"])[0],
                                   want_mis, rtol=1e-12)


def test_statistics_pos_and_count():
    lay = encode_raw(np.column_stack([np.ones(4), np.ones(4) * 2]),
                     [{"type": "pos", "dim": 1, "nclass": 1},
                      {"type": "count", "dim": 1, "nclass": 1}]).layout
    mu = np.full((4, 1), 0.5)
    var = np.full((4, 1), 0.2)
    lam = np.full((4, 1), 3.7)
    # grouped order: count < pos
    params = [jnp.asarray(lam), (jnp.asarray(mu), jnp.asarray(var))]
    mean, mode = mx.statistics(params, lay, conv=False)
    mean, mode = np.asarray(mean), np.asarray(mode)
    i_count = lay.groups[0].raw_slice[0]
    i_pos = lay.groups[1].raw_slice[0]
    np.testing.assert_allclose(mean[:, i_pos], np.exp(0.5 + 0.1) - 1)
    np.testing.assert_allclose(mode[:, i_pos], np.exp(0.5 - 0.2) - 1)
    np.testing.assert_allclose(mean[:, i_count], 3.7)
    np.testing.assert_allclose(mode[:, i_count], 3.0)


def test_sampled_reconstruction_degenerate_params_match_point_estimates():
    """With degenerate likelihood params (zero variance, peaked logits,
    near-zero Poisson rate) the sampled reconstruction (loglik.py:68-254
    `samples` analog) must equal the deterministic estimate, in the same
    grouped raw space as `statistics`."""
    import jax
    raw, ds = _ds(8)
    lay = ds.layout
    n = 8
    params = []
    want = {}
    for g in lay.groups:
        if g.kind == "real":
            mu = jnp.asarray(RNG.normal(0, 1, (n, 1)))
            params.append((mu, jnp.zeros((n, 1))))
            want["real"] = np.asarray(mu)[:, 0]
        elif g.kind == "cat":
            codes = RNG.integers(0, g.nclass, n)
            log_pi = np.full((n, 1, g.nclass), -60.0)
            log_pi[np.arange(n), 0, codes] = 0.0
            params.append(jnp.asarray(log_pi))
            want["cat"] = codes.astype(float)
        elif g.kind == "ordinal":
            lv = RNG.integers(0, g.nclass, n)
            probs = np.full((n, 1, g.nclass), 1e-6)
            probs[np.arange(n), 0, lv] = 1.0
            params.append(jnp.asarray(probs))
            want["ordinal"] = lv.astype(float)
        else:   # count
            params.append(jnp.full((n, 1), 1e-9))
            want["count"] = np.zeros(n)
    out = np.asarray(mx.sampled_reconstruction(
        params, lay, jax.random.PRNGKey(3), conv=False))
    assert out.shape == (n, 4)
    for g in lay.groups:
        np.testing.assert_allclose(out[:, g.raw_slice[0]], want[g.kind],
                                   atol=1e-6)


def test_sampled_reconstruction_pos_beta_spaces():
    """pos samples land in data units (expm1 of the log-normal draw) and
    beta samples land inside the column's [min, max] range."""
    import jax
    lay = encode_raw(
        np.column_stack([np.linspace(0.5, 4.0, 6), np.linspace(2.0, 8.0, 6)]),
        [{"type": "pos", "dim": 1, "nclass": 1},
         {"type": "beta", "dim": 1, "nclass": 1}]).layout
    n = 6
    # grouped order: beta < pos (alphabetical kind order)
    alpha = jnp.full((n, 1), 2.5)
    beta = jnp.full((n, 1), 3.5)
    mu = jnp.full((n, 1), 1.0)
    var = jnp.full((n, 1), 0.04)
    params = [(alpha, beta), (mu, var)]
    out = np.asarray(mx.sampled_reconstruction(
        params, lay, jax.random.PRNGKey(7), conv=False))
    i_beta = lay.groups[0].raw_slice[0]
    i_pos = lay.groups[1].raw_slice[0]
    r = np.asarray(lay.beta_ranges)
    assert (out[:, i_beta] >= r[0, 0]).all() and (out[:, i_beta] <= r[0, 1]).all()
    assert (out[:, i_pos] >= 0).all()
    # pos draws stay near exp(mu)-1 for small var
    assert np.all(np.abs(out[:, i_pos] - (np.e - 1)) < 1.5)
    # different key -> different draws (it is actually sampling)
    out2 = np.asarray(mx.sampled_reconstruction(
        params, lay, jax.random.PRNGKey(8), conv=False))
    assert not np.allclose(out, out2)


def test_gaussian_to_categorical_bridge():
    """Bucketed-Gaussian categorical density (HL_VAE/utils.py:188-214):
    probabilities normalize and peak at the bucket containing the mean."""
    import jax.numpy as jnp
    from hlax.eval.bridges import gaussian_to_categorical_density
    mean = jnp.asarray([[0.1, 0.45, 0.9]])   # buckets 0, 2, 4
    logv = jnp.full((1, 3), -4.0)
    # data hits the same buckets -> high density; off-bucket -> lower
    data_hit = jnp.asarray([[0.05, 110 / 255, 0.95]])
    data_miss = jnp.asarray([[0.95, 0.0, 0.05]])
    lp_hit = gaussian_to_categorical_density(mean, logv, data_hit)
    lp_miss = gaussian_to_categorical_density(mean, logv, data_miss)
    assert np.all(np.asarray(lp_hit) > np.asarray(lp_miss))
    assert np.isfinite(np.asarray(lp_hit)).all()


def test_pixel_level_converters_roundtrip():
    import jax.numpy as jnp
    from hlax.eval.bridges import convert_pixels_to_cat5
    x = jnp.asarray([[10 / 255, 60 / 255, 120 / 255, 170 / 255, 220 / 255]])
    idx = np.arange(5)
    out = np.asarray(convert_pixels_to_cat5(x, idx))
    np.testing.assert_array_equal(out[0], [0, 1, 2, 3, 4])
