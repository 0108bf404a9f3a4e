import numpy as np
import jax
import jax.numpy as jnp

from hlax.data.reader import encode_raw
from hlax.models import HLVAE, HLVAEConfig, nll_from_log_p
from hlax.ops import batch_normalization


TYPES = [
    {"type": "real", "dim": 1, "nclass": 1},
    {"type": "cat", "dim": 1, "nclass": 3},
    {"type": "ordinal", "dim": 1, "nclass": 4},
    {"type": "count", "dim": 1, "nclass": 1},
    {"type": "pos", "dim": 1, "nclass": 1},
]

RNG = np.random.default_rng(1)


def _dataset(n=12):
    raw = np.column_stack([
        RNG.normal(0, 1, n),
        RNG.integers(0, 3, n).astype(float),
        RNG.integers(0, 4, n).astype(float),
        RNG.integers(0, 7, n).astype(float),
        RNG.random(n) * 4,
    ])
    miss = (RNG.random((n, 5)) > 0.25).astype(float)
    return encode_raw(raw, TYPES, miss_mask=miss)


def test_normalization_masked_moments():
    ds = _dataset(50)
    lay = ds.layout
    norm, params = batch_normalization(
        jnp.array(ds.data), jnp.array(ds.mask), lay, conv=False)
    norm = np.asarray(norm)
    # real group: masked z-score has ~0 mean, ~1 var over observed entries
    g = [g for g in lay.groups if g.kind == "real"][0]
    col = norm[:, g.exp_slice[0]]
    m = ds.mask[:, g.raw_slice[0]]
    obs = col[m == 1]
    assert abs(obs.mean()) < 1e-8
    assert abs(obs.var() - 1.0) < 1e-2   # (var+1e-5 regularizer)
    # unobserved entries exactly zero
    assert np.all(col[m == 0] == 0)
    # count group: log of (data*mask), zero where missing
    gc = [g for g in lay.groups if g.kind == "count"][0]
    colc = norm[:, gc.exp_slice[0]]
    mc = ds.mask[:, gc.raw_slice[0]]
    datac = ds.data[:, gc.exp_slice[0]]
    np.testing.assert_allclose(colc[mc == 1], np.log(datac[mc == 1]))
    assert np.all(colc[mc == 0] == 0)
    assert params.real_mean is not None and params.pos_mean_log is not None


def test_mlp_forward_shapes_and_masking():
    ds = _dataset(12)
    cfg = HLVAEConfig(layout=ds.layout, z_dim=4, h_dims=(16,), y_dim=3,
                      conv=False, dtype=jnp.float64)
    model = HLVAE(cfg)
    key = jax.random.PRNGKey(0)
    data, mask = jnp.array(ds.data), jnp.array(ds.mask)
    tmask = jnp.array(ds.theta_mask)
    params = model.init(key, data, mask, tmask, key)
    out = model.apply(params, data, mask, tmask, key)
    assert out["mu"].shape == (12, 4)
    assert out["log_p_x"].shape == (12, ds.layout.n_raw)
    # observed/missing split is exact
    lp, lpm = np.asarray(out["log_p_x"]), np.asarray(out["log_p_x_missing"])
    m = np.asarray(mask)
    assert np.all(lp[m == 0] == 0)
    assert np.all(lpm[m == 1] == 0)
    assert np.isfinite(lp).all() and np.isfinite(lpm).all()
    nll = nll_from_log_p(out["log_p_x"])
    assert nll.shape == (12,) and np.isfinite(np.asarray(nll)).all()


def test_forward_jits_and_grads_flow():
    ds = _dataset(8)
    cfg = HLVAEConfig(layout=ds.layout, z_dim=3, h_dims=(8,), y_dim=2,
                      conv=False, dtype=jnp.float64)
    model = HLVAE(cfg)
    key = jax.random.PRNGKey(0)
    data, mask = jnp.array(ds.data), jnp.array(ds.mask)
    tmask = jnp.array(ds.theta_mask)
    params = model.init(key, data, mask, tmask, key)

    @jax.jit
    def loss_fn(p, k):
        out = model.apply(p, data, mask, tmask, k)
        return jnp.sum(nll_from_log_p(out["log_p_x"]))

    g = jax.grad(loss_fn)(params, key)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    # at least some head gradient is non-zero
    assert any(np.abs(np.asarray(x)).max() > 0 for x in flat)


def test_conv_forward_healthmnist_shape():
    # D4-like layout: 324 real pixels + 972 cat(5) pixels, interleaved regions
    types = ([{"type": "real", "dim": 1, "nclass": 1}] * 324
             + [{"type": "cat", "dim": 1, "nclass": 5}] * 972)
    n = 4
    raw = np.column_stack([
        RNG.random((n, 324)) * 255,
        RNG.integers(0, 5, (n, 972)).astype(float),
    ])
    ds = encode_raw(raw, types)
    cfg = HLVAEConfig(layout=ds.layout, z_dim=8, h_dims=(32,), y_dim=5,
                      conv=True, dtype=jnp.float32)
    model = HLVAE(cfg)
    key = jax.random.PRNGKey(0)
    data = jnp.array(ds.data, jnp.float32)
    mask = jnp.array(ds.mask, jnp.float32)
    tmask = jnp.array(ds.theta_mask, jnp.float32)
    params = model.init(key, data, mask, tmask, key)
    out = model.apply(params, data, mask, tmask, key)
    assert out["log_p_x"].shape == (n, 1296)
    assert np.isfinite(np.asarray(out["log_p_x"])).all()


def test_single_head_theta_matches_two_pass_reference_routing():
    """The fused theta_estimation (one head eval, mask-gated gradient) must
    equal the reference's two-pass routing (HLVAE.py:416-453) in both values
    and parameter gradients."""
    ds = _dataset(10)
    cfg = HLVAEConfig(layout=ds.layout, z_dim=3, h_dims=(8,), y_dim=4,
                      conv=False, dtype=jnp.float64)
    model = HLVAE(cfg)
    key = jax.random.PRNGKey(3)
    data, mask = jnp.array(ds.data), jnp.array(ds.mask)
    tmask = jnp.array(ds.theta_mask)
    params = model.init(key, data, mask, tmask, key)
    y = jax.random.normal(key, (10, ds.layout.n_raw, 4), jnp.float64)

    def fused(p):
        th = model.apply(p, y, mask, tmask,
                         method=lambda m, *a: m.theta_estimation(*a))
        return th

    def two_pass(p):
        def run(mdl, y, mask, tmask):
            lay = mdl.cfg.layout
            obs_y = y * mask[:, :, None]
            mis_y = y * (1.0 - mask)[:, :, None]
            blocks = []
            for gi, g in enumerate(lay.groups):
                sl = slice(g.raw_slice[0], g.raw_slice[1])
                t_obs = mdl._head(gi, g, obs_y[:, sl, :])
                t_mis = jax.lax.stop_gradient(mdl._head(gi, g, mis_y[:, sl, :]))
                pm = tmask[:, g.theta_slice[0]:g.theta_slice[1]]
                blocks.append(t_obs * pm + t_mis * (1.0 - pm))
            return jnp.concatenate(blocks, axis=1)
        return model.apply(p, y, mask, tmask, method=run)

    v1, v2 = fused(params), two_pass(params)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-12, atol=1e-12)
    g1 = jax.grad(lambda p: jnp.sum(jnp.sin(fused(p))))(params)
    g2 = jax.grad(lambda p: jnp.sum(jnp.sin(two_pass(p))))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-12)


def test_reshape_max_pool_matches_reduce_window():
    """_max_pool_2x2 == flax max_pool forward; grads match where window
    maxima are unique (the reshape form avoids the select_and_scatter HLO
    that blocks x64 conv compilation on TPU)."""
    from flax import linen as nn
    from hlax.models.hlvae import _max_pool_2x2

    x = RNG.normal(0, 1, (3, 36, 36, 7)).astype(np.float32)  # unique a.s.
    ref = nn.max_pool(jnp.asarray(x), (2, 2), strides=(2, 2))
    got = _max_pool_2x2(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def s_ref(v):
        return jnp.sum(jnp.sin(nn.max_pool(v, (2, 2), strides=(2, 2))))

    def s_new(v):
        return jnp.sum(jnp.sin(_max_pool_2x2(v)))

    g_ref = jax.grad(s_ref)(jnp.asarray(x))
    g_new = jax.grad(s_new)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-7)


def test_mixed_precision_policy_conv():
    """compute_dtype=bfloat16 runs ONLY the conv+MLP stacks in bf16:
    parameters and every model output stay float32, the same param tree is
    interchangeable between policy-on and policy-off models, and outputs
    agree to bf16 tolerance (the policy reorders no math, it only lowers
    the matmul compute dtype)."""
    types = ([{"type": "real", "dim": 1, "nclass": 1}] * 324
             + [{"type": "cat", "dim": 1, "nclass": 5}] * 972)
    n = 4
    raw = np.column_stack([
        RNG.random((n, 324)) * 255,
        RNG.integers(0, 5, (n, 972)).astype(float),
    ])
    ds = encode_raw(raw, types)
    kw = dict(layout=ds.layout, z_dim=8, h_dims=(32,), y_dim=5,
              conv=True, dtype=jnp.float32)
    m32 = HLVAE(HLVAEConfig(**kw))
    mmx = HLVAE(HLVAEConfig(**kw, compute_dtype=jnp.bfloat16))
    key = jax.random.PRNGKey(0)
    data = jnp.array(ds.data, jnp.float32)
    mask = jnp.array(ds.mask, jnp.float32)
    tmask = jnp.array(ds.theta_mask, jnp.float32)

    p32 = m32.init(key, data, mask, tmask, key)
    pmx = mmx.init(key, data, mask, tmask, key)
    # identical param trees (same names, f32 storage, same init draws)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)), p32, pmx)
    assert all(x.dtype == jnp.float32
               for x in jax.tree_util.tree_leaves(pmx))

    out32 = m32.apply(p32, data, mask, tmask, key)
    outmx = mmx.apply(p32, data, mask, tmask, key)
    # boundary contract: likelihood inputs/outputs are full precision
    assert outmx["log_p_x"].dtype == jnp.float32
    assert outmx["mu"].dtype == jnp.float32
    # same math at bf16 matmul tolerance
    np.testing.assert_allclose(np.asarray(outmx["mu"]),
                               np.asarray(out32["mu"]), rtol=0.1, atol=0.05)
    lp32, lpmx = np.asarray(out32["log_p_x"]), np.asarray(outmx["log_p_x"])
    assert np.isfinite(lpmx).all()
    np.testing.assert_allclose(
        lpmx, lp32, rtol=0.15, atol=0.3 + 0.05 * np.abs(lp32).max())

    def loss(p, k):
        out = mmx.apply(p, data, mask, tmask, k)
        return jnp.sum(nll_from_log_p(out["log_p_x"]))

    g = jax.grad(loss)(p32, key)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert all(x.dtype == jnp.float32 for x in leaves)
    assert any(np.abs(np.asarray(x)).max() > 0 for x in leaves)
