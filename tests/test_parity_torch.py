"""End-to-end cross-framework parity: hlax vs the plain-torch f64 replica.

One full training-step forward — conv HLVAE NLL + varying-T sparse-GP KLD
upper bound with natural-gradient quantities — evaluated on IDENTICAL weights
and an identical batch in float64 must agree between hlax (JAX) and
``baselines/torch_baseline.py`` (the reference-shaped measurement replica of
/root/reference/training.py:121-128) to ~1e-8 relative.

This is the whole-graph check that piecewise oracle tests can miss: any
silent drift in normalization, type routing, theta merging, the conv stack,
or any A..F KLD term breaks it.

Weight mapping notes (verified numerically):
  * flax Conv kernel [kh,kw,in,out] -> torch Conv2d weight via
    transpose(3,2,0,1); both are cross-correlations, no flip.
  * flax ConvTranspose (transpose_kernel=False) -> torch ConvTranspose2d
    requires a SPATIAL FLIP then transpose(2,3,0,1) (torch computes the
    gradient-of-conv, i.e. the flipped fractionally-strided conv).
  * flax flattens conv features NHWC -> (h,w,c); torch NCHW -> (c,h,w);
    the dense layers on either side of the flatten absorb the permutation.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

import baselines.torch_baseline as tb  # noqa: E402
from hlax.data.reader import encode_raw  # noqa: E402
from hlax.gp import elbo as gp_elbo  # noqa: E402
from hlax.gp import kernels as gp_kernels  # noqa: E402
from hlax.models import HLVAE, HLVAEConfig  # noqa: E402
from hlax.models.hlvae import nll_from_log_p  # noqa: E402

# reduced-but-conv-shaped scale (image geometry fixed at 36x36 / D4 types)
S, T, L, M, HID = 4, 5, 8, 16, 50
P_TOT, N_TOT = 20.0, 100.0
EPS = 1e-6
N_REAL, N_CAT, NCLASS, Y_DIM = 324, 972, 5, 5


def _t(x):
    return torch.tensor(np.asarray(x, np.float64))


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    n = S * T

    raw = np.column_stack([
        rng.random((n, N_REAL)) * 255,
        rng.integers(0, NCLASS, (n, N_CAT)).astype(float),
    ])
    miss = (rng.random((n, N_REAL + N_CAT)) > 0.25).astype(float)
    types = ([{"type": "real", "dim": 1, "nclass": 1}] * N_REAL
             + [{"type": "cat", "dim": 1, "nclass": NCLASS}] * N_CAT)
    het = encode_raw(raw, types, miss_mask=miss)

    labels = np.zeros((n, 6))
    labels[:, 0] = np.tile(np.arange(T), S)                       # time
    labels[:, 1] = np.repeat(rng.integers(-9, 11, S), T).astype(float)
    labels[:, 2] = np.repeat(np.arange(S), T)                     # subject
    labels[:, 3] = np.repeat(rng.integers(0, 2, S), T).astype(float)
    labels[:, 4] = np.repeat(rng.integers(0, 2, S), T).astype(float)

    cfg = HLVAEConfig(layout=het.layout, z_dim=L, h_dims=(HID,), y_dim=Y_DIM,
                      conv=True, dtype=jnp.float64)
    model = HLVAE(cfg)
    data = jnp.asarray(het.data, jnp.float64)
    mask = jnp.asarray(het.mask, jnp.float64)
    tmask = jnp.asarray(het.theta_mask, jnp.float64)
    key = jax.random.PRNGKey(3)
    params = model.init(key, data, mask, tmask, key)

    # canonical kernel structure (config/hlvae_config_file.txt):
    # spec0 = rbf(t0) + cat(g3)*rbf(t0) + cat(d4)*rbf(dt1)
    # spec1 = cat(s2) + cat(s2)*rbf(t0)
    spec0, spec1 = gp_kernels.build_kernel_specs(
        [2], [], [0],
        [{"cat_covariate": 3, "cont_covariate": 0},
         {"cat_covariate": 4, "cont_covariate": 1},
         {"cat_covariate": 2, "cont_covariate": 0}],
        [], [], 2)
    k0 = gp_kernels.init_kernel_params(spec0, L, jnp.float64)
    k1 = gp_kernels.init_kernel_params(spec1, L, jnp.float64)
    # randomize so the test isn't at the symmetric init point
    k0 = [{k: v + 0.3 * rng.standard_normal(v.shape) for k, v in p.items()}
          for p in k0]
    k1 = [{k: v + 0.3 * rng.standard_normal(v.shape) for k, v in p.items()}
          for p in k1]

    zt = labels[rng.choice(n, M)][None].repeat(L, axis=0).astype(np.float64)
    zt[:, :, 0] += rng.uniform(-0.5, 0.5, (L, M))
    m_ind = rng.standard_normal((L, M, 1))
    Hh = rng.standard_normal((L, M, M)) / 3.0
    H = Hh @ Hh.transpose(0, 2, 1) + 0.5 * np.eye(M)

    return dict(het=het, labels=labels, model=model, params=params,
                spec0=spec0, spec1=spec1, k0=k0, k1=k1,
                zt=zt, m=m_ind, H=H, data=data, mask=mask, tmask=tmask)


def _hlax_forward(s):
    model, params = s["model"], s["params"]
    out = model.apply(params, s["data"], s["mask"], s["tmask"],
                      jax.random.PRNGKey(11))
    nll = jnp.sum(nll_from_log_p(out["log_p_x"]))
    x_st = jnp.asarray(s["labels"], jnp.float64).reshape(S, T, -1)
    valid = jnp.ones((S, T), jnp.float64)
    kld, gm, gH, _ = gp_elbo.kld_upper_bound(
        s["spec0"], s["k0"], s["spec1"], s["k1"],
        jnp.ones((L,), jnp.float64),
        jnp.asarray(s["m"]), jnp.asarray(s["H"]), jnp.asarray(s["zt"]),
        x_st, valid,
        out["mu"].reshape(S, T, L), out["log_var"].reshape(S, T, L),
        P_TOT, N_TOT, EPS, natural_gradient=True)
    loss = nll * P_TOT / S + kld
    return out, nll, kld, loss, gm, gH


def _port_vae_to_torch(flax_params, monkeypatch):
    for name, val in (("P_SUBJ", int(P_TOT)), ("T", T), ("LATENT", L),
                      ("M", M), ("S_BATCH", S), ("HID", HID)):
        monkeypatch.setattr(tb, name, val)
    p = flax_params["params"]
    vae = tb.VAE()
    feat = 9

    def dense_w(scope):
        return _t(np.asarray(p[scope]["kernel"]).T)

    def dense_b(scope):
        return _t(np.asarray(p[scope]["bias"]))

    with torch.no_grad():
        # cat group is gid 0 (sorted set_of_types: ('cat','5') < ('real','1'))
        vae.rep_w.copy_(_t(p["rep_w_0"]))
        vae.rep_b.copy_(_t(p["rep_b_0"]))
        vae.conv1.weight.copy_(_t(np.asarray(p["conv1"]["kernel"]).transpose(3, 2, 0, 1)))
        vae.conv1.bias.copy_(_t(p["conv1"]["bias"]))
        vae.conv2.weight.copy_(_t(np.asarray(p["conv2"]["kernel"]).transpose(3, 2, 0, 1)))
        vae.conv2.bias.copy_(_t(p["conv2"]["bias"]))
        # fc: flax input (h,w,c) -> torch input (c,h,w)
        k = np.asarray(p["enc_mlp"]["Dense_0"]["kernel"]).reshape(feat, feat, 32, HID)
        vae.fc.weight.copy_(_t(k.transpose(3, 2, 0, 1).reshape(HID, -1)))
        vae.fc.bias.copy_(_t(p["enc_mlp"]["Dense_0"]["bias"]))
        vae.mean.weight.copy_(dense_w("mean_layer"))
        vae.mean.bias.copy_(dense_b("mean_layer"))
        vae.logv.weight.copy_(dense_w("log_var_layer"))
        vae.logv.bias.copy_(dense_b("log_var_layer"))
        vae.dhid.weight.copy_(_t(np.asarray(p["dec_mlp"]["Dense_0"]["kernel"]).T))
        vae.dhid.bias.copy_(_t(p["dec_mlp"]["Dense_0"]["bias"]))
        # y_layer: flax output (h,w,c) -> torch output (c,h,w)
        k = np.asarray(p["y_layer"]["kernel"]).reshape(HID, feat, feat, 32)
        vae.ylin.weight.copy_(_t(k.transpose(3, 1, 2, 0).reshape(-1, HID)))
        b = np.asarray(p["y_layer"]["bias"]).reshape(feat, feat, 32)
        vae.ylin.bias.copy_(_t(b.transpose(2, 0, 1).reshape(-1)))
        # ConvTranspose: spatial flip + [in,out,kh,kw]
        for tname, fname in (("dc1", "deconv1"), ("dc2", "deconv2")):
            k = np.asarray(p[fname]["kernel"])[::-1, ::-1].transpose(2, 3, 0, 1)
            getattr(vae, tname).weight.copy_(_t(k.copy()))
            getattr(vae, tname).bias.copy_(_t(p[fname]["bias"]))
        # obs heads: gid 0 = cat, gid 1 = real
        vae.w_cat.copy_(_t(p["obs_w_0"]))
        vae.b_cat.copy_(_t(p["obs_b_0"]))
        vae.w_real.copy_(_t(p["obs_w_1"]))
        vae.b_real.copy_(_t(p["obs_b_1"]))
        vae.log_vy_real.copy_(_t(p["log_vy_real"]))
    return vae


def _port_kernels_to_torch(k0, k1):
    kern = tb.Kernels()
    mapping = {
        "os0": k0[0]["raw_os"], "ls0": k0[0]["raw_ls_0"],
        "os1": k0[1]["raw_os"], "ls1": k0[1]["raw_ls_1"],
        "os2": k0[2]["raw_os"], "ls2": k0[2]["raw_ls_1"],
        "os3": k1[0]["raw_os"],
        "os4": k1[1]["raw_os"], "ls4": k1[1]["raw_ls_1"],
    }
    with torch.no_grad():
        for name, val in mapping.items():
            kern.p[name].copy_(_t(val))
    return kern


def test_one_step_parity(setup, monkeypatch):
    s = setup
    out, nll_j, kld_j, loss_j, gm_j, gH_j = _hlax_forward(s)

    lay = s["het"].layout
    g_cat, g_real = lay.groups[0], lay.groups[1]
    assert g_cat.kind == "cat" and g_real.kind == "real"
    data = np.asarray(s["data"])
    mask = np.asarray(s["mask"])
    x_cat = _t(data[:, g_cat.exp_slice[0]:g_cat.exp_slice[1]])
    x_real = _t(data[:, g_real.exp_slice[0]:g_real.exp_slice[1]])
    m_cat = _t(mask[:, g_cat.raw_slice[0]:g_cat.raw_slice[1]])
    m_real = _t(mask[:, g_real.raw_slice[0]:g_real.raw_slice[1]])

    vae = _port_vae_to_torch(s["params"], monkeypatch)
    kern = _port_kernels_to_torch(s["k0"], s["k1"])

    # identical reparameterization noise
    eps = (np.asarray(out["z"]) - np.asarray(out["mu"])) \
        / np.exp(0.5 * np.asarray(out["log_var"]))

    with torch.no_grad():
        nll_t, mu_t, logv_t = vae(x_real, x_cat, m_real, m_cat, eps=_t(eps))
    np.testing.assert_allclose(np.asarray(out["mu"]), mu_t.numpy(),
                               rtol=1e-9, atol=1e-9)

    kld_t, gm_t, gH_t = tb.kld_iter(
        kern, _t(s["m"]), _t(s["H"]), _t(s["labels"]),
        mu_t, logv_t, _t(s["zt"]), P_TOT, float(S), N_TOT, 2)
    loss_t = nll_t * P_TOT / S + kld_t

    np.testing.assert_allclose(float(nll_t.detach()), float(nll_j), rtol=1e-9)
    np.testing.assert_allclose(float(kld_t.detach()), float(kld_j), rtol=1e-8)
    np.testing.assert_allclose(float(loss_t.detach()), float(loss_j), rtol=1e-8)
    # grads reach O(1e5) with heavy cancellation; near-zero elements carry
    # f64 reduction-order noise, so the atol scales with the tensor magnitude
    gm_t, gH_t = gm_t.detach().numpy(), gH_t.detach().numpy()
    np.testing.assert_allclose(np.asarray(gm_j), gm_t,
                               rtol=1e-6, atol=1e-8 * np.abs(gm_t).max())
    np.testing.assert_allclose(np.asarray(gH_j), gH_t,
                               rtol=1e-6, atol=1e-8 * np.abs(gH_t).max())


@pytest.mark.slow
def test_training_trajectory_parity(setup, monkeypatch):
    """Multi-step trajectory parity: hlax's REAL jitted train step (Adam +
    closed-form natural-gradient (m,H) update, hlax/train/step.py) against
    the torch replica's one_step loop (training.py:62-137 semantics) from
    identical weights with shared per-step reparameterization noise, both
    float64 on CPU.

    The one-step test above proves the forward/bound/nat-grad math; THIS
    test is where silent drift in the optimizer (optax.adam vs torch Adam),
    the nat-grad accumulation, or cross-step normalization would surface —
    the per-step losses must track each other through N_STEPS full-batch
    steps, making the 'bit-comparable ELBO' north star (BASELINE.md)
    mechanically checkable."""
    import optax  # noqa: F401  (documented dependency of the claim below)
    from hlax.train import step as tstep

    s = setup
    N_STEPS = 25
    cfg = tstep.TrainConfig(latent_dim=L, M=M, P_tot=P_TOT, N_tot=N_TOT,
                            id_covariate=2, natural_gradient=True,
                            constrain_scales=True, gp_dtype=jnp.float64,
                            eps=EPS)
    model = s["model"]
    batch = {"data": s["data"], "mask": s["mask"],
             "theta_mask": s["tmask"],
             "labels": jnp.asarray(s["labels"], jnp.float64),
             "valid": jnp.ones((S, T), jnp.float64)}
    state = tstep.TrainState(
        vae=s["params"], k0=s["k0"], k1=s["k1"],
        raw_noise=gp_kernels.noise_init(L, True, jnp.float64),
        zt=jnp.asarray(s["zt"]), m=jnp.asarray(s["m"]),
        H=jnp.asarray(s["H"]), opt_state=None,
        step=jnp.zeros((), jnp.int32), rng=jax.random.PRNGKey(42))
    state = state._replace(
        opt_state=tstep.make_optimizer(cfg).init(tstep._trainable(state, cfg)))
    step_fn = jax.jit(tstep.make_train_step(model, s["spec0"], s["spec1"],
                                            cfg))

    # torch side: identical weights via the port helpers
    lay = s["het"].layout
    g_cat, g_real = lay.groups[0], lay.groups[1]
    data = np.asarray(s["data"])
    mask = np.asarray(s["mask"])
    x_cat = _t(data[:, g_cat.exp_slice[0]:g_cat.exp_slice[1]])
    x_real = _t(data[:, g_real.exp_slice[0]:g_real.exp_slice[1]])
    m_cat = _t(mask[:, g_cat.raw_slice[0]:g_cat.raw_slice[1]])
    m_real = _t(mask[:, g_real.raw_slice[0]:g_real.raw_slice[1]])
    x_t = _t(s["labels"])
    vae = _port_vae_to_torch(s["params"], monkeypatch)
    kern = _port_kernels_to_torch(s["k0"], s["k1"])
    z_t = _t(s["zt"]).requires_grad_(True)
    m_t, H_t = _t(s["m"]), _t(s["H"])
    # same Adam as optax.adam(cfg.lr): betas (0.9, 0.999), eps 1e-8 applied
    # OUTSIDE the sqrt (optax eps_root=0), bias correction on — the torch
    # default update rule
    opt = torch.optim.Adam(list(vae.parameters()) + kern.params() + [z_t],
                           lr=cfg.lr)

    losses_j, losses_t = [], []
    for _ in range(N_STEPS):
        # reproduce the step's reparameterization noise: the jitted step
        # derives its model key via rng, sub = split(state.rng) (step.py)
        _, sub = jax.random.split(state.rng)
        out = model.apply(state.vae, s["data"], s["mask"], s["tmask"], sub)
        eps = (np.asarray(out["z"]) - np.asarray(out["mu"])) \
            / np.exp(0.5 * np.asarray(out["log_var"]))

        state, metrics = step_fn(state, batch)
        losses_j.append(float(metrics["loss"]))

        opt.zero_grad()
        nll_t, mu_t, logv_t = vae(x_real, x_cat, m_real, m_cat, eps=_t(eps))
        kld_t, gm_t, gH_t = tb.kld_iter(kern, m_t, H_t, x_t, mu_t, logv_t,
                                        z_t, P_TOT, float(S), N_TOT, 2)
        loss_t = nll_t * P_TOT / S + kld_t
        loss_t.backward()
        opt.step()
        with torch.no_grad():   # training.py:130-137
            LHt = torch.linalg.cholesky(H_t)
            iH = torch.cholesky_solve(torch.eye(M, dtype=torch.float64), LHt)
            iH_new = iH + 0.01 * (gH_t + gH_t.transpose(-1, -2))
            LiH = torch.linalg.cholesky(iH_new)
            H_t = torch.cholesky_solve(torch.eye(M, dtype=torch.float64), LiH)
            m_t = torch.matmul(H_t, torch.matmul(iH, m_t)
                               - 0.01 * (gm_t - 2 * torch.matmul(gH_t, m_t)))
        losses_t.append(float(loss_t.detach()))

    # the loss must have actually moved (this is a real trajectory, not a
    # fixed point) and the two frameworks must track each other throughout
    assert abs(losses_j[-1] - losses_j[0]) > 1.0
    np.testing.assert_allclose(losses_t, losses_j, rtol=1e-6)
    # terminal variational state agrees too (accumulated nat-grad updates)
    np.testing.assert_allclose(np.asarray(state.m), m_t.numpy(), rtol=1e-5,
                               atol=1e-7 * float(np.abs(m_t.numpy()).max()))
    np.testing.assert_allclose(np.asarray(state.H), H_t.numpy(), rtol=1e-5,
                               atol=1e-7 * float(np.abs(H_t.numpy()).max()))


def test_natural_gradient_update_parity(setup):
    """The closed-form (m,H) natural-gradient update (training.py:130-137)
    matches the torch replica given identical gradients."""
    s = setup
    rng = np.random.default_rng(13)
    gm = rng.standard_normal((L, M, 1))
    gHs = rng.standard_normal((L, M, M)) / 10.0
    gH = 0.4 * (gHs + gHs.transpose(0, 2, 1))

    m_j, H_j = gp_elbo.natural_gradient_update(
        jnp.asarray(s["m"]), jnp.asarray(s["H"]),
        jnp.asarray(gm), jnp.asarray(gH), 0.01)

    m_t, Ht = _t(s["m"]), _t(s["H"])
    LH = torch.linalg.cholesky(Ht)
    iH = torch.cholesky_solve(torch.eye(M, dtype=torch.float64), LH)
    iH_new = iH + 0.01 * (_t(gH) + _t(gH).transpose(-1, -2))
    LiH = torch.linalg.cholesky(iH_new)
    H_new = torch.cholesky_solve(torch.eye(M, dtype=torch.float64), LiH)
    m_new = torch.matmul(H_new, torch.matmul(iH, m_t)
                         - 0.01 * (_t(gm) - 2 * torch.matmul(_t(gH), m_t)))

    np.testing.assert_allclose(np.asarray(H_j), H_new.numpy(), rtol=1e-8,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(m_j), m_new.numpy(), rtol=1e-8,
                               atol=1e-10)


def test_likelihood_heads_parity_torch():
    """pos/count/ordinal/beta heads match the reference-shaped torch graph
    (VERDICT r04 #7): values of log_p_x / log_p_x_missing / params AND the
    theta-gradient of sum(log_p_x) agree to f64 precision.  The torch side
    (baselines/torch_baseline.py::head_*) follows loglik.py:73-256 op-for-op
    including td.Poisson/td.Normal log_prob/cdf, so this catches any closed-
    form drift a scipy oracle written alongside hlax could share."""
    from hlax.ops import likelihoods as lk

    rng = np.random.default_rng(21)
    B, d = 17, 7

    def grads(fn_j, fn_t, theta, *extra_j):
        """Compare d sum(log_p_x)/d theta between jax and torch."""
        gj = jax.grad(lambda th: jnp.sum(fn_j(th)))(jnp.asarray(theta))
        tt = _t(theta).requires_grad_(True)
        fn_t(tt).sum().backward()
        np.testing.assert_allclose(np.asarray(gj), tt.grad.numpy(),
                                   rtol=1e-9, atol=1e-12)

    # ---- pos (shared-variance branch: theta [B,d] + extra [d]) ----
    data = rng.gamma(2.0, 3.0, (B, d))
    mask = (rng.random((B, d)) > 0.3).astype(float)
    theta = rng.standard_normal((B, d))
    extra = rng.standard_normal(d) * 0.3
    logd = np.log1p(data)
    nm, nv = logd.mean(0), logd.var(0)
    out = lk.loglik_pos(jnp.asarray(data), jnp.asarray(mask),
                        jnp.asarray(theta), jnp.asarray(nm), jnp.asarray(nv),
                        jnp.asarray(extra))
    lp_t, lpm_t, (mean_t, var_t) = tb.head_pos(
        _t(data), _t(mask), _t(theta), _t(nm), _t(nv), _t(extra))
    np.testing.assert_allclose(np.asarray(out["log_p_x"]), lp_t.numpy(),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out["log_p_x_missing"]),
                               lpm_t.numpy(), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out["params"][0]), mean_t.numpy(),
                               rtol=1e-10)
    grads(lambda th: lk.loglik_pos(jnp.asarray(data), jnp.asarray(mask), th,
                                   jnp.asarray(nm), jnp.asarray(nv),
                                   jnp.asarray(extra))["log_p_x"],
          lambda th: tb.head_pos(_t(data), _t(mask), th, _t(nm), _t(nv),
                                 _t(extra))[0], theta)

    # ---- pos (logvar-network branch: theta [B,2d], no extra) ----
    theta2 = rng.standard_normal((B, 2 * d)) * 0.5
    out = lk.loglik_pos(jnp.asarray(data), jnp.asarray(mask),
                        jnp.asarray(theta2), jnp.asarray(nm), jnp.asarray(nv),
                        None)
    lp_t, lpm_t, _ = tb.head_pos(_t(data), _t(mask), _t(theta2), _t(nm),
                                 _t(nv), None)
    np.testing.assert_allclose(np.asarray(out["log_p_x"]), lp_t.numpy(),
                               rtol=1e-10, atol=1e-12)
    grads(lambda th: lk.loglik_pos(jnp.asarray(data), jnp.asarray(mask), th,
                                   jnp.asarray(nm), jnp.asarray(nv),
                                   None)["log_p_x"],
          lambda th: tb.head_pos(_t(data), _t(mask), th, _t(nm), _t(nv),
                                 None)[0], theta2)

    # ---- count (Poisson) ----
    cdata = rng.poisson(4.0, (B, d)).astype(float)
    ctheta = rng.standard_normal((B, d)) * 2.0
    out = lk.loglik_count(jnp.asarray(cdata), jnp.asarray(mask),
                          jnp.asarray(ctheta))
    lp_t, lpm_t, lam_t = tb.head_count(_t(cdata), _t(mask), _t(ctheta))
    np.testing.assert_allclose(np.asarray(out["log_p_x"]), lp_t.numpy(),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out["log_p_x_missing"]),
                               lpm_t.numpy(), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out["params"]), lam_t.numpy(),
                               rtol=1e-10)
    grads(lambda th: lk.loglik_count(jnp.asarray(cdata), jnp.asarray(mask),
                                     th)["log_p_x"],
          lambda th: tb.head_count(_t(cdata), _t(mask), th)[0], ctheta)

    # ---- ordinal (cumulative link, nclass=4, thermometer data) ----
    nclass = 4
    levels = rng.integers(1, nclass + 1, (B, d))
    therm = (np.arange(1, nclass + 1)[None, None, :]
             <= levels[:, :, None]).astype(float).reshape(B, d * nclass)
    otheta = rng.standard_normal((B, d * nclass))
    out = lk.loglik_ordinal(jnp.asarray(therm), jnp.asarray(mask),
                            jnp.asarray(otheta), nclass)
    lp_t, lpm_t, probs_t = tb.head_ordinal(_t(therm), _t(mask), _t(otheta),
                                           nclass)
    np.testing.assert_allclose(np.asarray(out["log_p_x"]), lp_t.numpy(),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out["log_p_x_missing"]),
                               lpm_t.numpy(), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out["params"]), probs_t.numpy(),
                               rtol=1e-10)
    grads(lambda th: lk.loglik_ordinal(jnp.asarray(therm), jnp.asarray(mask),
                                       th, nclass)["log_p_x"],
          lambda th: tb.head_ordinal(_t(therm), _t(mask), th, nclass)[0],
          otheta)

    # ---- beta (Normal-CDF mean, global dispersion) ----
    ranges = np.column_stack([rng.random(d) * -2.0, 2.0 + rng.random(d)])
    bdata = rng.uniform(ranges[:, 0], ranges[:, 1], (B, d))
    btheta = rng.standard_normal((B, d))
    bextra = np.float64(1.3)
    out = lk.loglik_beta(jnp.asarray(bdata), jnp.asarray(mask),
                         jnp.asarray(btheta), jnp.asarray(ranges),
                         jnp.asarray(bextra))
    lp_t, lpm_t, (al_t, be_t) = tb.head_beta(_t(bdata), _t(mask), _t(btheta),
                                             _t(ranges), _t(bextra))
    np.testing.assert_allclose(np.asarray(out["log_p_x"]), lp_t.numpy(),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out["log_p_x_missing"]),
                               lpm_t.numpy(), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out["params"][0]), al_t.numpy(),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out["params"][1]), be_t.numpy(),
                               rtol=1e-10)
    grads(lambda th: lk.loglik_beta(jnp.asarray(bdata), jnp.asarray(mask),
                                    th, jnp.asarray(ranges),
                                    jnp.asarray(bextra))["log_p_x"],
          lambda th: tb.head_beta(_t(bdata), _t(mask), th, _t(ranges),
                                  _t(bextra))[0], btheta)
