"""GP layer tests: kernels, KLD bound oracle, DUBO, nat-grads, prediction."""
import numpy as np
import jax
import jax.numpy as jnp

from hlax.gp import kernels as K
from hlax.gp import elbo as E
from hlax.gp.predict import batch_predict, build_test_pred_map

RNG = np.random.default_rng(3)

L, M, Q = 2, 5, 3
S, T = 4, 3
EPS = 1e-6
ID_COV = 2   # subject id column


def _specs():
    # canonical-style: cat(id) -> spec1; rbf(time 0) -> spec0;
    # interaction cat(id)*rbf(0) -> spec1; cat(gender 1)*rbf(0) -> spec0
    return K.build_kernel_specs(
        cat_kernel=[ID_COV], bin_kernel=[], sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": ID_COV},
                        {"cont_covariate": 0, "cat_covariate": 1}],
        bin_int_kernel=[], covariate_missing_val=[], id_covariate=ID_COV)


def _covariates(s=S, t=T, rng=None):
    rng = RNG if rng is None else rng
    x = np.zeros((s, t, Q))
    x[:, :, 0] = np.arange(t)[None, :] + rng.normal(0, .1, (s, t))  # time
    x[:, :, 1] = rng.integers(0, 2, (s, 1))                          # gender
    x[:, :, 2] = np.arange(s)[:, None]                               # subject
    return x


def _params(spec, rng=None):
    rng = RNG if rng is None else rng
    p = K.init_kernel_params(spec, L)
    # perturb so latent dims differ
    return jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(rng.normal(0, 0.2, a.shape)), p)


def test_spec_composer_routing():
    spec0, spec1 = _specs()
    kinds0 = [tuple(f.kind for f in c.factors) for c in spec0.components]
    kinds1 = [tuple(f.kind for f in c.factors) for c in spec1.components]
    assert kinds1 == [("cat",), ("cat", "rbf")]
    assert kinds0 == [("rbf",), ("cat", "rbf")]


def test_kernel_values():
    spec0, spec1 = _specs()
    p1 = _params(spec1)
    x = _covariates(2, 2).reshape(4, Q)
    km = np.asarray(K.kernel_matrix(spec1, p1, jnp.array(x), jnp.array(x)))
    assert km.shape == (L, 4, 4)
    # cross-subject entries are zero for spec1 (both components involve cat(id))
    subj = x[:, ID_COV]
    cross = subj[:, None] != subj[None, :]
    assert np.all(km[:, cross] == 0)
    # same-subject same-time diagonal: softplus(os1) + softplus(os2)*rbf(0)=sum
    for l in range(L):
        os_ = [float(jax.nn.softplus(p["raw_os"][l])) for p in p1]
        np.testing.assert_allclose(np.diagonal(km[l]), os_[0] + os_[1], rtol=1e-6)
    # rbf decay: same subject, different time
    ls = float(jax.nn.softplus(p1[1]["raw_ls_1"][0]))
    dt = x[0, 0] - x[1, 0]
    expect = (float(jax.nn.softplus(p1[0]["raw_os"][0]))
              + float(jax.nn.softplus(p1[1]["raw_os"][0]))
              * np.exp(-0.5 * (dt / ls) ** 2))
    np.testing.assert_allclose(km[0, 0, 1], expect, rtol=1e-6)


def _bound_inputs(s=S, t=T, valid=None):
    spec0, spec1 = _specs()
    p0, p1 = _params(spec0), _params(spec1)
    x_st = _covariates(s, t)
    if valid is None:
        valid = np.ones((s, t))
    z = np.stack([x_st.reshape(-1, Q)[RNG.choice(s * t, M, replace=False)]
                  for _ in range(L)])
    m = RNG.normal(0, 1, (L, M, 1))
    Hh = RNG.normal(0, 1, (L, M, M)) / 3
    H = Hh @ np.swapaxes(Hh, -1, -2) + 0.5 * np.eye(M)
    mu = RNG.normal(0, 1, (s, t, L)) * valid[:, :, None]
    log_v = RNG.normal(-1, .3, (s, t, L))
    noise = np.ones(L)
    return (spec0, p0, spec1, p1, noise, m, H, z, x_st, valid, mu, log_v)


def _np_kld_oracle(spec0, p0, spec1, p1, noise, m, H, z, x_st, valid,
                   mu, log_v, P_tot, N_tot):
    """Independent per-subject-loop oracle of elbo_functions.py:196-277."""
    def kmat(spec, p, l, a, b):
        out = np.asarray(K.kernel_matrix(
            spec, p, jnp.array(a), jnp.array(b)))[l]
        return out

    s_count, t_count = valid.shape
    A = B = C = D = Eterm = 0.0
    for l in range(L):
        K0zz = kmat(spec0, p0, l, z[l], z[l]) + EPS * np.eye(M)
        iK0zz = np.linalg.inv(K0zz)
        for s in range(s_count):
            rows = valid[s] > 0
            if not rows.any():
                continue
            x = x_st[s][rows]
            Tn = x.shape[0]
            K0xz = kmat(spec0, p0, l, x, z[l])
            K0 = kmat(spec0, p0, l, x, x)
            B_st = kmat(spec1, p1, l, x, x) + noise[l] * np.eye(Tn)
            iB = np.linalg.inv(B_st)
            fit = (K0xz @ iK0zz @ m[l])[:, 0] - mu[s][rows, l]
            A += fit @ iB @ fit
            B += np.sum(np.diag(iB) * np.exp(log_v[s][rows, l]))
            C += np.linalg.slogdet(B_st)[1]
            KziBK = K0xz.T @ iB @ K0xz
            D += np.sum(iB * K0) - np.sum(KziBK * iK0zz)
            Eterm += np.sum((iK0zz @ H[l] @ iK0zz) * KziBK)
    F = np.sum(log_v[valid > 0])
    tr1 = qf1 = logdetK = logdetH = 0.0
    for l in range(L):
        K0zz = kmat(spec0, p0, l, z[l], z[l]) + EPS * np.eye(M)
        iK0zz = np.linalg.inv(K0zz)
        tr1 += np.sum(iK0zz * H[l].T)
        qf1 += float(m[l].T @ iK0zz @ m[l])
        logdetK += np.linalg.slogdet(K0zz)[1]
        logdetH += np.linalg.slogdet(H[l])[1]
    kld_qu_pu = 0.5 * (tr1 + qf1 - L * M + logdetK - logdetH)
    P_batch = (valid.sum(1) > 0).sum()
    return (P_tot / P_batch * 0.5 * (A + B + C + D + Eterm - F)
            + kld_qu_pu - L * N_tot / 2)


def test_kld_matches_numpy_oracle():
    inp = _bound_inputs()
    got, _, _, _ = E.kld_upper_bound(
        *[jnp.asarray(v) if isinstance(v, np.ndarray) else v for v in inp],
        P_tot=10.0, N_tot=30.0, eps=EPS)
    want = _np_kld_oracle(*inp, P_tot=10.0, N_tot=30.0)
    np.testing.assert_allclose(float(got), want, rtol=1e-8)


def test_kld_padding_invariance():
    # varying-T: subject 0 has 3 rows, subject 1 has 1, subject 2 has 2
    valid = np.array([[1, 1, 1], [1, 0, 0], [1, 1, 0], [1, 1, 1]], dtype=float)
    inp = _bound_inputs(valid=valid)
    got, gm, gH, _ = E.kld_upper_bound(
        *[jnp.asarray(v) if isinstance(v, np.ndarray) else v for v in inp],
        P_tot=8.0, N_tot=20.0, eps=EPS, natural_gradient=True)
    want = _np_kld_oracle(*inp, P_tot=8.0, N_tot=20.0)
    np.testing.assert_allclose(float(got), want, rtol=1e-8)
    assert np.isfinite(np.asarray(gm)).all() and np.isfinite(np.asarray(gH)).all()

    # extra padding (bigger T_max) must not change the value
    T2 = T + 2
    pad = lambda a: np.concatenate(
        [a, np.zeros(a.shape[:1] + (T2 - T,) + a.shape[2:])], axis=1)
    (spec0, p0, spec1, p1, noise, m, H, z, x_st, _, mu, log_v) = inp
    got2, _, _, _ = E.kld_upper_bound(
        spec0, p0, spec1, p1, jnp.asarray(noise), jnp.asarray(m),
        jnp.asarray(H), jnp.asarray(z), jnp.asarray(pad(x_st)),
        jnp.asarray(pad(valid)), jnp.asarray(pad(mu)), jnp.asarray(pad(log_v)),
        P_tot=8.0, N_tot=20.0, eps=EPS)
    np.testing.assert_allclose(float(got2), float(got), rtol=1e-8)


def test_natural_gradients_match_autodiff():
    """With P_tot == P_batch the closed-form (grad_m, grad_H) equal autodiff
    gradients of the bound (elbo_functions.py:184-192)."""
    inp = _bound_inputs()
    (spec0, p0, spec1, p1, noise, m, H, z, x_st, valid, mu, log_v) = [
        jnp.asarray(v) if isinstance(v, np.ndarray) else v for v in inp]

    def bound(m_, H_):
        out, _, _, _ = E.kld_upper_bound(
            spec0, p0, spec1, p1, noise, m_, H_, z, x_st, valid, mu, log_v,
            P_tot=float(S), N_tot=float(S * T), eps=EPS)
        return out

    _, gm, gH, _ = E.kld_upper_bound(
        spec0, p0, spec1, p1, noise, m, H, z, x_st, valid, mu, log_v,
        P_tot=float(S), N_tot=float(S * T), eps=EPS, natural_gradient=True)
    am, aH = jax.grad(bound, argnums=(0, 1))(m, H)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(am), rtol=1e-6, atol=1e-8)
    # autodiff d/dH is symmetrized differently; compare symmetric parts
    sym = lambda A: 0.5 * (A + np.swapaxes(A, -1, -2))
    np.testing.assert_allclose(sym(np.asarray(gH)), sym(np.asarray(aH)),
                               rtol=1e-6, atol=1e-8)


def test_dubo_finite_and_padding_invariant():
    valid = np.array([[1, 1, 1], [1, 1, 0], [1, 1, 1], [1, 0, 0]], dtype=float)
    (spec0, p0, spec1, p1, noise, m, H, z, x_st, _, mu, log_v) = _bound_inputs(
        valid=valid)
    args = (spec0, p0, spec1, p1, jnp.asarray(noise), jnp.asarray(z))
    d1 = E.deviance_upper_bound(*args, jnp.asarray(x_st), jnp.asarray(valid),
                                jnp.asarray(mu), jnp.asarray(log_v), EPS)
    T2 = T + 2
    pad = lambda a: np.concatenate(
        [a, np.zeros(a.shape[:1] + (T2 - T,) + a.shape[2:])], axis=1)
    d2 = E.deviance_upper_bound(*args, jnp.asarray(pad(x_st)),
                                jnp.asarray(pad(valid)), jnp.asarray(pad(mu)),
                                jnp.asarray(pad(log_v)), EPS)
    assert np.isfinite(float(d1))
    np.testing.assert_allclose(float(d1), float(d2), rtol=1e-10)


def test_predict_matches_dense_woodbury_oracle():
    """Z_pred equals (Q0* + K1*) (Q0 + B)^-1 mu with Q0 the Nystrom kernel."""
    (spec0, p0, spec1, p1, noise, m, H, z, x_st, valid, mu, log_v) = \
        _bound_inputs()
    test_x = _covariates(S, 2).reshape(-1, Q)   # same subjects, new times
    subj_ids = x_st[:, 0, ID_COV]
    idx, val = build_test_pred_map(
        x_st.reshape(-1, Q)[:, ID_COV], subj_ids)
    test_subj_of_row = np.repeat(np.arange(S), 2)

    got = batch_predict(
        spec0, p0, spec1, p1, jnp.asarray(noise), jnp.asarray(z),
        jnp.asarray(x_st), jnp.asarray(valid), jnp.asarray(mu),
        jnp.asarray(test_x), idx, val, test_subj_of_row, EPS)
    got = np.asarray(got)

    xf = x_st.reshape(-1, Q)
    for l in range(L):
        km = lambda sp, pp, a, b: np.asarray(
            K.kernel_matrix(sp, pp, jnp.array(a), jnp.array(b)))[l]
        K0xz = km(spec0, p0, xf, z[l])
        K0zz = km(spec0, p0, z[l], z[l]) + EPS * np.eye(M)
        Q0 = K0xz @ np.linalg.inv(K0zz) @ K0xz.T
        K1f = km(spec1, p1, xf, xf)
        Sigma = Q0 + K1f + noise[l] * np.eye(S * T)
        Q0s = km(spec0, p0, test_x, z[l]) @ np.linalg.inv(K0zz) @ K0xz.T
        K1s = km(spec1, p1, test_x, xf)
        want = (Q0s + K1s) @ np.linalg.inv(Sigma) @ mu.reshape(-1, L)[:, l]
        np.testing.assert_allclose(got[:, l], want, rtol=1e-6, atol=1e-8)


def test_natural_gradient_update_math():
    m = jnp.asarray(RNG.normal(0, 1, (L, M, 1)))
    Hh = RNG.normal(0, 1, (L, M, M)) / 3
    H = jnp.asarray(Hh @ np.swapaxes(Hh, -1, -2) + np.eye(M))
    gm = jnp.asarray(RNG.normal(0, .1, (L, M, 1)))
    gH = jnp.asarray(RNG.normal(0, .01, (L, M, M)))
    m2, H2 = E.natural_gradient_update(m, H, gm, gH, lr=0.01)
    iH = np.linalg.inv(np.asarray(H))
    iH_new = iH + 0.01 * (np.asarray(gH) + np.swapaxes(np.asarray(gH), -1, -2))
    H_want = np.linalg.inv(iH_new)
    m_want = H_want @ (iH @ np.asarray(m)
                       - 0.01 * (np.asarray(gm) - 2 * np.asarray(gH) @ np.asarray(m)))
    np.testing.assert_allclose(np.asarray(H2), H_want, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(m2), m_want, rtol=1e-8)


def test_sample_elbo_matches_dense_nystrom_oracle():
    """sample_elbo == log N(y; 0, Q0 + Bfull) - 0.5 tr(iB (K0 - Q0))."""
    (spec0, p0, spec1, p1, noise, m, H, z, x_st, valid, mu, log_v) = \
        _bound_inputs()
    y = mu   # any values work as the latent sample
    got = float(E.sample_elbo(spec0, p0, spec1, p1, jnp.asarray(noise),
                              jnp.asarray(z), jnp.asarray(x_st),
                              jnp.asarray(valid), jnp.asarray(y), EPS))

    xf = x_st.reshape(-1, Q)
    want = 0.0
    N = S * T
    for l in range(L):
        km = lambda sp, pp, a, b: np.asarray(
            K.kernel_matrix(sp, pp, jnp.array(a), jnp.array(b)))[l]
        K0xz = km(spec0, p0, xf, z[l])
        K0zz = km(spec0, p0, z[l], z[l]) + EPS * np.eye(M)
        Q0 = K0xz @ np.linalg.inv(K0zz) @ K0xz.T
        K0 = km(spec0, p0, xf, xf)
        Bfull = km(spec1, p1, xf, xf) + noise[l] * np.eye(N)
        # zero cross-subject entries of B (block-diagonal structure)
        subj = xf[:, ID_COV]
        Bfull = Bfull * (subj[:, None] == subj[None, :])
        Sig = Q0 + Bfull
        yl = y.reshape(-1, L)[:, l]
        loglik = (-0.5 * N * np.log(2 * np.pi)
                  - 0.5 * np.linalg.slogdet(Sig)[1]
                  - 0.5 * yl @ np.linalg.solve(Sig, yl))
        tr = np.sum(np.linalg.inv(Bfull) * (K0 - Q0))
        want += loglik - 0.5 * tr
    np.testing.assert_allclose(got, want, rtol=1e-7)


def test_float32_bound_matches_float64_reference_dtype():
    """BASELINE.md fidelity check: the float32 fast path reproduces the
    float64 (reference-dtype) KLD bound to <0.5% relative even on this
    deliberately ill-conditioned draw (near-singular Nystrom gram; real
    trained configs are tighter)."""
    (spec0, p0, spec1, p1, noise, m, H, z, x_st, valid, mu, log_v) = \
        _bound_inputs()
    args64 = [jnp.asarray(v, jnp.float64) if isinstance(v, np.ndarray) else v
              for v in (noise, m, H, z, x_st, valid, mu, log_v)]
    v64, _, _, _ = E.kld_upper_bound(spec0, p0, spec1, p1, *args64,
                                     P_tot=10.0, N_tot=30.0, eps=1e-4)
    p0_32 = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), p0)
    p1_32 = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), p1)
    args32 = [jnp.asarray(v, jnp.float32) if isinstance(v, np.ndarray) else v
              for v in (noise, m, H, z, x_st, valid, mu, log_v)]
    v32, _, _, _ = E.kld_upper_bound(spec0, p0_32, spec1, p1_32, *args32,
                                     P_tot=10.0, N_tot=30.0, eps=1e-4)
    rel = abs(float(v32) - float(v64)) / abs(float(v64))
    assert rel < 5e-3, rel


def test_nat_grad_f64_chain_matches_f64_reference():
    """The mixed-precision path (f32 bound inputs + nat_grad_dtype=float64)
    must reproduce the all-float64 natural-gradient quantities much more
    closely than the all-float32 path does — this is the stability fix for
    the canonical-scale f32 divergence (see gp/elbo.py docstring)."""
    inp = _bound_inputs()
    as64 = [jnp.asarray(v, jnp.float64) if isinstance(v, np.ndarray) else v
            for v in inp]
    as32 = [jnp.asarray(v, jnp.float32) if isinstance(v, np.ndarray) else v
            for v in inp]
    kw = dict(P_tot=float(S), N_tot=float(S * T), natural_gradient=True)

    _, gm64, gH64, iH64 = E.kld_upper_bound(*as64, eps=EPS, **kw)
    _, gm_mix, gH_mix, iH_mix = E.kld_upper_bound(
        *as32, eps=EPS, nat_grad_dtype=jnp.float64, **kw)
    _, gm32, gH32, _ = E.kld_upper_bound(*as32, eps=EPS, **kw)

    assert gm_mix.dtype == jnp.float64 and gH_mix.dtype == jnp.float64

    def relerr(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return np.abs(a - b).max() / np.abs(b).max()

    # mixed chain tracks f64 at least as well as pure f32 everywhere, and
    # the H-side (where the instability lives) markedly better
    assert relerr(gH_mix, gH64) < relerr(gH32, gH64)
    assert relerr(iH_mix, iH64) < 1e-5
    assert relerr(gm_mix, gm64) <= relerr(gm32, gm64) * 1.5

    # the (m, H) update in the mixed path stays PSD and matches f64
    m64, H64 = E.natural_gradient_update(as64[5], as64[6], gm64, gH64,
                                         0.01, iH=iH64)
    m32 = as32[5]
    H32 = as32[6]
    m_mix, H_mix = E.natural_gradient_update(m32, H32, gm_mix, gH_mix,
                                             0.01, iH=iH_mix)
    assert m_mix.dtype == m32.dtype and H_mix.dtype == H32.dtype
    np.testing.assert_allclose(np.asarray(H_mix, np.float64),
                               np.asarray(H64), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m_mix, np.float64),
                               np.asarray(m64), rtol=1e-3, atol=1e-5)


def test_kld_pallas_chol_matches_xla_incl_gradients():
    """The training-path Pallas branch (use_pallas_chol=True, now the
    default on TPU) must reproduce the XLA branch's bound value AND its
    gradients wrt kernel params and H.  Runs the kernel in interpret mode
    on CPU via FORCE_PALLAS."""
    from hlax.ops import linalg_small as ls
    inp = _bound_inputs()
    (spec0, p0, spec1, p1, noise, m, H, z, x_st, valid, mu, log_v) = [
        jnp.asarray(v) if isinstance(v, np.ndarray) else v for v in inp]

    def bound(p0_, H_, pallas):
        out, _, _, _ = E.kld_upper_bound(
            spec0, p0_, spec1, p1, noise, m, H_, z, x_st, valid, mu, log_v,
            P_tot=10.0, N_tot=30.0, eps=EPS, use_pallas_chol=pallas)
        return out

    old = ls.FORCE_PALLAS
    ls.FORCE_PALLAS = True
    try:
        v_p, (gp_p, gH_p) = jax.value_and_grad(bound, argnums=(0, 1))(
            p0, H, True)
    finally:
        ls.FORCE_PALLAS = old
    v_x, (gp_x, gH_x) = jax.value_and_grad(bound, argnums=(0, 1))(p0, H, False)

    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(gp_p),
                    jax.tree_util.tree_leaves(gp_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-9)
    sym = lambda A: 0.5 * (A + np.swapaxes(A, -1, -2))
    np.testing.assert_allclose(sym(np.asarray(gH_p)), sym(np.asarray(gH_x)),
                               rtol=1e-6, atol=1e-9)


def test_whitened_w_float32_stable_where_direct_factorization_fails():
    """Trained-kernel conditioning regression (round-3 eval-dtype work).

    On trained canonical checkpoints the eval bounds' W = K0zz + KziBK is
    ill-conditioned enough that factoring it directly in float32 NaNs —
    which is why rounds 1-2 forced eval-side float64.  The whitened
    factorization (gp/elbo.py::whitened_w_factor) factors I + iLK·KziBK·iLKᵀ
    (eigenvalues >= 1) instead, and must stay finite AND track the float64
    value in float32 under the same adversarial conditioning: near-duplicate
    inducing points (near-singular K0zz) with large output scales.
    """
    # Test-local RNG: the draws here must be independent of which other
    # tests ran first (the shared module RNG made this test order-dependent
    # — ADVICE r03).  Seed chosen so the f32/f64 agreement below holds.
    rng = np.random.default_rng(7)
    spec0, spec1 = _specs()
    p0, p1 = _params(spec0, rng), _params(spec1, rng)
    # crank the output scales (trained kernels grow scales freely); +50 puts
    # cond(W) ~ 1.5e8 (direct f32 Cholesky fails) while cond(K0zz) ~ 5e6 (its
    # f32 Cholesky survives, as it does every training step)
    boost = lambda p: [{k: (v + 50.0 if k == "raw_os" else v)
                        for k, v in c.items()} for c in p]
    p0, p1 = boost(p0), boost(p1)
    s, t = 32, 8
    x_st = _covariates(s, t, rng)
    valid = np.ones((s, t))
    # inducing rows identical in the cat dims (grid covariates) and
    # near-duplicate in the rbf dim -> K0zz is rank-1 up to the jitter
    z = np.tile(x_st[0, 0], (L, M, 1))
    z[:, :, 0] += rng.normal(0, 1e-5, (L, M))
    mu = rng.normal(0, 1, (s, t, L))
    log_v = rng.normal(-1, .3, (s, t, L))
    noise = np.ones(L)

    def dubo(dt, eps):
        cast = lambda tree: jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dt), tree)
        return float(E.deviance_upper_bound(
            spec0, cast(p0), spec1, cast(p1), jnp.asarray(noise, dt),
            cast(z), jnp.asarray(x_st, dt), jnp.asarray(valid, dt),
            jnp.asarray(mu, dt), jnp.asarray(log_v, dt), eps))

    ref = dubo(jnp.float64, 1e-6)
    got = dubo(jnp.float32, 1e-4)
    assert np.isfinite(ref)
    assert np.isfinite(got)
    np.testing.assert_allclose(got, ref, rtol=5e-3)

    # and the motivation: the DIRECT f32 factorization of W breaks down
    # (non-finite factor) on exactly this conditioning
    cast32 = lambda tree: jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), tree)
    blk = E.subject_blocks(spec0, cast32(p0), spec1, cast32(p1),
                           jnp.asarray(noise, jnp.float32), cast32(z),
                           jnp.asarray(x_st, jnp.float32),
                           jnp.asarray(valid, jnp.float32), 1e-4)
    iB_K0xz = jnp.einsum("lstu,lsum->lstm", blk.iB, blk.K0xz)
    KziBK = jnp.einsum("lstm,lstn->lmn", blk.K0xz, iB_K0xz)
    W = blk.K0zz + KziBK
    LW_direct = jnp.linalg.cholesky(0.5 * (W + jnp.swapaxes(W, -1, -2)))
    assert not bool(jnp.all(jnp.isfinite(LW_direct))), \
        "direct f32 Cholesky of W unexpectedly survived; tighten the test"
