"""Sparse-GP KL-divergence bounds, padded-batched over subjects and latents.

Reference math: ``minibatch_KLD_upper_bound`` / ``minibatch_KLD_upper_bound_iter``
(/root/reference/elbo_functions.py:118-285) and ``deviance_upper_bound`` /
``validation_dubo`` (elbo_functions.py:60-115, validation.py:16-76).

TPU-native design: instead of the reference's Python loop over subjects with
per-subject Cholesky factorizations (elbo_functions.py:242-266), subjects are
padded to a common T_max and ALL per-subject solves run as one batched
Cholesky of shape [latent, S, T_max, T_max].  Padding contributes exactly
zero to every term:

  * B blocks are identity on padded rows/cols (diag 1, off-diag 0), so their
    Cholesky log-diagonal is 0 and their inverse is identity;
  * K matrices, mu and log_v are masked to zero on padded rows, so every
    bilinear/trace accumulator vanishes there.

This single implementation covers both the fixed-T and the varying-T paths of
the reference (fixed-T is just "no padding").
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from hlax.gp.kernels import KernelSpec, kernel_matrix
from hlax.ops.linalg_small import chol_inv_blocked, chol_inv_small

# TPU matmuls default to bfloat16 passes; the GP quadratic forms (entries up
# to ~1/eps after inverting near-singular grams) lose enough mantissa to make
# the natural-gradient Cholesky chain diverge.  All GP einsums/matmuls run at
# full float32 precision.
import functools as _functools


def _highest_precision(fn):
    @_functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)
    return wrapped



def _chol_inverse(L):
    """Inverse from a (batched) Cholesky factor."""
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    eye = jnp.broadcast_to(eye, L.shape)
    return jax.scipy.linalg.cho_solve((L, True), eye)


def _logdet_from_chol(L):
    return 2.0 * jnp.sum(jnp.log(
        jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)


class SubjectBlocks(NamedTuple):
    """Shared per-batch kernel quantities (padded subject-major)."""
    K0xz: jnp.ndarray        # [L, S, T, M]   (masked)
    K0zz: jnp.ndarray        # [L, M, M]      (+ eps I)
    LK0zz: jnp.ndarray       # [L, M, M]
    iK0zz: jnp.ndarray       # [L, M, M]
    K0_st: jnp.ndarray       # [L, S, T, T]   (masked)
    LB: jnp.ndarray          # [L, S, T, T]
    iB: jnp.ndarray          # [L, S, T, T]
    iLB: jnp.ndarray         # [L, S, T, T]   inverse Cholesky factor of B
    iLK: jnp.ndarray         # [L, M, M]      inverse Cholesky factor of K0zz


@_highest_precision
def subject_blocks(
    spec0: KernelSpec, params0, spec1: KernelSpec, params1,
    noise, z, x_st, valid, eps,
    with_K0st: bool = True,
    use_pallas_chol: bool = False,
    extra_spd=None,
):
    """Build the kernel blocks shared by the bounds and the predictor.

    x_st [S, T, Q] padded covariates, valid [S, T] 0/1, z [L, M, Q],
    noise [L] GP observation noise.

    ``extra_spd`` [L, M, M]: an additional SPD batch (the bound's H) to
    factorize STACKED with K0zz in one blocked-kernel pass — halves the
    per-step Pallas invocation count versus factorizing them separately.
    When given, returns ``(SubjectBlocks, (L_extra, iL_extra))``.
    """
    L = z.shape[0]
    M = z.shape[1]
    T = x_st.shape[1]
    dt = x_st.dtype

    vo = valid[:, :, None] * valid[:, None, :]          # [S, T, T]

    K0xz = kernel_matrix(spec0, params0, x_st, z, x2_batched=True)  # [L,S,T,M]
    K0xz = K0xz * valid[None, :, :, None]
    K0zz = kernel_matrix(spec0, params0, z, z, x1_batched=True, x2_batched=True)
    K0zz = K0zz + eps * jnp.eye(M, dtype=dt)
    extra_fact = None
    if use_pallas_chol:
        # blocked Pallas factorization: XLA's [L,M,M] f32 Cholesky alone
        # costs ~1.7 ms at M=120 on a v5e (latency-bound sequential loop)
        if extra_spd is not None:
            Ls, iLs = chol_inv_blocked(
                jnp.concatenate([K0zz, extra_spd.astype(dt)], axis=0))
            LK0zz, iLK = Ls[:L], iLs[:L]
            extra_fact = (Ls[L:], iLs[L:])
        else:
            LK0zz, iLK = chol_inv_blocked(K0zz)
        iK0zz = jnp.einsum("lkm,lkn->lmn", iLK, iLK)
    else:
        LK0zz = jnp.linalg.cholesky(K0zz)
        eyeM = jnp.broadcast_to(jnp.eye(M, dtype=dt), LK0zz.shape)
        iLK = jax.scipy.linalg.solve_triangular(LK0zz, eyeM, lower=True)
        iK0zz = _chol_inverse(LK0zz)
        if extra_spd is not None:
            LEx = jnp.linalg.cholesky(extra_spd.astype(dt))
            iLEx = jax.scipy.linalg.solve_triangular(LEx, eyeM, lower=True)
            extra_fact = (LEx, iLEx)

    K1_st = kernel_matrix(spec1, params1, x_st, x_st) * vo[None]
    eyeT = jnp.eye(T, dtype=dt)
    diag_fill = (noise[:, None, None, None] * valid[None, :, :, None]
                 + (1.0 - valid)[None, :, :, None])
    B_st = K1_st * vo[None] + eyeT * diag_fill
    if use_pallas_chol:
        # Pallas batch-on-lanes Cholesky (hlax/ops/linalg_small.py).  Wins on
        # the gradient-free paths (prediction / DUBO / eval, 2.4x) AND inside
        # the training step (honest on-chip A/B: 4.94 vs 7.04 ms full step —
        # round 2's opposite conclusion was an enqueue-rate timing artifact).
        # chol_inv_blocked dispatches on T: <=48 the unrolled batch-on-lanes
        # kernel (canonical T=20), <=128 the single-pass mid kernel, beyond
        # that mid-kernel diagonal blocks + MXU panels (the T >> 100
        # longitudinal regime, SURVEY §5 — XLA otherwise serializes these).
        LB, iLB = chol_inv_blocked(B_st)
    else:
        LB = jnp.linalg.cholesky(B_st)
        iLB = jax.scipy.linalg.solve_triangular(
            LB, jnp.broadcast_to(eyeT, LB.shape), lower=True)
    iB = jnp.einsum("lskt,lsku->lstu", iLB, iLB)

    if with_K0st:
        K0_st = kernel_matrix(spec0, params0, x_st, x_st) * vo[None]
    else:
        K0_st = jnp.zeros((L, 0, 0, 0), dt)
    blocks = SubjectBlocks(K0xz, K0zz, LK0zz, iK0zz, K0_st, LB, iB, iLB, iLK)
    return blocks if extra_spd is None else (blocks, extra_fact)


@_highest_precision
def kld_upper_bound(
    spec0: KernelSpec, params0, spec1: KernelSpec, params1,
    noise,                    # [L] GP noise
    m,                        # [L, M, 1] inducing mean
    H,                        # [L, M, M] inducing covariance (PSD)
    z,                        # [L, M, Q] inducing points
    x_st,                     # [S, T, Q] padded covariates
    valid,                    # [S, T]
    mu_st,                    # [S, T, L] encoder means (0 on padding)
    log_v_st,                 # [S, T, L] encoder log-variances
    P_tot,                    # total number of subjects in the dataset
    N_tot,                    # total number of rows in the dataset
    eps: float,
    natural_gradient: bool = False,
    use_pallas_chol: bool = False,
    nat_grad_dtype=None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """Unbiased mini-batched KLD upper bound (elbo_functions.py:118-285).

    Returns (kld_total, grad_m, grad_H, iH); the gradients are the
    closed-form natural-gradient quantities of elbo_functions.py:184-192 and
    iH the Cholesky inverse of H for reuse by natural_gradient_update (all
    None unless ``natural_gradient``).

    ``nat_grad_dtype``: compute dtype for the closed-form natural-gradient
    chain (iK0zz/B_mat compositions + iH).  The chain composes matrices with
    eigenvalues up to 1/eps; round 2 found pure float32 here diverges at
    canonical Health-MNIST scale (NaN by ~ep75-120) and shipped a float64
    chain.  Round 3 root-caused the divergence to the *explicit-inverse
    composition* iK·Kz·iK (squares the rounding error of iK on the
    near-singular Nystrom gram) and replaced it with backward-stable
    triangular solves on the K0zz Cholesky factor — with which the PURE
    float32 chain is stable through 300 canonical-GP-scale epochs (CPU
    repro harness, 2026-08-17).  float64 (pass jnp.float64 with x64
    enabled) remains the belt-and-braces default; float32 is the fast path
    where f64 is expensive.
    """
    Ldim = z.shape[0]
    M = z.shape[1]

    # H is factorized STACKED with K0zz inside subject_blocks (one blocked
    # Pallas pass for both [L, M, M] batches)
    blk, (LH, iLH) = subject_blocks(spec0, params0, spec1, params1, noise,
                                    z, x_st, valid, eps,
                                    use_pallas_chol=use_pallas_chol,
                                    extra_spd=H)
    iH = jnp.einsum("lkm,lkn->lmn", iLH, iLH)

    # number of real subjects in the batch (all-padding subjects don't count)
    P_batch = jnp.sum(jnp.any(valid > 0, axis=1).astype(x_st.dtype))

    v_mask = valid[:, :, None]
    mu_m = mu_st * v_mask                                # [S, T, L]
    v_m = jnp.exp(log_v_st) * v_mask

    # A: quadratic fit of K0xz iK0zz m - mu under iB (elbo_functions.py:166-167)
    iKm = jnp.einsum("lmn,lno->lmo", blk.iK0zz, m)       # [L, M, 1]
    fit = jnp.einsum("lstm,lmo->lst", blk.K0xz, iKm)     # [L, S, T]
    r = fit - jnp.transpose(mu_m, (2, 0, 1))             # [L, S, T]
    A = jnp.einsum("lst,lstu,lsu->", r, blk.iB, r)

    diag_iB = jnp.diagonal(blk.iB, axis1=-2, axis2=-1)   # [L, S, T]
    Bt = jnp.einsum("lst,stl->", diag_iB, v_m)
    C = jnp.sum(jnp.log(jnp.diagonal(blk.LB, axis1=-2, axis2=-1))) * 2.0

    iB_K0xz = jnp.einsum("lstu,lsum->lstm", blk.iB, blk.K0xz)
    KziBK = jnp.einsum("lstm,lstn->lmn", blk.K0xz, iB_K0xz)   # [L, M, M]
    D = jnp.sum(blk.iB * blk.K0_st) - jnp.sum(KziBK * blk.iK0zz)

    E_mat = jnp.einsum("lmn,lno,lop->lmp", blk.iK0zz, H, blk.iK0zz)
    E = jnp.sum(E_mat * KziBK)   # E_mat symmetric-transposable w/ KziBK sym
    F = jnp.sum(log_v_st * v_mask)

    # KL(q(u) || p(u)) (elbo_functions.py:176-180)
    tr1 = jnp.sum(blk.iK0zz * jnp.swapaxes(H, -1, -2))
    qf1 = jnp.sum(m * jnp.einsum("lmn,lno->lmo", blk.iK0zz, m))
    logdetK = jnp.sum(_logdet_from_chol(blk.LK0zz))
    logdetH = jnp.sum(_logdet_from_chol(LH))
    kld_qu_pu = 0.5 * (tr1 + qf1 - Ldim * M + logdetK - logdetH)

    kld_total = (P_tot / P_batch * 0.5 * (A + Bt + C + D + E - F)
                 + kld_qu_pu - Ldim * N_tot / 2.0)

    grad_m = grad_H = iH_out = None
    if natural_gradient:
        cdt = nat_grad_dtype or x_st.dtype
        m_c = m.astype(cdt)
        iB_mu = jnp.einsum("lstu,sul->lst", blk.iB, mu_m)
        ng_P1 = jnp.einsum("lstm,lst->lm", blk.K0xz,
                           iB_mu)[:, :, None].astype(cdt)
        # B_mat = iK·KziBK·iK + iK.  Round 2's explicit-inverse composition
        # iK·Kz·iK squares the rounding error of iK on the (intrinsically
        # near-singular) RBF Nystrom gram and drove the pure-f32 chain
        # indefinite (NaN by ~ep75 at canonical scale); round 3 replaced it
        # with backward-stable cho_solves.  Round 4 replaces the solves with
        # the WHITENED GRAM composition (same move as whitened_w_factor):
        #     KziBK = Σ_st Gs^T Gs  with  Gs = iLB·K0xz
        #  => iK·KziBK·iK + iK = iLK^T (I + C) iLK,
        #     C = Σ_st G̃^T G̃,  G̃ = iLB·K0xz·iLK^T.
        # C is PSD in floating point up to O(eps·λmax) and I + C has
        # eigenvalues >= 1, so the composition never touches the gram's
        # conditioning squared — stability equals the solve chain's (A/B'd:
        # 300 canonical epochs, finite, matching loss) while the ~6 batched
        # [L,M,M] triangular solves (latency-bound XLA custom calls, ~350 us
        # on a v5e) become 4 MXU batched matmuls (~40 us).
        if cdt == blk.LK0zz.dtype:
            iLK_c = blk.iLK
            iK_c = blk.iK0zz          # already built by subject_blocks
        else:
            LK = jnp.linalg.cholesky(blk.K0zz.astype(cdt))
            eyeM = jnp.broadcast_to(jnp.eye(LK.shape[-1], dtype=cdt),
                                    LK.shape)
            iLK_c = jax.scipy.linalg.solve_triangular(LK, eyeM, lower=True)
            iK_c = jnp.einsum("lkm,lkn->lmn", iLK_c, iLK_c)
        Gw = jnp.einsum("lstu,lsun->lstn", blk.iLB.astype(cdt),
                        jnp.einsum("lstm,lnm->lstn", blk.K0xz.astype(cdt),
                                   iLK_c))                    # iLB·K0xz·iLK^T
        C_w = jnp.einsum("lstm,lstn->lmn", Gw, Gw)            # PSD Gram sum
        IpC = C_w + jnp.eye(C_w.shape[-1], dtype=cdt)
        B_mat = jnp.einsum("lpm,lpq,lqn->lmn", iLK_c, IpC, iLK_c)
        B_mat = 0.5 * (B_mat + jnp.swapaxes(B_mat, -1, -2))
        if cdt != H.dtype:
            LH_c = jnp.linalg.cholesky(H.astype(cdt))
            iH_c = _chol_inverse(LH_c)
        else:
            iH_c = iH
        grad_m = -jnp.einsum("lmn,lno->lmo", iK_c, ng_P1) \
            + jnp.einsum("lmn,lno->lmo", B_mat, m_c)
        grad_H = 0.5 * (-iH_c + B_mat)
        iH_out = iH_c   # reusable by natural_gradient_update (saves a Cholesky)

    return kld_total, grad_m, grad_H, iH_out


def whitened_w_factor(iLK, K0xz, iLB, use_pallas_chol: bool = True):
    """Stable factorization of W = K0zz + Kzx·iB·Kxz without factoring W.

    Whitening by the K0zz Cholesky factor: W = LK (I + C) LKᵀ with
    C = iLK·Kzx·iB·Kxz·iLKᵀ PSD, so the matrix actually factored (I + C)
    has eigenvalues >= 1 and its float32 Cholesky is unconditionally
    stable.  Factoring W directly stacks K0zz's near-singular conditioning
    on top of the Nystrom term's scale — on trained kernels that is what
    pushed the float32 eval bounds to NaN (the round-2 finding that forced
    eval-side float64).  Same move as the solve-based natural-gradient
    chain (kld_upper_bound): triangular solves against Cholesky factors
    instead of explicit compositions on the ill-conditioned gram.

    C is built as an explicit Gram sum C = Σ_st GᵀG with
    G = iLB·K0xz·iLKᵀ, NOT as iLK·KziBK·iLKᵀ: the triple product's
    float32 rounding error scales with ‖iLK‖²·‖KziBK‖ (≈ O(1) absolute at
    trained-kernel conditioning), which can push eigenvalues of I + C
    below zero; a Gram sum is PSD in floating point up to
    O(eps·λmax(C)) ≪ 1.

    Args: iLK [L,M,M] (inverse Cholesky factor of K0zz), K0xz [L,S,T,M]
    (masked), iLB [L,S,T,T] — all from ``subject_blocks``, which already
    produced both inverse factors; re-solving either here would duplicate
    the expensive triangular solves on every eval bound/predict call.
    Returns (iLK, LWi, iLWi):
      * logdet W = logdet K0zz + 2·Σ log diag LWi,
      * inv(W)   = iLKᵀ · iLWiᵀ · iLWi · iLK,
      * ‖iLW·p‖² with iLW = iLWi·iLK gives the W-quadratic forms.
    """
    M = iLK.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(M, dtype=iLK.dtype), iLK.shape)
    A = jnp.einsum("lstm,lnm->lstn", K0xz, iLK)      # K0xz·iLKᵀ [L,S,T,M]
    G = jnp.einsum("lstu,lsun->lstn", iLB, A)        # [L,S,T,M]
    C = jnp.einsum("lstm,lstn->lmn", G, G)           # Gram sum: PSD
    Wi = eye + C
    if use_pallas_chol:
        LWi, iLWi = chol_inv_blocked(Wi)
    else:
        LWi = jnp.linalg.cholesky(Wi)
        iLWi = jax.scipy.linalg.solve_triangular(LWi, eye, lower=True)
    return iLK, LWi, iLWi


@_highest_precision
def deviance_upper_bound(
    spec0: KernelSpec, params0, spec1: KernelSpec, params1,
    noise, z, x_st, valid, mu_st, log_v_st, eps: float,
) -> jnp.ndarray:
    """Closed-form DUBO over a full set (validation.py:16-76), padded-batched
    and summed over latent dimensions."""
    blk = subject_blocks(spec0, params0, spec1, params1, noise, z, x_st,
                         valid, eps, use_pallas_chol=True)
    v_mask = valid[:, :, None]
    mu_m = jnp.transpose(mu_st * v_mask, (2, 0, 1))      # [L, S, T]
    v_m = jnp.transpose(jnp.exp(log_v_st) * v_mask, (2, 0, 1))
    N_valid = jnp.sum(valid)

    iB_K0xz = jnp.einsum("lstu,lsum->lstm", blk.iB, blk.K0xz)
    KziBK = jnp.einsum("lstm,lstn->lmn", blk.K0xz, iB_K0xz)
    iLK, LWi, iLWi = whitened_w_factor(blk.iLK, blk.K0xz, blk.iLB)

    # logDetSigma = -logdet K0zz + logdet B + logdet W, and
    # logdet W = logdet K0zz + logdet(I + C): the K0zz terms cancel
    logDetB = jnp.sum(_logdet_from_chol(blk.LB), axis=-1)   # [L]
    logDetSigma = logDetB + _logdet_from_chol(LWi)

    iB_m = jnp.einsum("lstu,lsu->lst", blk.iB, mu_m)
    qF1 = jnp.einsum("lst,lst->l", mu_m, iB_m)
    p = jnp.einsum("lstm,lst->lm", blk.K0xz, iB_m)       # [L, M]
    sol = jnp.einsum("lmn,ln->lm", iLWi,
                     jnp.einsum("lmn,ln->lm", iLK, p))   # = solve(LW, p)
    qF2 = jnp.sum(sol ** 2, axis=-1)
    qF = qF1 - qF2

    tr = (jnp.sum(blk.iB * blk.K0_st, axis=(-1, -2, -3))
          - jnp.sum(KziBK * blk.iK0zz, axis=(-1, -2)))
    logDetD = jnp.sum(jnp.where(valid[None] > 0,
                                jnp.transpose(log_v_st, (2, 0, 1)), 0.0),
                      axis=(-1, -2))
    diag_iB = jnp.diagonal(blk.iB, axis1=-2, axis2=-1)
    tr_iB_D = jnp.einsum("lst,lst->l", diag_iB, v_m)
    G = iB_K0xz * jnp.sqrt(v_m)[:, :, :, None]
    KziBDiBK = jnp.einsum("lstm,lstn->lmn", G, G)
    # tr(iW K) with iW = iLW^T iLW and iLW = iLWi·iLK
    Kw = jnp.einsum("lmn,lno,lpo->lmp", iLK, KziBDiBK, iLK)
    tr_W = jnp.einsum("lmn,lno,lmo->l", iLWi, Kw, iLWi)
    tr_iSigma_D = tr_iB_D - tr_W

    dubo = 0.5 * (tr_iSigma_D + qF - N_valid + logDetSigma - logDetD + tr)
    return jnp.sum(dubo)


@_highest_precision
def sample_elbo(
    spec0: KernelSpec, params0, spec1: KernelSpec, params1,
    noise, z, x_st, valid, y_st, eps: float,
) -> jnp.ndarray:
    """Sample-based sparse-GP marginal-likelihood lower bound
    (elbo_functions.py:9-57), batched over latent dims and padded subjects.

    y_st [S, T, L]: a latent sample (0 on padding).  Returns the bound summed
    over latent dimensions (the reference's per-dim ``elbo`` summed over the
    L loop of validation.py:141-147).
    """
    blk = subject_blocks(spec0, params0, spec1, params1, noise, z, x_st,
                         valid, eps, use_pallas_chol=True)
    y_m = jnp.transpose(y_st * valid[:, :, None], (2, 0, 1))   # [L, S, T]
    N_valid = jnp.sum(valid)

    iB_K0xz = jnp.einsum("lstu,lsum->lstm", blk.iB, blk.K0xz)
    KziBK = jnp.einsum("lstm,lstn->lmn", blk.K0xz, iB_K0xz)
    iLK, LWi, iLWi = whitened_w_factor(blk.iLK, blk.K0xz, blk.iLB)

    # -logdet K0zz + logdet W = logdet(I + C): K0zz cancels (see DUBO)
    logDet = (jnp.sum(_logdet_from_chol(blk.LB), axis=-1)
              + _logdet_from_chol(LWi))                         # [L]

    iB_y = jnp.einsum("lstu,lsu->lst", blk.iB, y_m)
    qF1 = jnp.einsum("lst,lst->l", y_m, iB_y)
    p = jnp.einsum("lstm,lst->lm", blk.K0xz, iB_y)
    sol = jnp.einsum("lmn,ln->lm", iLWi,
                     jnp.einsum("lmn,ln->lm", iLK, p))   # = solve(LW, p)
    qF = qF1 - jnp.sum(sol ** 2, axis=-1)

    tr = (jnp.sum(blk.iB * blk.K0_st, axis=(-1, -2, -3))
          - jnp.sum(KziBK * blk.iK0zz, axis=(-1, -2)))
    const = -0.5 * N_valid * jnp.log(2.0 * jnp.pi)
    el = const - 0.5 * (logDet + qF) - 0.5 * tr
    return jnp.sum(el)


# jitted entry points for eval paths (specs are hashable static args)
deviance_upper_bound_jit = jax.jit(deviance_upper_bound,
                                   static_argnums=(0, 2))
sample_elbo_jit = jax.jit(sample_elbo, static_argnums=(0, 2))


@_highest_precision
def natural_gradient_update(m, H, grad_m, grad_H, lr: float, iH=None,
                            jitter: float = 0.0,
                            use_pallas_chol: bool = True):
    """Closed-form natural-gradient step on (m, H) (training.py:130-137).

    Pass the ``iH`` returned by kld_upper_bound to skip recomputing the
    Cholesky inverse of H.  The arithmetic runs in the gradients' dtype
    (float64 when kld_upper_bound was given nat_grad_dtype=float64) and the
    result is cast back to the state dtype of (m, H).

    ``jitter``: relative diagonal ridge added to iH_new before its Cholesky
    (scaled by the mean diagonal).  iH_new is PSD in exact arithmetic
    (0.99·iH + 0.01·B_mat for lr=0.01, both PSD), but float32 rounding can
    push small eigenvalues negative; a tiny ridge keeps the factorization
    alive without visibly perturbing the update."""
    cdt = grad_H.dtype
    m_c, H_c = m.astype(cdt), H.astype(cdt)
    eye = jnp.broadcast_to(jnp.eye(H.shape[-1], dtype=cdt), H.shape)

    def spd_inverse(A):
        # Pallas blocked factorization when allowed (self-gating; this is
        # the gradient-free (m, H) update, so only the forward kernel
        # runs) — iL^T iL equals cho_solve-against-eye's two triangular
        # solves up to rounding of the same order.  Partitions cleanly on
        # a mesh too (custom_partitioning wrapper, linalg_small.py), so
        # use_pallas_chol=False is purely a caller preference now.
        if use_pallas_chol:
            _, iLA = chol_inv_blocked(A)
            return jnp.einsum("lkm,lkn->lmn", iLA, iLA)
        return _chol_inverse(jnp.linalg.cholesky(A))

    if iH is None:
        iH = spd_inverse(H_c)
    iH_new = iH + lr * (grad_H + jnp.swapaxes(grad_H, -1, -2))
    if jitter:
        mean_diag = jnp.mean(jnp.diagonal(iH_new, axis1=-2, axis2=-1),
                             axis=-1)[:, None, None]
        iH_new = iH_new + jitter * mean_diag * eye
    H_new = spd_inverse(iH_new)
    m_new = jnp.einsum(
        "lmn,lno->lmo", H_new,
        jnp.einsum("lmn,lno->lmo", iH, m_c)
        - lr * (grad_m - 2.0 * jnp.einsum("lmn,lno->lmo", grad_H, m_c)))
    return m_new.astype(m.dtype), H_new.astype(H.dtype)
