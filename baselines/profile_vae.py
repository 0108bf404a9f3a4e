"""Layer-level timing of the canonical VAE + KLD-bound internals on the chip.

Round-3's component profile (profile_step.py) named two hot blocks: VAE
fwd+bwd 2.06 ms and KLD bound fwd+bwd 1.86 ms.  This drills INSIDE them —
each encoder/decoder stage and each piece of the GP bound — to decide where
a Pallas kernel or a layout restructure actually pays.

Protocol is profile_step.py's: every component is lax.scanned N times in
ONE jitted program with a carry injected into its inputs (no hoisting/CSE
across trips) and timed against a VALUE FETCH of the final carry.
"""
import sys, os, time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from flax import linen as nn
from hlax.data.dataset import subject_batches, gather_batch
from hlax.gp import elbo as gp_elbo
from hlax.gp.kernels import build_kernel_specs, kernel_matrix, noise_value
from hlax.models import hlvae as mh
from hlax.ops.linalg_small import chol_inv_blocked, chol_inv_small
from hlax.ops.normalization import batch_normalization
from hlax.train import step as tstep

# 500 trips/program: the relay charges a FIXED ~23 ms round-trip per value
# fetch (measured: 23.3/23.1/23.0 ms total for 50/500/5000 trivial trips),
# so 50 trips (profile_step.py round 3) buried every component under a
# ~460 us/trip floor; 500 trips push the floor to ~46 us/trip and the
# printed numbers subtract it.
SCAN_N = 500
REPS = 3
FLOOR_S = 23.0e-3   # relay round-trip, subtracted as FLOOR_S / SCAN_N


def timeit_scan(fn_of_carry, n=SCAN_N, reps=REPS, label=""):
    @jax.jit
    def many():
        def body(c, _):
            out = fn_of_carry(c)
            return (out * 1e-30).astype(jnp.float32), ()
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
        return c

    float(np.asarray(many()))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(many()))
        best = min(best, (time.perf_counter() - t0) / n)
    best = max(best - FLOOR_S / n, 0.0)
    print(f"{label}: {best*1e6:.0f} us", flush=True)
    return best


def main():
    epoch_fn, state, staged, model, het, ds = bench.build()
    del epoch_fn
    b = jax.jit(gather_batch)(staged, jnp.arange(bench.S_BATCH))
    vae = state.vae
    key = jax.random.PRNGKey(0)
    cfg_m = model.cfg
    lay = cfg_m.layout
    B = b["data"].shape[0]
    print(f"batch rows B={B}", flush=True)

    data, mask, tmask = b["data"], b["mask"], b["theta_mask"]

    # ---- encoder stages ------------------------------------------------
    def apply(fn, *args):
        return model.apply(vae, *args, method=fn)

    def norm_rep_img(c):
        def f(m, data, mask):
            norm_data, _ = batch_normalization(data, mask, lay, True)
            blocks = []
            for gi, g in enumerate(lay.groups):
                x_g = norm_data[:, g.exp_slice[0]:g.exp_slice[1]]
                m_g = mask[:, g.raw_slice[0]:g.raw_slice[1]]
                if g.kind in ("cat", "ordinal"):
                    x3 = x_g.reshape(x_g.shape[0], g.n_vars, g.nclass)
                    rep = jnp.einsum("bdc,dc->bd", x3, m._rep_w[str(gi)])
                    rep = rep + m._rep_b[str(gi)]
                else:
                    rep = x_g
                blocks.append(rep * m_g)
            one = jnp.concatenate(blocks, axis=1)
            img = one[:, jnp.asarray(lay.raw_inv)]
            return img.reshape(-1, 36, 36, 1)
        img = apply(f, data + c, mask)
        return jnp.sum(img[0])

    timeit_scan(norm_rep_img, label="enc: norm+rep+permute+reshape")

    img0 = model.apply(vae, data, mask,
                       method=lambda m, d, mk: None) if False else None
    # fixed inputs for isolated conv stages
    def mk_img(m, d, mk):
        norm_data, _ = batch_normalization(d, mk, lay, True)
        blocks = []
        for gi, g in enumerate(lay.groups):
            x_g = norm_data[:, g.exp_slice[0]:g.exp_slice[1]]
            m_g = mk[:, g.raw_slice[0]:g.raw_slice[1]]
            if g.kind in ("cat", "ordinal"):
                x3 = x_g.reshape(x_g.shape[0], g.n_vars, g.nclass)
                rep = jnp.einsum("bdc,dc->bd", x3, m._rep_w[str(gi)])
                rep = rep + m._rep_b[str(gi)]
            else:
                rep = x_g
            blocks.append(rep * m_g)
        one = jnp.concatenate(blocks, axis=1)
        return one[:, jnp.asarray(lay.raw_inv)].reshape(-1, 36, 36, 1)
    img = jax.jit(lambda d, mk: model.apply(vae, d, mk, method=mk_img))(
        data, mask)

    def conv1_pool(c):
        h = apply(lambda m, x: mh._max_pool_2x2(nn.relu(m.conv1(x))), img + c)
        return jnp.sum(h[0])
    timeit_scan(conv1_pool, label="enc: conv1(1->16)+relu+pool fwd")

    h1 = jax.jit(lambda x: model.apply(
        vae, x, method=lambda m, x: mh._max_pool_2x2(nn.relu(m.conv1(x)))))(img)

    def conv2_pool(c):
        h = apply(lambda m, x: mh._max_pool_2x2(nn.relu(m.conv2(x))), h1 + c)
        return jnp.sum(h[0])
    timeit_scan(conv2_pool, label="enc: conv2(16->32)+relu+pool fwd")

    h2 = jax.jit(lambda x: model.apply(
        vae, x, method=lambda m, x: mh._max_pool_2x2(nn.relu(m.conv2(x)))))(h1)
    flat = h2.reshape(B, -1)

    def enc_mlp(c):
        def f(m, x):
            h = m.enc_mlp(x)
            return m.mean_layer(h), m.log_var_layer(h)
        mu, lv = apply(f, flat + c)
        return jnp.sum(mu[0]) + jnp.sum(lv[0])
    timeit_scan(enc_mlp, label="enc: mlp(2592->500)+mu/logvar fwd")

    def conv_block_bwd(c):
        def f(p, x):
            def stages(m, x):
                h = mh._max_pool_2x2(nn.relu(m.conv1(x)))
                h = mh._max_pool_2x2(nn.relu(m.conv2(h)))
                return h
            return jnp.sum(model.apply(p, x, method=stages) ** 2)
        g = jax.grad(f, argnums=(0, 1))(vae, img + c)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))
    timeit_scan(conv_block_bwd, label="enc: conv block fwd+bwd")

    # ---- decoder stages ------------------------------------------------
    mu = jax.jit(lambda x: model.apply(vae, x, method=lambda m, x: m.mean_layer(
        m.enc_mlp(x))))(flat)

    def dec_mlp(c):
        def f(m, z):
            h = m.dec_mlp(z)
            y = m.y_layer(h)
            return y.reshape(-1, 9, 9, 32)
        y = apply(f, mu + c)
        return jnp.sum(y[0])
    timeit_scan(dec_mlp, label="dec: mlp(32->500)+y_layer(500->2592) fwd")

    y99 = jax.jit(lambda z: model.apply(vae, z, method=lambda m, z: m.y_layer(
        m.dec_mlp(z)).reshape(-1, 9, 9, 32)))(mu)

    def deconvs(c):
        def f(m, y):
            y = nn.relu(m.deconv1(y))
            return m.deconv2(y)
        y = apply(f, y99 + c)
        return jnp.sum(y[0])
    timeit_scan(deconvs, label="dec: deconv1+deconv2 fwd")

    def deconv_bwd(c):
        def f(p, y):
            def stages(m, y):
                return m.deconv2(nn.relu(m.deconv1(y)))
            return jnp.sum(model.apply(p, y, method=stages) ** 2)
        g = jax.grad(f, argnums=(0, 1))(vae, y99 + c)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))
    timeit_scan(deconv_bwd, label="dec: deconv block fwd+bwd")

    y_img = jax.jit(lambda y: model.apply(vae, y, method=lambda m, y:
        m.deconv2(nn.relu(m.deconv1(y)))))(y99)

    def heads_theta(c):
        def f(m, y):
            y = y.reshape(y.shape[0], -1, cfg_m.y_dim)
            y = y[:, jnp.asarray(lay.raw_perm), :]
            return m.theta_estimation(y, mask, tmask)
        th = apply(f, y_img + c)
        return jnp.sum(th[0])
    timeit_scan(heads_theta, label="dec: permute+heads+theta fwd")

    theta = jax.jit(lambda y: model.apply(vae, y, method=lambda m, y:
        m.theta_estimation(
            y.reshape(y.shape[0], -1, cfg_m.y_dim)[:, jnp.asarray(lay.raw_perm)],
            mask, tmask)))(y_img)

    def loglik(c):
        def f(m, th):
            _, norm_params = batch_normalization(data, mask, lay, True)
            lp, lpm, _ = m.loglik(th, data, mask, norm_params)
            return lp
        lp = apply(f, theta + c)
        return jnp.sum(lp[0])
    timeit_scan(loglik, label="dec: loglik heads fwd")

    def loglik_bwd(c):
        def f(p, th):
            def g(m, th):
                _, norm_params = batch_normalization(data, mask, lay, True)
                lp, _, _ = m.loglik(th, data, mask, norm_params)
                return jnp.sum(lp)
            return model.apply(p, th, method=g)
        g = jax.grad(f, argnums=(0, 1))(vae, theta + c)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))
    timeit_scan(loglik_bwd, label="dec: loglik fwd+bwd")

    # ---- KLD bound internals -------------------------------------------
    spec0, spec1 = build_kernel_specs(
        cat_kernel=[2], bin_kernel=[], sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2},
                        {"cont_covariate": 0, "cat_covariate": 3},
                        {"cont_covariate": 1, "cat_covariate": 4}],
        bin_int_kernel=[], covariate_missing_val=[], id_covariate=2)
    valid = b["valid"]
    S, Tt = valid.shape
    x_st = b["labels"].reshape(S, Tt, -1)
    noise = noise_value(state.raw_noise, True)
    eps = 1e-4
    L, M = bench.LATENT, bench.M

    def kernels_only(c):
        K0xz = kernel_matrix(spec0, state.k0, x_st + c, state.zt,
                             x2_batched=True)
        K0zz = kernel_matrix(spec0, state.k0, state.zt, state.zt,
                             x1_batched=True, x2_batched=True)
        K1 = kernel_matrix(spec1, state.k1, x_st + c, x_st + c)
        return jnp.sum(K0xz[0, 0]) + jnp.sum(K0zz[0]) + jnp.sum(K1[0, 0])
    timeit_scan(kernels_only, label="kld: kernel matrices fwd")

    with jax.default_matmul_precision("highest"):
        blk = jax.jit(lambda: gp_elbo.subject_blocks(
            spec0, state.k0, spec1, state.k1, noise, state.zt, x_st, valid,
            eps, use_pallas_chol=True))()
    jax.block_until_ready(blk)

    B_st = blk.K0_st * 0 + (blk.LB @ jnp.swapaxes(blk.LB, -1, -2))

    def cholB(c):
        LB, iLB = chol_inv_small(B_st + c * jnp.eye(Tt, dtype=B_st.dtype))
        iB = jnp.einsum("lskt,lsku->lstu", iLB, iLB)
        return jnp.sum(LB[0, 0]) + jnp.sum(iB[0, 0])
    timeit_scan(cholB, label="kld: [L,S,T,T] pallas chol+inv")

    KH = jnp.concatenate([blk.K0zz, state.H.astype(blk.K0zz.dtype)], axis=0)

    def cholKH(c):
        Ls, iLs = chol_inv_blocked(KH + c * jnp.eye(M, dtype=KH.dtype))
        return jnp.sum(Ls[0]) + jnp.sum(iLs[0])
    timeit_scan(cholKH, label="kld: [2L,120,120] blocked chol+inv")

    mu0 = jnp.zeros((S, Tt, L), jnp.float32)
    lv0 = jnp.zeros((S, Tt, L), jnp.float32)

    def bound_terms(c):
        with jax.default_matmul_precision("highest"):
            m_ = state.m
            v_mask = valid[:, :, None]
            mu_m = (mu0 + c) * v_mask
            v_m = jnp.exp(lv0) * v_mask
            iKm = jnp.einsum("lmn,lno->lmo", blk.iK0zz, m_)
            fit = jnp.einsum("lstm,lmo->lst", blk.K0xz, iKm)
            r = fit - jnp.transpose(mu_m, (2, 0, 1))
            A = jnp.einsum("lst,lstu,lsu->", r, blk.iB, r)
            diag_iB = jnp.diagonal(blk.iB, axis1=-2, axis2=-1)
            Bt = jnp.einsum("lst,stl->", diag_iB, v_m)
            C = jnp.sum(jnp.log(jnp.diagonal(blk.LB, axis1=-2, axis2=-1)))
            iB_K0xz = jnp.einsum("lstu,lsum->lstm", blk.iB, blk.K0xz)
            KziBK = jnp.einsum("lstm,lstn->lmn", blk.K0xz, iB_K0xz)
            D = jnp.sum(blk.iB * blk.K0_st) - jnp.sum(KziBK * blk.iK0zz)
            E_mat = jnp.einsum("lmn,lno,lop->lmp", blk.iK0zz,
                               state.H.astype(jnp.float32), blk.iK0zz)
            E = jnp.sum(E_mat * KziBK)
            return A + Bt + C + D + E
    timeit_scan(bound_terms, label="kld: A..E terms fwd (given blocks)")

    def natgrad_chain(c):
        with jax.default_matmul_precision("highest"):
            iB_K0xz = jnp.einsum("lstu,lsum->lstm", blk.iB, blk.K0xz)
            KziBK = jnp.einsum("lstm,lstn->lmn", blk.K0xz, iB_K0xz)
            Kz = KziBK + c
            iB_mu = jnp.einsum("lstu,sul->lst", blk.iB, mu0 + c)
            ng_P1 = jnp.einsum("lstm,lst->lm", blk.K0xz, iB_mu)[:, :, None]
            Y = jax.scipy.linalg.cho_solve((blk.LK0zz, True), Kz)
            B_mat = jax.scipy.linalg.cho_solve(
                (blk.LK0zz, True), jnp.swapaxes(Y, -1, -2)) + blk.iK0zz
            B_mat = 0.5 * (B_mat + jnp.swapaxes(B_mat, -1, -2))
            grad_m = -jnp.einsum("lmn,lno->lmo", blk.iK0zz, ng_P1) \
                + jnp.einsum("lmn,lno->lmo", B_mat, state.m)
            return jnp.sum(grad_m) + jnp.sum(B_mat[0])
    timeit_scan(natgrad_chain, label="kld: nat-grad chain (solves+B_mat)")


if __name__ == "__main__":
    main()
