"""Component timing of the canonical training epoch/step on the real chip.

Times (a) the scanned whole-epoch program bench.py measures, (b) one train
step alone, and (c) its components: VAE forward / forward+backward, KLD
bound forward (with natural-gradient quantities) / forward+backward, and
the (m, H) natural-gradient update.
"""
import sys, os, time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from hlax.data.dataset import (subject_batches, gather_batch,
                               epoch_subject_batches)
from hlax.gp import elbo as gp_elbo
from hlax.gp.kernels import build_kernel_specs, noise_value
from hlax.models.hlvae import nll_from_log_p
from hlax.train import step as tstep


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    epoch_fn, state, staged, model, het, ds = bench.build()
    nb = (bench.P_SUBJ + bench.S_BATCH - 1) // bench.S_BATCH
    rng = np.random.default_rng(0)
    idx = jnp.asarray(np.stack(list(
        epoch_subject_batches(ds.P, bench.S_BATCH, rng))))

    # whole-epoch program (state donated -> chain it)
    st, m = epoch_fn(state, staged, idx)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        st, m = epoch_fn(st, staged, idx)
    jax.block_until_ready(m["loss"])
    t_ep = (time.perf_counter() - t0) / 20
    print(f"epoch ({nb} steps): {t_ep*1e6:.0f} us  "
          f"({nb/t_ep:.0f} steps/sec)")

    spec0, spec1 = build_kernel_specs(
        cat_kernel=[2], bin_kernel=[], sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2},
                        {"cont_covariate": 0, "cat_covariate": 3},
                        {"cont_covariate": 1, "cat_covariate": 4}],
        bin_int_kernel=[], covariate_missing_val=[], id_covariate=2)
    cfg = tstep.TrainConfig(latent_dim=bench.LATENT, M=bench.M,
                            P_tot=float(bench.P_SUBJ),
                            N_tot=float(bench.P_SUBJ * bench.T),
                            id_covariate=2, natural_gradient=True,
                            constrain_scales=True, gp_dtype=jnp.float32)
    state = tstep.init_train_state(
        model, spec0, spec1, next(subject_batches(ds, bench.S_BATCH)), cfg,
        seed=0)
    b = jax.jit(gather_batch)(staged, jnp.arange(bench.S_BATCH))

    step = jax.jit(tstep.make_train_step(model, spec0, spec1, cfg))
    s2, m2 = step(state, b)
    jax.block_until_ready(m2["loss"])
    t0 = time.perf_counter()
    for _ in range(30):
        s2, m2 = step(s2, b)
    jax.block_until_ready(m2["loss"])
    print(f"single step (dispatched): {(time.perf_counter()-t0)/30*1e6:.0f} us")

    vae = state.vae
    key = jax.random.PRNGKey(0)

    @jax.jit
    def vae_fwd(vae, b, key):
        out = model.apply(vae, b["data"], b["mask"], b["theta_mask"], key)
        return jnp.sum(nll_from_log_p(out["log_p_x"]))

    vae_bwd = jax.jit(jax.grad(vae_fwd))
    print(f"vae forward: {timeit(vae_fwd, vae, b, key)*1e6:.0f} us")
    print(f"vae fwd+bwd: {timeit(vae_bwd, vae, b, key)*1e6:.0f} us")

    valid = b["valid"]
    S, Tt = valid.shape
    x_st = b["labels"].reshape(S, Tt, -1)
    mu_st = jnp.zeros((S, Tt, bench.LATENT), jnp.float32)
    lv_st = jnp.zeros((S, Tt, bench.LATENT), jnp.float32)
    nat_dt = jnp.float64 if jax.config.jax_enable_x64 else None

    @jax.jit
    def kld_only(st, x_st, valid, mu_st, lv_st):
        noise = noise_value(st.raw_noise, True)
        kld, gm, gH, _ = gp_elbo.kld_upper_bound(
            spec0, st.k0, spec1, st.k1, noise, st.m, st.H, st.zt,
            x_st, valid, mu_st, lv_st, cfg.P_tot, cfg.N_tot, cfg.eps,
            natural_gradient=True, nat_grad_dtype=nat_dt)
        return kld

    print(f"kld fwd (w/ f64 nat grads): "
          f"{timeit(kld_only, state, x_st, valid, mu_st, lv_st)*1e6:.0f} us")

    @jax.jit
    def kld_bwd(st, x_st, valid, mu_st, lv_st):
        def f(k0, k1, zt, mu_st):
            noise = noise_value(st.raw_noise, True)
            kld, _, _, _ = gp_elbo.kld_upper_bound(
                spec0, k0, spec1, k1, noise, st.m, st.H, zt,
                x_st, valid, mu_st, lv_st, cfg.P_tot, cfg.N_tot, cfg.eps)
            return kld
        return jax.grad(f, argnums=(0, 1, 2, 3))(st.k0, st.k1, st.zt, mu_st)

    print(f"kld fwd+bwd: "
          f"{timeit(kld_bwd, state, x_st, valid, mu_st, lv_st)*1e6:.0f} us")

    @jax.jit
    def natgrad(st):
        gH = jnp.zeros(st.H.shape,
                       jnp.float64 if nat_dt is not None else st.H.dtype)
        gm = jnp.zeros(st.m.shape, gH.dtype)
        return gp_elbo.natural_gradient_update(st.m, st.H, gm, gH, 0.01)

    print(f"nat-grad update: {timeit(natgrad, state)*1e6:.0f} us")


if __name__ == "__main__":
    main()
