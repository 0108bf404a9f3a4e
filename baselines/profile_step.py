"""Component timing of the canonical training epoch/step on the real chip.

Times (a) the scanned whole-epoch program bench.py measures, (b) one train
step alone, and (c) its components: VAE forward / forward+backward, KLD
bound forward (with natural-gradient quantities) / forward+backward, and
the (m, H) natural-gradient update.

Measurement protocol (NOTES.md "measurement honesty"): every timing syncs
on an actual VALUE FETCH (np.asarray), never ``block_until_ready`` — the
axon remote-device relay can return from block_until_ready at enqueue,
silently turning a throughput number into an enqueue rate.  Small
components are scanned N times inside ONE jitted program with a tiny carry
threaded through every trip (so XLA cannot hoist the loop-invariant body
out of the scan), and the whole program is timed against one fetch.
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

SCAN_N = 50      # component trips per program
REPS = 3         # programs per measurement (min taken)


def timeit_scan(fn_of_carry, n=SCAN_N, reps=REPS):
    """Time ``fn_of_carry(c) -> scalar`` scanned n times in ONE program.

    The carry c (f32 scalar, starts 0) must be INJECTED into the component's
    inputs by the caller (e.g. ``data + c``) and the returned scalar feeds
    the next trip's carry scaled by 1e-30 — a true data dependence chain, so
    the body cannot be hoisted or CSE'd across trips.  Returns seconds per
    call, synced on a value fetch of the final carry.
    """
    @jax.jit
    def many():
        def body(c, _):
            out = fn_of_carry(c)
            return (out * 1e-30).astype(jnp.float32), ()
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
        return c

    float(np.asarray(many()))          # compile + warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(many()))      # value fetch forces completion
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    epoch_fn, state, staged, model, het, ds = bench.build()
    nb = (bench.P_SUBJ + bench.S_BATCH - 1) // bench.S_BATCH
    rng = np.random.default_rng(0)
    idx = jnp.asarray(np.stack(list(
        epoch_subject_batches(ds.P, bench.S_BATCH, rng))))

    # whole-epoch program: state chains through the loop (donated), so the
    # dispatches pipeline and ONE final value fetch syncs the whole chain
    st, m = epoch_fn(state, staged, idx)
    np.asarray(m["loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        st, m = epoch_fn(st, staged, idx)
    np.asarray(m["loss"])
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

    # single dispatched step: state chains -> pipeline + one final fetch
    step = jax.jit(tstep.make_train_step(model, spec0, spec1, cfg))
    s2, m2 = step(state, b)
    np.asarray(m2["loss"])
    t0 = time.perf_counter()
    for _ in range(30):
        s2, m2 = step(s2, b)
    np.asarray(m2["loss"])
    print(f"single step (dispatched): {(time.perf_counter()-t0)/30*1e6:.0f} us")

    vae = state.vae
    key = jax.random.PRNGKey(0)

    def vae_fwd(c):
        out = model.apply(vae, b["data"] + c, b["mask"], b["theta_mask"], key)
        return jnp.sum(nll_from_log_p(out["log_p_x"]))

    print(f"vae forward: {timeit_scan(vae_fwd)*1e6:.0f} us")

    def vae_bwd(c):
        def f(p):
            out = model.apply(p, b["data"] + c, b["mask"], b["theta_mask"],
                              key)
            return jnp.sum(nll_from_log_p(out["log_p_x"]))
        g = jax.grad(f)(vae)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))

    print(f"vae fwd+bwd: {timeit_scan(vae_bwd)*1e6:.0f} us")

    valid = b["valid"]
    S, Tt = valid.shape
    x_st = b["labels"].reshape(S, Tt, -1)
    mu0 = jnp.zeros((S, Tt, bench.LATENT), jnp.float32)
    lv0 = jnp.zeros((S, Tt, bench.LATENT), jnp.float32)
    # match the SHIPPED configuration (cfg.nat_grad_f64=False -> f32 chain);
    # an earlier revision timed the f64 chain here, which is 30-60x slower
    # under TPU software-f64 and is not what the epoch/bench numbers run
    nat_dt = (jnp.float64 if cfg.nat_grad_f64 and jax.config.jax_enable_x64
              else None)
    noise = noise_value(state.raw_noise, True)

    def kld_fwd(c):
        kld, gm, gH, _ = gp_elbo.kld_upper_bound(
            spec0, state.k0, spec1, state.k1, noise, state.m, state.H,
            state.zt, x_st, valid, mu0 + c, lv0, cfg.P_tot, cfg.N_tot,
            cfg.eps, natural_gradient=True,
            use_pallas_chol=cfg.use_pallas_chol, nat_grad_dtype=nat_dt)
        return kld + jnp.sum(gm).astype(kld.dtype)

    print(f"kld fwd (w/ nat grads): {timeit_scan(kld_fwd)*1e6:.0f} us")

    def kld_bwd(c):
        def f(k0, k1, zt, mu_st):
            kld, _, _, _ = gp_elbo.kld_upper_bound(
                spec0, k0, spec1, k1, noise, state.m, state.H, zt,
                x_st, valid, mu_st, lv0, cfg.P_tot, cfg.N_tot, cfg.eps,
                use_pallas_chol=cfg.use_pallas_chol)
            return kld
        g = jax.grad(f, argnums=(0, 1, 2, 3))(state.k0, state.k1, state.zt,
                                              mu0 + c)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))

    print(f"kld fwd+bwd: {timeit_scan(kld_bwd)*1e6:.0f} us")

    def natgrad(c):
        gH = jnp.zeros(state.H.shape,
                       nat_dt if nat_dt is not None else state.H.dtype)
        gm = jnp.zeros(state.m.shape, gH.dtype) + c.astype(gH.dtype)
        m_new, H_new = gp_elbo.natural_gradient_update(
            state.m, state.H, gm, gH, 0.01,
            use_pallas_chol=cfg.use_pallas_chol)
        return (jnp.sum(m_new) + jnp.sum(H_new)).astype(jnp.float32)

    print(f"nat-grad update: {timeit_scan(natgrad)*1e6:.0f} us")

    def gather(c):
        # carry-dependent indices (c rounds to +0) so LICM cannot hoist the
        # gather out of the scan body
        sub = jnp.arange(bench.S_BATCH) + c.astype(jnp.int32)
        bt = gather_batch(staged, sub)
        return jnp.sum(bt["data"][0, :4]) + c

    print(f"batch gather: {timeit_scan(gather)*1e6:.0f} us")


if __name__ == "__main__":
    main()
