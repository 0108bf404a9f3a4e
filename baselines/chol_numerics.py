"""On-chip numerics harness for the mid-size Pallas Cholesky (M=120).

Round-4 shipped `_chol_inv_mid` as the default factorization for the
canonical M=120 K0zz/H matrices and the driver bench diverged to NaN
(BENCH_r04.json, bisected by the judge: pallas-on NaNs within epochs,
pallas-off converges).  CI never caught it because every linalg test runs
Pallas in *interpret mode on CPU*, where `jax.lax.rsqrt` is exact — the
chip's approximate VPU rsqrt (and any Mosaic lowering difference) is
exactly what CI cannot see.  This harness runs the kernels ON THE REAL
CHIP and quantifies their error against a float64 CPU oracle, on

  * synthetic SPD batches with controlled conditioning (1e3 / 1e6 / 1e7,
    log-spaced eigenvalues in a random orthogonal basis), and
  * the REAL matrices of the canonical workload: K0zz(+eps) and the
    natural-gradient iH_new after warming the canonical Health-MNIST
    training for a configurable number of epochs with the XLA path
    (--capture-epochs), i.e. the exact inputs on which round 4 NaN'd.

Paths compared (all f32 on chip):
  mid          — the single-pass mid kernel (`_chol_inv_mid`)
  blocked24    — the round-3 composition (small-kernel diagonal blocks,
                 forced by capping MAX_MID_M below M)
  xla          — jnp.linalg.cholesky + triangular solve (the
                 use_pallas_chol=False arm that converges)

Metrics per (path, matrix set): max |iL@L64 - I| (the inverse-factor
residual that feeds the natural-gradient H update), max rel error of L
vs the f64 factor, and count of non-finite outputs.

Usage (on an idle host with a healthy link):
    python baselines/chol_numerics.py [--capture-epochs 50] \
        [--out baselines/chol_numerics.json]

Reference under test: the factorizations backing elbo_functions.py:118-193
(/root/reference) — hlax/gp/elbo.py::subject_blocks + natural_gradient_update.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def f64_oracle(a64):
    l64 = np.linalg.cholesky(a64)
    il64 = np.linalg.solve(
        l64, np.broadcast_to(np.eye(a64.shape[-1]), l64.shape))
    return l64, il64


def measure(name, fn, a64, out):
    """Run (L, iL) = fn(f32 a) on device, compare against the f64 oracle."""
    import jax.numpy as jnp

    l64, il64 = f64_oracle(a64)
    m = a64.shape[-1]
    l, il = fn(jnp.asarray(a64, jnp.float32))
    l = np.asarray(l, np.float64)
    il = np.asarray(il, np.float64)
    nonfinite = int(np.sum(~np.isfinite(l)) + np.sum(~np.isfinite(il)))
    res = np.abs(np.einsum("...ij,...jk->...ik", il, l64)
                 - np.eye(m)).max() if nonfinite == 0 else float("nan")
    rel_l = (np.abs(l - l64).max() / np.abs(l64).max()
             if nonfinite == 0 else float("nan"))
    row = {"path": name, "max_rel_L": float(rel_l),
           "max_inv_residual": float(res), "nonfinite": nonfinite}
    out.append(row)
    print(f"  {name:10s} relL={rel_l:9.2e}  |iL@L-I|={res:9.2e}  "
          f"nonfinite={nonfinite}", flush=True)
    return row


def synthetic_spd(rng, b, m, cond):
    q, _ = np.linalg.qr(rng.standard_normal((b, m, m)))
    ev = np.exp(np.linspace(0.0, -np.log(cond), m))
    return np.einsum("bij,j,bkj->bik", q, ev, q)


def capture_canonical(epochs: int):
    """Warm canonical training with the XLA path (stable) for ``epochs``,
    then return the exact [L,M,M] batches the Pallas path would factorize:
    K0zz + eps*I and H (the nat-grad state), stacked like subject_blocks
    does, plus the whitened Wi = I + C from a training batch."""
    import jax
    import jax.numpy as jnp
    import bench
    from hlax.gp import elbo as gp_elbo
    from hlax.gp.kernels import kernel_matrix, noise_value
    from hlax.data.dataset import epoch_subject_batches

    epoch_fn, state, staged, model, het, ds = bench.build()
    # disable Pallas for the warmup: rebuild the epoch fn with the flag off
    from hlax.train import step as tstep
    cfg = tstep.TrainConfig(latent_dim=bench.LATENT, M=bench.M,
                            P_tot=float(bench.P_SUBJ),
                            N_tot=float(het.data.shape[0]), id_covariate=2,
                            natural_gradient=True, constrain_scales=True,
                            gp_dtype=jnp.float32, use_pallas_chol=False)
    from hlax.gp.kernels import build_kernel_specs
    spec0, spec1 = build_kernel_specs(
        cat_kernel=[2], bin_kernel=[], sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2},
                        {"cont_covariate": 0, "cat_covariate": 3},
                        {"cont_covariate": 1, "cat_covariate": 4}],
        bin_int_kernel=[], covariate_missing_val=[], id_covariate=2)
    epoch_xla = jax.jit(tstep.make_train_epoch(model, spec0, spec1, cfg),
                        donate_argnums=0)
    rng = np.random.default_rng(0)
    chunk = 10
    for _ in range(max(1, epochs // chunk)):
        mats = [np.stack(list(epoch_subject_batches(ds.P, bench.S_BATCH, rng)))
                for _ in range(chunk)]
        state, metrics = epoch_xla(state, staged, jnp.asarray(
            np.concatenate(mats, axis=0)))
        loss = float(np.asarray(metrics["loss"])[-1])
    print(f"# captured state after ~{epochs} XLA-path epochs, "
          f"last loss {loss:.1f}", flush=True)
    z = state.zt
    k0 = state.k0
    K0zz = kernel_matrix(spec0, k0, z, z, x1_batched=True, x2_batched=True)
    K0zz = np.asarray(K0zz, np.float64) + cfg.eps * np.eye(bench.M)
    H = np.asarray(state.H, np.float64)
    # symmetrize for the oracle (state H is kept symmetric up to rounding)
    H = 0.5 * (H + np.swapaxes(H, -1, -2))
    stacked = np.concatenate([K0zz, H], axis=0)
    return stacked, float(loss)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capture-epochs", type=int, default=50)
    ap.add_argument("--skip-capture", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "chol_numerics.json"))
    args = ap.parse_args()

    import bench
    bench.wait_healthy_device_link()

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import hlax.ops.linalg_small as ls

    platform = jax.devices()[0].platform
    print(f"# platform: {platform}", flush=True)

    def mid(a):
        return jax.jit(ls._chol_inv_mid)(a)

    def mid_raw(a):
        saved = ls.MID_REFINE
        ls.MID_REFINE = False   # the exact round-4 shipped path (no Newton)
        try:
            return jax.jit(ls._chol_inv_mid_batched)(a)
        finally:
            ls.MID_REFINE = saved

    def blocked24(a):
        saved = ls.MAX_MID_M
        ls.MAX_MID_M = 24       # force the round-3 composition
        try:
            return jax.jit(ls.chol_inv_blocked)(a)
        finally:
            ls.MAX_MID_M = saved

    def xla(a):
        l = jnp.linalg.cholesky(a)
        eye = jnp.broadcast_to(jnp.eye(a.shape[-1], dtype=a.dtype), a.shape)
        il = jax.scipy.linalg.solve_triangular(l, eye, lower=True)
        return l, il

    paths = [("mid", mid), ("mid_raw", mid_raw), ("blocked24", blocked24),
             ("xla", xla)]
    report = {"platform": platform, "sets": []}
    rng = np.random.default_rng(0)

    for cond in (1e3, 1e6, 1e7):
        a64 = synthetic_spd(rng, 64, 120, cond)
        print(f"synthetic M=120 cond={cond:.0e}:", flush=True)
        rows = []
        for name, fn in paths:
            measure(name, fn, a64, rows)
        report["sets"].append({"set": f"synthetic_cond{cond:.0e}",
                               "rows": rows})

    # f32-INDEFINITE spectrum (cond 1e10): the degenerate-pivot-guard
    # regime.  The guarded Pallas kernels must return finite factors of a
    # nearby SPD matrix here; XLA's Cholesky returns NaN (expected —
    # nonfinite>0 for the xla row is the baseline being beaten, and the
    # error metrics vs the f64 oracle are meaningless for every path).
    a64 = synthetic_spd(rng, 64, 120, 1e10)
    emin = np.linalg.eigvalsh(a64.astype(np.float32).astype(np.float64))
    print(f"synthetic M=120 f32-indefinite (eigmin {emin.min():.1e}):",
          flush=True)
    rows = []
    for name, fn in paths:
        measure(name, fn, a64, rows)
    report["sets"].append({"set": "synthetic_f32_indefinite",
                           "f32_eigmin": float(emin.min()), "rows": rows})

    if not args.skip_capture:
        stacked, loss = capture_canonical(args.capture_epochs)
        conds = np.linalg.cond(stacked)
        print(f"canonical K0zz+H after {args.capture_epochs} epochs "
              f"(cond min/med/max {conds.min():.1e}/"
              f"{np.median(conds):.1e}/{conds.max():.1e}):", flush=True)
        rows = []
        for name, fn in paths:
            measure(name, fn, stacked, rows)
        report["sets"].append({
            "set": f"canonical_ep{args.capture_epochs}",
            "warm_loss": loss,
            "cond_max": float(conds.max()), "rows": rows})

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"# wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
