"""Canonical-convergence proof run for the shipped default configuration.

Round 4 shipped `use_pallas_chol=True` routing the M=120 K0zz/H
factorizations through the single-pass mid Pallas kernel and the driver
bench diverged to NaN (BENCH_r04.json; VERDICT r04 weak #1).  This runner
is the "done" criterion of VERDICT r05 ask #1: train the EXACT bench
configuration (bench.build(), shipped defaults, real Health-MNIST D4) for
330+ epochs on the real chip, record the per-epoch net-loss trace, and
fail loudly unless the final loss is finite and in the round-3 regime
(~-550k +/- 10%).

Usage:  python baselines/convergence_check.py [--epochs 330]
            [--pallas-off] [--out baselines/convergence_r05.json]

`--pallas-off` reruns the judge's bisection arm (use_pallas_chol=False)
for an A/B trace on identical seeds/data.

Reference math being matched: /root/reference training.py:121-137 +
elbo_functions.py:118-193 (the canonical run the reference converges on).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# loss window from the round-3 finite bench + the judge's 330-epoch
# pallas-off rerun (-537,586); +/-10% per the verdict's done criterion
EXPECT_LOSS = -550_000.0
TOL = 0.10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=330)
    ap.add_argument("--pallas-off", action="store_true")
    ap.add_argument("--mixed", action="store_true",
                    help="train under the selective mixed-precision policy "
                         "(HLVAEConfig.compute_dtype=bfloat16) — the quality "
                         "arm of baselines/ab_bf16_step.py's 'mixed' row")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "convergence_r05.json"))
    args = ap.parse_args()

    import bench
    bench.wait_healthy_device_link()

    import jax
    import jax.numpy as jnp
    from hlax.data.dataset import epoch_subject_batches

    epoch_fn, state, staged, model, het, ds = bench.build(
        compute_dtype=jnp.bfloat16 if args.mixed else None)
    if args.pallas_off:
        from hlax.train import step as tstep
        from hlax.gp.kernels import build_kernel_specs
        cfg = tstep.TrainConfig(
            latent_dim=bench.LATENT, M=bench.M, P_tot=float(bench.P_SUBJ),
            N_tot=float(het.data.shape[0]), id_covariate=2,
            natural_gradient=True, constrain_scales=True,
            gp_dtype=jnp.float32, use_pallas_chol=False)
        spec0, spec1 = build_kernel_specs(
            cat_kernel=[2], bin_kernel=[], sqexp_kernel=[0],
            cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2},
                            {"cont_covariate": 0, "cat_covariate": 3},
                            {"cont_covariate": 1, "cat_covariate": 4}],
            bin_int_kernel=[], covariate_missing_val=[], id_covariate=2)
        epoch_fn = jax.jit(tstep.make_train_epoch(model, spec0, spec1, cfg),
                           donate_argnums=0)

    nb = (bench.P_SUBJ + bench.S_BATCH - 1) // bench.S_BATCH
    rng = np.random.default_rng(0)
    chunk = 10
    trace = []
    t0 = time.perf_counter()
    for e in range(0, args.epochs, chunk):
        idx = jnp.asarray(np.concatenate(
            [np.stack(list(epoch_subject_batches(ds.P, bench.S_BATCH, rng)))
             for _ in range(chunk)], axis=0))
        state, metrics = epoch_fn(state, staged, idx)
        losses = np.asarray(metrics["loss"])          # value fetch = sync
        ep_loss = float(losses[-nb:].mean())
        trace.append({"epoch": e + chunk, "loss": ep_loss})
        flag = "" if np.isfinite(ep_loss) else "   <-- NON-FINITE"
        print(f"epoch {e + chunk:4d}  net loss {ep_loss:15.1f}{flag}",
              flush=True)
        if not np.isfinite(ep_loss):
            break
    wall = time.perf_counter() - t0

    final = trace[-1]["loss"]
    ok = bool(np.isfinite(final)
              and abs(final - EXPECT_LOSS) <= TOL * abs(EXPECT_LOSS))
    report = {
        "arm": ("pallas_off" if args.pallas_off
                else "mixed_bf16" if args.mixed else "shipped_default"),
        "epochs": trace[-1]["epoch"], "final_loss": final,
        "expected": EXPECT_LOSS, "rel_tol": TOL, "ok": ok,
        "wall_s": round(wall, 1), "trace": trace,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"# final loss {final:.1f} after {trace[-1]['epoch']} epochs "
          f"({wall:.0f}s) -> {'OK' if ok else 'FAIL'}; wrote {args.out}",
          flush=True)
    sys.exit(0 if ok else 4)


if __name__ == "__main__":
    main()
