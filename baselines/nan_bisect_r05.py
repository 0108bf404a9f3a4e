"""Round-5 NaN bisect: which M=120 factorization route keeps the
lax-conv canonical trajectory finite?

Context (VERDICT r05 #1 follow-up): the 330-epoch convergence proof
(baselines/convergence_r05.json) ran at commit aa1b41b when the model
default was still fused_conv=True.  Commit 3499abd flipped the default
to the lax conv lowerings for the 5x-faster backward — and bench.py's
new finiteness gate then caught the shipped default diverging within
the 30-epoch timing window (/tmp/bench_r05.out).  The mid Pallas
kernel is numerically on par with XLA on the fused trajectory's
matrices (baselines/chol_numerics.json) but the lax-conv trajectory
drives the K0zz/H conditioning somewhere it NaNs.

Arms (each a fresh subprocess; the chip is single-client so they run
serialized).  NOTE: the recorded nan_bisect_r05.json arms ran BEFORE the
root-cause flip (MID_ALIAS_INPUT now defaults False): at that time
"default"/"noguard" meant the ALIASED mid kernel (guarded/raw — both NaN
at epoch 1), "noalias" was the experimental separate-output variant
(finite, now the shipped default), and "blocked24"/"fused" were the
finite controls.  Verdict: input_output_aliases={0:0} miscompiles inside
the donated lax-conv epoch program; numerics (guard, refine) exonerated.
  default      lax conv + mid kernel + pivot guard (shipped)
  noguard      same with HLAX_PIVOT_GUARD=0
  blocked24    lax conv + round-3 blocked composition + guard
  fused        fused conv + mid kernel (aa1b41b config)
  noalias      lax conv + separate-output mid kernel

Usage: python baselines/nan_bisect_r05.py             # run all arms
       python baselines/nan_bisect_r05.py --arm NAME --epochs N  # one arm

Writes baselines/nan_bisect_r05.json (arm -> first_nan_epoch|None,
final_loss, trace tail).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

ARMS = ("noguard", "default", "blocked24", "fused", "noalias")


def run_arm(arm: str, epochs: int) -> dict:
    import bench
    import jax
    import jax.numpy as jnp
    from hlax.data.dataset import epoch_subject_batches
    from hlax.gp.kernels import build_kernel_specs
    from hlax.models import HLVAE, HLVAEConfig
    from hlax.train import step as tstep
    import hlax.ops.linalg_small as ls

    if arm == "blocked24":
        # route M=120 through the round-3 composition: 24-blocks via the
        # batch-on-lanes kernel + MXU panels (mid kernel stays for nothing
        # at canonical scale)
        ls.MAX_MID_M = 24

    epoch_fn, state, staged, model, het, ds = bench.build()

    if arm == "fused":
        cfg = tstep.TrainConfig(
            latent_dim=bench.LATENT, M=bench.M, P_tot=float(bench.P_SUBJ),
            N_tot=float(het.data.shape[0]), id_covariate=2,
            natural_gradient=True, constrain_scales=True,
            gp_dtype=jnp.float32)
        spec0, spec1 = build_kernel_specs(
            cat_kernel=[2], bin_kernel=[], sqexp_kernel=[0],
            cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2},
                            {"cont_covariate": 0, "cat_covariate": 3},
                            {"cont_covariate": 1, "cat_covariate": 4}],
            bin_int_kernel=[], covariate_missing_val=[], id_covariate=2)
        mcfg = HLVAEConfig(layout=ds.layout, z_dim=bench.LATENT,
                           h_dims=(500,), y_dim=5, conv=True,
                           dtype=jnp.float32, fused_conv=True)
        model = HLVAE(mcfg)
        # params are layout-compatible (same weights, different lowering)
        epoch_fn = jax.jit(tstep.make_train_epoch(model, spec0, spec1, cfg),
                           donate_argnums=0)

    nb = (bench.P_SUBJ + bench.S_BATCH - 1) // bench.S_BATCH
    rng = np.random.default_rng(0)
    chunk = 5
    trace = []
    first_nan = None
    t0 = time.perf_counter()
    for e in range(0, epochs, chunk):
        idx = jnp.asarray(np.concatenate(
            [np.stack(list(epoch_subject_batches(ds.P, bench.S_BATCH, rng)))
             for _ in range(chunk)], axis=0))
        state, metrics = epoch_fn(state, staged, idx)
        losses = np.asarray(metrics["loss"])          # value fetch = sync
        # per-epoch means inside the chunk to pin the first bad epoch
        per_ep = losses.reshape(chunk, nb).mean(axis=1)
        for j, ep_loss in enumerate(per_ep):
            ep = e + j + 1
            if not np.isfinite(ep_loss) and first_nan is None:
                first_nan = ep
        ep_loss = float(per_ep[-1])
        trace.append({"epoch": e + chunk, "loss": ep_loss})
        print(f"[{arm}] epoch {e + chunk:4d}  loss {ep_loss:15.1f}"
              f"{'' if np.isfinite(ep_loss) else '   <-- NON-FINITE'}",
              flush=True)
        if first_nan is not None:
            break
    return {"arm": arm, "epochs_run": trace[-1]["epoch"] if trace else 0,
            "first_nan_epoch": first_nan,
            "final_loss": trace[-1]["loss"] if trace else None,
            "wall_s": round(time.perf_counter() - t0, 1),
            "trace_tail": trace[-6:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", choices=ARMS)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "nan_bisect_r05.json"))
    args = ap.parse_args()

    if args.arm:
        rep = run_arm(args.arm, args.epochs)
        print("RESULT " + json.dumps(rep), flush=True)
        return

    import bench
    bench.wait_healthy_device_link()
    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    for arm in ARMS:
        if arm in results and "error" not in results[arm]:
            continue
        env = dict(os.environ)
        if arm == "noguard":
            env["HLAX_PIVOT_GUARD"] = "0"
        if arm == "noalias":
            env["HLAX_MID_ALIAS"] = "0"
        p = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__),
             "--arm", arm, "--epochs", str(args.epochs)],
            capture_output=True, text=True, cwd=ROOT, timeout=1800, env=env)
        line = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
        sys.stdout.write(p.stdout)
        if p.returncode or not line:
            sys.stderr.write(p.stderr[-2000:])
            results[arm] = {"arm": arm, "error": f"rc={p.returncode}"}
        else:
            results[arm] = json.loads(line[-1][len("RESULT "):])
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(f"# wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
