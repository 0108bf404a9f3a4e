"""bfloat16-vs-float32 model step-time A/B AFTER the MXU conv lowering.

Round-3's full 400-epoch CLI A/B (QUALITY.md) found bf16 12% SLOWER and
badly worse in quality; the judge asked (VERDICT r03 #6) to re-run the
SPEED axis once the 1->16->32-channel convs were reformulated as patch
matmuls (hlax/ops/convfuse.py), since the old conv layout was the prime
suspect for "bf16 buys no throughput".  The quality verdict is dtype-
mantissa-driven (Gaussian-NLL variance calibration collapses at bf16) and
does not depend on layout, so only step time is re-measured here.

Round 5 adds a third arm, "mixed": the selective mixed-precision policy
(HLVAEConfig.compute_dtype=bfloat16 — bf16 conv+MLP stacks, f32 params/
reparameterization/heads/GP math), which targets the step-time win of the
full-bf16 arm without touching the paths its quality collapse implicated.

Protocol (NOTES.md measurement honesty): whole-epoch scanned program,
state chained through 20 epochs, ONE value fetch at the end; gate on a
healthy device link before timing; each arm runs in its OWN subprocess
(fresh client, fresh allocator) so the f32 arm's live executables cannot
bias the bf16 arm — `main()` is the two-subprocess wrapper, `--arm DTYPE`
is the single-arm worker entry.
"""
import sys, os, time, json, subprocess

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPOCHS = 20


def time_epoch(model_dtype, compute_dtype=None):
    import jax.numpy as jnp
    import bench
    from hlax.data.dataset import epoch_subject_batches

    epoch_fn, state, staged, model, het, ds = bench.build(
        model_dtype=model_dtype, compute_dtype=compute_dtype)
    nb = (bench.P_SUBJ + bench.S_BATCH - 1) // bench.S_BATCH
    rng = np.random.default_rng(0)
    idx = jnp.asarray(np.stack(list(
        epoch_subject_batches(ds.P, bench.S_BATCH, rng))))
    st, m = epoch_fn(state, staged, idx)          # compile + warm
    loss0 = float(np.asarray(m["loss"]).sum())
    t0 = time.perf_counter()
    for _ in range(EPOCHS):
        st, m = epoch_fn(st, staged, idx)
    loss = float(np.asarray(m["loss"]).sum())     # value fetch = sync
    dt = (time.perf_counter() - t0) / EPOCHS
    return {"sec_per_epoch": dt, "steps_per_sec": nb / dt,
            "loss_first": loss0, "loss_last": loss,
            "finite": bool(np.isfinite(loss))}


def run_arm(name: str):
    import jax.numpy as jnp
    import bench
    bench.wait_healthy_device_link()   # never time through a degraded relay
    if name == "mixed":
        # selective policy: bf16 conv+MLP stacks, f32 params/heads/GP math
        r = time_epoch(jnp.float32, compute_dtype=jnp.bfloat16)
    else:
        dt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]
        r = time_epoch(dt)
    print("ARM_RESULT " + json.dumps(r), flush=True)


def main():
    out = {}
    here = os.path.abspath(__file__)
    for name in ("float32", "bfloat16", "mixed"):
        p = subprocess.run([sys.executable, here, "--arm", name],
                           capture_output=True, text=True, timeout=1800)
        line = next((l for l in p.stdout.splitlines()
                     if l.startswith("ARM_RESULT ")), None)
        if p.returncode != 0 or line is None:
            print(p.stdout[-2000:], p.stderr[-2000:], file=sys.stderr)
            raise RuntimeError(f"{name} arm failed (rc={p.returncode})")
        r = json.loads(line[len("ARM_RESULT "):])
        out[name] = r
        print(f"{name}: {r['sec_per_epoch']*1e3:.2f} ms/epoch "
              f"({r['steps_per_sec']:.1f} steps/sec), finite={r['finite']}")
    out["speedup_bf16"] = (out["float32"]["sec_per_epoch"]
                           / out["bfloat16"]["sec_per_epoch"])
    out["speedup_mixed"] = (out["float32"]["sec_per_epoch"]
                            / out["mixed"]["sec_per_epoch"])
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ab_bf16_step.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"bf16 step speedup vs f32: {out['speedup_bf16']:.3f}x -> {path}")


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--arm":
        run_arm(sys.argv[2])
    else:
        main()
