"""Device-level performance accounting for the canonical training step.

Answers "is the quoted steps/sec physically plausible, and at what MFU?"
(the round-2 verdict found the repo's perf numbers un-normalized to hardware
capability).  Method:

  1. build the canonical Health-MNIST bench workload (bench.build);
  2. lower + compile the whole-epoch training program and read XLA's own
     cost analysis (flops) — this is the compiler's count for the program
     actually executed, not a hand model;
  3. measure steps/sec end-to-end (same protocol as bench.py);
  4. identify the chip (device_kind) and compute
     MFU = achieved FLOP/s / chip peak FLOP/s.

Writes baselines/flops.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# bf16/f32 peak TFLOP/s per chip, from public spec sheets; "f32" is the
# classic fp32 path (TPUs run f32 matmuls as multi-pass bf16, so achievable
# f32 peak is below the bf16 number)
CHIP_PEAKS_TFLOPS = {
    "TPU v4": {"bf16": 275.0, "f32": 137.0},
    "TPU v5e": {"bf16": 197.0, "f32": 98.5},
    "TPU v5 lite": {"bf16": 197.0, "f32": 98.5},
    "TPU v5p": {"bf16": 459.0, "f32": 229.5},
    "TPU v6e": {"bf16": 918.0, "f32": 459.0},
    "TPU v6 lite": {"bf16": 918.0, "f32": 459.0},
}


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from hlax.data.dataset import epoch_subject_batches

    epoch_fn, state, staged, model, het, ds = bench.build()
    nb = (bench.P_SUBJ + bench.S_BATCH - 1) // bench.S_BATCH
    rng = np.random.default_rng(0)

    def idx_mat():
        return jnp.asarray(np.stack(list(
            epoch_subject_batches(ds.P, bench.S_BATCH, rng))))

    idx = idx_mat()
    lowered = epoch_fn.lower(state, staged, idx)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    # XLA's cost analysis counts a while-loop (lax.scan) body ONCE, not per
    # trip: the compiled-epoch flops are identical for 1/2/10 scanned steps
    # (verified round 3).  The reported number is therefore the PER-STEP
    # count (plus negligible outside-loop ops), ~20.6 GFLOP for the
    # canonical step — consistent with a hand count of the conv/dense/GP
    # GEMMs.  Do NOT divide by steps-per-epoch.
    flops_step = float(ca.get("flops", float("nan")))

    # measured steps/sec, bench protocol: CHUNK-epoch dispatches with
    # value-fetch sync (np.asarray — block_until_ready through the axon
    # relay can return early; see bench.py)
    def idx_chunk(k=bench.CHUNK):
        mats = [np.stack(list(epoch_subject_batches(ds.P, bench.S_BATCH,
                                                    rng)))
                for _ in range(k)]
        return jnp.asarray(np.concatenate(mats, axis=0))

    state, ms = epoch_fn(state, staged, idx_chunk())   # compile + warmup
    np.asarray(ms["loss"])
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        state, ms = epoch_fn(state, staged, idx_chunk())
        np.asarray(ms["loss"])
    dt = time.perf_counter() - t0
    steps_per_sec = reps * bench.CHUNK * nb / dt

    dev = jax.devices()[0]
    kind = dev.device_kind
    plat = dev.platform
    peaks = CHIP_PEAKS_TFLOPS.get(kind)
    achieved_tflops = steps_per_sec * flops_step / 1e12
    out = {
        "device_kind": kind,
        "platform": plat,
        "flops_per_step_xla": flops_step,
        "steps_per_sec_measured": round(steps_per_sec, 1),
        "achieved_tflops": round(achieved_tflops, 2),
        "peak_tflops_bf16": peaks["bf16"] if peaks else None,
        "peak_tflops_f32": peaks["f32"] if peaks else None,
        "mfu_vs_f32_peak": (round(achieved_tflops / peaks["f32"], 4)
                            if peaks else None),
        "mfu_vs_bf16_peak": (round(achieved_tflops / peaks["bf16"], 4)
                             if peaks else None),
        "notes": "flops from XLA cost_analysis of the compiled whole-epoch "
                 "program, which counts the lax.scan body ONCE, so the "
                 "reported number IS the per-step count (no division); "
                 "steps/sec measured end-to-end through the device link",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "flops.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
