"""Full-float64 canonical-config training ON THE TPU CHIP.

The reference's native dtype is float64 everywhere (HLVAE_main.py:158
``.double()``).  On TPU, f64 is software-emulated; round 2 additionally hit
TWO compile blockers in the chip's x64 rewrite, both fixed in round 3:
(1) flax truncated-normal init lowers ``nextafter`` — fixed by initializing
on the host CPU backend and transferring
(hlax/train/step.py::init_train_state); (2) max-pool's backward emits
``select_and_scatter`` — fixed by the reshape-based 2x2 pool
(hlax/models/hlvae.py::_max_pool_2x2).  This script demonstrates the
end-to-end f64 conv path at canonical scale and records its cost next to
the shipped f32 configuration.

Prints one JSON line {"dtype", "epochs", "steps_per_sec", "losses_finite",
"final_epoch_mean_loss"} and writes baselines/f64_tpu.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPOCHS = 3


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    import bench
    from hlax.data.dataset import epoch_subject_batches

    P_SUBJ, S_BATCH = bench.P_SUBJ, bench.S_BATCH
    # the canonical bench workload at the reference's native dtype (eps ->
    # 1e-6, the reference value, via TrainConfig's dtype-aware default);
    # data/model/spec assembly is SHARED with bench.build so this run can
    # never desynchronize from the headline bench
    epoch_fn, state, staged, model, het, ds = bench.build(
        model_dtype=jnp.float64, gp_dtype=jnp.float64)
    rng = np.random.default_rng(0)
    nb = (P_SUBJ + S_BATCH - 1) // S_BATCH

    def idx_chunk(k):
        mats = [np.stack(list(epoch_subject_batches(ds.P, S_BATCH, rng)))
                for _ in range(k)]
        return jnp.asarray(np.concatenate(mats, axis=0))

    # ONE-epoch programs, value-fetch synced per dispatch.  The first
    # attempt scanned 10 epochs per dispatch and the multi-minute software
    # -f64 program CRASHED the TPU worker ("kernel fault", 2026-08-18);
    # per-epoch dispatch keeps each program short enough to survive while
    # still timing against value fetches (see bench.py on why
    # block_until_ready is not a sync point here).  The per-dispatch relay
    # round-trip (~2 s worst case) is noise against a multi-second f64
    # epoch.
    state, ms = epoch_fn(state, staged, idx_chunk(1))   # compile+warmup
    np.asarray(ms["loss"])
    t0 = time.perf_counter()
    losses = []
    for _ in range(EPOCHS):
        state, ms = epoch_fn(state, staged, idx_chunk(1))
        losses.append(np.asarray(ms["loss"]))
    losses = np.concatenate(losses)
    dt = time.perf_counter() - t0
    res = {
        "dtype": "float64 (model + GP, on-chip)",
        "device_kind": jax.devices()[0].device_kind,
        "epochs": 1 + EPOCHS,
        "steps_per_sec": round(EPOCHS * nb / dt, 2),
        "losses_finite": bool(np.isfinite(losses).all()),
        "final_epoch_mean_loss": float(losses[-nb:].mean()),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "f64_tpu.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
