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

EPOCHS = 10


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    import bench
    from hlax.data import generate as gen
    from hlax.data.reader import encode_raw
    from hlax.data.dataset import (HEALTH_MNIST_LABEL_ORDER,
                                   LongitudinalDataset, subject_batches,
                                   stage_dataset, epoch_subject_batches)
    from hlax.gp.kernels import build_kernel_specs
    from hlax.models import HLVAE, HLVAEConfig
    from hlax.train import step as tstep

    P_SUBJ, T, LATENT, M, S_BATCH = (bench.P_SUBJ, bench.T, bench.LATENT,
                                     bench.M, bench.S_BATCH)
    cache = f"/tmp/hlax_bench_hm_d4_p{P_SUBJ}_seed0.npz"   # bench.build's cache
    if os.path.exists(cache):
        z = np.load(cache)
        raw_data, raw_mask, labels = z["data"], z["mask"], z["labels"]
    else:
        out = gen.generate(num_3=P_SUBJ // 2, num_6=P_SUBJ // 2, missing=25.0,
                           datatype_config="D4", seed=0)
        raw_data, raw_mask = out["data"], out["mask"]
        labels = np.nan_to_num(
            out["labels"][:, np.array(HEALTH_MNIST_LABEL_ORDER)])
        np.savez(cache, data=raw_data, mask=raw_mask, labels=labels)
    het = encode_raw(raw_data, gen.types_table("D4"), miss_mask=raw_mask)
    ds = LongitudinalDataset(het=het, labels=labels, id_covariate=2, conv=True)

    spec0, spec1 = build_kernel_specs(
        cat_kernel=[2], bin_kernel=[], sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2},
                        {"cont_covariate": 0, "cat_covariate": 3},
                        {"cont_covariate": 1, "cat_covariate": 4}],
        bin_int_kernel=[], covariate_missing_val=[], id_covariate=2)
    cfg = tstep.TrainConfig(latent_dim=LATENT, M=M, P_tot=float(P_SUBJ),
                            N_tot=float(len(ds)), id_covariate=2,
                            natural_gradient=True, constrain_scales=True,
                            gp_dtype=jnp.float64)      # eps -> 1e-6 (ref value)
    model = HLVAE(HLVAEConfig(layout=ds.layout, z_dim=LATENT, h_dims=(500,),
                              y_dim=5, conv=True, dtype=jnp.float64))
    state = tstep.init_train_state(model, spec0, spec1,
                                   next(subject_batches(ds, S_BATCH)), cfg,
                                   seed=0)
    epoch_fn = jax.jit(tstep.make_train_epoch(model, spec0, spec1, cfg),
                       donate_argnums=0)
    staged = stage_dataset(ds, jnp.float64)
    rng = np.random.default_rng(0)
    nb = (P_SUBJ + S_BATCH - 1) // S_BATCH

    def idx_chunk(k):
        mats = [np.stack(list(epoch_subject_batches(ds.P, S_BATCH, rng)))
                for _ in range(k)]
        return jnp.asarray(np.concatenate(mats, axis=0))

    # one EPOCHS-epoch scan per dispatch, value-fetch sync (see bench.py:
    # block_until_ready through the relay can return early, and per-epoch
    # dispatch would measure relay latency, not the f64 compute cost)
    state, ms = epoch_fn(state, staged, idx_chunk(EPOCHS))   # compile+warmup
    np.asarray(ms["loss"])
    t0 = time.perf_counter()
    state, ms = epoch_fn(state, staged, idx_chunk(EPOCHS))
    losses = np.asarray(ms["loss"])
    dt = time.perf_counter() - t0
    res = {
        "dtype": "float64 (model + GP, on-chip)",
        "device_kind": jax.devices()[0].device_kind,
        "epochs": 2 * EPOCHS,
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
