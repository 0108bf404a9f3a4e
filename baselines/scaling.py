"""Weak-scaling measurement of the mesh epoch-scan training path.

Runs the one-dispatch-per-epoch training program (make_train_epoch_mesh +
jit_train_epoch) on virtual CPU meshes of 1/2/4/8 devices with a FIXED
per-device workload (weak scaling: P_local and S_local constant, global
problem grows with the mesh), and records steps/sec and subject-rows/sec.

HONESTY CAVEAT (recorded with the numbers): this host exposes ONE physical
CPU core, so the N virtual devices are time-sliced — aggregate rows/sec
CANNOT exceed the 1-device number.  What this measures is the PARTITIONING
OVERHEAD of the SPMD program: with zero overhead, aggregate rows/sec stays
flat as devices are added (N devices each doing the 1-device per-device work,
serialized on one core).  A drop below flat is the cost of the collectives +
partitioned-program inefficiency.  On real multi-chip hardware the same
program's rows/sec would scale with devices minus exactly this overhead.

Each mesh size runs in its own subprocess (a process holds one jax backend
config; --xla_force_host_platform_device_count must be set pre-import).

Usage:  python baselines/scaling.py            # run all, print a table
        python baselines/scaling.py <nd> <nl>  # single measurement (child)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# fixed per-device workload (weak scaling)
P_LOCAL, S_LOCAL, T = 8, 4, 10
LATENT_PER_DEV, M = 8, 32
EPOCHS_WARM, EPOCHS_MEASURED = 2, 12


def measure(n_data: int, n_latent: int) -> dict:
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hlax.data.reader import encode_raw
    from hlax.data.dataset import (LongitudinalDataset, subject_batches,
                                   stage_dataset_mesh,
                                   epoch_subject_batches_mesh)
    from hlax.gp.kernels import build_kernel_specs
    from hlax.models import HLVAE, HLVAEConfig
    from hlax.parallel import mesh as pmesh
    from hlax.train import step as tstep

    P = P_LOCAL * n_data
    L = LATENT_PER_DEV * n_latent
    n = P * T
    rng = np.random.default_rng(0)
    types = [{"type": "real", "dim": 1, "nclass": 1},
             {"type": "cat", "dim": 1, "nclass": 5},
             {"type": "count", "dim": 1, "nclass": 1},
             {"type": "pos", "dim": 1, "nclass": 1}] * 8
    raw = np.column_stack(
        [{"real": rng.normal(0, 1, n), "cat": rng.integers(0, 5, n),
          "count": rng.poisson(3, n), "pos": rng.random(n) * 3}[t["type"]]
         for t in types])
    het = encode_raw(raw, types,
                     miss_mask=(rng.random(raw.shape) > 0.2).astype(float))
    labels = np.zeros((n, 3))
    labels[:, 0] = np.tile(np.arange(T), P)
    labels[:, 2] = np.repeat(np.arange(P), T)
    ds = LongitudinalDataset(het=het, labels=labels, id_covariate=2,
                             conv=False)
    spec0, spec1 = build_kernel_specs(
        [2], [], [0], [{"cont_covariate": 0, "cat_covariate": 2}], [], [], 2)
    cfg = tstep.TrainConfig(latent_dim=L, M=M, P_tot=float(P), N_tot=float(n),
                            id_covariate=2, natural_gradient=True,
                            constrain_scales=True, gp_dtype=jnp.float32)
    model = HLVAE(HLVAEConfig(layout=ds.layout, z_dim=L, h_dims=(64,),
                              y_dim=3, conv=False, dtype=jnp.float32))
    state = tstep.init_train_state(
        model, spec0, spec1, next(subject_batches(ds, S_LOCAL * n_data)),
        cfg, seed=0)

    mesh = pmesh.make_mesh(n_data=n_data, n_latent=n_latent)
    s_batch = S_LOCAL * n_data
    with mesh:
        staged = pmesh.shard_staged(
            stage_dataset_mesh(ds, jnp.float32, n_data), mesh)
        state = pmesh.shard_state(state, mesh)
        epoch = pmesh.jit_train_epoch(
            tstep.make_train_epoch_mesh(model, spec0, spec1, cfg),
            state, mesh, staged)
        r = np.random.default_rng(1)
        idx = lambda: jnp.asarray(
            epoch_subject_batches_mesh(P, n_data, s_batch, r))
        nb = P_LOCAL // S_LOCAL
        for _ in range(EPOCHS_WARM):
            state, ms = epoch(state, staged, idx())
        jax.block_until_ready(ms["loss"])
        t0 = time.perf_counter()
        for _ in range(EPOCHS_MEASURED):
            state, ms = epoch(state, staged, idx())
        jax.block_until_ready(ms["loss"])
        dt = time.perf_counter() - t0
    steps = EPOCHS_MEASURED * nb
    return {
        "n_data": n_data, "n_latent": n_latent, "devices": n_data * n_latent,
        "P": P, "L": L, "steps_per_sec": round(steps / dt, 2),
        "rows_per_sec": round(steps * s_batch * T / dt, 1),
        "loss": float(np.asarray(ms["loss"])[-1]),
    }


def child_main(n_data: int, n_latent: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    print(json.dumps(measure(n_data, n_latent)), flush=True)


def run_all() -> None:
    configs = [(1, 1), (2, 1), (4, 1), (8, 1), (4, 2)]
    results = []
    for nd, nl in configs:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            f" --xla_force_host_platform_device_count="
                            f"{nd * nl}").strip()
        env["JAX_PLATFORMS"] = "cpu"
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(nd), str(nl)],
            env=env, capture_output=True, text=True, timeout=1800)
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-2000:])
            raise RuntimeError(f"scaling run ({nd}x{nl}) failed")
        line = proc.stdout.strip().splitlines()[-1]
        results.append(json.loads(line))
        print(line, flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "scaling_cpu.json")
    with open(out, "w") as f:
        json.dump({"host": "1 physical CPU core, virtual-device mesh",
                   "weak_scaling": results}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    if len(sys.argv) == 3:
        flags = os.environ.get("XLA_FLAGS", "")
        need = int(sys.argv[1]) * int(sys.argv[2])
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={need}"
            ).strip()
        child_main(int(sys.argv[1]), int(sys.argv[2]))
    else:
        run_all()
