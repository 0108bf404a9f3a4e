"""Benchmark: Health-MNIST canonical-config training + imputation eval.

Prints TWO JSON lines {"metric", "value", "unit", "vs_baseline"}:
  1. train steps/sec/chip (canonical config, 300 measured steps = 30
     epochs x 10 steps), and
  2. imputation-eval samples/sec measured on a TRAINED model — after the
     timing window the same state is trained an extra TRAIN_EPOCHS=300
     epochs (the QUALITY.md convergence horizon) so the eval throughput is
     quoted at a real converged ELBO, not a random init (BASELINE.md
     "at matched ELBO").
     ``net_loss_at_eval`` is the final epoch's MEAN per-batch net loss —
     the quantity the CLI prints per epoch — on the REAL Health-MNIST data.

Data: the actual Heterogeneous Health-MNIST D4 battery, synthesized
in-memory by ``hlax.data.generate`` (rotation disease model, 5-level
quantized quadrants, 25% missingness — the reference's own generator
semantics, Heterogeneous_Health_MNIST_generate.py), seeded.  Round 2 used
uniform-random pixels here; the loss at eval was a meaningless +5.1M.

Configuration matches the reference's canonical run
(/root/reference/config/hlvae_config_file.txt): Heterogeneous Health-MNIST
D4 (324 real + 972 cat(5) pixels), P=200 subjects x T=20, latent_dim=32,
M=120 inducing points, subjects_per_batch=20, conv encoder/decoder,
hidden [500], y_dim=5, type_KL=GPapprox_closed, natural_gradient=True,
constrain_scales=True.

Baseline: the reference cannot run here (gpytorch not installed), so
``baselines/torch_baseline.py`` measures a faithful plain-torch float64 CPU
replica of the same training step (the reference's own device story —
SURVEY.md §6) on THIS host, which exposes a single CPU core.  Its numbers
are cached in baselines/baseline_cpu.json; every vs_baseline multiplier
therefore reads "vs single-core single-thread float64 torch replica".
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "baselines", "baseline_cpu.json")

P_SUBJ, T, LATENT, M, S_BATCH = 200, 20, 32, 120, 20
EPOCHS_MEASURED = 30     # 10 steps/epoch at canonical scale -> 300 steps
# extra epochs before the eval measurement: the QUALITY.md canonical study
# converges by ~300-400 epochs; affordable since the natural-gradient chain
# default flipped to the stable solve-based f32 path (~0.1 s/epoch on-chip
# vs ~3.9 with the f64 chain — baselines/ab_natgrad_f64.json)
TRAIN_EPOCHS = 300
# epochs scanned per dispatch (the CLI's --epochs_per_dispatch): the relay
# adds 2.6 s PER DISPATCH when degraded, so per-epoch dispatch would measure
# the relay, not the chip; 10-epoch chunks amortize it 10x while remaining a
# genuine end-to-end protocol (users run many epochs between validations)
CHUNK = 10
# the reference's eval protocol batches 500 rows (model_test.py:13-38);
# the eval measurement chunks identically so vs_baseline compares the
# framework, not the batching
EVAL_CHUNK = 500


_PROBE = """
import time, numpy as np, jax, jax.numpy as jnp
t0 = time.perf_counter()
x = jnp.ones((128, 128)); np.asarray(x @ x)          # compile + fetch
t1 = time.perf_counter()
np.asarray(jnp.ones((128, 128)) @ x)                  # cached-program fetch
print("PROBE_OK", round(t1 - t0, 2), round(time.perf_counter() - t1, 2))
"""


def wait_healthy_device_link(attempts: int = 8, probe_timeout: float = 120.0,
                             retry_sleep: float = 30.0) -> None:
    """Gate the measurement on a healthy device link.

    This environment reaches its TPU through a remote relay that can wedge
    or degrade for minutes at a time (NOTES.md): in the degraded state every
    program trip costs ~264 ms, so a bench run started in such a window
    measures the relay, not the chip.  Probe with SHORT-LIVED subprocesses
    (a held client connection from a wedged process blocks the relay's own
    recovery) and start measuring only once a probe round-trips promptly.
    Healthy means the probe completes AND its cached-program value fetch
    round-trips fast (the degraded-but-alive relay mode still answers, just
    at ~2.6 s/trip — completing inside the timeout is not enough).
    After ``attempts``: proceeds if the link is merely degraded (numbers
    will be relay-bound but finite), but EXITS with status 2 if no probe
    ever completed — a fully dead link would otherwise hang the first
    device op forever, which reads as a hung benchmark instead of the
    infrastructure failure it is.  On a directly-attached device the first
    probe passes instantly.
    """
    any_completed = False
    print("# probing device link health before measuring (see NOTES.md)",
          file=sys.stderr, flush=True)
    for i in range(attempts):
        t0 = time.perf_counter()
        try:
            r = subprocess.run([sys.executable, "-c", _PROBE],
                               capture_output=True, text=True,
                               timeout=probe_timeout)
            line = next((l for l in r.stdout.splitlines()
                         if l.startswith("PROBE_OK")), None)
            if r.returncode == 0 and line:
                any_completed = True
                cached_fetch = float(line.split()[-1])
                if cached_fetch < 1.0:
                    dt = time.perf_counter() - t0
                    print(f"# device link healthy (probe {dt:.1f}s): {line}",
                          file=sys.stderr, flush=True)
                    return
        except subprocess.TimeoutExpired:
            pass
        print(f"# device link degraded (probe attempt {i + 1}/{attempts}); "
              f"retrying in {retry_sleep:.0f}s", file=sys.stderr, flush=True)
        time.sleep(retry_sleep)
    if not any_completed:
        print("# device link DEAD: no probe completed — refusing to hang on "
              "the first device op; restart the relay and re-run",
              file=sys.stderr, flush=True)
        sys.exit(2)
    print("# proceeding on a degraded link — numbers may be relay-bound",
          file=sys.stderr, flush=True)


def build(model_dtype=None, gp_dtype=None, compute_dtype=None):
    """Canonical-config workload.  ``model_dtype``/``gp_dtype`` default to
    the shipped float32 configuration; baselines/f64_tpu.py passes float64
    for the reference-native-dtype demonstration run; ``compute_dtype``
    selects the selective mixed-precision policy (HLVAEConfig.compute_dtype)
    for baselines/ab_bf16_step.py's policy arm."""
    import jax
    jax.config.update("jax_enable_x64", True)   # f64 natural-gradient chain
    # persistent compilation cache: compiles through a degraded relay take
    # minutes; re-runs of the same canonical program should not re-pay
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from hlax.data import generate as gen
    from hlax.data.reader import encode_raw
    from hlax.data.dataset import (HEALTH_MNIST_LABEL_ORDER,
                                   LongitudinalDataset, subject_batches,
                                   stage_dataset)
    from hlax.gp.kernels import build_kernel_specs
    from hlax.models import HLVAE, HLVAEConfig
    from hlax.train import step as tstep

    # real Health-MNIST D4: P=200 subjects (100 threes + 100 sixes) x T=20
    # (cached: the generator's per-image scipy rotations cost ~100 s of
    # host CPU; the bench measures the framework, not dataset synthesis)
    cache = f"/tmp/hlax_bench_hm_d4_p{P_SUBJ}_seed0.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        raw_data, raw_mask, labels = z["data"], z["mask"], z["labels"]
    else:
        out = gen.generate(num_3=P_SUBJ // 2, num_6=P_SUBJ // 2,
                           missing=25.0, datatype_config="D4", seed=0)
        raw_data, raw_mask = out["data"], out["mask"]
        # label-column reorder + NaN->0, as the ingestion layer does for
        # n_variables == 1296 (hlax/data/dataset.py::load_dataset)
        labels = np.nan_to_num(
            out["labels"][:, np.array(HEALTH_MNIST_LABEL_ORDER)])
        np.savez(cache, data=raw_data, mask=raw_mask, labels=labels)
    het = encode_raw(raw_data, gen.types_table("D4"), miss_mask=raw_mask)
    ds = LongitudinalDataset(het=het, labels=labels, id_covariate=2, conv=True)
    n = len(ds)

    spec0, spec1 = build_kernel_specs(
        cat_kernel=[2], bin_kernel=[], sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2},
                        {"cont_covariate": 0, "cat_covariate": 3},
                        {"cont_covariate": 1, "cat_covariate": 4}],
        bin_int_kernel=[], covariate_missing_val=[], id_covariate=2)
    mdt = model_dtype or jnp.float32
    gdt = gp_dtype or jnp.float32
    cfg = tstep.TrainConfig(latent_dim=LATENT, M=M, P_tot=float(P_SUBJ),
                            N_tot=float(n), id_covariate=2,
                            natural_gradient=True, constrain_scales=True,
                            gp_dtype=gdt)
    mcfg = HLVAEConfig(layout=ds.layout, z_dim=LATENT, h_dims=(500,), y_dim=5,
                       conv=True, dtype=mdt, compute_dtype=compute_dtype)
    model = HLVAE(mcfg)
    state = tstep.init_train_state(model, spec0, spec1,
                                   next(subject_batches(ds, S_BATCH)), cfg,
                                   seed=0)
    # the CLI training path: whole-epoch lax.scan over on-device gathered
    # batches, ONE dispatch per epoch (hlax/train/step.py make_train_epoch)
    epoch_fn = jax.jit(tstep.make_train_epoch(model, spec0, spec1, cfg),
                       donate_argnums=0)
    staged = stage_dataset(ds, mdt)
    return epoch_fn, state, staged, model, het, ds


def _gate_finite(loss: float, where: str) -> None:
    """HARD GATE on finiteness (round-4 lesson: BENCH_r04 recorded
    net_loss_at_eval = NaN and still quoted eval throughput "at matched
    ELBO" — a diverged run voids BOTH headline numbers, because the eval
    pass then measures arithmetic on NaN parameters, not the framework).
    A benchmark of a shipped default that cannot train to a finite loss
    must FAIL loudly, not report fast-but-wrong numbers."""
    if not np.isfinite(loss):
        print(json.dumps({
            "metric": "healthmnist_train_steps_per_sec_per_chip",
            "value": None, "unit": "steps/sec", "vs_baseline": None,
            "error": f"INVALID: net loss {where} is {loss} (non-finite) — "
                     "the shipped default diverged; throughput numbers are "
                     "void",
        }), flush=True)
        sys.exit(3)


def main():
    wait_healthy_device_link()
    import jax
    import jax.numpy as jnp
    from hlax.data.dataset import epoch_subject_batches

    epoch_fn, state, staged, model, het, ds = build()
    nb = (P_SUBJ + S_BATCH - 1) // S_BATCH
    rng = np.random.default_rng(0)

    def idx_chunk(k=CHUNK):
        mats = [np.stack(list(epoch_subject_batches(ds.P, S_BATCH, rng)))
                for _ in range(k)]
        return jnp.asarray(np.concatenate(mats, axis=0))

    # NOTE: all timing syncs below are actual VALUE FETCHES (np.asarray),
    # not block_until_ready — through the axon remote-device relay
    # block_until_ready can return before the queued programs finish, which
    # silently turns a throughput measurement into an enqueue-rate
    # measurement (round-3 finding; the round-2 headline numbers were
    # inflated ~10x by exactly this).
    state, metrics = epoch_fn(state, staged, idx_chunk())   # compile + warmup
    np.asarray(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(EPOCHS_MEASURED // CHUNK):
        state, metrics = epoch_fn(state, staged, idx_chunk())
        np.asarray(metrics["loss"])   # forces completion
    dt = time.perf_counter() - t0
    steps_per_sec = EPOCHS_MEASURED * nb / dt
    _gate_finite(float(np.asarray(metrics["loss"])[-nb:].mean()),
                 f"after the {EPOCHS_MEASURED}-epoch timing window")

    baseline = {}
    if os.path.isfile(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f)
    train_base = baseline.get("steps_per_sec")

    print(json.dumps({
        "metric": "healthmnist_train_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / train_base, 2) if train_base else None,
    }), flush=True)

    # train to convergence so the eval metric is quoted at a real ELBO
    for _ in range(TRAIN_EPOCHS // CHUNK):
        state, metrics = epoch_fn(state, staged, idx_chunk())
        np.asarray(metrics["loss"])
    # final epoch's MEAN per-batch net loss (the per-epoch quantity the CLI
    # prints), not the last batch's
    final_loss = float(np.asarray(metrics["loss"])[-nb:].mean())
    _gate_finite(final_loss, f"after the {TRAIN_EPOCHS}-epoch convergence "
                 "run (eval would be measured on diverged parameters)")

    # the relay can degrade DURING the ~40 s quick-train between the two
    # measurement windows (observed: eval 128k samples/sec in one run, 63k
    # in another, identical code).  Re-check from IN-process — the chip is
    # single-client, so the subprocess probe of the start-up gate would
    # deadlock here — by timing a tiny cached-program value fetch, and wait
    # out a degraded window before measuring eval.
    import jax.numpy as jnp_
    tiny = jnp_.ones((128, 128))
    float(np.asarray(tiny @ tiny)[0, 0])          # compile outside the loop
    for i in range(10):
        t0 = time.perf_counter()
        float(np.asarray(tiny @ tiny)[0, 0])
        if time.perf_counter() - t0 < 0.5:
            break
        print(f"# link degraded before eval window (fetch "
              f"{time.perf_counter() - t0:.2f}s); waiting 30s "
              f"({i + 1}/10)", file=sys.stderr, flush=True)
        time.sleep(30)

    eval_throughput(model, state.vae, het,
                    baseline.get("eval_samples_per_sec"), final_loss)




def eval_throughput(model, params, het, eval_base=None, final_loss=None):
    """Secondary metric: imputation-eval samples/sec — full encode->decode +
    masked likelihoods on the real Health-MNIST dataset (the reference's
    HLVAETest hot path, model_test.py:135-275), measured with the TRAINED
    parameters handed in by main().  Chunked at EVAL_CHUNK=500 rows to
    mirror the reference's eval DataLoader batch (model_test.py:13-38), so
    the vs_baseline ratio compares frameworks under the same protocol.

    The chunk loop is a ``lax.scan`` inside ONE jitted program and the
    timing syncs on a value fetch of the on-device-reduced total
    log-likelihood: the framework's real eval battery (hlax/eval) consumes
    model outputs in-graph and only materializes reduced metrics, so
    charging a full [n, 1296] raw-output device->host transfer per pass
    (which an earlier revision did) measures the host link, not the eval.
    The reference gets that materialization for free by running ON the
    host — its per-batch protocol is otherwise mirrored exactly."""
    import jax
    import jax.numpy as jnp

    n = het.data.shape[0]
    key = jax.random.PRNGKey(0)
    nchunks = (n + EVAL_CHUNK - 1) // EVAL_CHUNK
    pad = nchunks * EVAL_CHUNK - n

    def chunked(arr):
        a = np.asarray(arr, np.float32)
        if pad:
            a = np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)])
        return jnp.asarray(a.reshape(nchunks, EVAL_CHUNK, *a.shape[1:]))

    data_c, mask_c, tmask_c = (chunked(het.data), chunked(het.mask),
                               chunked(het.theta_mask))

    @jax.jit
    def one_pass(params):
        def body(tot, chunk):
            d, m, tm = chunk
            out = model.apply(params, d, m, tm, key, sample=False)
            return tot + jnp.sum(out["log_p_x"]), ()
        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              (data_c, mask_c, tmask_c))
        return tot

    float(np.asarray(one_pass(params)))   # compile warmup
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        float(np.asarray(one_pass(params)))   # value fetch forces completion
    dt = time.perf_counter() - t0
    rate = reps * n / dt
    print(json.dumps({
        "metric": "healthmnist_imputation_eval_samples_per_sec",
        "value": round(rate, 1),
        "unit": "samples/sec",
        "vs_baseline": round(rate / eval_base, 2) if eval_base else None,
        "net_loss_at_eval": round(final_loss, 2) if final_loss is not None
        else None,
    }), flush=True)


if __name__ == "__main__":
    main()
