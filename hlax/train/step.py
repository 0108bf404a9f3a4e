"""Jitted training step: VAE NLL + sparse-GP KLD bound + optax/natural-grad.

Reference semantics: ``hensman_training`` (/root/reference/training.py:23-137)
and the optimizer assembly in HLVAE_main.py:231-278:

  * loss = sum(nll) * P/P_batch + KLD_upper_bound     (training.py:121-124)
  * Adam(lr=1e-3) over {kernel0, kernel1, zt, vae [, m, H] [, noise]}
  * when natural_gradient: (m, H) leave Adam and get the closed-form natural
    update after each step (training.py:130-137), with H maintained PSD.

TPU-native: the whole step — forward, bound, backward, Adam, natural-gradient
Cholesky updates — is ONE jitted XLA program over static padded shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hlax.eval import metrics as mx
from hlax.gp import elbo as gp_elbo
from hlax.gp import kernels as gp_kernels
from hlax.models.hlvae import HLVAE, nll_from_log_p


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    latent_dim: int
    M: int
    P_tot: float            # subjects in the dataset
    N_tot: float            # rows in the dataset
    id_covariate: int
    lr: float = 1e-3
    natural_gradient: bool = True
    natural_gradient_lr: float = 0.01
    constrain_scales: bool = True
    # jitter: dtype-aware default (SURVEY.md §7 'float64 on TPU' hard part):
    # 1e-6 matches the reference in float64; float32 needs a larger floor or
    # near-duplicate inducing covariates make Cholesky blow up.
    eps: Optional[float] = None
    gp_dtype: Any = jnp.float32
    # Pallas batch-on-lanes Cholesky inside the training bound: the honest
    # (value-fetch-synced) on-chip A/B measures the full train step at
    # 4.94 ms with it vs 7.04 ms with XLA's Cholesky+VJP — 30% faster, so
    # on by default.  (Round 2 concluded the opposite from an enqueue-rate
    # timing; see NOTES.md measurement-honesty rules.)  Falls back to XLA
    # automatically on CPU and for float64 (hlax/ops/linalg_small.py).
    use_pallas_chol: bool = True
    # float64 for the closed-form natural-gradient chain (the [L,M,M]
    # iK/B_mat/iH compositions + the (m,H) update).  Off by default: the
    # solve-based f32 chain (gp/elbo.py) is stable at canonical scale, and
    # TPUs emulate f64 in software — measured 3.94 s/epoch vs 0.094 with
    # the f32 chain on a v5e (42x; baselines/ab_natgrad_f64.json).  Turn on
    # for extra numerical margin on CPU/GPU or ill-conditioned kernels.
    # Requires x64 enabled; ignored when gp_dtype is already float64.
    nat_grad_f64: bool = False
    # relative diagonal ridge on iH_new before its Cholesky (see
    # gp/elbo.py::natural_gradient_update); together with the solve-based
    # B_mat composition this keeps the PURE-f32 chain stable at canonical
    # scale, offering a fast path where f64 is expensive
    nat_grad_jitter: float = 0.0

    def __post_init__(self):
        if self.eps is None:
            object.__setattr__(
                self, "eps",
                1e-6 if self.gp_dtype == jnp.float64 else 1e-4)


class TrainState(NamedTuple):
    vae: Any                  # flax param tree
    k0: Any                   # kernel0 params (list of dicts, leading L axis)
    k1: Any
    raw_noise: jnp.ndarray    # [L]
    zt: jnp.ndarray           # [L, M, Q]
    m: jnp.ndarray            # [L, M, 1]
    H: jnp.ndarray            # [L, M, M] (PSD iff natural_gradient)
    opt_state: Any
    step: jnp.ndarray
    rng: jnp.ndarray


def _trainable(state: TrainState, cfg: TrainConfig) -> Dict[str, Any]:
    t = {"vae": state.vae, "k0": state.k0, "k1": state.k1, "zt": state.zt}
    if not cfg.constrain_scales:
        t["raw_noise"] = state.raw_noise
    if not cfg.natural_gradient:
        t["m"] = state.m
        t["H"] = state.H
    return t


def make_optimizer(cfg: TrainConfig):
    return optax.adam(cfg.lr)


def init_train_state(
    model: HLVAE,
    spec0, spec1,
    example_batch: Dict[str, np.ndarray],
    cfg: TrainConfig,
    seed: int = 0,
    zt_init: Optional[np.ndarray] = None,
) -> TrainState:
    """Build the initial state (HLVAE_main.py:200-278 semantics):
    inducing points from random training covariates, m ~ N(0,1),
    H = R/10 (RR^T if natural gradient)."""
    key = jax.random.PRNGKey(seed)
    k_vae, k_m, k_h, k_z, k_run = jax.random.split(key, 5)
    dt = cfg.gp_dtype

    def _init_vae():
        data = jnp.asarray(example_batch["data"], model.cfg.dtype)
        mask = jnp.asarray(example_batch["mask"], model.cfg.dtype)
        tmask = jnp.asarray(example_batch["theta_mask"], model.cfg.dtype)
        return model.init(k_vae, data, mask, tmask, k_vae)

    if model.cfg.dtype == jnp.float64 and jax.default_backend() != "cpu":
        # full-f64 model on TPU: flax's truncated-normal initializer lowers
        # a ``nextafter`` that XLA's x64 rewrite cannot legalize on the
        # chip — run the init on the host CPU backend and transfer (the
        # reference's native dtype, HLVAE_main.py:158 ``.double()``)
        try:
            cpu_dev = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            # no CPU backend (e.g. --device=tpu pins jax_platforms): draw
            # the init in float32 on-device and widen — same distributions
            # up to f32 rounding of the draw, and it avoids the nextafter
            # lowering because the RNG runs in f32
            f32_model = HLVAE(dataclasses.replace(model.cfg,
                                                  dtype=jnp.float32))
            data = jnp.asarray(example_batch["data"], jnp.float32)
            mask = jnp.asarray(example_batch["mask"], jnp.float32)
            tmask = jnp.asarray(example_batch["theta_mask"], jnp.float32)
            vae32 = f32_model.init(k_vae, data, mask, tmask, k_vae)
            vae = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float64), vae32)
        else:
            with jax.default_device(cpu_dev):
                vae = _init_vae()
            vae = jax.device_put(vae, jax.devices()[0])
    else:
        vae = _init_vae()

    L, M = cfg.latent_dim, cfg.M
    labels = np.asarray(example_batch["labels"])
    Q = labels.shape[1]
    if zt_init is None:
        rows = labels[np.asarray(example_batch["idx"]) >= 0]
        rng = np.random.default_rng(seed)
        zt_init = np.stack([
            rows[rng.choice(len(rows), M, replace=len(rows) < M)]
            for _ in range(L)])
        # covariates are often on a discrete grid (e.g. integer timepoints),
        # so sampled inducing rows collide and K0zz becomes singular up to
        # the jitter.  Nudge the continuous (rbf-active) dims — inducing
        # points are free trainable parameters, this only improves
        # conditioning and coverage.
        rbf_dims = sorted({f.dim for sp in (spec0, spec1)
                           for c in sp.components for f in c.factors
                           if f.kind == "rbf"})
        if rbf_dims:
            zt_init = zt_init.copy()
            zt_init[:, :, rbf_dims] += rng.uniform(
                -0.5, 0.5, zt_init[:, :, rbf_dims].shape)
    zt = jnp.asarray(zt_init, dt)

    # The reference draws m ~ N(0,1) (HLVAE_main.py:259); combined with the
    # near-singular RBF Nystrom gram this makes the first KLD terms ~1e8 and
    # the float32 natural-gradient Cholesky chain diverges.  A damped init
    # (same distribution, small scale) keeps early magnitudes sane; it is
    # still a random init, converging to the same optimum.
    m = 0.01 * jax.random.normal(k_m, (L, M, 1), dt)
    H = jax.random.normal(k_h, (L, M, M), dt) / 10.0
    if cfg.natural_gradient:
        # + ridge: R R^T alone has near-zero minimum eigenvalues, which the
        # float32 natural-gradient Cholesky chain cannot tolerate
        H = jnp.einsum("lmn,lon->lmo", H, H) + 0.01 * jnp.eye(M, dtype=dt)

    k0 = gp_kernels.init_kernel_params(spec0, L, dt)
    k1 = gp_kernels.init_kernel_params(spec1, L, dt)
    raw_noise = gp_kernels.noise_init(L, cfg.constrain_scales, dt)

    state = TrainState(vae=vae, k0=k0, k1=k1, raw_noise=raw_noise, zt=zt,
                       m=m, H=H, opt_state=None, step=jnp.zeros((), jnp.int32),
                       rng=k_run)
    opt_state = make_optimizer(cfg).init(_trainable(state, cfg))
    return state._replace(opt_state=opt_state)


def make_train_step(model: HLVAE, spec0, spec1, cfg: TrainConfig):
    """Returns jit-ready ``step(state, batch) -> (state, metrics)``.

    ``batch`` is a dict of arrays with S*T_max flat rows: data, mask,
    theta_mask, labels, and valid [S, T_max].
    """
    tx = make_optimizer(cfg)
    layout, conv = model.cfg.layout, model.cfg.conv
    # The reference's per-batch recon metric (training.py:97-101) iterates
    # partial_error and overwrites recon_loss each pass, so only the type
    # whose first raw-order occurrence is LAST survives.  Reproduce that.
    kinds_raw = layout.var_kinds_grouped()[np.asarray(layout.raw_inv)]
    last_kind = list(dict.fromkeys(kinds_raw))[-1]

    def recon_metric(params, data, mask, row_valid):
        """Training recon-error metric, computed inside the step graph (the
        reference re-runs statistics/error_computation on host every batch,
        training.py:84-102; here it fuses into the same XLA program).
        ``row_valid`` [B] zeroes the padded rows of the subject batch."""
        mean_rec, _ = mx.statistics(params, layout, conv)
        truth = mx.discrete_transform(data, layout)
        true_mask = row_valid[:, None] * jnp.ones_like(mask)
        _, err_missing, partial = mx.error_computation(
            truth, mean_rec, layout, mask * row_valid[:, None], conv=conv,
            true_mask=true_mask)
        n_rows = jnp.sum(row_valid)
        recon = jnp.sum(partial[last_kind]["error_all"]) * n_rows
        # the reference *intended* to also track the missing-imputation error
        # (training.py:103, commented out, leaving missing_imp_error = 0 in
        # validation_df); we track the intended quantity.
        miss = jnp.sum(err_missing)
        return recon, miss

    def loss_fn(train, fixed, batch, rng):
        p = {**train, **fixed}
        out = model.apply(p["vae"], batch["data"], batch["mask"],
                          batch["theta_mask"], rng)
        nll = jnp.sum(nll_from_log_p(out["log_p_x"]))

        valid = batch["valid"]
        S, T = valid.shape
        gdt = cfg.gp_dtype
        x_st = batch["labels"].reshape(S, T, -1).astype(gdt)
        mu_st = out["mu"].reshape(S, T, -1).astype(gdt)
        log_v_st = out["log_var"].reshape(S, T, -1).astype(gdt)

        H = p["H"]
        PSD_H = H if cfg.natural_gradient else jnp.einsum("lmn,lon->lmo", H, H)
        noise = gp_kernels.noise_value(p["raw_noise"], cfg.constrain_scales)
        nat_dt = (jnp.float64 if cfg.nat_grad_f64 and jax.config.jax_enable_x64
                  else None)
        kld, gm, gH, iH = gp_elbo.kld_upper_bound(
            spec0, p["k0"], spec1, p["k1"], noise, p["m"], PSD_H, p["zt"],
            x_st, valid.astype(gdt), mu_st, log_v_st,
            cfg.P_tot, cfg.N_tot, cfg.eps,
            natural_gradient=cfg.natural_gradient,
            use_pallas_chol=cfg.use_pallas_chol,
            nat_grad_dtype=nat_dt)

        P_batch = jnp.sum((valid.sum(axis=1) > 0).astype(nll.dtype))
        nll_scaled = nll * cfg.P_tot / P_batch
        loss = nll_scaled + kld.astype(nll.dtype)
        recon, miss_recon = recon_metric(
            jax.lax.stop_gradient(out["params"]), batch["data"],
            batch["mask"], valid.reshape(-1).astype(batch["mask"].dtype))
        aux = {"nll": nll_scaled, "kld": kld, "grad_m": gm, "grad_H": gH,
               "iH": iH, "recon": recon, "miss_recon": miss_recon,
               "mu": out["mu"], "log_var": out["log_var"],
               "log_p_x": out["log_p_x"]}
        return loss, aux

    def step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, Any]]:
        rng, sub = jax.random.split(state.rng)
        train = _trainable(state, cfg)
        fixed = {k: getattr(state, k)
                 for k in ("vae", "k0", "k1", "zt", "raw_noise", "m", "H")
                 if k not in train}
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            train, fixed, batch, sub)
        updates, opt_state = tx.update(grads, state.opt_state, train)
        train = optax.apply_updates(train, updates)

        new = state._replace(opt_state=opt_state, step=state.step + 1, rng=rng,
                             **train)
        if cfg.natural_gradient:
            m_new, H_new = gp_elbo.natural_gradient_update(
                state.m, state.H,
                jax.lax.stop_gradient(aux["grad_m"]),
                jax.lax.stop_gradient(aux["grad_H"]),
                cfg.natural_gradient_lr,
                iH=jax.lax.stop_gradient(aux["iH"]),
                jitter=cfg.nat_grad_jitter,
                use_pallas_chol=cfg.use_pallas_chol)
            new = new._replace(m=m_new, H=H_new)
        metrics = {"loss": loss, "nll": aux["nll"], "kld": aux["kld"],
                   "recon": aux["recon"], "miss_recon": aux["miss_recon"]}
        return new, metrics

    return step


def make_train_epoch(model: HLVAE, spec0, spec1, cfg: TrainConfig,
                     unroll: int = 1, pregather: bool = False):
    """Whole-epoch training as ONE XLA program (jit-ready).

    ``epoch(state, staged, idx_batches)``: lax.scan of the train step over
    [n_batches, S] subject-index arrays, gathering each padded batch from the
    device-staged dataset inside the scan body.  One dispatch per EPOCH
    instead of one per step (the reference re-enters Python per batch,
    training.py:70).  Returns (state, metrics) with metrics stacked [nb].

    ``unroll``: lax.scan unroll factor.  The axon remote-device relay
    executes each while-loop trip with a per-trip round-trip cost (measured
    round 3: wall time linear in scanned steps at ~the per-dispatch
    latency), so unrolling the loop body removes that per-trip tax on
    relay-attached devices; on directly-attached TPUs it is a conventional
    pipelining knob.  Program size grows ~unroll x (compile time too).

    ``pregather``: gather ALL the epoch's batches in one device op before
    the scan (one big gather per epoch, HBM cost = one extra dataset-sized
    epoch buffer) instead of one small gather per scan trip.  Value-
    identical; a throughput knob to be settled by measurement.
    """
    from hlax.data.dataset import gather_batch, gather_epoch

    step = make_train_step(model, spec0, spec1, cfg)

    def epoch(state: TrainState, staged, idx_batches):
        if pregather:
            return jax.lax.scan(step, state, gather_epoch(staged, idx_batches),
                                unroll=unroll)

        def body(st, idx):
            return step(st, gather_batch(staged, idx))
        return jax.lax.scan(body, state, idx_batches, unroll=unroll)

    return epoch


def make_train_epoch_mesh(model: HLVAE, spec0, spec1, cfg: TrainConfig):
    """Whole-epoch training as ONE XLA program over a (data x latent) mesh.

    ``epoch(state, staged, idx_batches)``: like ``make_train_epoch`` but the
    staged dataset carries an explicit leading device axis [D, P_local, ...]
    (sharded over 'data') and ``idx_batches`` is [nb, D, S_loc] LOCAL
    per-shard subject indices — the scan-body gather is a vmap over the
    device axis, so every shard gathers from its own block and the SPMD
    partitioner adds no collectives for the data movement.  Jit through
    ``hlax.parallel.mesh.jit_train_epoch`` to pin the shardings.

    The Pallas Cholesky kernels stay ON here (cfg.use_pallas_chol): GSPMD
    cannot see inside a Mosaic custom call, but the kernels' entry points
    wrap themselves in ``jax.shard_map`` over the ambient mesh with
    batch-dims-sharded specs (hlax/ops/linalg_small.py::_ambient_mesh), so
    each shard runs the unmodified kernel on its local [L_loc, S_loc, T, T]
    block — the mesh program keeps the 30% full-step win instead of falling
    back to XLA's factorization (round 3 forced use_pallas_chol=False
    here).  Requires tracing inside ``with mesh:``, which every hlax mesh
    surface (CLI --data_parallel, jit_train_epoch, dryrun) does."""
    from hlax.data.dataset import gather_batch_mesh

    step = make_train_step(model, spec0, spec1, cfg)

    def epoch(state: TrainState, staged, idx_batches):
        def body(st, idx):
            return step(st, gather_batch_mesh(staged, idx))
        return jax.lax.scan(body, state, idx_batches)

    return epoch


def device_batch(batch: Dict[str, np.ndarray], dtype) -> Dict[str, jnp.ndarray]:
    out = {}
    for k, v in batch.items():
        if k == "idx":
            out[k] = jnp.asarray(v)
        else:
            out[k] = jnp.asarray(v, dtype)
    return out
