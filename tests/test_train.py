"""End-to-end smoke training: tiny cohort, MLP model, full GP prior.

Checks (SURVEY.md §4 plan item d): loss decreases over a few epochs, the
natural-gradient H stays PSD, and the checkpoint round-trips.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hlax.data.reader import encode_raw
from hlax.data.dataset import LongitudinalDataset, subject_batches, n_batches
from hlax.gp.kernels import build_kernel_specs
from hlax.models import HLVAE, HLVAEConfig
from hlax.train import step as tstep


TYPES = [
    {"type": "real", "dim": 1, "nclass": 1},
    {"type": "real", "dim": 1, "nclass": 1},
    {"type": "cat", "dim": 1, "nclass": 3},
    {"type": "count", "dim": 1, "nclass": 1},
]
P, T, L, M, Q = 6, 4, 3, 8, 3
ID_COV = 2


def _dataset(varying=False):
    rng = np.random.default_rng(7)
    rows = []
    labels = []
    for s in range(P):
        t_s = T if not varying else rng.integers(2, T + 1)
        phase = rng.normal()
        for t in range(t_s):
            rows.append([np.sin(0.5 * t + phase), np.cos(0.5 * t + phase),
                         float(s % 3), float(rng.poisson(3))])
            labels.append([float(t), float(s % 2), float(s)])
    raw = np.asarray(rows)
    miss = (rng.random(raw.shape) > 0.2).astype(float)
    het = encode_raw(raw, TYPES, miss_mask=miss)
    return LongitudinalDataset(het=het, labels=np.asarray(labels),
                               id_covariate=ID_COV, conv=False)


@pytest.mark.parametrize("varying,natural", [(False, True), (True, False)])
def test_smoke_train(varying, natural, tmp_path):
    ds = _dataset(varying)
    spec0, spec1 = build_kernel_specs(
        cat_kernel=[ID_COV], bin_kernel=[], sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": ID_COV}],
        bin_int_kernel=[], covariate_missing_val=[], id_covariate=ID_COV)
    cfg = tstep.TrainConfig(latent_dim=L, M=M, P_tot=float(ds.P),
                            N_tot=float(len(ds)), id_covariate=ID_COV,
                            natural_gradient=natural, constrain_scales=True,
                            gp_dtype=jnp.float64)
    mcfg = HLVAEConfig(layout=ds.layout, z_dim=L, h_dims=(16,), y_dim=3,
                       conv=False, dtype=jnp.float64)
    model = HLVAE(mcfg)

    batches = list(subject_batches(ds, 3))
    ex = tstep.device_batch(batches[0], jnp.float64)
    state = tstep.init_train_state(model, spec0, spec1, batches[0], cfg, seed=0)
    step = jax.jit(tstep.make_train_step(model, spec0, spec1, cfg))

    losses = []
    rng = np.random.default_rng(0)
    for epoch in range(8):
        ep = 0.0
        for b in subject_batches(ds, 3, rng):
            state, metrics = step(state, tstep.device_batch(b, jnp.float64))
            ep += float(metrics["loss"])
        losses.append(ep / n_batches(ds, 3))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]   # training reduces the bound

    if natural:
        Hn = np.asarray(state.H)
        eigs = np.linalg.eigvalsh(Hn)
        assert (eigs > 0).all()   # H stays PSD under natural-gradient updates

    # checkpoint round-trip
    from hlax.train import checkpoint as ckpt
    ckpt.save(str(tmp_path), state)
    state2 = ckpt.restore(str(tmp_path), state)
    assert state2 is not None
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # missing checkpoint -> None
    assert ckpt.restore(str(tmp_path / "nope"), state) is None


def test_smoke_train_all_types_with_beta_and_logvar(tmp_path):
    """Full type coverage: real+pos+count+cat+ordinal+beta heads with
    logvar_network (per-element variances) train end-to-end."""
    types = [
        {"type": "real", "dim": 1, "nclass": 1},
        {"type": "pos", "dim": 1, "nclass": 1},
        {"type": "count", "dim": 1, "nclass": 1},
        {"type": "cat", "dim": 1, "nclass": 3},
        {"type": "ordinal", "dim": 1, "nclass": 4},
        {"type": "beta", "dim": 1, "nclass": 1},
    ]
    rng = np.random.default_rng(9)
    n = P * T
    raw = np.column_stack([
        rng.normal(0, 1, n), rng.random(n) * 4,
        rng.poisson(3, n).astype(float), rng.integers(0, 3, n).astype(float),
        rng.integers(0, 4, n).astype(float), rng.random(n) * 8 + 1,
    ])
    miss = (rng.random(raw.shape) > 0.2).astype(float)
    het = encode_raw(raw, types, miss_mask=miss, beta_ranges=[(1.0, 9.001)],
                     logvar_network=True)
    labels = np.zeros((n, 3))
    labels[:, 0] = np.tile(np.arange(T), P)
    labels[:, 2] = np.repeat(np.arange(P), T)
    ds = LongitudinalDataset(het=het, labels=labels, id_covariate=ID_COV,
                             conv=False, use_ranges=True)
    spec0, spec1 = build_kernel_specs([ID_COV], [], [0], [], [], [], ID_COV)
    cfg = tstep.TrainConfig(latent_dim=L, M=M, P_tot=float(ds.P),
                            N_tot=float(len(ds)), id_covariate=ID_COV,
                            natural_gradient=True, constrain_scales=True,
                            gp_dtype=jnp.float64)
    mcfg = HLVAEConfig(layout=ds.layout, z_dim=L, h_dims=(16,), y_dim=3,
                       conv=False, logvar_network=True, dtype=jnp.float64)
    model = HLVAE(mcfg)
    batches = list(subject_batches(ds, 3))
    state = tstep.init_train_state(model, spec0, spec1, batches[0], cfg)
    step = jax.jit(tstep.make_train_step(model, spec0, spec1, cfg))
    losses = []
    for _ in range(6):
        tot = 0.0
        for b in subject_batches(ds, 3, np.random.default_rng(0)):
            state, metrics = step(state, tstep.device_batch(b, jnp.float64))
            tot += float(metrics["loss"])
        losses.append(tot)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # eval battery over all types
    from hlax.eval.testing import hlvae_test
    res = hlvae_test(model, state.vae, ds, test=False, id_covariate=ID_COV,
                     prnt=False)
    for kind in ("real", "pos", "count", "cat", "ordinal", "beta"):
        assert kind in res["partial_LL"]
        assert np.isfinite(np.asarray(
            res["partial_error_mean"][kind]["error_observed"])).all()


def test_epoch_scan_matches_per_step():
    """make_train_epoch (lax.scan over on-device gathered batches) must
    produce the same state and per-batch metrics as sequential
    make_train_step calls on the same batch order."""
    from hlax.data.dataset import stage_dataset, gather_batch

    ds = _dataset(varying=True)
    spec0, spec1 = build_kernel_specs(
        cat_kernel=[ID_COV], bin_kernel=[], sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": ID_COV}],
        bin_int_kernel=[], covariate_missing_val=[], id_covariate=ID_COV)
    cfg = tstep.TrainConfig(latent_dim=L, M=M, P_tot=float(ds.P),
                            N_tot=float(len(ds)), id_covariate=ID_COV,
                            natural_gradient=True, constrain_scales=True,
                            gp_dtype=jnp.float64)
    mcfg = HLVAEConfig(layout=ds.layout, z_dim=L, h_dims=(16,), y_dim=3,
                       conv=False, dtype=jnp.float64)
    model = HLVAE(mcfg)
    batches = list(subject_batches(ds, 3))
    state = tstep.init_train_state(model, spec0, spec1, batches[0], cfg, seed=0)

    staged = stage_dataset(ds, jnp.float64)
    spb = 3
    idx_mat = np.arange(ds.P)
    pad = (-len(idx_mat)) % spb
    idx_mat = np.concatenate([idx_mat, -np.ones(pad, np.int64)]).reshape(-1, spb)

    step = jax.jit(tstep.make_train_step(model, spec0, spec1, cfg))
    s_ref = state
    ref_losses = []
    for idx in idx_mat:
        s_ref, m = step(s_ref, gather_batch(staged, jnp.asarray(idx)))
        ref_losses.append(float(m["loss"]))

    epoch = jax.jit(tstep.make_train_epoch(model, spec0, spec1, cfg))
    s_scan, ms = epoch(state, staged, jnp.asarray(idx_mat))

    np.testing.assert_allclose(np.asarray(ms["loss"]), ref_losses,
                               rtol=1e-10)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref._replace(opt_state=None)),
                    jax.tree_util.tree_leaves(s_scan._replace(opt_state=None))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-12)

    # the pre-gathered variant (one gather per epoch) is value-identical
    ep_pg = jax.jit(tstep.make_train_epoch(model, spec0, spec1, cfg,
                                           pregather=True))
    s_pg, ms_pg = ep_pg(state, staged, jnp.asarray(idx_mat))
    np.testing.assert_allclose(np.asarray(ms_pg["loss"]), ref_losses,
                               rtol=1e-10)
    for a, b in zip(jax.tree_util.tree_leaves(s_pg._replace(opt_state=None)),
                    jax.tree_util.tree_leaves(s_scan._replace(opt_state=None))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-12)


@pytest.mark.slow
def test_chunked_dispatch_matches_per_epoch():
    """One [2*nb] chunked dispatch (--epochs_per_dispatch) must equal two
    sequential [nb] epoch dispatches bit-for-bit (same scan body, same
    batch order; only the dispatch boundary differs), incl. the unrolled
    variant (make_train_epoch(..., unroll=...))."""
    from hlax.data.dataset import stage_dataset

    ds = _dataset(varying=True)
    spec0, spec1 = build_kernel_specs(
        cat_kernel=[ID_COV], bin_kernel=[], sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": ID_COV}],
        bin_int_kernel=[], covariate_missing_val=[], id_covariate=ID_COV)
    cfg = tstep.TrainConfig(latent_dim=L, M=M, P_tot=float(ds.P),
                            N_tot=float(len(ds)), id_covariate=ID_COV,
                            natural_gradient=True, constrain_scales=True,
                            gp_dtype=jnp.float64)
    mcfg = HLVAEConfig(layout=ds.layout, z_dim=L, h_dims=(16,), y_dim=3,
                       conv=False, dtype=jnp.float64)
    model = HLVAE(mcfg)
    state = tstep.init_train_state(model, spec0, spec1,
                                   next(subject_batches(ds, 3)), cfg, seed=0)
    staged = stage_dataset(ds, jnp.float64)
    spb = 3
    rng = np.random.default_rng(5)
    from hlax.data.dataset import epoch_subject_batches
    i1 = np.stack(list(epoch_subject_batches(ds.P, spb, rng)))
    i2 = np.stack(list(epoch_subject_batches(ds.P, spb, rng)))

    epoch = jax.jit(tstep.make_train_epoch(model, spec0, spec1, cfg))
    sA, mA1 = epoch(state, staged, jnp.asarray(i1))
    sA, mA2 = epoch(sA, staged, jnp.asarray(i2))

    chunk = jnp.asarray(np.concatenate([i1, i2], axis=0))
    sB, mB = epoch(state, staged, chunk)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(mA1["loss"]), np.asarray(mA2["loss"])]),
        np.asarray(mB["loss"]))
    for a, b in zip(jax.tree_util.tree_leaves(sA._replace(opt_state=None)),
                    jax.tree_util.tree_leaves(sB._replace(opt_state=None))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # unrolled scan: same numbers, different schedule
    ep_u = jax.jit(tstep.make_train_epoch(model, spec0, spec1, cfg,
                                          unroll=len(i1)))
    sU, mU = ep_u(state, staged, jnp.asarray(i1))
    np.testing.assert_allclose(np.asarray(mU["loss"]),
                               np.asarray(mA1["loss"]), rtol=1e-12)
