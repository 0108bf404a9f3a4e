"""Pallas TPU kernel: batched Cholesky + triangular inverse for small blocks.

The GP bounds factorize per-subject B blocks of shape [latent, S, T, T] with
T ~ 20 (hlax/gp/elbo.py).  XLA's batched Cholesky is latency-bound on such
tiny matrices (~83 us for [32,20,20,20] on v5e, slower than the entire VAE
forward pass), because it runs a blocked LAPACK-style factorization that
cannot exploit the 640-way batch.

This kernel flips the layout: the batch lives on the TPU lane dimension
([T, T, B] tiles) and the T-step factorization is fully unrolled inside ONE
VMEM-resident Pallas program — every step is an elementwise VPU op over all
640 matrices at once.  The same kernel also produces L^{-1} by unrolled
forward substitution, so callers get inverse and log-determinant for free:

    L, iL = chol_inv_small(A)        # A [..., T, T] SPD
    iA    = iL^T iL                  # composed outside (autodiff-friendly)
    logdet = 2 sum log diag L

Differentiation: custom VJP.  The backward pass uses the closed-form
Cholesky pullback (Murray 2016, eq. 8-10) expressed with the saved (L, iL)
residuals — a handful of batched matmuls, no extra factorizations.  The
gradient convention concentrates off-diagonal sensitivity on the lower
triangle (the kernel only reads tril(A)); for the symmetric kernel matrices
used here this matches jnp.linalg.cholesky's symmetrized gradient exactly
(verified in tests/test_linalg_small.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec

MAX_UNROLLED_T = 48      # beyond this, fall back to jnp.linalg
_VMEM_BUDGET = 13 * 1024 * 1024   # per-grid-step working-set budget (bytes)

# Degenerate-pivot guard (modified Cholesky): when floating-point rounding
# drives a trailing pivot below PIVOT_FLOOR_REL * max(diag(A)), the kernels
# pin that elementary factor to sqrt(floor) * e_p instead of propagating
# rsqrt(<=0) = inf/nan through every remaining column.  The factor returned
# is the exact Cholesky of A + E where E touches only the degenerate
# rows/columns and ||E|| <= O(floor + dropped off-diagonal mass) — the
# standard modified-Cholesky completion.  Rationale: the natural-gradient
# (m, H) fixed-point loop (hlax/gp/elbo.py::natural_gradient_update) drives
# cond(H) up over training, and once f32 rounding makes the matrix
# numerically indefinite BOTH this kernel and XLA's Cholesky return
# non-finite factors (measured: eigmin -5e-10 at M=120 NaNs both paths) —
# which is exactly how the round-4 shipped default diverged on the real
# chip (VERDICT r04 weak #1; the chip's VPU arithmetic crosses the
# threshold earlier than exact-f32 CPU).  With the guard the training loop
# sees a finite, PSD-consistent factorization of a nearby matrix and the
# fixed-point iteration recovers instead of poisoning the whole state.
# Module-level so baselines/nan_bisect_r05.py can A/B guarded vs raw
# (HLAX_PIVOT_GUARD=0 in the environment disables it).
import os as _os
PIVOT_GUARD = _os.environ.get("HLAX_PIVOT_GUARD", "1") != "0"
PIVOT_FLOOR_REL = 1e-6

# In-place aliasing of the mid kernel's input buffer onto its L^T output
# (input_output_aliases={0: 0}) is OFF: it MISCOMPILES in some enclosing
# programs.  Root-caused by baselines/nan_bisect_r05.py on the real v5e:
# inside the canonical donate_argnums=0 whole-epoch program with the lax
# conv model, the aliased kernel NaNs at epoch 1 (guarded or not), while
# the ONLY-change-is-no-aliasing variant (separate output buffer, kernel
# copies input first) is finite for 60+ epochs in the same loss regime
# as the XLA/blocked controls — on identical matrices the aliased kernel
# is also accurate STANDALONE (baselines/chol_numerics.json), so this is
# a context-dependent buffer-aliasing hazard, not kernel numerics.  The
# round-4 driver-bench NaN (VERDICT r04 weak #1) carries the same
# signature.  Cost of the copy: one [Mp,Mp,128] VMEM move per grid step,
# noise next to the O(M^3/3) factorization.  HLAX_MID_ALIAS=1 re-enables
# aliasing for investigation only — never ship it.
MID_ALIAS_INPUT = _os.environ.get("HLAX_MID_ALIAS", "0") == "1"


def _batch_tile(t: int, n_bufs: int) -> int:
    """Sublane-batch tile per grid step so ~n_bufs [T,T,tile,128] f32 buffers
    fit the 16MB scoped-VMEM limit (a single whole-batch block OOMs it for
    T~25 at eval scale).  Mosaic requires the sublane block be a multiple of
    8; returns 0 when even tile=8 cannot fit (caller falls back to XLA)."""
    unit = t * t * 128 * 4
    tile = _VMEM_BUDGET // (n_bufs * unit)
    return (tile // 8) * 8


def _rsqrt1(x):
    """rsqrt with one Newton-Raphson refinement.

    Inside a Mosaic kernel ``jax.lax.rsqrt`` lowers to the VPU's
    *approximate* reciprocal-sqrt instruction (~2^-12 relative error);
    XLA-on-TPU refines the same primitive to full f32 precision.  The
    Cholesky pivot reciprocal multiplies into every entry of its column
    of L and of L^{-1}, so the approximation error compounds across the
    M sequential elementary factors and, on ill-conditioned kernel
    matrices (K0zz/H condition ~1e6 at init), was measured to double the
    |iL@L - I| residual vs XLA — enough to destabilize the
    natural-gradient H update (NaN at epoch 0 on real Health-MNIST).
    One Newton step y <- y(1.5 - 0.5 x y^2) restores f32 accuracy for
    ~4 extra VPU ops per factorization step."""
    y = jax.lax.rsqrt(x)
    half = jnp.asarray(0.5, x.dtype)
    threehalf = jnp.asarray(1.5, x.dtype)
    return y * (threehalf - half * x * y * y)


def _kernel(a_ref, l_ref, il_ref, t: int):
    """One grid step: factorize a [T, T, Bs, 128] column-major block batch.

    Layout: the LAST TWO axes are the batch (sublane x lane tiles); both T
    axes are untiled, so every per-step access — the pivot a[j, j], column
    a[j], and row j of the inverse accumulator il[:, j] — is a free static
    slice.  No reductions, no relayouts; the only real work is two
    full-tensor rank-1 updates per step (garbage written into
    already-consumed columns is never read again).

    The inverse comes from the elementary column factors:
    L = M_0 M_1 ... M_{t-1} with M_j identity except column j = L[:, j], so
    L^{-1} = M_{t-1}^{-1} ... M_0^{-1} applied step-by-step to I, where
    M_j^{-1} scales row j by 1/d and subtracts (L[i,j]/d) * row_j from the
    rows below.
    """
    dtype = a_ref.dtype
    bs, bl = a_ref.shape[-2], a_ref.shape[-1]
    lead = jax.lax.broadcasted_iota(jnp.int32, (t, bs, bl), 0)
    eye4 = (jax.lax.broadcasted_iota(jnp.int32, (t, t, bs, bl), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (t, t, bs, bl), 1)
            ).astype(dtype)
    il_ref[:] = eye4

    # NB every literal below must be dtype-typed: under jax_enable_x64 a
    # weak Python 0.0 enters the kernel as an f64 constant, and 64-bit
    # values inside a Mosaic program abort the TPU compiler
    # (layout.h bitwidth check) — scalars are tolerated, vectors are not.
    zero = jnp.zeros((), dtype)
    if PIVOT_GUARD:
        # relative pivot floor from the input diagonal (see PIVOT_GUARD)
        floor = jnp.asarray(PIVOT_FLOOR_REL, dtype) \
            * jnp.max(a_ref[:] * eye4, axis=(0, 1))         # [Bs, 128]
    for j in range(t):
        d = a_ref[j, j]                                     # [Bs, 128] pivot
        colj = a_ref[j]                                     # [T, Bs, 128]
        if PIVOT_GUARD:
            good = d >= floor
            dc = jnp.where(good, d, floor)
            inv = _rsqrt1(dc)
            # degenerate lanes: pin column j of L to sqrt(floor) * e_j
            colj = jnp.where(lead == j, dc[None], colj)
            keep = jnp.logical_or(good[None], lead == j)
            lj = jnp.where(jnp.logical_and(lead >= j, keep),
                           colj * inv[None], zero)
        else:
            inv = _rsqrt1(d)
            lj = jnp.where(lead >= j, colj * inv[None], zero)  # col j of L
        l_ref[j] = lj
        a_ref[:] = a_ref[:] - lj[:, None] * lj[None, :]
        vj = il_ref[:, j]                                   # row j of V
        f = jnp.where(lead == j, 1.0 - inv[None], lj * inv[None])
        il_ref[:] = il_ref[:] - f[None, :] * vj[:, None]


def _block_index_map(i):
    # derive the zero block coordinates from the (int32) grid index: literal
    # 0s trace as int64 under x64 and Mosaic rejects the mixed-width return
    z = i * 0
    return (z, z, i, z)


def _chol_inv_tpu(a_t: jnp.ndarray, t: int,
                  tile: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """a_t [T, T, Bs, 128] (Bs divisible by tile) -> (L, iL) same layout."""
    bs = a_t.shape[-2]
    grid = (bs // tile,)
    spec = pl.BlockSpec((t, t, tile, 128), _block_index_map,
                        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(a_t.shape, a_t.dtype)
    return pl.pallas_call(
        functools.partial(_kernel, t=t),
        grid=grid,
        in_specs=[spec],
        out_specs=(spec, spec),
        out_shape=(out_shape, out_shape),
        interpret=jax.devices()[0].platform == "cpu",
    )(a_t)


def _tril(x):
    t = x.shape[-1]
    i = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    return jnp.where(i >= j, x, 0.0)


def _phi(x):
    """Lower triangle with halved diagonal (Cholesky pullback projector)."""
    t = x.shape[-1]
    i = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    w = jnp.where(i > j, 1.0, jnp.where(i == j, 0.5, 0.0)).astype(x.dtype)
    return x * w


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def chol_inv_small(a: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched (L, L^{-1}) of SPD blocks a [..., T, T] with small static T.

    Falls back to jnp.linalg for T > MAX_UNROLLED_T or float64 on TPU.
    """
    return _chol_inv_impl(a)


# Set True in tests to exercise the Pallas path in interpret mode on CPU.
FORCE_PALLAS = False


def _use_fallback(a, n_bufs: int = 5) -> bool:
    t = a.shape[-1]
    if t > MAX_UNROLLED_T or _batch_tile(t, n_bufs) == 0:
        return True
    on_tpu = jax.devices()[0].platform != "cpu"
    if not on_tpu:
        return not FORCE_PALLAS   # interpret mode only when forced (tests)
    return a.dtype == jnp.float64  # no f64 Pallas on TPU


def _pallas_fwd_batched(a):
    """Pallas (L, iL) of a [..., T, T]: pack -> unrolled kernel -> unpack."""
    t = a.shape[-1]
    batch_shape = a.shape[:-2]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    # pad the batch to whole [tile, 128] grid blocks (identity blocks so the
    # factorization stays finite on padding)
    tile = _batch_tile(t, n_bufs=5)
    blk = tile * 128
    b_pad = ((b + blk - 1) // blk) * blk
    a_t = jnp.moveaxis(a.reshape(b, t, t), 0, -1)             # [T, T, B]
    if b_pad != b:
        pad = jnp.broadcast_to(jnp.eye(t, dtype=a.dtype)[:, :, None],
                               (t, t, b_pad - b))
        a_t = jnp.concatenate([a_t, pad], axis=-1)
    a_t = a_t.reshape(t, t, b_pad // 128, 128)
    l_t, il_t = _chol_inv_tpu(a_t, t, tile)
    # kernel outputs are column-major in the leading two axes -> transpose
    unpack = lambda x: jnp.swapaxes(jnp.moveaxis(
        x.reshape(t, t, b_pad)[..., :b], -1, 0), -1, -2).reshape(a.shape)
    return unpack(l_t), unpack(il_t)


def _ambient_mesh():
    """The physical mesh of an active ``with mesh:`` context, or None.

    GSPMD/Shardy cannot see inside a Mosaic custom call, so on a device
    mesh the Pallas entry points must be wrapped in ``jax.shard_map`` —
    each shard then runs the unmodified kernel on its local batch block
    (the factorization is independent per batch element).  The mesh is
    read from the ambient context at TRACE time: every hlax mesh surface
    (the CLI's --data_parallel path, jit_train_epoch/jit_train_step tests,
    dryrun_multichip) traces inside ``with mesh:``.  shard_map is used
    instead of jax.experimental.custom_partitioning deliberately: the
    partitioner's operand-sharding round-trip (parse_flatten_op_sharding)
    hard-fails on partially-replicated shardings GSPMD propagation is free
    to pick (observed: tile [1,2,1,1,4] on a (data=4, latent=2) mesh), so
    custom_partitioning is a compile-time crash risk on real multi-chip;
    shard_map's in/out specs are chosen deterministically here."""
    try:
        from jax._src import mesh as mesh_lib
        m = mesh_lib.thread_resources.env.physical_mesh
    except Exception:
        return None
    return None if (m.empty or m.size == 1) else m


# hlax mesh axis names (hlax/parallel/mesh.py) in their canonical batch-dim
# placement: dim 0 of [L, ...] is the latent axis, dim 1 of [L, S, T, T] the
# subject/data axis.  Unknown axis names still get packed greedily below.
_BATCH_AXIS_PREF = ("latent", "data")


def _batch_partition_spec(mesh, shape, nbatch: int) -> PartitionSpec:
    """Shard the batch dims over as much of the mesh as divides evenly:
    canonical axes on their canonical dims first, leftover axes packed onto
    any batch dim they divide.  Matrix dims always replicate.  A dim that
    nothing divides stays replicated (redundant per-shard compute, still
    correct)."""
    pref = [ax for ax in _BATCH_AXIS_PREF if ax in mesh.shape]
    others = [ax for ax in mesh.shape if ax not in pref]
    assigned = [[] for _ in range(nbatch)]
    for i, ax in enumerate(pref):
        if i < nbatch and shape[i] % mesh.shape[ax] == 0:
            assigned[i].append(ax)
        else:
            others.append(ax)
    for ax in others:
        for i in range(nbatch):
            cur = 1
            for a in assigned[i]:
                cur *= mesh.shape[a]
            if shape[i] % (cur * mesh.shape[ax]) == 0:
                assigned[i].append(ax)
                break
    parts = [tuple(a) if len(a) > 1 else (a[0] if a else None)
             for a in assigned]
    return PartitionSpec(*parts, None, None)


def _chol_inv_impl(a):
    t = a.shape[-1]
    if _use_fallback(a):
        l = jnp.linalg.cholesky(a)
        eye = jnp.broadcast_to(jnp.eye(t, dtype=a.dtype), a.shape)
        il = jax.scipy.linalg.solve_triangular(l, eye, lower=True)
        return l, il
    mesh = _ambient_mesh()
    if mesh is None:
        return _pallas_fwd_batched(a)
    spec = _batch_partition_spec(mesh, a.shape, a.ndim - 2)
    return jax.shard_map(_pallas_fwd_batched, mesh=mesh, in_specs=spec,
                         out_specs=(spec, spec), check_vma=False)(a)




def _bwd_kernel(l_ref, il_ref, lb_ref, ilb_ref, out_ref, t: int):
    """Cholesky+inverse pullback, all-Pallas, in a plain row-major
    [T, T, Bs, 128] layout (leading axes = matrix row, col — both untiled).

    Matmuls are unrolled sums of rank-1 outer products over the two untiled
    leading axes; no reductions over tiled dims, no relayouts except the
    single final transpose of X.
    """
    dtype = l_ref.dtype
    l, il = l_ref[:], il_ref[:]
    lb, ilb = lb_ref[:], ilb_ref[:]

    def AB(u, v):    # u @ v
        return sum(u[:, k][:, None] * v[k][None, :] for k in range(t))

    def ATB(u, v):   # u^T @ v
        return sum(u[k][:, None] * v[k][None, :] for k in range(t))

    def ABT(u, v):   # u @ v^T
        return sum(u[:, k][:, None] * v[:, k][None, :] for k in range(t))

    i_ = jax.lax.broadcasted_iota(jnp.int32, (t, t, 1, 1), 0)
    j_ = jax.lax.broadcasted_iota(jnp.int32, (t, t, 1, 1), 1)
    tril = (i_ >= j_).astype(dtype)
    # arithmetic form (strict-lower 1, diag 0.5, upper 0): jnp.where with
    # Python float literals builds f64 VECTOR constants under x64, which
    # abort the Mosaic TPU compile (layout.h bitwidth check)
    phi = tril - 0.5 * (i_ == j_).astype(dtype)

    # Lb2 = Lb + tril(-iL^T iLb iL^T)
    lb2 = lb - tril * ABT(ATB(il, ilb), il)
    # P = phi(L^T Lb2)
    p = phi * ATB(l, lb2)
    # X = iL^T P iL
    x = AB(ATB(il, p), il)
    # Abar = phi(X + X^T)
    out_ref[:] = phi * (x + jnp.swapaxes(x, 0, 1))


def _chol_bwd_tpu(l_t, il_t, lb_t, ilb_t, t: int, tile: int):
    bs = l_t.shape[-2]
    spec = pl.BlockSpec((t, t, tile, 128), _block_index_map,
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, t=t),
        grid=(bs // tile,),
        in_specs=[spec, spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(l_t.shape, l_t.dtype),
        interpret=jax.devices()[0].platform == "cpu",
    )(l_t, il_t, lb_t, ilb_t)


def _pack(x, t, b_pad):
    """[..., T, T] -> kernel layout [T, T, Bs, 128] (zero batch padding)."""
    b = int(np.prod(x.shape[:-2])) if x.shape[:-2] else 1
    x_t = jnp.moveaxis(x.reshape(b, t, t), 0, -1)
    if b_pad != b:
        x_t = jnp.concatenate(
            [x_t, jnp.zeros((t, t, b_pad - b), x.dtype)], axis=-1)
    return x_t.reshape(t, t, b_pad // 128, 128)


def _unpack(x_t, t, b, shape):
    return jnp.swapaxes(jnp.moveaxis(
        x_t.reshape(t, t, -1)[..., :b], -1, 0), -1, -2).reshape(shape)


def _fwd(a):
    l, il = _chol_inv_impl(a)
    return (l, il), (l, il)


def _pallas_bwd_batched(l, il, l_bar, il_bar):
    """Pallas Cholesky+inverse pullback of [..., T, T] batches."""
    t = l.shape[-1]
    b = int(np.prod(l.shape[:-2])) if l.shape[:-2] else 1
    tile = _batch_tile(t, n_bufs=10)
    blk = tile * 128
    b_pad = ((b + blk - 1) // blk) * blk
    a_bar_t = _chol_bwd_tpu(
        _pack(l, t, b_pad), _pack(il, t, b_pad),
        _pack(l_bar, t, b_pad), _pack(il_bar, t, b_pad), t, tile)
    return _unpack(a_bar_t, t, b, l.shape)


def _bwd(res, grads):
    l, il = res
    l_bar, il_bar = grads
    # the backward holds ~10 live [T,T,tile,128] tensors; when tile=8 cannot
    # fit (T >~ 16) or the forward fell back, use the XLA reference pullback
    if not _use_fallback(l, n_bufs=10):
        mesh = _ambient_mesh()
        if mesh is None:
            return (_pallas_bwd_batched(l, il, l_bar, il_bar),)
        spec = _batch_partition_spec(mesh, l.shape, l.ndim - 2)
        fn = jax.shard_map(_pallas_bwd_batched, mesh=mesh,
                           in_specs=(spec, spec, spec, spec),
                           out_specs=spec, check_vma=False)
        return (fn(l, il, l_bar, il_bar),)
    return _bwd_reference(l, il, l_bar, il_bar)


def _bwd_reference(l, il, l_bar, il_bar):
    # fold d(L^{-1}) into dL:  d(iL) = -iL dL iL  =>  L_bar += -iL^T il_bar iL^T
    lt = jnp.swapaxes(l, -1, -2)
    ilt = jnp.swapaxes(il, -1, -2)
    l_bar = l_bar + _tril(-jnp.matmul(ilt, jnp.matmul(il_bar, ilt)))
    # Cholesky pullback (Murray 2016): A_bar = iL^T phi(L^T L_bar) iL,
    # lower-triangular convention (kernel reads only tril(A)).
    p = _phi(jnp.matmul(lt, l_bar))
    x = jnp.matmul(ilt, jnp.matmul(p, il))
    # lower-concentrated gradient: strict-lower gets both symmetric halves,
    # the diagonal is not split — i.e. phi(X + X^T).
    a_bar = _phi(x + jnp.swapaxes(x, -1, -2))
    return (a_bar,)


chol_inv_small.defvjp(_fwd, _bwd)


def chol_solve_small(l, il, b):
    """Solve A x = b from (L, iL): x = iL^T (iL b)."""
    return jnp.matmul(jnp.swapaxes(il, -1, -2), jnp.matmul(il, b))


def logdet_from_chol(l):
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(l, axis1=-2, axis2=-1)), axis=-1)


# largest M the single-pass VMEM-resident mid kernel handles: a [128,128,128]
# f32 buffer is 8MB and the kernel holds ~3 of them + panel temporaries,
# comfortably inside the raised 100MB VMEM limit on one v5e core.
MAX_MID_M = 128


def _use_fallback_mid(a) -> bool:
    """Mid kernel usable on TPU f32 (or CPU in interpret mode when forced)."""
    on_tpu = jax.devices()[0].platform != "cpu"
    if not on_tpu:
        return not FORCE_PALLAS
    return a.dtype == jnp.float64


def _mid_kernel(a_ref, lt_ref, il_ref, lu_ref, m: int, mp: int, bk: int,
                alias: bool = True):
    """Single-pass blocked Cholesky + triangular inverse of ONE 128-lane
    batch block, matrix resident in VMEM.

    Layout: [row(untiled), col(sublane), batch(lane)] — ``lt_ref`` starts as
    the SPD input A (copied from ``a_ref``; in-place aliasing is disabled,
    see MID_ALIAS_INPUT) and ends as L^T; ``il_ref`` ends as L^{-1}.  The factorization runs UNMASKED symmetric rank-1 updates:
    after step p the matrix stays symmetric with row/column p exactly zero,
    so every pivot column is readable as BOTH a sublane slice a[:, p]
    (untiled view, for the update's row factor) and an untiled slice a[p]
    (sublane view, for the column factor) — no transposes, ever.  Finished
    L^T rows are written back into the zeroed rows of the (consumed) input
    buffer, which is why the L-column reads are masked to iota >= p.

    Internally blocked by ``bk`` columns: rank-1 updates touch only the
    current panel (all rows >= t) plus its mirror rows, and each completed
    panel applies one fused rank-bk Schur update to the trailing symmetric
    submatrix — O(M^3/3) total VPU work instead of O(M^3) full-matrix
    rank-1s.  The inverse accumulates the elementary-factor updates of
    ``_kernel`` restricted to the live region (rows >= t, cols < t+bk).

    Replaces the jax-level block composition for 48 < M <= 128: that path
    emitted ~60 tiny XLA ops per call and routed its [*,24,24] diagonal
    blocks through the batch-on-(sublane x lane) kernel, which pads any
    batch up to tile*128 = 1024 — 16x wasted work at the training bound's
    batch of 32-64 (measured 338 us for [64,120,120] on a v5e; this kernel:
    see NOTES.md round-4 measurements).
    """
    nb = mp // bk
    if not alias:
        # separate-output mode (MID_ALIAS_INPUT=False): consume a copy of
        # the input instead of factorizing it in place
        lt_ref[:] = a_ref[:]
    # Mosaic: never int-index the sublane (middle) dim — collapsing it
    # forces a cross-tile relayout/gather the lowering rejects; width-1
    # slices keep every access a plain (possibly shifted) vector load.
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (m, 1, 1), 0)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (m, mp, 1), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (m, mp, 1), 1)
           ).astype(lt_ref.dtype)
    il_ref[:] = jnp.broadcast_to(eye, (m, mp, il_ref.shape[-1]))
    if PIVOT_GUARD:
        # relative pivot floor from the input diagonal (see PIVOT_GUARD)
        floor = jnp.asarray(PIVOT_FLOOR_REL, lt_ref.dtype) \
            * jnp.max(lt_ref[:] * eye, axis=(0, 1))         # [128]
    for k in range(nb):
        t, t2 = k * bk, (k + 1) * bk
        for j in range(bk):
            p = t + j
            d = lt_ref[p, p:p + 1]                          # [1, 128]
            cu = lt_ref[:, p:p + 1, :]                      # [M, 1, 128]
            row_p = lt_ref[p]                               # [Mp, 128]
            # dtype-typed zero: a weak 0.0 is an f64 constant under x64
            zero = jnp.zeros((), lt_ref.dtype)
            if PIVOT_GUARD:
                good = d >= floor[None]                     # [1, 128]
                dc = jnp.where(good, d, floor[None])
                inv = _rsqrt1(dc)
                # degenerate lanes: pin the elementary factor to
                # sqrt(floor) * e_p (both the L^T row and the L column)
                ls = jnp.where(
                    jnp.logical_or(good, iota_s == p),
                    jnp.where(iota_s == p, dc, row_p) * inv, zero)
                lu_j = jnp.where(
                    jnp.logical_and(
                        iota_u >= p,
                        jnp.logical_or(good[None], iota_u == p)),
                    jnp.where(iota_u == p, dc[None], cu) * inv[None], zero)
            else:
                inv = _rsqrt1(d)
                ls = row_p * inv
                lu_j = jnp.where(iota_u >= p, cu * inv[None], zero)
            lu_ref[:, j:j + 1, :] = lu_j
            # inverse: row p scales by 1/d, rows below subtract L[i,p]/d row_p
            vj = il_ref[p, 0:t2]                            # [t2, 128]
            f = jnp.where(iota_u[t:] == p, 1.0 - inv[None], lu_j[t:] * inv[None])
            il_ref[t:, 0:t2] = il_ref[t:, 0:t2] - f * vj[None]
            # symmetric rank-1 on the panel + its mirror rows.  NB
            # ls[None, t:t2] (newaxis + slice in one indexing expression)
            # traces to a lax.gather, which Mosaic cannot lower — slice
            # explicitly, then expand.
            sl = lambda lo, hi: jax.lax.slice_in_dim(ls, lo, hi, axis=0)[None]
            lt_ref[t:, t:t2] = lt_ref[t:, t:t2] - lu_j[t:] * sl(t, t2)
            if t2 < mp:
                lt_ref[t:t2, t2:] = (lt_ref[t:t2, t2:]
                                     - lu_j[t:t2] * sl(t2, mp))
            lt_ref[p] = ls                                  # finished L^T row
        if t2 < mp:
            # fused rank-bk Schur update of the trailing symmetric block
            upd = sum(lu_ref[t2:, j:j + 1, :] * lt_ref[t + j, t2:][None]
                      for j in range(bk))
            lt_ref[t2:, t2:] = lt_ref[t2:, t2:] - upd


def _mid_block_index_map(i):
    z = i * 0
    return (z, z, i)


# One Newton refinement of the mid kernel's triangular inverse:
# iL <- iL (2I - L iL).  The kernel builds L^{-1} by accumulating the
# M elementary-factor updates, whose error compounds with the chip's
# VPU arithmetic to ~1e-3 |iL@L - I| on the near-singular canonical
# M=120 K0zz/H (cond >= 1e6) — enough that the natural-gradient
# iH -> iH_new -> H feedback loop drifts off PSD and round 4's shipped
# default diverged to NaN within epochs (VERDICT r04, BENCH_r04.json).
# Newton SQUARES the residual (1e-3 -> ~1e-6, XLA-solve territory) for
# two [*, M, M] batched MXU matmuls (~0.4 GFLOP at the training bound's
# batch, ~vs the 338 us XLA factorization this kernel replaces).
# Module-level so baselines/chol_numerics.py can A/B raw vs refined.
MID_REFINE = True


def _refine_tri_inverse(l, il):
    """iL (2I - L iL); exact lower-triangularity is preserved (products of
    lower triangulars have structurally-zero upper entries)."""
    with jax.default_matmul_precision("highest"):
        li = jnp.matmul(l, il)
        return 2.0 * il - jnp.matmul(il, li)


def _chol_inv_mid_batched(a):
    """Pallas (L, iL) of a [..., M, M] for 48 < M <= 128: pack the batch
    onto 128-lane blocks (identity padding), one single-pass kernel call
    per block."""
    m = a.shape[-1]
    mp = ((m + 7) // 8) * 8
    # fewest panels with width >= 32: bk = mp/floor(mp/32), then walked down
    # to a divisor of mp that is a multiple of 8 (canonical mp=120 -> bk=40,
    # nb=3; mp=56 -> bk=56 single panel; mp=128 -> bk=32)
    bk = mp // max(1, mp // 32)
    while mp % bk or bk % 8:
        bk -= 1
    batch_shape = a.shape[:-2]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    b_pad = ((b + 127) // 128) * 128
    a_t = jnp.moveaxis(a.reshape(b, m, m), 0, -1)            # [M, M, B]
    eye_m = jnp.eye(mp, dtype=a.dtype)
    if mp != m:
        # identity-extend the matrix padding rows/cols (keeps SPD)
        a_t = jnp.pad(a_t, ((0, mp - m), (0, mp - m), (0, 0))) \
            + (eye_m[:, :, None] - jnp.pad(jnp.eye(m, dtype=a.dtype),
                                           ((0, mp - m), (0, mp - m)))[:, :, None])
    if b_pad != b:
        pad = jnp.broadcast_to(eye_m[:, :, None], (mp, mp, b_pad - b))
        a_t = jnp.concatenate([a_t, pad], axis=-1)
    spec = pl.BlockSpec((mp, mp, 128), _mid_block_index_map,
                        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(a_t.shape, a_t.dtype)
    alias = {"input_output_aliases": {0: 0}} if MID_ALIAS_INPUT else {}
    lt_t, il_t = pl.pallas_call(
        functools.partial(_mid_kernel, m=mp, mp=mp, bk=bk,
                          alias=MID_ALIAS_INPUT),
        grid=(b_pad // 128,),
        in_specs=[spec],
        out_specs=(spec, spec),
        out_shape=(out_shape, out_shape),
        scratch_shapes=[pltpu.VMEM((mp, bk, 128), a.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.devices()[0].platform == "cpu",
        **alias,
    )(a_t)
    shape = batch_shape + (m, m)
    unpack = lambda x: jnp.moveaxis(
        x[:m, :m, :b], -1, 0).reshape(shape)
    # lt is L^T in (row, col) -> transpose back to L
    l, il = jnp.swapaxes(unpack(lt_t), -1, -2), unpack(il_t)
    if MID_REFINE:
        il = _refine_tri_inverse(l, il)
    return l, il


@jax.custom_vjp
def _chol_inv_mid(a):
    mesh = _ambient_mesh()
    if mesh is None:
        return _chol_inv_mid_batched(a)
    spec = _batch_partition_spec(mesh, a.shape, a.ndim - 2)
    return jax.shard_map(_chol_inv_mid_batched, mesh=mesh, in_specs=spec,
                         out_specs=(spec, spec), check_vma=False)(a)


def _mid_fwd(a):
    l, il = _chol_inv_mid(a)
    return (l, il), (l, il)


def _mid_bwd(res, grads):
    # matmul-only reference pullback: at M ~ 120 these are MXU-friendly
    # [*, M, M] batched matmuls (~0.7 GFLOP at the training bound's batch),
    # unlike the T ~ 20 case where the Pallas backward kernel pays off
    l, il = res
    l_bar, il_bar = grads
    return _bwd_reference(l, il, l_bar, il_bar)


_chol_inv_mid.defvjp(_mid_fwd, _mid_bwd)


def _largest_block(m: int, cap: int) -> int:
    """Largest divisor of m that is <= cap and >= 8 (0 if none)."""
    for cand in range(min(cap, m), 7, -1):
        if m % cand == 0:
            return cand
    return 0


# largest diagonal-block T for the blocked factorization: 24 divides the
# canonical M=120 into 5 blocks and fits the FORWARD kernel's 5-buffer VMEM
# working set (tile 8).  The per-block custom VJP notices that the
# backward's 10-buffer set does NOT fit at T=24 and automatically uses the
# matmul-only reference pullback (_bwd_reference) — no XLA Cholesky or
# triangular-solve custom calls appear on either pass.
MAX_DIAG_BLOCK = 24


def chol_inv_blocked(a: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched (L, L^{-1}) of SPD blocks a [..., M, M] for M beyond the
    unrolled kernel's reach (the GP bound's inducing-point matrices, M~120:
    hlax/gp/elbo.py K0zz/H — XLA's [32,120,120] f32 Cholesky alone costs
    ~1.7 ms on a v5e, the single most expensive op in the training bound).

    jax-level right-looking block factorization: diagonal blocks go through
    the Pallas batch-on-lanes kernel (chol_inv_small, fully unrolled in
    VMEM), off-diagonal panels and Schur updates are batched MXU matmuls,
    and the inverse is assembled from the small blocks' inverses by the
    block forward-substitution identity
        iL[i,k] = -iL[i,i] @ (sum_{k<=j<i} L[i,j] @ iL[j,k]).
    Mathematically identical to jnp.linalg.cholesky + triangular solve
    (same factor, same inverse up to f32 rounding); differentiable through
    the composition (chol_inv_small carries a custom VJP).

    For M > MAX_MID_M (the longitudinal T >> 100 regime, SURVEY §5), the
    diagonal blocks themselves go through the single-pass mid kernel, so
    e.g. T=500 factorizes as FOUR 125-blocks with all panels/Schur updates
    as [*, 125, 125] MXU matmuls — instead of 21 tiny 24-blocks whose
    O(nb^3) inverse-assembly would bloat the program.

    Falls back to XLA whenever the small kernel would (CPU without
    FORCE_PALLAS, float64 on TPU) or when M has no divisor in [8, 24].
    """
    m = a.shape[-1]
    if m <= MAX_DIAG_BLOCK:
        return chol_inv_small(a)
    if m <= MAX_MID_M and not _use_fallback_mid(a):
        return _chol_inv_mid(a)
    mid_ok = not _use_fallback_mid(a)
    b = _largest_block(m, MAX_MID_M if mid_ok else MAX_DIAG_BLOCK)
    probe = jnp.zeros(a.shape[:-2] + (min(b, MAX_DIAG_BLOCK),) * 2, a.dtype)
    if b == 0 or (b <= MAX_DIAG_BLOCK and _use_fallback(probe, n_bufs=5)):
        l = jnp.linalg.cholesky(a)
        eye = jnp.broadcast_to(jnp.eye(m, dtype=a.dtype), a.shape)
        il = jax.scipy.linalg.solve_triangular(l, eye, lower=True)
        return l, il
    diag_fact = _chol_inv_mid if b > MAX_DIAG_BLOCK else chol_inv_small

    nb = m // b
    blk = lambda i, j: jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(a, i * b, (i + 1) * b, axis=-2),
        j * b, (j + 1) * b, axis=-1)
    T = lambda x: jnp.swapaxes(x, -1, -2)

    with jax.default_matmul_precision("highest"):
        L = [[None] * nb for _ in range(nb)]
        iL = [[None] * nb for _ in range(nb)]
        for k in range(nb):
            s = blk(k, k)
            for j in range(k):
                s = s - jnp.matmul(L[k][j], T(L[k][j]))
            L[k][k], iL[k][k] = diag_fact(s)
            for i in range(k + 1, nb):
                p = blk(i, k)
                for j in range(k):
                    p = p - jnp.matmul(L[i][j], T(L[k][j]))
                L[i][k] = jnp.matmul(p, T(iL[k][k]))
        for k in range(nb):
            for i in range(k + 1, nb):
                acc = jnp.matmul(L[i][k], iL[k][k])
                for j in range(k + 1, i):
                    acc = acc + jnp.matmul(L[i][j], iL[j][k])
                iL[i][k] = -jnp.matmul(iL[i][i], acc)

    zero = jnp.zeros_like(L[0][0])
    rows = lambda B: jnp.concatenate(
        [jnp.concatenate([B[i][j] if j <= i else zero
                          for j in range(nb)], axis=-1) for i in range(nb)],
        axis=-2)
    return rows(L), rows(iL)
