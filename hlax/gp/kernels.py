"""GP kernels as pure functions + the kernel-spec compiler.

Semantics follow the reference kernel zoo:
  * BinKernel / CatKernel / RbfKernel  — /root/reference/kernel_spec.py:9-69
  * two-additive-kernel composition (shared ``spec0`` vs subject-level
    ``spec1``) with scale/product/interaction/missing-mask structure —
    /root/reference/kernel_gen.py:199-310
  * softplus parametrization of lengthscale/outputscale matches the
    gpytorch constraints the reference relies on (also spelled out in the
    reference's torch-only kernel library, GP_model.py:27-117).

A spec is static metadata (tuples of factors); parameters are a pytree with a
leading latent axis — evaluation is vmapped over latent dimensions, which is
also the natural axis to shard across a TPU mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def softplus(x):
    return jax.nn.softplus(x)


def inv_softplus(y: float) -> float:
    return float(np.log(np.expm1(y)))


RAW_LS_INIT = inv_softplus(2.5)    # lengthscale init 2.5 (kernel_spec.py:68)
RAW_OS_INIT = 0.0                  # gpytorch ScaleKernel raw init -> softplus(0)


@dataclasses.dataclass(frozen=True)
class KernelFactor:
    kind: str   # 'cat' | 'bin' | 'rbf' | 'catmod'
    dim: int    # active covariate column
    num: int = 0   # number of instances (catmod only, kernel_spec.py:35-55)


@dataclasses.dataclass(frozen=True)
class KernelComponent:
    factors: Tuple[KernelFactor, ...]


@dataclasses.dataclass(frozen=True)
class KernelSpec:
    components: Tuple[KernelComponent, ...]

    def __len__(self):
        return len(self.components)


def build_kernel_specs(
    cat_kernel: Sequence[int],
    bin_kernel: Sequence[int],
    sqexp_kernel: Sequence[int],
    cat_int_kernel: Sequence[Dict[str, int]],
    bin_int_kernel: Sequence[Dict[str, int]],
    covariate_missing_val: Sequence[Dict[str, int]],
    id_covariate: int,
) -> Tuple[KernelSpec, KernelSpec]:
    """Compile config lists into (spec0, spec1) — kernel_gen.py:199-310.

    spec1 collects components involving the id covariate (block-diagonal
    across subjects); spec0 everything else.
    """
    missing = {d["covariate"]: d["mask"] for d in covariate_missing_val}

    def masked(factors: List[KernelFactor], cov: int) -> List[KernelFactor]:
        if cov in missing:
            factors.append(KernelFactor("bin", missing[cov]))
        return factors

    comps0: List[KernelComponent] = []
    comps1: List[KernelComponent] = []

    for idx in cat_kernel:
        fs = masked([KernelFactor("cat", idx)], idx)
        (comps1 if idx == id_covariate else comps0).append(
            KernelComponent(tuple(fs)))
    for idx in sqexp_kernel:
        comps0.append(KernelComponent(tuple(masked([KernelFactor("rbf", idx)], idx))))
    for idx in bin_kernel:
        comps0.append(KernelComponent(tuple(masked([KernelFactor("bin", idx)], idx))))
    for d in cat_int_kernel:
        fs = masked([KernelFactor("cat", d["cat_covariate"])], d["cat_covariate"])
        fs += masked([KernelFactor("rbf", d["cont_covariate"])], d["cont_covariate"])
        (comps1 if d["cat_covariate"] == id_covariate else comps0).append(
            KernelComponent(tuple(fs)))
    for d in bin_int_kernel:
        fs = masked([KernelFactor("bin", d["bin_covariate"])], d["bin_covariate"])
        fs += masked([KernelFactor("rbf", d["cont_covariate"])], d["cont_covariate"])
        comps0.append(KernelComponent(tuple(fs)))

    return KernelSpec(tuple(comps0)), KernelSpec(tuple(comps1))


def init_kernel_params(spec: KernelSpec, latent_dim: int, dtype=jnp.float64):
    """Per-component params with leading latent axis: a list of dicts
    {'raw_os': [L], 'raw_ls_<i>': [L]} (one lengthscale per rbf factor)."""
    params = []
    for comp in spec.components:
        p = {"raw_os": jnp.full((latent_dim,), RAW_OS_INIT, dtype)}
        for i, f in enumerate(comp.factors):
            if f.kind == "rbf":
                p[f"raw_ls_{i}"] = jnp.full((latent_dim,), RAW_LS_INIT, dtype)
        params.append(p)
    return params


def _factor_matrix(f: KernelFactor, p_comp, i: int, x1, x2):
    """x1 [..., N1, Q], x2 [..., N2, Q] -> [..., N1, N2] (single latent)."""
    a = x1[..., :, None, f.dim]
    b = x2[..., None, :, f.dim]
    if f.kind == "cat":
        return (a == b).astype(x1.dtype)           # kernel_spec.py:31-32
    if f.kind == "bin":
        return (a + b == 2).astype(x1.dtype)       # kernel_spec.py:22-23
    if f.kind == "catmod":
        # centered one-vs-rest categorical kernel (CatKernelMod,
        # kernel_spec.py:35-55; arXiv:1912.03549): 1 on match,
        # -1/(num-1) otherwise
        eq = (a == b).astype(x1.dtype)
        return eq - (1.0 - eq) / (f.num - 1)
    ls = softplus(p_comp[f"raw_ls_{i}"])
    d = (a - b) / ls
    return jnp.exp(-0.5 * d * d)


def _kmat_single(spec: KernelSpec, params, x1, x2):
    """Single-latent kernel matrix: params leaves are scalars here."""
    out = None
    for comp, p in zip(spec.components, params):
        k = None
        for i, f in enumerate(comp.factors):
            km = _factor_matrix(f, p, i, x1, x2)
            k = km if k is None else k * km
        k = softplus(p["raw_os"]) * k
        out = k if out is None else out + k
    if out is None:
        shape = jnp.broadcast_shapes(x1.shape[:-1], x2.shape[:-1])
        return jnp.zeros(shape[:-1] + (x1.shape[-2], x2.shape[-2]), x1.dtype)
    return out


def kernel_matrix(spec: KernelSpec, params, x1, x2,
                  x1_batched: bool = False, x2_batched: bool = False):
    """Latent-batched kernel matrix.

    x1/x2: [*, N, Q], or [L, *, N, Q] when the corresponding ``*_batched``
    flag is set (e.g. per-latent inducing points z [L, M, Q]).
    Returns [L, *, N1, N2].
    """
    if not spec.components:
        # evaluate shape via a dummy; all-zero kernel
        l = jax.tree_util.tree_leaves(params)
        L = l[0].shape[0] if l else 1
        s1 = x1.shape[1:] if x1_batched else x1.shape
        s2 = x2.shape[1:] if x2_batched else x2.shape
        batch = jnp.broadcast_shapes(s1[:-2], s2[:-2])
        return jnp.zeros((L,) + batch + (s1[-2], s2[-2]), x1.dtype)
    return jax.vmap(
        lambda p, a, b: _kmat_single(spec, p, a, b),
        in_axes=(0, 0 if x1_batched else None, 0 if x2_batched else None),
    )(params, x1, x2)


def noise_init(latent_dim: int, constrain_scales: bool, dtype=jnp.float64):
    """GaussianLikelihood noise (HLVAE_main.py:208-213): softplus raw with a
    1e-8 floor; with constrain_scales the noise is pinned to 1 and frozen."""
    if constrain_scales:
        return jnp.zeros((latent_dim,), dtype)   # unused raw, noise() returns 1
    return jnp.full((latent_dim,), inv_softplus(1.0 - 1e-8), dtype)


def noise_value(raw_noise, constrain_scales: bool):
    if constrain_scales:
        return jnp.ones_like(raw_noise)
    return softplus(raw_noise) + 1e-8


def default_eps(dtype) -> float:
    """Dtype-aware jitter: the reference's 1e-6 (HLVAE_main.py:27) in
    float64; float32 Cholesky needs a larger floor."""
    return 1e-6 if dtype == jnp.float64 else 1e-4
