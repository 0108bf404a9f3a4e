"""HLVAE: heterogeneous-likelihood VAE with conv or MLP encoder/decoder.

TPU-native re-design of the reference model (/root/reference/HLVAE.py:104-475).
Differences from the reference's mechanisms (semantics preserved):

  * All per-type routing uses the static grouped layout (hlax.types) —
    every ``x[:, idx == i]`` boolean gather in HLVAE.py:284-453 becomes a
    static slice, so the whole forward pass is one fused XLA program.
  * Observation heads (HLVAE.py:11-102) are batched einsums over
    [B, n_raw, y_dim] blocks.
  * The missing-side theta pass (no_grad in HLVAE.py:435-445) is
    ``jax.lax.stop_gradient``.
  * Image tensors are NHWC (TPU-friendly); 36x36 Health-MNIST shape.

Parameters live in a flax.linen module; compute dtype is configurable
(float32 default; float64 available for CPU parity tests).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hlax.ops import convfuse as cf
from hlax.ops import likelihoods as lik
from hlax.ops.normalization import NormParams, batch_normalization
from hlax.types import TypeLayout

_INIT = nn.initializers.normal(stddev=0.05)   # reference init (HLVAE.py:132-133)


@dataclasses.dataclass(frozen=True)
class HLVAEConfig:
    layout: TypeLayout
    z_dim: int = 32
    h_dims: Tuple[int, ...] = (500,)
    y_dim: int = 5
    conv: bool = True
    logvar_network: bool = False
    vy_init_real: float = 1.0
    vy_init_pos: float = 0.5
    vy_fixed: bool = False
    image_side: int = 36
    dtype: object = jnp.float32
    # Lower the image stack as pool-fused patch matmuls (hlax.ops.convfuse)
    # instead of XLA's conv lowerings — exactly equivalent (same params,
    # summation reordered; tested values+grads).  OFF by default: the
    # round-4 claim that the patch-matmul form wins was a forward-only /
    # degraded-link artifact.  The round-5 value-fetch-synced full-model
    # A/B on the v5e measures fwd+bwd at 1.93 ms with the lax conv
    # lowerings vs 10.25 ms fused (the patch extraction's backward
    # scatter-adds dominate); per-stage isolation shows every fused stage
    # 2-3x slower on fwd+bwd (QUALITY.md round-5 table).  The fused path
    # stays available for forward-heavy eval graphs, where it is
    # competitive (fwd 1.32 vs 0.88 ms is conv+rep+heads; the conv share
    # is near-parity).
    fused_conv: bool = False
    # Selective mixed precision: when set (e.g. jnp.bfloat16), ONLY the
    # encoder/decoder conv+MLP stacks compute in this dtype — parameters,
    # masking/normalization, the mean/log_var layers (reparameterization),
    # and the observation heads (likelihood theta) all stay in ``dtype``.
    # This targets where the MXU FLOPs are while keeping every path the
    # full-bf16 quality A/B implicated (Gaussian-NLL variance calibration,
    # QUALITY.md) at full precision.  None = single-dtype model (default;
    # the all-bf16 ``dtype=bfloat16`` option also remains).
    compute_dtype: object = None

    @property
    def n_raw(self) -> int:
        return self.layout.n_raw

    @property
    def n_exp(self) -> int:
        return self.layout.n_exp


def _log_vy_init(vy: float) -> float:
    # log(vy - exp(min_log_vy)), HLVAE.py:208-209
    return math.log(vy - math.exp(lik.MIN_LOG_VY))


def _pool_2x2_fwd_only(h):
    B, H, W, C = h.shape
    return h.reshape(B, H // 2, 2, W // 2, 2, C).max(axis=(2, 4))


@jax.custom_vjp
def _max_pool_2x2(h):
    """2x2 stride-2 max pool via reshape + max (HLVAE.py:151 MaxPool2d(2,2)).

    Forward-identical to ``nn.max_pool(h, (2, 2), strides=(2, 2))`` for even
    spatial dims, but lowers to a plain max reduction instead of
    ``reduce_window`` — whose VJP emits a ``select_and_scatter`` HLO that the
    TPU x64 rewrite cannot legalize, blocking float64 conv training on the
    chip.

    Custom VJP: a single eq-mask select (``where(h == pooled, g, 0)``).
    jnp's reduce-max pullback adds a tie-count reduction + divide over the
    full pre-pool tensor — on the [B*T, 36, 36, 16] conv1 activation that
    second bandwidth-bound pass is ~30 us/step of the canonical program
    (measured on v5e, NOTES.md round-4).  Tie behavior differs only on
    exactly-tied window maxima (measure zero for continuous activations):
    this mask replicates the cotangent to every tied element where
    reduce-max splits it evenly and torch's MaxPool2d picks one winner."""
    return _pool_2x2_fwd_only(h)


def _pool_2x2_vjp_fwd(h):
    o = _pool_2x2_fwd_only(h)
    return o, (h, o)


def _pool_2x2_vjp_bwd(res, g):
    h, o = res
    B, H, W, C = h.shape
    hr = h.reshape(B, H // 2, 2, W // 2, 2, C)
    gb = jnp.where(hr == o[:, :, None, :, None, :],
                   g[:, :, None, :, None, :], 0).astype(h.dtype)
    return (gb.reshape(h.shape),)


_max_pool_2x2.defvjp(_pool_2x2_vjp_fwd, _pool_2x2_vjp_bwd)


class _ConvParams(nn.Module):
    """Parameter container with nn.Conv/nn.ConvTranspose's exact param tree
    (same names, shapes, and default initializers under the same scope ->
    bit-identical init draws and checkpoint compatibility); the parent
    applies the math via hlax.ops.convfuse — fused patch-matmul path or
    the exact lax lowering."""
    kshape: Tuple[int, int, int, int]   # [kh, kw, in_feat, out_feat]
    dtype: object

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 self.kshape, self.dtype)
        self.bias = self.param("bias", nn.initializers.zeros_init(),
                               (self.kshape[-1],), self.dtype)


class _MLP(nn.Module):
    features: Sequence[int]
    dtype: object                 # compute dtype (flax promotes inputs to it)
    param_dtype: object = None    # storage dtype; None = same as compute

    @nn.compact
    def __call__(self, x):
        pdt = self.param_dtype if self.param_dtype is not None else self.dtype
        for f in self.features:
            x = nn.Dense(f, kernel_init=_INIT, bias_init=_INIT,
                         dtype=self.dtype, param_dtype=pdt)(x)
            x = nn.relu(x)
        return x


class HLVAE(nn.Module):
    cfg: HLVAEConfig

    def setup(self):
        cfg = self.cfg
        lay = cfg.layout
        dt = cfg.dtype

        # --- encoder ---------------------------------------------------
        if cfg.conv:
            # one-to-one scalarization of cat/ordinal one-hot blocks
            # (Representation_One_Hot, HLVAE.py:91-102)
            rep_w, rep_b = {}, {}
            for gi, g in enumerate(lay.groups):
                if g.kind in ("cat", "ordinal"):
                    rep_w[str(gi)] = self.param(
                        f"rep_w_{gi}", _INIT, (g.n_vars, g.nclass), dt)
                    rep_b[str(gi)] = self.param(
                        f"rep_b_{gi}", _INIT, (g.n_vars,), dt)
            self._rep_w, self._rep_b = rep_w, rep_b
            self.conv1 = _ConvParams((3, 3, 1, 16), dt)
            self.conv2 = _ConvParams((3, 3, 16, 32), dt)
        cdt = cfg.compute_dtype if cfg.compute_dtype is not None else dt
        self.enc_mlp = _MLP(cfg.h_dims, cdt, param_dtype=dt)
        # mean/log_var stay full precision: they parameterize the
        # reparameterization draw and the KL (dtype=dt promotes the cdt
        # hidden activations back up inside the layer)
        self.mean_layer = nn.Dense(cfg.z_dim, kernel_init=_INIT, bias_init=_INIT,
                                   dtype=dt, param_dtype=dt)
        self.log_var_layer = nn.Dense(cfg.z_dim, kernel_init=_INIT, bias_init=_INIT,
                                      dtype=dt, param_dtype=dt)

        # --- decoder ---------------------------------------------------
        self.dec_mlp = _MLP(tuple(reversed(cfg.h_dims)), cdt, param_dtype=dt)
        feat = cfg.image_side // 4   # 36 -> 9 after two stride-2 pools
        y_out = 32 * feat * feat if cfg.conv else lay.n_raw * cfg.y_dim
        self.y_layer = nn.Dense(y_out, kernel_init=_INIT, bias_init=_INIT,
                                dtype=cdt, param_dtype=dt)
        if cfg.conv:
            self.deconv1 = _ConvParams((4, 4, 32, 16), dt)
            self.deconv2 = _ConvParams((4, 4, 16, cfg.y_dim), dt)

        # --- observation heads (HLVAE.py:11-102) -----------------------
        obs = {}
        for gi, g in enumerate(lay.groups):
            d = g.n_vars
            if g.kind == "count":
                obs[f"w_{gi}"] = self.param(f"obs_w_{gi}", _INIT, (d, cfg.y_dim, 1), dt)
                obs[f"b_{gi}"] = self.param(f"obs_b_{gi}", _INIT, (d, 1), dt)
            elif g.kind in ("real", "pos", "beta"):
                obs[f"w_{gi}"] = self.param(f"obs_w_{gi}", _INIT, (d, cfg.y_dim, 1), dt)
                obs[f"b_{gi}"] = self.param(f"obs_b_{gi}", _INIT, (d, 1), dt)
                if cfg.logvar_network and g.kind in ("real", "pos"):
                    obs[f"wv_{gi}"] = self.param(f"obs_wv_{gi}", _INIT,
                                                 (d, cfg.y_dim, 1), dt)
                    obs[f"bv_{gi}"] = self.param(f"obs_bv_{gi}", _INIT, (d, 1), dt)
            elif g.kind == "cat":
                obs[f"w_{gi}"] = self.param(f"obs_w_{gi}", _INIT,
                                            (d, cfg.y_dim, g.nclass - 1), dt)
                obs[f"b_{gi}"] = self.param(f"obs_b_{gi}", _INIT,
                                            (d, g.nclass - 1), dt)
            elif g.kind == "ordinal":
                obs[f"w_{gi}"] = self.param(f"obs_w_{gi}", _INIT, (d, cfg.y_dim, 1), dt)
                obs[f"b_{gi}"] = self.param(f"obs_b_{gi}", _INIT, (d, 1), dt)
                obs[f"th_{gi}"] = self.param(
                    f"obs_th_{gi}", nn.initializers.ones, (d, g.nclass - 1), dt)
        self._obs = obs

        # --- global observation-noise parameters (HLVAE.py:204-227) ----
        d_real = sum(g.n_vars for g in lay.groups if g.kind == "real")
        d_pos = sum(g.n_vars for g in lay.groups if g.kind == "pos")
        if not cfg.logvar_network:
            if d_real:
                self.log_vy_real = self.param(
                    "log_vy_real",
                    lambda k, s, d: jnp.full(s, _log_vy_init(cfg.vy_init_real), d),
                    (d_real,), dt)
            if d_pos:
                self.log_vy_pos = self.param(
                    "log_vy_pos",
                    lambda k, s, d: jnp.full(s, _log_vy_init(cfg.vy_init_pos), d),
                    (d_pos,), dt)
        self.disp_param = self.param(
            "disp_param", lambda k, s, d: jnp.ones(s, d), (1,), dt)

    # ------------------------------------------------------------------
    # encoder
    # ------------------------------------------------------------------

    def encode(self, data, mask, norm_data=None, norm_params=None):
        """data [B, n_exp] grouped, mask [B, n_raw] grouped -> (mu, log_var)."""
        cfg = self.cfg
        lay = cfg.layout
        if norm_data is None:
            norm_data, norm_params = batch_normalization(data, mask, lay, cfg.conv)

        if cfg.conv:
            # scalarize to one channel per raw variable (HLVAE.py:293-304)
            blocks = []
            for gi, g in enumerate(lay.groups):
                x_g = norm_data[:, g.exp_slice[0]:g.exp_slice[1]]
                m_g = mask[:, g.raw_slice[0]:g.raw_slice[1]]
                if g.kind in ("cat", "ordinal"):
                    x3 = x_g.reshape(x_g.shape[0], g.n_vars, g.nclass)
                    rep = jnp.einsum("bdc,dc->bd", x3, self._rep_w[str(gi)])
                    rep = rep + self._rep_b[str(gi)]
                else:
                    rep = x_g
                blocks.append(rep * m_g)
            one_to_one = jnp.concatenate(blocks, axis=1)   # [B, n_raw] grouped
            # un-permute to original pixel order for the spatial conv
            img = one_to_one[:, jnp.asarray(lay.raw_inv)]
            s = cfg.image_side
            img = img.reshape(-1, s, s, 1)
            cdt = cfg.compute_dtype if cfg.compute_dtype is not None else cfg.dtype
            img = img.astype(cdt)
            k1, b1 = self.conv1.kernel.astype(cdt), self.conv1.bias.astype(cdt)
            k2, b2 = self.conv2.kernel.astype(cdt), self.conv2.bias.astype(cdt)
            if cfg.fused_conv:
                h = cf.conv_pool_fused(img, k1, b1)
                h = cf.conv_pool_fused(h, k2, b2)
            else:
                h = nn.relu(cf.conv3x3_same(img, k1, b1))
                h = _max_pool_2x2(h)
                h = nn.relu(cf.conv3x3_same(h, k2, b2))
                h = _max_pool_2x2(h)
            enc_in = h.reshape(h.shape[0], -1)
        else:
            enc_in = norm_data

        hidden = self.enc_mlp(enc_in)
        mu = self.mean_layer(hidden)
        log_var = jnp.clip(self.log_var_layer(hidden), -15.0, 15.0)
        return mu, log_var

    # ------------------------------------------------------------------
    # decoder
    # ------------------------------------------------------------------

    def decode_y(self, z):
        """z [B, z_dim] -> per-variable features y [B, n_raw, y_dim] (grouped)."""
        cfg = self.cfg
        h = self.dec_mlp(z)
        y = self.y_layer(h)
        if cfg.conv:
            cdt = cfg.compute_dtype if cfg.compute_dtype is not None else cfg.dtype
            k1, b1 = self.deconv1.kernel.astype(cdt), self.deconv1.bias.astype(cdt)
            k2, b2 = self.deconv2.kernel.astype(cdt), self.deconv2.bias.astype(cdt)
            feat = cfg.image_side // 4
            y = y.reshape(-1, feat, feat, 32)
            if cfg.fused_conv:
                y = nn.relu(cf.conv_transpose_fused(y, k1, b1))
                y = cf.conv_transpose_fused(y, k2, b2)
            else:
                y = nn.relu(cf.conv_transpose4x4_s2(y, k1, b1))
                y = cf.conv_transpose4x4_s2(y, k2, b2)           # [B,36,36,y]
            # heads/likelihood theta stay full precision from here on
            y = y.astype(cfg.dtype)
            y = y.reshape(y.shape[0], -1, cfg.y_dim)   # original pixel order
            y = y[:, jnp.asarray(cfg.layout.raw_perm), :]   # -> grouped order
        else:
            y = y.astype(cfg.dtype)
            y = y.reshape(y.shape[0], cfg.layout.n_raw, cfg.y_dim)
        return y

    def _head(self, gi, g, y_g):
        """Apply observation head of group ``gi`` to y_g [B, d, y_dim]."""
        cfg = self.cfg
        obs = self._obs
        if g.kind == "cat":
            th = jnp.einsum("bdy,dyc->bdc", y_g, obs[f"w_{gi}"]) + obs[f"b_{gi}"]
            zeros = jnp.zeros(th.shape[:2] + (1,), th.dtype)
            th = jnp.concatenate([zeros, th], axis=-1)       # pin class 0
            return th.reshape(th.shape[0], -1)
        if g.kind == "ordinal":
            mean = jnp.einsum("bdy,dya->bda", y_g, obs[f"w_{gi}"]) + obs[f"b_{gi}"]
            thr = jnp.broadcast_to(obs[f"th_{gi}"],
                                   (y_g.shape[0],) + obs[f"th_{gi}"].shape)
            th = jnp.concatenate([thr, mean], axis=-1)        # [B, d, c]
            return th.reshape(th.shape[0], -1)
        # count / real / pos / beta: mean head [B, d]
        mean = (jnp.einsum("bdy,dya->bda", y_g, obs[f"w_{gi}"])
                + obs[f"b_{gi}"])[..., 0]
        if g.kind == "real" and cfg.conv:
            mean = jax.nn.sigmoid(mean)   # conv-real sigmoid (HLVAE.py:271-273)
        if cfg.logvar_network and g.kind in ("real", "pos"):
            logv = (jnp.einsum("bdy,dya->bda", y_g, obs[f"wv_{gi}"])
                    + obs[f"bv_{gi}"])[..., 0]
            return jnp.concatenate([mean, logv], axis=-1)     # [means, logvars]
        return mean

    def theta_estimation(self, y, mask, theta_mask):
        """Route observed/missing features through heads (HLVAE.py:416-453).

        The reference evaluates each head twice — on y*mask (with gradients)
        and on y*(1-mask) under no_grad — and merges by param_mask.  Because
        every head is per-variable affine and theta_mask is the per-variable
        mask broadcast to theta columns, the merged result equals a SINGLE
        head evaluation h = head(y) with the gradient gated by the mask:

            theta = stop_gradient(h) + theta_mask * (h - stop_gradient(h))

        (identical values and identical parameter gradients; halves the
        decoder-head FLOPs — verified in tests/test_model.py)."""
        lay = self.cfg.layout
        blocks = []
        for gi, g in enumerate(lay.groups):
            sl = slice(g.raw_slice[0], g.raw_slice[1])
            h = self._head(gi, g, y[:, sl, :])
            hs = jax.lax.stop_gradient(h)
            pm = theta_mask[:, g.theta_slice[0]:g.theta_slice[1]]
            blocks.append(hs + pm * (h - hs))
        return jnp.concatenate(blocks, axis=1)   # [B, n_theta] grouped

    def loglik(self, theta, data, mask, norm_params: NormParams):
        """Dispatch per-type likelihoods (HLVAE.py:381-414). Returns
        (log_p_x [B,n_raw], log_p_x_missing [B,n_raw], params list)."""
        cfg = self.cfg
        lay = cfg.layout
        lp_blocks, lpm_blocks, params = [], [], []
        for gi, g in enumerate(lay.groups):
            d_blk = data[:, g.exp_slice[0]:g.exp_slice[1]]
            m_blk = mask[:, g.raw_slice[0]:g.raw_slice[1]]
            t_blk = theta[:, g.theta_slice[0]:g.theta_slice[1]]
            if g.kind == "real":
                if cfg.conv:
                    d_blk = d_blk / 255.0
                extra = None if cfg.logvar_network else self.log_vy_real
                if extra is not None and cfg.vy_fixed:   # HLVAE.py:218-220
                    extra = jax.lax.stop_gradient(extra)
                out = lik.loglik_real(d_blk, m_blk, t_blk,
                                      norm_params.real_mean, norm_params.real_var,
                                      extra, cfg.conv)
            elif g.kind == "pos":
                extra = None if cfg.logvar_network else self.log_vy_pos
                if extra is not None and cfg.vy_fixed:
                    extra = jax.lax.stop_gradient(extra)
                out = lik.loglik_pos(d_blk, m_blk, t_blk,
                                     norm_params.pos_mean_log,
                                     norm_params.pos_var_log, extra)
            elif g.kind == "cat":
                out = lik.loglik_cat(d_blk, m_blk, t_blk, g.nclass)
            elif g.kind == "ordinal":
                out = lik.loglik_ordinal(d_blk, m_blk, t_blk, g.nclass)
            elif g.kind == "count":
                out = lik.loglik_count(d_blk, m_blk, t_blk)
            else:   # beta
                ranges = jnp.asarray(np.array(lay.beta_ranges), theta.dtype)
                out = lik.loglik_beta(d_blk, m_blk, t_blk, ranges, self.disp_param)
            lp_blocks.append(out["log_p_x"])
            lpm_blocks.append(out["log_p_x_missing"])
            params.append(out["params"])
        return (jnp.concatenate(lp_blocks, axis=1),
                jnp.concatenate(lpm_blocks, axis=1), params)

    def decode(self, z, data, mask, theta_mask, norm_params):
        y = self.decode_y(z)
        theta = self.theta_estimation(y, mask, theta_mask)
        log_p_x, log_p_x_missing, params = self.loglik(theta, data, mask, norm_params)
        return log_p_x, log_p_x_missing, params, theta

    # ------------------------------------------------------------------

    def __call__(self, data, mask, theta_mask, rng, sample: bool = True):
        """Full forward pass (HLVAE.forward, HLVAE.py:364-375)."""
        norm_data, norm_params = batch_normalization(
            data, mask, self.cfg.layout, self.cfg.conv)
        mu, log_var = self.encode(data, mask, norm_data, norm_params)
        if sample:
            eps = jax.random.normal(rng, mu.shape, mu.dtype)
            z = mu + eps * jnp.exp(0.5 * log_var)
        else:
            z = mu
        log_p_x, log_p_x_missing, params, theta = self.decode(
            z, data, mask, theta_mask, norm_params)
        return {
            "mu": mu, "log_var": log_var, "z": z,
            "log_p_x": log_p_x, "log_p_x_missing": log_p_x_missing,
            "params": params, "theta": theta,
        }


def nll_from_log_p(log_p_x):
    """Reference loss_function (HLVAE.py:377-379): -sum over columns."""
    return -jnp.sum(log_p_x, axis=1)
