"""MXU-shaped fused conv ops for the HLVAE image path.

The reference conv stack (/root/reference/HLVAE.py:140-160) is two
3x3 convs with 1->16->32 channels + 2x2 max pools, and two 4x4
stride-2 transposed convs (32->16->5).  Lowered naively, every one of
these ops contracts over <=144 elements — the 128x128 MXU runs almost
empty and the step is op-boundary latency-bound (round-3 profile:
VAE fwd+bwd 2.0 ms of a 4.0 ms step).

This module reformulates each stage as ONE patch matmul with an
MXU-friendly contraction, exactly equivalent (same parameters, same
math, summation reordered):

  * ``conv_pool_fused``: conv3x3-SAME + bias + relu + maxpool2x2 as a
    single stride-2 4x4-patch extraction -> matmul
    ``[B*S/2*S/2, 16C] @ [16C, 4O]`` -> relu -> max over the 4 in-window
    positions.  The 2x2 pool window's receptive field is a 4x4 input
    patch; the weight ``W[(r,s,c),(u,v,o)] = k[r-u, s-v, c, o]``
    evaluates all four conv outputs of the window from that one patch.
  * ``conv_transpose_fused``: ConvTranspose-4x4-stride2-SAME + bias as a
    3x3-patch extraction -> matmul ``[B*H*W, 9C] @ [9C, 4O]`` ->
    depth-to-space.  Each output phase (u,v) of a stride-2 transposed
    conv is a small conv over the un-dilated input with the kernel
    subsampled at ``k[2r-u, 2s-v]`` (fractionally-strided-conv identity).

Both also make the backward pass plain matmuls (transposed-weight GEMMs)
instead of XLA's conv-grad lowerings, which suffer the same tiny-channel
padding.  Equivalence vs the lax/flax lowerings is tested to f32/f64
rounding in tests/test_convfuse.py, values and gradients.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def conv3x3_same(x: jnp.ndarray, kernel: jnp.ndarray,
                 bias: jnp.ndarray) -> jnp.ndarray:
    """Reference lowering: exactly ``flax.linen.Conv(O, (3,3), SAME)``."""
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


def conv_transpose4x4_s2(x: jnp.ndarray, kernel: jnp.ndarray,
                         bias: jnp.ndarray) -> jnp.ndarray:
    """Reference lowering: ``flax.linen.ConvTranspose(O, (4,4), (2,2), SAME)``
    (= lhs-dilated conv, pad 2, no kernel flip — verified vs flax)."""
    y = jax.lax.conv_transpose(
        x, kernel, (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


@jax.custom_vjp
def _relu_max_uv(y: jnp.ndarray) -> jnp.ndarray:
    """max over the (u, v) window axes of relu(y), y [..., 2, 2, O].

    Custom VJP: one eq-mask select (grad replicated to ties — same
    measure-zero deviation as hlvae._max_pool_2x2, which torch's
    MaxPool2d resolves by picking a single winner) instead of XLA's
    tie-count + divide second pass over the pre-pool tensor."""
    return jnp.max(jax.nn.relu(y), axis=(-3, -2))


def _relu_max_uv_fwd(y):
    o = _relu_max_uv(y)
    return o, (y, o)


def _relu_max_uv_bwd(res, g):
    y, o = res
    ob = o[..., None, None, :]
    gb = g[..., None, None, :]
    return (jnp.where((y > 0) & (y == ob), gb, 0).astype(y.dtype),)


_relu_max_uv.defvjp(_relu_max_uv_fwd, _relu_max_uv_bwd)


def _patches(xp: jnp.ndarray, offs: int, size: int,
             stride: int) -> jnp.ndarray:
    """[B, Hp, Wp, C] padded input -> [B, size, size, offs*offs*C]:
    channel block (r, s) is window element (r, s) of the ``offs x offs``
    window starting at (stride*p, stride*q) — r slowest, then s, then C."""
    rows = []
    for r in range(offs):
        for s in range(offs):
            rows.append(jax.lax.slice(
                xp, (0, r, s, 0),
                (xp.shape[0], r + 1 + stride * (size - 1),
                 s + 1 + stride * (size - 1), xp.shape[3]),
                (1, stride, stride, 1)))
    return jnp.concatenate(rows, axis=-1)


def conv_pool_fused(x: jnp.ndarray, kernel: jnp.ndarray,
                    bias: jnp.ndarray) -> jnp.ndarray:
    """relu(conv3x3_same(x, k, b)) -> 2x2/2 maxpool, as one patch matmul.

    x [B, S, S, C] (S even), kernel [3, 3, C, O] -> [B, S//2, S//2, O].
    """
    B, S, _, C = x.shape
    O = kernel.shape[-1]
    half = S // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    p = _patches(xp, 4, half, 2)                      # [B, S/2, S/2, 16C]

    # W[(r,s,c), (u,v,o)] = kernel[r-u, s-v, c, o] (zero outside 0..2):
    # pad u zeros before the rows / v before the cols.
    w_uv = [jnp.pad(kernel, ((u, 1 - u), (v, 1 - v), (0, 0), (0, 0)))
            for u in (0, 1) for v in (0, 1)]          # each [4, 4, C, O]
    w = jnp.stack(w_uv, axis=-2)                      # [4, 4, C, 4(uv), O]
    w = w.reshape(16 * C, 4 * O)

    y = p.reshape(B * half * half, 16 * C) @ w
    y = y.reshape(B, half, half, 2, 2, O) + bias
    return _relu_max_uv(y)


def conv_transpose_fused(x: jnp.ndarray, kernel: jnp.ndarray,
                         bias: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose 4x4 stride-2 SAME + bias as patch matmul + d2s.

    x [B, H, W, C], kernel [4, 4, C, O] -> [B, 2H, 2W, O].
    out[2m+u, 2n+v, o] = sum_{r,s in 0..2} x[m-1+r, n-1+s] * k[2r-u, 2s-v]
    (taps outside 0..3 are zero).
    """
    B, H, W, C = x.shape
    O = kernel.shape[-1]
    assert H == W, "square images only (36x36 Health-MNIST path)"
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    p = _patches(xp, 3, H, 1)                         # [B, H, W, 9C]

    # kext[i] = kernel[i-1] for i in 1..4, zero at 0/5/6: index 2r-u+1.
    kext = jnp.pad(kernel, ((1, 2), (1, 2), (0, 0), (0, 0)))
    w_uv = [kext[jnp.array([1 - u, 3 - u, 5 - u])][:, jnp.array([1 - v, 3 - v, 5 - v])]
            for u in (0, 1) for v in (0, 1)]          # each [3, 3, C, O]
    w = jnp.stack(w_uv, axis=-2).reshape(9 * C, 4 * O)

    y = p.reshape(B * H * W, 9 * C) @ w
    y = y.reshape(B, H, W, 2, 2, O) + bias            # [..., u, v, O]
    y = y.transpose(0, 1, 3, 2, 4, 5)                 # [B, H, 2, W, 2, O]
    return y.reshape(B, 2 * H, 2 * W, O)
