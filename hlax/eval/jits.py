"""Cached jitted model entry points for the eval paths.

The eval battery (validate / hlvae_test / mse_test_gp) calls the model many
times outside the training step.  Naively re-wrapping ``model.apply`` per
call would either re-trace every time (new closure objects) or run eagerly
(thousands of op dispatches — disastrous through a remote-device tunnel).
This module keeps ONE jitted closure per (model, entry point).

Keys are ``(id(model), name)``, which is safe here because the cached
closure itself holds a strong reference to the model: an id cannot be reused
while its entry is cached.  A finalizer evicts the entries if the cache's
reference is ever the last one dropped (belt and braces against stale
closures after GC id reuse).
"""

from __future__ import annotations

import weakref
from typing import Callable, Dict, Tuple

import jax

_CACHE: Dict[Tuple[int, str], Callable] = {}


def _evict(key: Tuple[int, str]) -> None:
    _CACHE.pop(key, None)


def _get(model, name: str, builder: Callable[[], Callable],
         **jit_kwargs) -> Callable:
    key = (id(model), name)
    fn = _CACHE.get(key)
    if fn is None:
        fn = jax.jit(builder(), **jit_kwargs)
        _CACHE[key] = fn
        try:
            weakref.finalize(model, _evict, key)
        except TypeError:   # non-weakref-able model objects
            pass
    return fn


def encode_fn(model):
    """(vae, data, mask) -> (mu, log_var); normalization computed in-chunk."""
    return _get(model, "encode", lambda: (
        lambda vae, data, mask: model.apply(
            vae, data, mask, None, None,
            method=lambda mdl, d, m, *_: mdl.encode(d, m))))


def forward_fn(model):
    """(vae, data, mask, theta_mask, rng, sample) -> full output dict."""
    def build():
        def f(vae, data, mask, tmask, rng, sample):
            return model.apply(vae, data, mask, tmask, rng, sample=sample)
        return f
    return _get(model, "forward", build, static_argnums=(5,))


def decode_fn(model):
    """(vae, z, data, mask, theta_mask, norm_params) -> (lp, lpm, params, theta)."""
    return _get(model, "decode", lambda: (
        lambda vae, z, data, mask, tmask, norm_params: model.apply(
            vae, z, data, mask, tmask, norm_params,
            method=lambda mdl, z_, d, m, tm, npm: mdl.decode(z_, d, m, tm, npm))))
