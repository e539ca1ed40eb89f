"""Trainable batch norm matching the reference's custom "BN" layer.

Reference: src/caffe/layers/bn_layer.cpp (declared as BNLayer in
include/caffe/layers/batch_norm_v0_layer.hpp) -- distinct from stock Caffe
BatchNorm.  Semantics to reproduce exactly (they differ from modern BN and
matter for reproducing the published MAP, see SURVEY.md hard-part (b)):

* per-channel statistics over batch and spatial dims (cpp:139-158)
* biased variance  var = E[x^2] - (E[x])^2  (cpp:160-164)
* eps = 1e-9 added to the *variance* before sqrt (cpp:63, 211-215)
* running stats updated during the *training forward*:
      running = (1 - m) * batch + m * running,  m = bn_memory = 0.9
  (cpp:64, 166-171; proto caffe.proto:485)
* train uses batch stats, eval uses running stats (cpp:131-191)
* learned per-channel scale (gamma) and shift (beta); the QA recipe fills
  scale = 1 and shift = 1e-3 (do_trec_qa_clean.py:357)
* running stats have lr_mult = 0 (do_trec_qa_clean.py:358-359): they are
  optimizer-invisible, which here is expressed by keeping them in a separate
  ``state`` pytree rather than in ``params``.

Functional form: ``bn_apply`` returns (y, new_state); callers thread state
through the step function (the JAX-native replacement for the reference's
mutation of blobs_[2]/blobs_[3] inside Forward).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

VAR_EPS = 1e-9  # reference bn_layer.cpp:63
DEFAULT_MOMENTUM = 0.9  # reference caffe.proto:485 (bn_memory)


def bn_init(channels: int, *, scale_value: float = 1.0, shift_value: float = 1e-3,
            dtype=jnp.float32):
    """Returns (params, state) for one BN layer.

    Defaults follow the QA recipe fillers: scale=1, shift=1e-3
    (do_trec_qa_clean.py:357); running mean/var start at 0 (bn_layer.cpp:109-116).
    """
    params = {
        "scale": jnp.full((channels,), scale_value, dtype),
        "shift": jnp.full((channels,), shift_value, dtype),
    }
    state = {
        "mean": jnp.zeros((channels,), dtype),
        "var": jnp.zeros((channels,), dtype),
    }
    return params, state


def bn_apply(params, state, x, *, train: bool, momentum: float = DEFAULT_MOMENTUM,
             eps: float = VAR_EPS):
    """Apply BN over an NHWC (or N...C) tensor; stats per trailing channel.

    Returns (y, new_state).  In eval mode new_state is state unchanged.
    """
    reduce_axes = tuple(range(x.ndim - 1))
    if train:
        mu = jnp.mean(x, axis=reduce_axes)
        # biased variance via E[x^2] - (E[x])^2, as the reference computes it
        var = jnp.mean(x * x, axis=reduce_axes) - mu * mu
        new_state = {
            "mean": (1.0 - momentum) * jax.lax.stop_gradient(mu) + momentum * state["mean"],
            "var": (1.0 - momentum) * jax.lax.stop_gradient(var) + momentum * state["var"],
        }
    else:
        mu, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mu) * (inv * params["scale"]) + params["shift"]
    return y, new_state
