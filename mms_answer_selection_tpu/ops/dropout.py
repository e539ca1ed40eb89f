"""Inverted dropout (reference: src/caffe/layers/dropout_layer.cpp --
bernoulli mask scaled by 1/(1-ratio) at train time, identity at test)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout(key, x, ratio: float, *, train: bool):
    if not train or ratio <= 0.0:
        return x
    keep = 1.0 - ratio
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
