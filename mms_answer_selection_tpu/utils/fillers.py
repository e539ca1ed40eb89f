"""Parameter initializers matching the reference framework's fillers.

The reference initializes weights through a string-typed ``Filler`` registry
(reference: include/caffe/filler.hpp).  The recipes in
examples/trec_qa_w2v_mms/do_trec_qa_clean.py use:

* ``xavier``  -- uniform(-s, s) with s = sqrt(3 / fan_in)
  (filler.hpp:XavierFiller, default FAN_IN variance norm)
* ``uniform`` -- uniform(min, max)
* ``constant``-- constant value (this is the *default* filler, so layers
  whose recipes never set a filler -- notably the SimCross bilinear metric
  matrices (do_trec_qa_clean.py:468) -- start at exactly zero)
* ``gaussian``-- normal(mean, std)

These are plain functions of an explicit PRNG key: idiomatic JAX, no global
RNG state (the reference's ``Caffe::set_random_seed`` global maps to the key
threading done by callers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def xavier(key, shape, fan_in: int | None = None, dtype=jnp.float32):
    """Caffe-style Xavier: uniform(-s, s), s = sqrt(3 / fan_in).

    ``fan_in`` defaults to count / shape[0], matching the reference
    (filler.hpp XavierFiller: fan_in = blob->count() / blob->num()).
    """
    if fan_in is None:
        size = 1
        for d in shape[1:]:
            size *= d
        fan_in = size
    scale = (3.0 / float(fan_in)) ** 0.5
    return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)


def uniform(key, shape, minval: float, maxval: float, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=minval, maxval=maxval)


def gaussian(key, shape, mean: float = 0.0, std: float = 1.0, dtype=jnp.float32):
    return mean + std * jax.random.normal(key, shape, dtype)


def constant(shape, value: float = 0.0, dtype=jnp.float32):
    return jnp.full(shape, value, dtype)
