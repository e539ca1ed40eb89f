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


def msra(key, shape, fan_in: int | None = None, dtype=jnp.float32):
    """MSRAFiller (filler.hpp): normal(0, sqrt(2 / fan_in)), default FAN_IN
    variance norm (fan_in = count / num, like Xavier)."""
    if fan_in is None:
        size = 1
        for d in shape[1:]:
            size *= d
        fan_in = size
    std = (2.0 / float(fan_in)) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


def positive_unitball(key, shape, dtype=jnp.float32):
    """PositiveUnitballFiller (filler.hpp): uniform(0, 1) rows normalized so
    each leading-axis slice sums to 1."""
    x = jax.random.uniform(key, shape, dtype)
    flat = x.reshape(shape[0], -1)
    flat = flat / jnp.sum(flat, axis=1, keepdims=True)
    return flat.reshape(shape)


def bilinear(shape, dtype=jnp.float32):
    """BilinearFiller (filler.hpp): the upsampling kernel for Deconvolution
    layers -- f(x, y) independent per (out, in) pair over a (Cout, Cin, kh,
    kw) (or HWIO) 4-D blob.  Shape is interpreted as (..., kh, kw) with the
    kernel written into every leading slice."""
    kh, kw = shape[-2], shape[-1]

    def kern(k):
        f = (k + 1) // 2
        c = (2 * f - 1 - f % 2) / (2.0 * f)
        i = jnp.arange(k, dtype=dtype)
        return 1.0 - jnp.abs(i / f - c)

    k2d = kern(kh)[:, None] * kern(kw)[None, :]
    return jnp.broadcast_to(k2d, shape).astype(dtype)
