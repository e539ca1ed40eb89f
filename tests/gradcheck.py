"""Central finite-difference gradient checker.

Methodology mirrors the reference's GradientChecker
(include/caffe/test/test_gradient_check_util.hpp:18-262): perturb each input
element by +/-h, compare (f(x+h)-f(x-h))/2h against the analytic gradient
with a relative-or-absolute threshold, and allow "kink" exclusion zones for
non-smooth ops.  Here the analytic side is jax.grad rather than a
hand-written Backward, so the check validates that our op formulations
produce the gradients the reference's hand-written kernels encode.

Unlike the reference's element-at-a-time C++ loop, the perturbation sweep is
a single vmapped+jitted batch evaluation per argument -- the JAX-native way
to run thousands of forward passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def check_grad(fn, args, *, argnums=None, h=1e-3, tol=1e-2, kink_fn=None):
    """fn(*args) -> scalar.  Checks jax.grad against central differences.

    argnums: which positional args to check (default: all float args).
    kink_fn: optional fn(args, argnum, flat_index) -> bool; True skips the
    element (near a non-differentiable kink, reference util:174-188).
    """
    args = [jnp.asarray(a) for a in args]
    if argnums is None:
        argnums = [i for i, a in enumerate(args)
                   if jnp.issubdtype(a.dtype, jnp.floating)]
    grads = jax.jit(jax.grad(fn, argnums=tuple(argnums)))(*args)
    for gi, argnum in enumerate(argnums):
        a = args[argnum]
        shape, dtype = a.shape, a.dtype
        flat = jnp.ravel(a)
        k = flat.size

        def eval_at(v):
            new_args = list(args)
            new_args[argnum] = jnp.reshape(v, shape).astype(dtype)
            return fn(*new_args)

        eye = jnp.eye(k, dtype=flat.dtype) * jnp.asarray(h, flat.dtype)
        fp = jax.jit(jax.vmap(eval_at))(flat[None, :] + eye)
        fm = jax.jit(jax.vmap(eval_at))(flat[None, :] - eye)
        fd = np.asarray((fp - fm) / (2 * h), np.float64)
        an = np.asarray(grads[gi], np.float64).ravel()
        for idx in range(k):
            if kink_fn is not None and kink_fn(args, argnum, idx):
                continue
            scale = max(abs(fd[idx]), abs(an[idx]), 1.0)
            assert abs(fd[idx] - an[idx]) <= tol * scale, (
                f"arg {argnum} elem {idx}: finite-diff {fd[idx]} "
                f"vs analytic {an[idx]}")
