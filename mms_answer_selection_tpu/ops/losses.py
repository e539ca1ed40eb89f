"""Loss functions matching the reference layer semantics.

Each function returns a scalar loss; gradients come from autodiff and agree
with the reference's hand-written Backward passes (verified by the
finite-difference tests, mirroring the reference's GradientChecker
methodology -- include/caffe/test/test_gradient_check_util.hpp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def softmax_cross_entropy(logits, labels, *, ignore_label: int | None = None):
    """SoftmaxWithLoss: mean CE over valid samples.

    logits: (N, C), labels: int (N,).  Matches
    src/caffe/layers/softmax_loss_layer.cpp with the default VALID
    normalization (sum over non-ignored / count of non-ignored) and the
    FLT_MIN probability clamp.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    per = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]
    # -log(max(prob, FLT_MIN)) — softmax_loss_layer.cpp:107 caps the
    # per-sample FORWARD loss at ~87.34 when the correct class
    # underflows, but the reference's backward stays the analytic
    # prob - label (softmax_loss_layer.cpp:122-133) — so the cap is
    # straight-through: differentiating the capped value directly would
    # zero the gradient exactly where training most needs it (saturated
    # logits)
    cap = -jnp.log(jnp.float32(np.finfo(np.float32).tiny))
    per = per - jax.lax.stop_gradient(per - jnp.minimum(per, cap))
    if ignore_label is not None:
        valid = (labels != ignore_label).astype(logits.dtype)
        return jnp.sum(per * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.mean(per)


def pair_rank_loss(a, b, label, *, margin: float = 1.0):
    """Margin ranking + similarity hinge over paired scores.

    loss = mean_i[ max(0, margin - label_i * (a_i - b_i))
                   + |(1 - label_i) * (a_i - b_i)| ]

    Reference: src/caffe/layers/pair_rank_loss_layer.cpp:26-52 (forward;
    margin default 1.0 per caffe.proto:480), 55-83 (subgradient backward,
    which autodiff of this expression reproduces including the sign
    conventions at the kinks).
    """
    diff = a - b
    ordered = jnp.maximum(0.0, margin - label * diff)
    similar = jnp.abs((1.0 - label) * diff)
    return jnp.mean(ordered + similar)


def sigmoid_cross_entropy(logits, targets):
    """SigmoidCrossEntropyLoss: sum over features, mean over batch
    (src/caffe/layers/sigmoid_cross_entropy_loss_layer.cpp)."""
    per = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return jnp.sum(per) / logits.shape[0]


def euclidean_loss(a, b):
    """EuclideanLoss: sum((a-b)^2) / (2N)
    (src/caffe/layers/euclidean_loss_layer.cpp)."""
    d = a - b
    return jnp.sum(d * d) / (2.0 * a.shape[0])


def hinge_loss(scores, labels, *, norm: str = "L1"):
    """HingeLoss over (N, C) scores with int labels
    (src/caffe/layers/hinge_loss_layer.cpp): margins are
    max(0, 1 + s_c - s_y) summed with the correct-class sign flip."""
    n, c = scores.shape
    sign = jnp.where(jax.nn.one_hot(labels, c, dtype=scores.dtype) > 0, -1.0, 1.0)
    margins = jnp.maximum(0.0, 1.0 + sign * scores)
    if norm == "L2":
        return jnp.sum(margins * margins) / n
    return jnp.sum(margins) / n


_KLOG_THRESHOLD = 1e-20  # include/caffe/layers/loss_layer.hpp:12


def multinomial_logistic_loss(probs, labels):
    """MultinomialLogisticLoss: -mean_i log(max(p[i, y_i], 1e-20)) over
    PROBABILITY inputs (the pre-softmax-fused CE of
    src/caffe/layers/multinomial_logistic_loss_layer.cpp:20-34; its
    backward -1/(N*p) is autodiff of this expression through the clamp)."""
    p = jnp.take_along_axis(probs, labels[:, None].astype(jnp.int32),
                            axis=-1)[:, 0]
    return -jnp.mean(jnp.log(jnp.maximum(p, _KLOG_THRESHOLD)))


def infogain_loss(probs, labels, infogain):
    """InfogainLoss: -mean_i sum_j H[y_i, j] * log(max(p[i, j], 1e-20))
    with an arbitrary (C, C) information-gain matrix H -- H = identity
    reduces to multinomial_logistic_loss
    (src/caffe/layers/infogain_loss_layer.cpp:47-68; backward :70-103)."""
    h_rows = infogain[labels.astype(jnp.int32)]          # (N, C)
    logp = jnp.log(jnp.maximum(probs, _KLOG_THRESHOLD))
    return -jnp.mean(jnp.sum(h_rows * logp, axis=-1))


def contrastive_loss(a, b, y, *, margin: float = 1.0, legacy: bool = False):
    """ContrastiveLoss (src/caffe/layers/contrastive_loss_layer.cpp):
    similar pairs (y=1) pull by squared distance, dissimilar push to margin.
    Non-legacy uses max(margin - d, 0)^2 as in the reference default."""
    d2 = jnp.sum((a - b) ** 2, axis=1)
    if legacy:
        push = jnp.maximum(margin - d2, 0.0)
    else:
        d = jnp.sqrt(jnp.maximum(d2, 1e-12))
        push = jnp.maximum(margin - d, 0.0) ** 2
    per = y * d2 + (1.0 - y) * push
    return jnp.sum(per) / (2.0 * a.shape[0])
