"""Token saliency: gradient magnitudes of the loss w.r.t. embeddings.

Reference: ``test_networks_single`` (do_trec_qa_clean.py:654-779) backprops
the trained net to the embedding outputs and plots per-token |gradient|
heatmaps as saliency.png.  Here the same quantity is one ``jax.grad`` call
against the embedding activations (no net surgery needed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.mms_qa import MMSQAConfig, mms_qa_apply
from ..ops.embed import embed_lookup


def token_saliency(params, state, batch, cfg: MMSQAConfig):
    """Returns (q_saliency (N, W1), a_saliency (N, W2)): per-token summed
    |d loss / d embedding| -- the np.sum(np.fabs(diff), 1) of the reference
    (do_trec_qa_clean.py:773).  Differentiates through the REAL model
    (mms_qa_apply with explicit embedding activations), so any architecture
    change is saliency-visible automatically."""

    def loss_from_embeddings(q_emb, a_emb):
        out, _ = mms_qa_apply(params, state, batch, cfg, train=False,
                              q_emb=q_emb, a_emb=a_emb)
        return out["loss"]

    q_emb = embed_lookup(params["embed"], batch["question"])
    a_emb = embed_lookup(params["embed"], batch["answer"])
    gq, ga = jax.grad(loss_from_embeddings, argnums=(0, 1))(q_emb, a_emb)
    return (np.asarray(jnp.sum(jnp.abs(gq), axis=-1)),
            np.asarray(jnp.sum(jnp.abs(ga), axis=-1)))


def save_saliency_png(path, q_sal, a_sal):
    """saliency.png analogue (two stacked gray heatmaps)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # noqa: BLE001 - plotting is optional
        return False
    fig, (ax1, ax2) = plt.subplots(2, 1)
    ax1.imshow(np.atleast_2d(q_sal), cmap="gray_r", aspect="auto")
    ax1.set_ylabel("question")
    ax2.imshow(np.atleast_2d(a_sal), cmap="gray_r", aspect="auto")
    ax2.set_ylabel("answer")
    fig.savefig(path)
    plt.close(fig)
    return True
