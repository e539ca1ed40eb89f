"""Caption-to-image ranking: the multimodal text×image metric
(BASELINE.json configs[4]).

The reference's multimodal side is image-pair metric learning
(PairImageData + PairRankLoss).  This model completes the cross-modal
config: a CNN encodes an image into PATCH embeddings living in the same
D-dim space as word embeddings, and the learned bilinear metric scores a
caption against an image as

    score(caption, image) = Σ_m Σ_i max_p  t_i^T W_m v_p

-- exactly the SimCross-mode-2 + MaxSim structure of the QA path, with
image patches playing the candidate-token role.  That shared structure is
the point: the SAME fused retrieval kernels and QueryEngine serve image
pools (via ``encode_image`` -> ``QueryEngine.build_index_from_tokens``).

Training: triplet ranking with PairRankLoss over (caption, positive image,
negative image) — score margins, reference loss semantics
(pair_rank_loss_layer.cpp:26-52).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops import bn_apply, bn_init, conv2d, conv_init, embed_init, \
    embed_lookup, pair_rank_loss
from ..metrics.ir_metrics import rank_accuracy_jax
from ..ops.pooling import _out_size, max_pool2d
from ..ops.similarity import sim_cross_bilinear
from ..utils import fillers
from .mms_qa import ConvBlock


@dataclasses.dataclass(frozen=True)
class CaptionImageConfig:
    vocab_size: int = 100
    embed_dim: int = 50            # shared text/image token space
    caption_len: int = 12
    height: int = 16
    width: int = 16
    channels: int = 3
    blocks: Sequence[ConvBlock] = (
        ConvBlock(3, 3, 16, "max", 2, 2),
        ConvBlock(3, 3, 32, "max", 1, 1),
    )
    sim_measures: int = 2
    margin: float = 1.0

    def patch_grid(self) -> tuple[int, int]:
        import math
        h, w = self.height, self.width
        for b in self.blocks:
            h, w = h - b.kh + 1, w - b.kw + 1
            h = _out_size(h, b.pool_k, b.pool_stride)
            w = _out_size(w, b.pool_k, b.pool_stride)
        return h, w


def caption_image_init(key, cfg: CaptionImageConfig, *, pretrained=None,
                       dtype=jnp.float32):
    keys = jax.random.split(key, len(cfg.blocks) + 4)
    params: dict = {}
    state: dict = {}
    params["embed"] = embed_init(keys[0], cfg.vocab_size, cfg.embed_dim,
                                 pretrained=pretrained, dtype=dtype)
    in_ch = cfg.channels
    for i, b in enumerate(cfg.blocks):
        params[f"conv{i}"] = conv_init(keys[1 + i], in_ch, b.out_channels,
                                       b.kh, b.kw, dtype=dtype)
        bn_p, bn_s = bn_init(b.out_channels, dtype=dtype)
        params[f"bn{i}"] = bn_p
        state[f"bn{i}"] = bn_s
        in_ch = b.out_channels
    # project patch channels into the shared D-dim token space
    params["proj"] = {
        "w": fillers.xavier(keys[-2], (in_ch, cfg.embed_dim), fan_in=in_ch,
                            dtype=dtype),
        "b": jnp.zeros((cfg.embed_dim,), dtype),
    }
    # the learned cross-modal metric (xavier: unlike the QA recipe there is
    # no conv stack after the sim map to bootstrap a zero-init metric)
    m, d = cfg.sim_measures, cfg.embed_dim
    params["sim"] = {"w": fillers.xavier(keys[-1], (m, d, d), fan_in=d * d,
                                         dtype=dtype)}
    return params, state


def encode_image(params, state, images, cfg: CaptionImageConfig, *,
                 train: bool):
    """(N, H, W, C) -> ((N, P, D) patch token embeddings, new_state)."""
    x = images
    new_state = dict(state)
    for i, b in enumerate(cfg.blocks):
        x = conv2d(params[f"conv{i}"], x)
        x, new_state[f"bn{i}"] = bn_apply(params[f"bn{i}"], state[f"bn{i}"],
                                          x, train=train)
        x = max_pool2d(x, b.pool_k, b.pool_k, stride_h=b.pool_stride,
                       stride_w=b.pool_stride)
        x = jnp.tanh(x)
    n = x.shape[0]
    patches = x.reshape(n, -1, x.shape[-1])  # (N, P, C')
    tokens = jnp.tanh(patches @ params["proj"]["w"] + params["proj"]["b"])
    return tokens, new_state


def caption_image_score(params, caption_tokens, image_tokens,
                        cfg: CaptionImageConfig):
    """MaxSim under the learned metric: (N, W1, D) x (N, P, D) -> (N,)."""
    maps = sim_cross_bilinear(caption_tokens, image_tokens,
                              params["sim"]["w"])   # (N, W1, P, M)
    return jnp.sum(jnp.max(maps, axis=2), axis=(1, 2))


def caption_image_apply(params, state, batch, cfg: CaptionImageConfig, *,
                        train: bool, rng=None):
    """batch: {'caption': int (N, W1), 'image_pos', 'image_neg': (N,H,W,C)}.

    Returns ({'score_pos','score_neg','loss','rank_accuracy'}, new_state).
    Both images run the encoder in one batched pass.
    """
    n = batch["caption"].shape[0]
    cap = embed_lookup(params["embed"], batch["caption"])
    stacked = jnp.concatenate([batch["image_pos"], batch["image_neg"]], 0)
    tokens, new_state = encode_image(params, state, stacked, cfg,
                                     train=train)
    pos, neg = tokens[:n], tokens[n:]
    s_pos = caption_image_score(params, cap, pos, cfg)
    s_neg = caption_image_score(params, cap, neg, cfg)
    label = jnp.ones((n,), s_pos.dtype)  # pos should outrank neg
    out = {
        "score_pos": s_pos,
        "score_neg": s_neg,
        "loss": pair_rank_loss(s_pos, s_neg, label, margin=cfg.margin),
        "rank_accuracy": rank_accuracy_jax(
            s_pos, s_neg, jnp.ones_like(s_pos)),
    }
    return out, new_state
