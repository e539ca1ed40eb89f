"""Caption-to-image metric model (configs[4]): shapes, training signal."""

import jax
import jax.numpy as jnp
import numpy as np

from mms_answer_selection_tpu.models.caption_image import (
    CaptionImageConfig,
    caption_image_apply,
    caption_image_init,
    caption_image_score,
    encode_image,
)
from mms_answer_selection_tpu.models.mms_qa import ConvBlock
from mms_answer_selection_tpu.training import SolverConfig, make_solver

CFG = CaptionImageConfig(
    vocab_size=50, embed_dim=16, caption_len=6, height=10, width=10,
    channels=1, blocks=(ConvBlock(3, 3, 8, "max", 2, 2),), sim_measures=2)

rng = np.random.default_rng(61)


def _batch(n=8):
    return {
        "caption": jnp.asarray(rng.integers(0, 50, (n, 6)), jnp.int32),
        "image_pos": jnp.asarray(
            rng.normal(size=(n, 10, 10, 1)).astype(np.float32)),
        "image_neg": jnp.asarray(
            rng.normal(size=(n, 10, 10, 1)).astype(np.float32)),
    }


def test_shapes():
    params, state = caption_image_init(jax.random.PRNGKey(0), CFG)
    out, new_state = caption_image_apply(params, state, _batch(), CFG,
                                         train=True)
    assert out["score_pos"].shape == (8,)
    assert np.isfinite(float(out["loss"]))
    gh, gw = CFG.patch_grid()
    tokens, _ = encode_image(params, state, _batch()["image_pos"], CFG,
                             train=False)
    assert tokens.shape == (8, gh * gw, 16)


def test_score_is_maxsim_of_bilinear_map():
    params, state = caption_image_init(jax.random.PRNGKey(1), CFG)
    cap = jnp.asarray(rng.normal(size=(2, 6, 16)).astype(np.float32))
    img = jnp.asarray(rng.normal(size=(2, 9, 16)).astype(np.float32))
    s = np.asarray(caption_image_score(params, cap, img, CFG))
    w = np.asarray(params["sim"]["w"])
    for n in range(2):
        total = 0.0
        for m in range(2):
            maps = np.asarray(cap[n]) @ w[m] @ np.asarray(img[n]).T
            total += maps.max(axis=1).sum()
        np.testing.assert_allclose(s[n], total, rtol=1e-4, atol=1e-4)


def test_training_learns_caption_image_alignment():
    # plantable signal: the positive image's pixels encode the caption's
    # first token id; the negative is noise
    params, state = caption_image_init(jax.random.PRNGKey(2), CFG)
    solver = make_solver(SolverConfig(solver_type="adadelta",
                                      weight_decay=0.0))
    opt_state = solver.init(params)

    @jax.jit
    def step(params, state, opt_state, batch, it):
        def loss_fn(p):
            out, ns = caption_image_apply(p, state, batch, CFG, train=True)
            return out["loss"], (ns, out["rank_accuracy"])

        (loss, (ns, acc)), g = jax.value_and_grad(loss_fn,
                                                  has_aux=True)(params)
        p2, o2 = solver.apply(params, g, opt_state, it)
        return p2, ns, o2, loss, acc

    r = np.random.default_rng(3)

    def make_batch(n=16):
        first = r.integers(0, 8, n)
        caption = np.stack([np.full(6, f) for f in first])
        pos = np.zeros((n, 10, 10, 1), np.float32)
        for i, f in enumerate(first):
            pos[i, f, :, 0] = 2.0  # row index encodes the token
        pos += 0.1 * r.normal(size=pos.shape).astype(np.float32)
        neg = r.normal(size=pos.shape).astype(np.float32)
        return {"caption": jnp.asarray(caption, jnp.int32),
                "image_pos": jnp.asarray(pos),
                "image_neg": jnp.asarray(neg)}

    accs = []
    for i in range(40):
        params, state, opt_state, loss, acc = step(
            params, state, opt_state, make_batch(), jnp.asarray(i))
        accs.append(float(acc))
    assert np.mean(accs[-8:]) > max(0.6, np.mean(accs[:8]))
