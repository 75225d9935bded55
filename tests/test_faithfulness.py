"""Perturbation-curve faithfulness evaluation (utils/faithfulness.py)."""

import jax
import jax.numpy as jnp
import numpy as np

import lxt_tpu
from lxt_tpu.attribution import input_relevance
from lxt_tpu.utils.faithfulness import aopc_scores, perturbation_curve


def test_exact_on_linear_model():
    """For a linear target the G*I relevance is exact, so ablating the top-k
    tokens removes exactly their summed contributions."""
    B, T, D = 2, 7, 5
    w = jax.random.normal(jax.random.PRNGKey(0), (D,))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))

    def logit_fn(e):
        return (e @ w).sum(-1)  # [B]

    _, rel = input_relevance(lambda e: logit_fn(e).sum(), x)
    curve = perturbation_curve(logit_fn, x, rel, steps=T, order="morf")

    contrib = np.asarray(x @ w)                      # [B, T] per-token value
    order = np.argsort(-np.asarray(rel), axis=-1)
    full = contrib.sum(-1)
    for s in range(T + 1):
        k = s
        for b in range(B):
            expect = full[b] - contrib[b, order[b, :k]].sum()
            np.testing.assert_allclose(float(curve.values[s, b]), expect,
                                       rtol=1e-5, atol=1e-5)
    # step 0 is the unperturbed logit
    np.testing.assert_allclose(np.asarray(curve.values[0]), full,
                               rtol=1e-5, atol=1e-5)


def test_attnlrp_beats_random_on_llama():
    """Model-level sanity: AttnLRP relevance yields morf > random > lerf
    AOPC on a (random-weight) llama — the faithfulness ordering the paper
    establishes."""
    from lxt_tpu.models import llama as jllama

    cfg = jllama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2)
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 24), 0, 128)
    embeds = jllama.embed(params, ids)

    def logit_fn(e):
        out = jllama.forward(params, cfg, e, lxt_tpu.attnlrp, logits_at=-1)
        return out.logits[:, -1, :].max(-1)

    _, rel = input_relevance(lambda e: logit_fn(e).sum(), embeds)
    morf, lerf, rand = aopc_scores(jax.jit(logit_fn), embeds, rel, steps=8)
    # averaged over the batch the faithfulness ordering must hold
    assert float(morf.mean()) > float(rand.mean()) > float(lerf.mean()), (
        float(morf.mean()), float(rand.mean()), float(lerf.mean()))


def test_padding_not_ablated():
    """valid_mask: padded positions are never counted in the fractions."""
    B, T, D = 1, 8, 4
    x = jnp.ones((B, T, D))
    rel = jnp.arange(T, dtype=jnp.float32)[None]
    valid = jnp.asarray([[0, 0, 1, 1, 1, 1, 1, 1]], bool)

    def logit_fn(e):
        return e.sum((-1, -2))

    curve = perturbation_curve(logit_fn, x, rel, steps=6, order="morf",
                               valid_mask=valid)
    # full ablation removes exactly the 6 valid tokens' mass (6*D), never
    # touching the 2 padded ones
    np.testing.assert_allclose(float(curve.values[0, 0]), 8 * D)
    np.testing.assert_allclose(float(curve.values[-1, 0]), 2 * D)
