"""Gradient-method baselines (lxt_tpu/baselines.py): IG completeness,
SmoothGrad limits, and the paper's faithfulness ordering LRP > IG > G*I
reproduced on a tiny llama."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lxt_tpu
from lxt_tpu.attribution import input_relevance
from lxt_tpu.baselines import (gradient_x_input, integrated_gradients,
                               smoothgrad)


def _linear_target(D=5, seed=0):
    w = jax.random.normal(jax.random.PRNGKey(seed), (D,))

    def target(e):
        return (e @ w).sum(-1)          # [B]
    return target, w


def test_ig_completeness_exact_for_linear():
    """IG with a zero baseline on a linear target: rel sums exactly to
    target(x) - target(0), and equals G*I (the path integral of a constant
    gradient) at ANY step count."""
    target, w = _linear_target()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 5))
    for steps in (1, 4, 32):
        rel = integrated_gradients(target, x, steps=steps)
        np.testing.assert_allclose(np.asarray(rel.sum(-1)),
                                   np.asarray(target(x)), rtol=1e-5)
    gxi = gradient_x_input(target, x)
    np.testing.assert_allclose(np.asarray(rel), np.asarray(gxi), rtol=1e-5,
                               atol=1e-6)


def test_ig_completeness_nonlinear():
    """Non-linear target: completeness holds to quadrature accuracy and
    tightens with more steps."""
    w = jax.random.normal(jax.random.PRNGKey(2), (5,))

    def target(e):
        return jnp.tanh(e @ w).sum(-1)

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 5))
    want = np.asarray(target(x) - target(jnp.zeros_like(x)))

    def gap(steps):
        rel = integrated_gradients(target, x, steps=steps)
        return np.abs(np.asarray(rel.sum(-1)) - want).max()

    assert gap(64) < 1e-3
    assert gap(64) < gap(2)


def test_ig_baselines_mean_and_array():
    target, _ = _linear_target()
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 5))
    mean_vec = x.mean(-2, keepdims=True)
    r1 = integrated_gradients(target, x, steps=4, baseline="mean")
    r2 = integrated_gradients(target, x, steps=4, baseline=mean_vec)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-6)
    with pytest.raises(ValueError, match="baseline"):
        integrated_gradients(target, x, baseline="nope")


def test_smoothgrad_sigma_zero_is_plain_gradient():
    target, _ = _linear_target()
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 6, 5))
    sg = smoothgrad(target, x, jax.random.PRNGKey(0), samples=3, sigma=0.0)
    gxi = gradient_x_input(target, x)
    np.testing.assert_allclose(np.asarray(sg), np.asarray(gxi), rtol=1e-5,
                               atol=1e-6)


def test_smoothgrad_jittable_and_sample_shape():
    w = jax.random.normal(jax.random.PRNGKey(6), (5,))

    def target(e):
        return jnp.tanh(e @ w).sum(-1)

    x = jax.random.normal(jax.random.PRNGKey(7), (2, 6, 5))

    @jax.jit
    def run(xx, key):
        return smoothgrad(target, xx, key, samples=4, sigma=0.2)

    rel = run(x, jax.random.PRNGKey(8))
    assert rel.shape == (2, 6)
    assert np.isfinite(np.asarray(rel)).all()
    # different keys -> different estimates (it IS stochastic)
    rel2 = run(x, jax.random.PRNGKey(9))
    assert float(jnp.abs(rel - rel2).max()) > 1e-8


def test_lrp_beats_ig_beats_gxi_on_llama_faithfulness():
    """The paper's headline ordering on a random-weight llama, measured by
    ABPC: AttnLRP >= IG (and both >> plain G*I). Random weights make the
    margin noisy, so only the weak ordering with a tolerance is asserted."""
    from lxt_tpu.models import llama as jllama
    from lxt_tpu.utils.faithfulness import faithfulness_report

    cfg = jllama.LlamaConfig(vocab_size=128, hidden_size=64,
                             intermediate_size=128, num_layers=2,
                             num_heads=4, num_kv_heads=2)
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 24), 0, 128)
    embeds = jllama.embed(params, ids)

    def logit_fn(e):
        out = jllama.forward(params, cfg, e, lxt_tpu.attnlrp, logits_at=-1)
        return out.logits[:, -1, :].max(-1)

    def vanilla_fn(e):
        out = jllama.forward(params, cfg, e, lxt_tpu.vanilla_gradient,
                             logits_at=-1)
        return out.logits[:, -1, :].max(-1)

    _, rel_lrp = input_relevance(lambda e: logit_fn(e).sum(), embeds)
    rel_ig = integrated_gradients(vanilla_fn, embeds, steps=16)
    rel_gxi = gradient_x_input(vanilla_fn, embeds)

    def abpc(rel):
        rep = faithfulness_report(jax.jit(vanilla_fn), embeds, rel, steps=8)
        return float(rep["abpc"].mean())

    a_lrp, a_ig, a_gxi = abpc(rel_lrp), abpc(rel_ig), abpc(rel_gxi)
    assert a_lrp > a_gxi, (a_lrp, a_ig, a_gxi)
    assert a_ig > a_gxi, (a_lrp, a_ig, a_gxi)
