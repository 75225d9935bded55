"""Gradient*Input rule primitives vs closed-form LRP math.

The key identity behind the efficient path (reference
docs/source/under-the-hood-efficient.rst): with the rules applied, plain
gradients implement LRP Jacobians, and relevance = x * grad.
"""

import jax
import jax.numpy as jnp
import numpy as np

from lxt_tpu.composites import attnlrp, cp_lrp, vanilla_gradient
from lxt_tpu.ops.rules import divide_gradient, gamma_linear, identity_rule, stop_gradient


def test_identity_rule_relevance_passthrough():
    """x * grad == relevance_out: the identity rule conserves relevance."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 16)) + 2.0

    def f(x):
        return identity_rule(jax.nn.silu, x)

    out, vjp_fn = jax.vjp(f, x)
    rel_out = jax.random.normal(jax.random.PRNGKey(1), out.shape)
    (g,) = vjp_fn(rel_out)
    # grad = rel_out * f(x)/x  =>  x * grad = f(x) * rel_out = out-relevance
    np.testing.assert_allclose(x * g, out * rel_out, rtol=0, atol=1e-5)


def test_divide_gradient():
    x = jnp.arange(6.0).reshape(2, 3)
    for k in (2, 4):
        out, vjp_fn = jax.vjp(lambda a: divide_gradient(a, k), x)
        np.testing.assert_allclose(out, x)
        (g,) = vjp_fn(jnp.ones_like(x))
        np.testing.assert_allclose(g, jnp.full_like(x, 1.0 / k))


def test_stop_gradient():
    x = jnp.ones((3,))
    (g,) = jax.vjp(stop_gradient, x)[1](jnp.ones((3,)))
    np.testing.assert_allclose(g, jnp.zeros((3,)))


def test_gi_softmax_equals_deep_taylor():
    """G*I through a standard softmax == the explicit Deep-Taylor softmax rule
    (Prop 3.1). This is the identity that makes the efficient path kernel-
    agnostic: relevance_in = x * grad when grad carries R/p implicitly."""
    import lxt_tpu.ops.functional as lf

    key = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (4, 12))
    rel_out = jax.random.normal(k2, (4, 12))

    # explicit path
    _, vjp_exp = jax.vjp(lambda a: lf.softmax(a, -1), x)
    (rel_explicit,) = vjp_exp(rel_out)

    # efficient path: cotangent at softmax output is g = R/p; input relevance
    # is x * standard_grad
    p = jax.nn.softmax(x, -1)
    _, vjp_std = jax.vjp(lambda a: jax.nn.softmax(a, -1), x)
    (grad,) = vjp_std(rel_out / p)
    rel_efficient = x * grad

    np.testing.assert_allclose(rel_efficient, rel_explicit, rtol=0, atol=1e-5)


def test_gi_matmul_equals_prop33():
    """divide_gradient(·, 2) after a matmul + x*grad == Prop 3.3 (eps->0)."""
    import lxt_tpu.ops.functional as lf

    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    a = jax.random.normal(k1, (2, 5, 7))
    b = jax.random.normal(k2, (2, 7, 3))
    rel_out = jax.random.normal(k3, (2, 5, 3))

    _, vjp_exp = jax.vjp(lambda x, y: lf.matmul(x, y, 0.0), a, b)
    rel_a_exp, rel_b_exp = vjp_exp(rel_out)

    out = jnp.matmul(a, b)
    _, vjp_eff = jax.vjp(
        lambda x, y: divide_gradient(jnp.matmul(x, y), 2), a, b)
    g_a, g_b = vjp_eff(rel_out / out)
    np.testing.assert_allclose(a * g_a, rel_a_exp, rtol=0, atol=1e-4)
    np.testing.assert_allclose(b * g_b, rel_b_exp, rtol=0, atol=1e-4)


def test_composite_gated_mlp():
    """Composite.gated_mul applies identity+uniform (attnlrp) or stop-grad (cp)."""
    key = jax.random.PRNGKey(4)
    k1, k2 = jax.random.split(key)
    gate = jax.random.normal(k1, (4, 8))
    up = jax.random.normal(k2, (4, 8))

    out_a = attnlrp.gated_mul(jax.nn.silu, gate, up)
    out_c = cp_lrp.gated_mul(jax.nn.silu, gate, up)
    out_v = vanilla_gradient.gated_mul(jax.nn.silu, gate, up)
    expected = jax.nn.silu(gate) * up
    for o in (out_a, out_c, out_v):
        np.testing.assert_allclose(o, expected, rtol=0, atol=1e-6)

    # cp: no relevance through gate branch
    (g_gate, g_up) = jax.vjp(
        lambda g, u: cp_lrp.gated_mul(jax.nn.silu, g, u), gate, up)[1](jnp.ones((4, 8)))
    np.testing.assert_allclose(g_gate, jnp.zeros_like(gate))
    np.testing.assert_allclose(g_up, jax.nn.silu(gate))


def test_composite_norms_forward_parity():
    """Rule'd norms compute the exact same forward as vanilla."""
    key = jax.random.PRNGKey(5)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (2, 6, 16))
    w = jax.random.normal(k2, (16,))
    b = jax.random.normal(k3, (16,))

    np.testing.assert_allclose(
        attnlrp.rms_norm(x, w, 1e-6), vanilla_gradient.rms_norm(x, w, 1e-6),
        rtol=0, atol=1e-6)
    np.testing.assert_allclose(
        attnlrp.layer_norm(x, w, b, 1e-5), vanilla_gradient.layer_norm(x, w, b, 1e-5),
        rtol=0, atol=1e-6)

    # identity-rule rms_norm passes relevance through: x * grad == y * rel_out summed
    def f(xx):
        return attnlrp.rms_norm(xx, w, 1e-6)

    out, vjp_fn = jax.vjp(f, x)
    rel_out = jax.random.normal(jax.random.PRNGKey(6), out.shape)
    (g,) = vjp_fn(rel_out)
    np.testing.assert_allclose(
        (x * g).sum(-1), (out * rel_out).sum(-1), rtol=0, atol=1e-4)


def test_gamma_linear_conserves():
    """Gamma rule in G*I framing: x*grad sums to (approximately) out-relevance."""
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jnp.abs(jax.random.normal(k1, (4, 16))) + 0.1
    w = jax.random.normal(k2, (16, 8))

    out, vjp_fn = jax.vjp(lambda a: gamma_linear(a, w, None, 0.25), x)
    np.testing.assert_allclose(out, x @ w, rtol=0, atol=1e-5)
    rel_out = jax.random.normal(k3, out.shape)
    (g,) = vjp_fn(rel_out)
    rel_in = x * g
    # conservation within the gamma-modified denominator's tolerance
    ratio = rel_in.sum() / (rel_out * out).sum()
    assert 0.5 < float(ratio) < 2.0


def test_model_level_conservation_cp():
    """End-to-end conservation through a whole Llama block stack under
    CP-LRP: total input relevance equals the seeded logit minus the bias
    sink (Llama has no biases, so it is exact up to the softmax-free CP
    attention path and f32 roundoff)."""
    import lxt_tpu
    from lxt_tpu.attribution import input_relevance, select_logit
    from lxt_tpu.models import llama as jllama
    from lxt_tpu.ops.check import assert_finite_relevance

    cfg = jllama.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, rms_eps=1e-6)
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 6), 0, 64)
    embeds = jllama.embed(params, ids)

    def target(e):
        return select_logit(jllama.forward(params, cfg, e, __import__(
            "lxt_tpu").cp_lrp).logits)

    value, rel = input_relevance(target, embeds)
    assert_finite_relevance(rel)
    np.testing.assert_allclose(float(rel.sum()), float(value), rtol=2e-3)


def test_assert_finite_relevance_raises():
    from lxt_tpu.ops.check import assert_finite_relevance

    with np.testing.assert_raises(ValueError):
        assert_finite_relevance(jnp.array([1.0, jnp.nan]))


def test_nan_check_raises_in_program():
    """Under nan_check + checked(), a NaN in any rule backward raises a host
    error (reference: conservation_check_wrap raises on NaN,
    lxt/explicit/functional.py:29-30); finite relevance passes."""
    import pytest

    from lxt_tpu.ops.check import checked, nan_check
    from lxt_tpu.ops.rules import divide_gradient

    def make_grad(denom_offset):
        def f(x):
            # grad through 1/(x - offset) is NaN/Inf where x == offset
            y = divide_gradient(x, 2) / (x - denom_offset)
            return y.sum()
        return jax.grad(f)

    x = jnp.array([1.0, 2.0, 3.0])
    # the flag is read at TRACE time, so tracing (the first call) must
    # happen inside the context
    with nan_check():
        with pytest.raises(Exception, match="NaN/Inf relevance"):
            checked(make_grad(2.0))(x)  # x==2 -> division by zero
        finite = checked(make_grad(100.0))(x)
    # closed form: the /2 applies only on the numerator (divide_gradient) path
    xs = np.asarray(x)
    expect = 0.5 / (xs - 100.0) - xs / (xs - 100.0) ** 2
    np.testing.assert_allclose(np.asarray(finite), expect, rtol=1e-5)
