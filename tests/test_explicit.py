"""Explicit rule wrappers vs the closed-form primitives and the reference's
rule semantics (mirrors tests/test_rules.py + test_modules.py upstream)."""

import jax
import jax.numpy as jnp
import numpy as np

import lxt_tpu.explicit as le
import lxt_tpu.ops.functional as lf
from lxt_tpu.models.common import split_heads, merge_heads  # noqa: F401


def vjp_rel(fn, inputs, rel_out):
    out, vjp_fn = jax.vjp(fn, *inputs)
    return out, vjp_fn(rel_out)


def test_epsilon_rule_matches_linear_epsilon():
    """EpsilonRule-wrapped linear == lf.linear_epsilon (reference
    tests/test_rules.py:9-24)."""
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (16, 10))
    w = jax.random.normal(k2, (10, 5))
    rel = jax.random.normal(k3, (16, 5))

    rule = le.epsilon_rule(lambda a: jnp.matmul(a, w), 1e-9)
    _, (rel_rule,) = vjp_rel(rule, (x,), rel)
    _, (rel_lf, _, _) = vjp_rel(
        lambda a, ww, bb: lf.linear_epsilon(a, ww, bb, 1e-9), (x, w, None), rel)
    np.testing.assert_allclose(np.asarray(rel_rule), np.asarray(rel_lf),
                               rtol=0, atol=1e-5)


def test_uniform_epsilon_matches_matmul():
    """uniform_epsilon_rule(matmul, 2) == lf.matmul (Prop 3.3)."""
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    a = jax.random.normal(k1, (2, 6, 8))
    b = jax.random.normal(k2, (2, 8, 4))
    rel = jax.random.normal(k3, (2, 6, 4))

    rule = le.uniform_epsilon_rule(jnp.matmul, 2, 1e-9)
    _, (ra, rb) = vjp_rel(rule, (a, b), rel)
    _, (ra_lf, rb_lf) = vjp_rel(lambda x, y: lf.matmul(x, y, 1e-9), (a, b), rel)
    np.testing.assert_allclose(np.asarray(ra), np.asarray(ra_lf), rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rb), np.asarray(rb_lf), rtol=0, atol=1e-4)


def test_uniform_rule():
    a = jnp.ones((4, 3))
    b = jnp.ones((4, 3))
    rel = jnp.full((4, 3), 2.0)
    rule = le.uniform_rule(lambda x, y: x * y)
    _, (ra, rb) = vjp_rel(rule, (a, b), rel)
    np.testing.assert_allclose(np.asarray(ra), 1.0)
    np.testing.assert_allclose(np.asarray(rb), 1.0)


def test_identity_and_stop():
    x = jnp.linspace(-1, 1, 12).reshape(3, 4)
    rel = jnp.ones((3, 4))
    _, (r,) = vjp_rel(le.identity_rule_fn(jnp.tanh), (x,), rel)
    np.testing.assert_allclose(np.asarray(r), 1.0)

    stopped = le.stop_relevance_rule(jnp.tanh)
    _, (r,) = vjp_rel(stopped, (x,), rel)
    np.testing.assert_allclose(np.asarray(r), 0.0)


def test_taylor_decomposition_linear_exact():
    """For a purely linear fn, Taylor decomposition at any reference equals
    the epsilon rule (the Jacobian is constant)."""
    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (8, 6))
    w = jax.random.normal(k2, (6, 6))
    rel = jax.random.normal(k3, (8, 6))

    fn = lambda a: jnp.matmul(a, w)  # noqa: E731
    taylor = le.taylor_decomposition(fn, ref=(jnp.zeros_like(x),))
    _, (r_taylor,) = vjp_rel(taylor, (x,), rel)
    eps = le.epsilon_rule(fn, 1e-6)
    _, (r_eps,) = vjp_rel(eps, (x,), rel)
    np.testing.assert_allclose(np.asarray(r_taylor), np.asarray(r_eps),
                               rtol=0, atol=1e-4)


def test_softmax_dt_temperature():
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 8))
    sm = le.softmax_dt(temperature=2.0)
    out = sm(x)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(jax.nn.softmax(x / 2.0, -1)),
                               rtol=0, atol=1e-6)


def test_multi_head_attention_cp():
    """Forward equals standard fused MHA; relevance reaches only v (reference
    tests/test_modules.py:42-118 checks the same against an epsilon-wrapped
    inline implementation)."""
    import math

    key = jax.random.PRNGKey(4)
    ks = jax.random.split(key, 6)
    B, T, D, H = 2, 6, 16, 4
    q = jax.random.normal(ks[0], (B, T, D))
    w_qkv = jax.random.normal(ks[1], (D, 3 * D)) * 0.3
    b_qkv = jax.random.normal(ks[2], (3 * D,)) * 0.1
    w_out = jax.random.normal(ks[3], (D, D)) * 0.3
    b_out = jax.random.normal(ks[4], (D,)) * 0.1
    rel = jax.random.normal(ks[5], (B, T, D))

    def mha(q, k, v):
        return le.multi_head_attention_cp(q, k, v, H, w_qkv, b_qkv, w_out, b_out)

    # reference forward (plain math)
    wq, wk, wv = jnp.split(w_qkv, 3, -1)
    bq, bk, bv = jnp.split(b_qkv, 3)
    hd = D // H
    qh = split_heads(q @ wq + bq, H, hd)
    kh = split_heads(q @ wk + bk, H, hd)
    vh = split_heads(q @ wv + bv, H, hd)
    p = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(hd), -1)
    expected = merge_heads(jnp.einsum("bhqk,bhkd->bhqd", p, vh)) @ w_out + b_out

    out, (rq, rk, rv) = vjp_rel(mha, (q, q, q), rel)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rq), 0.0)
    np.testing.assert_allclose(np.asarray(rk), 0.0)
    assert float(jnp.abs(rv).sum()) > 0
