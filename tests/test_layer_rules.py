"""Per-layer-depth rule maps (Composite.override_layers/for_layer) and the
native zennit rule zoo (alpha-beta / z+): the reference composes per-layer
zennit rule maps (examples/vit_torch.py:59-65) and {type: rule} dicts
(lxt/explicit/core.py:10-41); here rule fields vary with STATIC layer depth
and the stack unrolls one compiled body per distinct composite."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lxt_tpu
from lxt_tpu.attribution import input_relevance, select_logit
from lxt_tpu.composites import Composite, attnlrp, cp_lrp
from lxt_tpu.models import common, llama as jllama
from lxt_tpu.ops.rules import alphabeta_linear, gamma_linear


def _llama(L=3):
    cfg = jllama.LlamaConfig(vocab_size=64, hidden_size=32,
                             intermediate_size=64, num_layers=L,
                             num_heads=2, num_kv_heads=2)
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    e = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32)) * 0.1
    return cfg, params, e


def _rel(cfg, params, e, comp):
    def target(x):
        return select_logit(jllama.forward(params, cfg, x, comp).logits)
    return input_relevance(target, e)


# ---------------------------------------------------------------------------
# Composite.for_layer semantics
# ---------------------------------------------------------------------------

def test_for_layer_resolution_order_and_ranges():
    c = (attnlrp
         .override_layers((0, 2), attention="cp")
         .override_layers(1, gate="cp")
         .override_layers((-1, None), norm="vanilla"))
    L = 4
    assert c.for_layer(0, L).attention == "cp"
    assert c.for_layer(0, L).gate == "uniform"
    assert c.for_layer(1, L).attention == "cp"
    assert c.for_layer(1, L).gate == "cp"
    assert c.for_layer(2, L).attention == "attnlrp"
    assert c.for_layer(3, L).norm == "vanilla"
    assert c.for_layer(2, L).norm == "identity"
    # resolved composites carry no further overrides and stay hashable
    assert c.for_layer(0, L).layer_overrides == ()
    hash(c)
    hash(c.for_layer(0, L))


def test_override_layers_validates_fields():
    with pytest.raises(ValueError, match="unknown Composite field"):
        attnlrp.override_layers(0, nonsense="x")
    with pytest.raises(ValueError, match="alpha - beta"):
        attnlrp.override_layers(0, linear_rule=("alphabeta", 2.0, 0.5))


def test_negative_index_needs_num_layers():
    c = attnlrp.override_layers((-1, None), gate="cp")
    with pytest.raises(ValueError, match="num_layers"):
        c.for_layer(0)


# ---------------------------------------------------------------------------
# model-level: overrides vs uniform composites
# ---------------------------------------------------------------------------

def test_full_range_override_equals_uniform_composite():
    """attnlrp overridden to CP on EVERY layer must reproduce cp_lrp's
    relevance exactly (attnlrp and cp_lrp differ only in attention+gate)."""
    cfg, params, e = _llama(L=3)
    mixed = attnlrp.override_layers((0, None), attention="cp", gate="cp")
    v1, r1 = _rel(cfg, params, e, mixed)
    v2, r2 = _rel(cfg, params, e, cp_lrp)
    assert float(v1) == float(v2)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2),
                               rtol=0, atol=1e-6)


def test_partial_override_differs_but_forward_identical():
    """Rules change ONLY the backward: logits must match with and without
    overrides (up to XLA fusion differences between the scan and unrolled
    drivers, ~1e-7), while the relevance differs from both uniform runs."""
    cfg, params, e = _llama(L=3)
    mixed = attnlrp.override_layers((1, 2), attention="cp", gate="cp")

    logits = lambda c: np.asarray(
        jllama.forward(params, cfg, e, c).logits)
    np.testing.assert_allclose(logits(mixed), logits(attnlrp),
                               rtol=0, atol=1e-6)

    _, r_mixed = _rel(cfg, params, e, mixed)
    _, r_attn = _rel(cfg, params, e, attnlrp)
    _, r_cp = _rel(cfg, params, e, cp_lrp)
    assert float(jnp.abs(r_mixed - r_attn).max()) > 1e-8
    assert float(jnp.abs(r_mixed - r_cp).max()) > 1e-8


def test_override_jittable_as_static():
    cfg, params, e = _llama(L=2)
    mixed = attnlrp.override_layers(0, gate="cp")

    @jax.jit
    def run(x):
        def target(xx):
            return select_logit(jllama.forward(params, cfg, xx, mixed).logits)
        return input_relevance(target, x)

    v, r = run(e)
    assert bool(jnp.isfinite(r).all())


def test_overrides_reject_custom_layer_driver():
    cfg, params, e = _llama(L=2)
    mixed = attnlrp.override_layers(0, gate="cp")
    with pytest.raises(ValueError, match="unrolled"):
        jllama.forward(params, cfg, e, mixed,
                       layer_driver=lambda f, h, xs: jax.lax.scan(f, h, xs))
    # the unrolled driver itself is fine
    out = jllama.forward(params, cfg, e, mixed, remat=False,
                         layer_driver=common.unrolled)
    assert out.logits.shape == (1, 8, 64)


# ---------------------------------------------------------------------------
# the unrolled per-layer reference (run_stacked_layers ground truth)
# ---------------------------------------------------------------------------

def test_run_stacked_layers_matches_hand_unrolled_gamma_depth():
    """A toy 3-layer stack with gamma on depth 1 only must equal composing
    the per-depth rule ops by hand — the unrolled per-layer reference."""
    ws = jax.random.normal(jax.random.PRNGKey(2), (3, 16, 16)) * 0.3
    x0 = jax.random.normal(jax.random.PRNGKey(3), (4, 16))

    comp = Composite(name="toy").override_layers(
        1, linear_rule=("gamma", 0.4))

    def make_layer(c):
        def layer_fn(h, w):
            return c.linear(h, w), None
        return layer_fn

    def stacked(x):
        h, _ = common.run_stacked_layers(make_layer, comp, False, None, x, ws)
        return h

    def hand(x):
        h = jnp.matmul(x, ws[0])
        h = gamma_linear(h, ws[1], None, 0.4)
        return jnp.matmul(h, ws[2])

    np.testing.assert_array_equal(np.asarray(stacked(x0)),
                                  np.asarray(hand(x0)))
    g1 = jax.grad(lambda x: stacked(x).sum())(x0)
    g2 = jax.grad(lambda x: hand(x).sum())(x0)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=0, atol=1e-6)


# ---------------------------------------------------------------------------
# alpha-beta / z+ rules (zennit zoo parity)
# ---------------------------------------------------------------------------

def test_alphabeta_linear_closed_form():
    """G*I relevance under alphabeta_linear equals the textbook formula
    R_j = sum_k (a z+_jk/z+_k - b z-_jk/z-_k) R_k with R_k = out_k."""
    rng = np.random.RandomState(0)
    # in-dim 64: every output has BOTH positive and negative contributions
    # (z+ and z- nonzero) — with one-signed z the textbook rule itself drops
    # that branch (stabilized 0 denominator) and conservation cannot hold
    x = rng.randn(5, 64).astype(np.float32)
    w = rng.randn(64, 6).astype(np.float32)
    alpha, beta = 2.0, 1.0

    grad = jax.grad(
        lambda xx: alphabeta_linear(xx, jnp.asarray(w), None,
                                    alpha, beta).sum())(jnp.asarray(x))
    got = np.asarray(grad) * x

    out = x @ w
    xp, xn = np.clip(x, 0, None), np.clip(x, None, 0)
    wp, wn = np.clip(w, 0, None), np.clip(w, None, 0)
    zp = xp @ wp + xn @ wn
    zn = xp @ wn + xn @ wp
    stab = lambda z: z + np.where(z >= 0, 1e-6, -1e-6)
    rp = out / stab(zp)
    rn = out / stab(zn)
    want = alpha * (xp * (rp @ wp.T) + xn * (rp @ wn.T)) \
        - beta * (xp * (rn @ wn.T) + xn * (rn @ wp.T))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # conservation: alpha - beta = 1 and no bias -> sum R_in == sum R_out
    np.testing.assert_allclose(got.sum(), out.sum(), rtol=1e-3)


def test_zplus_is_alphabeta_1_0():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(8, 4).astype(np.float32))
    c1 = Composite(name="a").with_rules(linear="zplus")
    c2 = Composite(name="b").with_rules(linear=("alphabeta", 1.0, 0.0))
    g1 = jax.grad(lambda xx: c1.linear(xx, w).sum())(x)
    g2 = jax.grad(lambda xx: c2.linear(xx, w).sum())(x)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    # forward unchanged by the rule
    np.testing.assert_array_equal(np.asarray(c1.linear(x, w)),
                                  np.asarray(x @ w))


def test_alphabeta_conv2d_runs_and_conserves():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(4, 4, 3, 5).astype(np.float32))
    c = Composite(name="c").with_rules(conv=("alphabeta", 2.0, 1.0))
    out = c.conv2d(x, w, strides=(4, 4))
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(jax.lax.conv_general_dilated(
            x, w, (4, 4), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))),
        rtol=1e-6, atol=1e-6)
    grad = jax.grad(lambda xx: c.conv2d(xx, w, strides=(4, 4)).sum())(x)
    rel = np.asarray(grad * x)
    np.testing.assert_allclose(rel.sum(), float(out.sum()), rtol=1e-3)


def test_summary_shows_rules_and_overrides():
    c = (attnlrp.with_rules(linear=("gamma", 0.25), conv="zplus")
         .override_layers((0, 4), attention="cp"))
    text = c.summary(verbose=False)
    assert "gamma rule (gamma=0.25)" in text
    assert "z+ rule" in text
    assert "layers [0, 4)" in text


def test_vit_per_depth_gamma():
    """ViT with gamma on the first block only: forward identical, heatmap
    differs from both no-gamma and all-gamma (the per-depth grid surface of
    the reference's vit example, vit_torch.py:59-65)."""
    from lxt_tpu.models import vit as jvit

    cfg = jvit.ViTConfig(image_size=16, patch_size=8, hidden_size=32,
                         intermediate_size=64, num_layers=2, num_heads=2,
                         num_classes=4)
    params = jvit.init_params(cfg, jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3))

    first = cp_lrp.override_layers((0, 1), linear_rule=("gamma", 0.25))
    every = cp_lrp.with_rules(linear=("gamma", 0.25))

    def rel(c):
        def target(x):
            # vit logits are [B, classes] — explain the top class
            return jvit.forward(params, cfg, x, c).logits[0].max()
        return input_relevance(target, img)[1]

    logits = lambda c: np.asarray(jvit.forward(params, cfg, img, c).logits)
    np.testing.assert_allclose(logits(first), logits(cp_lrp),
                               rtol=0, atol=1e-6)

    r_first, r_none, r_every = rel(first), rel(cp_lrp), rel(every)
    assert float(jnp.abs(r_first - r_none).max()) > 1e-9
    assert float(jnp.abs(r_first - r_every).max()) > 1e-9
