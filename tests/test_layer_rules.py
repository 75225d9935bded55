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


def test_flat_linear_closed_form():
    """Flat rule: every input gets an equal share of each output's relevance
    regardless of x and w — R_j = sum_k R_k / N (zennit Flat)."""
    rng = np.random.RandomState(3)
    x = rng.randn(4, 16).astype(np.float32)
    w = rng.randn(16, 5).astype(np.float32)
    c = Composite(name="f").with_rules(linear="flat")
    grad = jax.grad(lambda xx: c.linear(xx, jnp.asarray(w)).sum())(
        jnp.asarray(x))
    got = np.asarray(grad) * x
    out = x @ w
    want = np.broadcast_to(out.sum(-1, keepdims=True) / 16, x.shape)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # exact conservation
    np.testing.assert_allclose(got.sum(), out.sum(), rtol=1e-4)
    # forward unchanged by the rule (vs XLA's own matmul — reassociation
    # keeps numpy's @ a few ulps away)
    np.testing.assert_array_equal(
        np.asarray(c.linear(jnp.asarray(x), jnp.asarray(w))),
        np.asarray(jnp.matmul(jnp.asarray(x), jnp.asarray(w))))


def test_wsquare_linear_closed_form():
    """WSquare rule: R_j = sum_k w_jk^2 / (sum_j' w_j'k^2) R_k — input-
    agnostic, redistributes by weight magnitude (zennit WSquare)."""
    rng = np.random.RandomState(4)
    x = rng.randn(3, 12).astype(np.float32)
    w = rng.randn(12, 6).astype(np.float32)
    c = Composite(name="w2").with_rules(linear="wsquare")
    grad = jax.grad(lambda xx: c.linear(xx, jnp.asarray(w)).sum())(
        jnp.asarray(x))
    got = np.asarray(grad) * x
    out = x @ w
    w2 = w * w
    want = (out / (w2.sum(0) + 1e-6)) @ w2.T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got.sum(), out.sum(), rtol=1e-4)


def test_zbox_linear_closed_form_and_conservation():
    """ZBox with input bounds [l, h]: R_j = sum_k (x w - l w+ - h w-)_jk /
    z_k R_k; conserves exactly for bias-free layers (zennit ZBox)."""
    rng = np.random.RandomState(5)
    x = rng.rand(4, 10).astype(np.float32)  # bounded input in [0, 1]
    w = rng.randn(10, 7).astype(np.float32)
    low, high = 0.0, 1.0
    c = Composite(name="zb").with_rules(linear=("zbox", low, high))
    grad = jax.grad(lambda xx: c.linear(xx, jnp.asarray(w)).sum())(
        jnp.asarray(x))
    got = np.asarray(grad) * x
    out = x @ w
    wp, wn = np.clip(w, 0, None), np.clip(w, None, 0)
    z = x @ w - low * np.ones_like(x) @ wp - high * np.ones_like(x) @ wn
    stab = lambda zz: zz + np.where(zz >= 0, 1e-6, -1e-6)
    s = out / stab(z)
    want = x * (s @ w.T) - low * (s @ wp.T) - high * (s @ wn.T)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got.sum(), out.sum(), rtol=1e-3)


def test_zbox_conv2d_first_layer_conserves():
    """ZBox on the ViT-style patch conv: relevance into the pixels sums to
    the explained output (bias-free), the canonical bounded-pixel input rule."""
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(4, 4, 3, 5).astype(np.float32))
    c = Composite(name="zbc").with_rules(conv=("zbox", 0.0, 1.0))
    out = c.conv2d(x, w, strides=(4, 4))
    grad = jax.grad(lambda xx: c.conv2d(xx, w, strides=(4, 4)).sum())(x)
    rel = np.asarray(grad * x)
    np.testing.assert_allclose(rel.sum(), float(out.sum()), rtol=1e-3)


def test_flat_wsquare_ignore_input_value():
    """Flat/WSquare redistribute independently of the input point: scaling x
    scales relevance only through R_out, not through the redistribution
    weights — relevance RATIOS between inputs stay fixed."""
    rng = np.random.RandomState(7)
    # inputs bounded away from 0: the G*I sandwich divides and re-multiplies
    # by stabilize(x), whose eps contributes ~1e-6/|x| relative noise
    x = jnp.asarray((rng.rand(1, 8) + 0.5).astype(np.float32))
    w = jnp.asarray(rng.randn(8, 4).astype(np.float32))
    for spec in ("flat", "wsquare"):
        c = Composite(name="t").with_rules(linear=spec)
        g1 = jax.grad(lambda xx: c.linear(xx, w).sum())(x) * x
        g2 = jax.grad(lambda xx: c.linear(xx, w).sum())(2.0 * x) * (2.0 * x)
        r1, r2 = np.asarray(g1)[0], np.asarray(g2)[0]
        np.testing.assert_allclose(r2, 2.0 * r1, rtol=1e-4, atol=1e-6)


def test_bad_rule_specs_rejected():
    with pytest.raises(ValueError, match="low < high"):
        Composite(name="x").with_rules(linear=("zbox", 1.0, 0.0))
    with pytest.raises(ValueError, match="unknown rule spec"):
        Composite(name="x").with_rules(linear=("nonsense",))


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


def test_override_layers_minus_one_selects_last_layer():
    """Regression: an int -1 selector must hit the LAST layer (it used to
    resolve to the empty range (-1, 0) and silently match nothing)."""
    c = attnlrp.override_layers(-1, gate="cp")
    L = 4
    assert c.for_layer(L - 1, L).gate == "cp"
    for i in range(L - 1):
        assert c.for_layer(i, L).gate == "uniform"
    # and a model-level check: equals overriding the explicit last index
    c2 = attnlrp.override_layers(3, gate="cp")
    for i in range(L):
        assert c.for_layer(i, L).gate == c2.for_layer(i, L).gate


def test_modz_zero_input_artifact_documented():
    """Pin the documented G*I caveat: input-agnostic rules read zero
    relevance at exactly-zero inputs (x * grad with finite grad); nonzero
    inputs carry the full uniform share."""
    from lxt_tpu.ops.rules import modz_linear
    x = jnp.asarray([[0.0, 0.5, 1.0, 0.25]], jnp.float32)
    w = jnp.ones((4, 3), jnp.float32)
    g = jax.grad(lambda xx: modz_linear(xx, w, None, ("flat",)).sum())(x)
    rel = np.asarray(g * x)[0]
    assert rel[0] == 0.0                       # the artifact
    np.testing.assert_allclose(rel[1:], rel[1], rtol=1e-5)  # equal shares


# ---------------------------------------------------------------------------
# site-keyed rule selectors (Composite.override_sites)
# ---------------------------------------------------------------------------

def test_override_sites_vit_zbox_patch_gamma_mlp():
    """The reference's LayerMapComposite shape (vit_torch.py:59-65): z-box
    on the patch-embed conv + gamma on MLP linears ONLY. Verified against a
    hand-built equivalent forward (explicit rule primitives at exactly
    those sites); attention projections must stay implicit-epsilon."""
    from lxt_tpu.models import vit as jvit
    from lxt_tpu.ops.rules import modz_conv2d

    cfg = jvit.ViTConfig(image_size=16, patch_size=8, hidden_size=32,
                         intermediate_size=64, num_layers=2, num_heads=2,
                         num_classes=4)
    params = jvit.init_params(cfg, jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3))

    comp = cp_lrp.override_sites(conv_w=("zbox", 0.0, 1.0),
                                 w_fc=("gamma", 0.25),
                                 w_out=("gamma", 0.25))

    def rel(c):
        def target(x):
            return jvit.forward(params, cfg, x, c).logits[0].max()
        return input_relevance(target, img)[1]

    # forward unchanged (rules touch only the backward)
    np.testing.assert_allclose(
        np.asarray(jvit.forward(params, cfg, img, comp).logits),
        np.asarray(jvit.forward(params, cfg, img, cp_lrp).logits),
        rtol=0, atol=1e-6)

    # hand-built: a composite subclass-free equivalent using a modified
    # forward — run the SAME sites through the explicit rule primitives by
    # overriding the composite fields they'd consult
    class HandComposite(Composite):
        def linear(self, x, w, b=None, site=None):
            if site in ("w_fc", "w_out"):
                return gamma_linear(x, w, b, 0.25)
            return Composite.linear(self, x, w, b)  # no site rules

        def conv2d(self, x, w, b=None, strides=(1, 1), padding="VALID",
                   site=None):
            return modz_conv2d(x, w, b, strides, padding,
                               ("zbox", 0.0, 1.0))

    hand = HandComposite(name="hand", attention="cp", gate="cp")
    np.testing.assert_allclose(np.asarray(rel(comp)), np.asarray(rel(hand)),
                               rtol=1e-5, atol=1e-7)

    # differs from both plain cp_lrp and layer-wide gamma (so the selector
    # is doing real site-scoped work)
    every = cp_lrp.with_rules(linear=("gamma", 0.25))
    assert float(jnp.abs(rel(comp) - rel(cp_lrp)).max()) > 1e-9
    assert float(jnp.abs(rel(comp) - rel(every)).max()) > 1e-9


def test_override_sites_epsilon_pin_and_merge():
    """A site set to None pins implicit epsilon even when a layer-wide rule
    is set; later override_sites calls win per site; hashable."""
    c = (attnlrp.with_rules(linear=("gamma", 0.5))
         .override_sites(wq=None)
         .override_sites(wk=("alphabeta", 1.0, 0.0)))
    assert c._site_rule("wq", c._linear_rule()) is None
    assert c._site_rule("wk", c._linear_rule()) == ("alphabeta", 1.0, 0.0)
    assert c._site_rule("wv", c._linear_rule()) == ("gamma", 0.5)
    c2 = c.override_sites(wk=None)
    assert c2._site_rule("wk", c2._linear_rule()) is None
    hash(c2)

    # llama end-to-end: gamma on MLP only differs from gamma everywhere,
    # forward identical
    cfg, params, e = _llama(L=2)
    mlp_only = attnlrp.override_sites(wg=("gamma", 0.25),
                                      wu=("gamma", 0.25),
                                      wd=("gamma", 0.25))
    every = attnlrp.with_rules(linear=("gamma", 0.25))
    v0, r0 = _rel(cfg, params, e, attnlrp)
    v1, r1 = _rel(cfg, params, e, mlp_only)
    v2, r2 = _rel(cfg, params, e, every)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    assert float(jnp.abs(r1 - r0).max()) > 1e-12
    assert float(jnp.abs(r1 - r2).max()) > 1e-12
