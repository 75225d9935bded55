"""Llama assembled entirely from EXPLICIT relevance-propagating ops.

This is the model-level validation of the explicit op set
(``lxt_tpu/ops/functional.py`` + ``lxt_tpu/explicit.py``): the same
computation as the reference's vendored explicit Llama
(``lxt/explicit/models/llama.py`` in rachtibat/LRP-eXplains-Transformers),
where every op that needs an LRP rule is an ``lf.*`` call whose VJP
propagates relevance directly —

- linears -> ``lf.linear_epsilon``            (ref llama.py:83-105, Eq. 8)
- RMSNorm -> ``lf.rms_norm_identity``         (ref llama.py:427-428, Prop 3.4)
- RoPE    -> ``lf.add2``/``lf.mul2`` with stop-grad cos/sin (ref :258-259)
- q@k^T   -> ``lf.matmul`` + ``lf.mul2(., 1/sqrt(hd), n=1)`` (ref :379-380)
- softmax -> ``lf.softmax`` Deep-Taylor       (ref SoftmaxDT, :387-390)
- attn@v  -> ``lf.matmul``                    (ref AttentionValueMatmul ->
                                               UniformEpsilonRule, :75-81)
- SiLU    -> identity rule; gate*up -> uniform rule (ref ProjSiluMultiplication
                                               -> UniformRule, :75-78)
- residuals -> ``lf.add2``                    (ref :481,488)

Under the explicit convention the cotangent IS the relevance: seed the vjp
with the explained logit's VALUE (reference ``max_logit.backward(max_logit)``,
examples/paper/llama.py) and the input cotangent is the input relevance —
no final Gradient*Input contraction.

The cp_lrp composite blocks relevance through the softmax (q/k stop-grad)
and the gate branch, with epsilon instead of uniform rules at the products
(reference cp_lrp composite, llama.py:95-105).

Parameters/config are shared with :mod:`lxt_tpu.models.llama` (same pytree),
so any loaded checkpoint runs on either path.
"""

import math

import jax
import jax.numpy as jnp

from lxt_tpu import composites, explicit as ex
from lxt_tpu.models import common
from lxt_tpu.models.common import ModelOutputs
from lxt_tpu.ops import functional as lf
from lxt_tpu.ops.attention import repeat_kv


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _apply_rope_explicit(q, k, cos, sin):
    """RoPE via lf ops with detached tables (ref llama.py:258-259)."""
    cos = jax.lax.stop_gradient(cos)[None, None]
    sin = jax.lax.stop_gradient(sin)[None, None]
    q = lf.add2(lf.mul2(q, cos, 1), lf.mul2(_rotate_half(q), sin, 1))
    k = lf.add2(lf.mul2(k, cos, 1), lf.mul2(_rotate_half(k), sin, 1))
    return q, k


def forward(
    params,
    cfg,
    inputs_embeds,
    composite: composites.Composite = composites.attnlrp,
    *,
    remat: bool = True,
    positions=None,
    probes=None,
):
    """Explicit-path forward. ``cfg``/``params`` as in ``models/llama.py``.

    ``probes``: optional zeros ``[L, B, T, D]`` added (plain ``+``) to each
    layer's output. Under the explicit convention the vjp cotangent at a
    probe IS the relevance at that layer output — the functional counterpart
    of the reference's backward hooks on its explicit LLaMA (reference
    docs/source/latent-feature-attribution.rst: ``register_full_backward_hook``
    on each decoder layer, where "gradients are replaced with LRP scores").
    """
    B, T, D = inputs_embeds.shape
    cp = composite.attention == "cp"
    if positions is None:
        positions = jnp.arange(T, dtype=jnp.int32)
    cos, sin = common.rope_tables(positions, cfg.hd, cfg.rope_theta,
                                  rope_scaling=getattr(cfg, "rope_scaling", None),
                                  seq_len=T)
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.hd
    inv_scale = jnp.float32(1.0 / math.sqrt(hd))
    silu_identity = ex.identity_rule_fn(jax.nn.silu)
    qpos = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    visible = kpos <= qpos
    window = getattr(cfg, "sliding_window", None)
    if window is not None:
        # same semantics as the efficient path (models/llama.py:275):
        # key visible iff q - window < k <= q (Mistral/Phi-3 checkpoints)
        visible = visible & (kpos > qpos - window)
    causal = jnp.where(visible, 0.0, -jnp.inf).astype(jnp.float32)[None, None]

    def linear(x, w, b=None):
        return lf.linear_epsilon(x, w, b)

    def layer_fn(h, xs):
        lp, probe = xs
        res = h
        x = lf.rms_norm_identity(h, lp["ln1"], cfg.rms_eps)
        q = common.split_heads(linear(x, lp["wq"], lp.get("bq")), H, hd)
        k = common.split_heads(linear(x, lp["wk"], lp.get("bk")), Hkv, hd)
        v = common.split_heads(linear(x, lp["wv"], lp.get("bv")), Hkv, hd)
        q, k = _apply_rope_explicit(q, k, cos, sin)
        k = repeat_kv(k, H // Hkv)
        v = repeat_kv(v, H // Hkv)

        if cp:
            # CP-LRP: no relevance through the softmax branch at all
            scores = jax.lax.stop_gradient(
                jnp.matmul(q, k.swapaxes(-1, -2)).astype(jnp.float32)
                * inv_scale + causal)
            probs = jax.lax.stop_gradient(jax.nn.softmax(scores, axis=-1))
            attn = ex.epsilon_rule(jnp.matmul)(probs.astype(v.dtype), v)
        else:
            scores = lf.mul2(lf.matmul(q, k.swapaxes(-1, -2)), inv_scale, 1)
            scores = lf.add2(scores.astype(jnp.float32), causal)
            probs = lf.softmax(scores, -1).astype(v.dtype)
            attn = lf.matmul(probs, v)   # UniformEpsilonRule(n=2) == Prop 3.3
        h = lf.add2(res, linear(common.merge_heads(attn), lp["wo"]))

        res = h
        x = lf.rms_norm_identity(h, lp["ln2"], cfg.rms_eps)
        if cp:
            g = jax.nn.silu(jax.lax.stop_gradient(linear(x, lp["wg"])))
            prod = ex.epsilon_rule(lambda a, b: a * b)(g, linear(x, lp["wu"]))
        else:
            g = silu_identity(linear(x, lp["wg"]))
            prod = lf.mul2(g, linear(x, lp["wu"]))
        h = lf.add2(res, linear(prod, lp["wd"]))
        if probe is not None:
            # plain add: the cotangent passes through unchanged, so the
            # probe's cotangent equals the relevance at this layer output
            h = h + probe
        return h, None

    body = common.remat_wrap(lambda h, xs: layer_fn(h, xs), remat)
    h, _ = jax.lax.scan(body, inputs_embeds, (params["layers"], probes))

    h = lf.rms_norm_identity(h, params["final_norm"], cfg.rms_eps)
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    logits = linear(h, head)
    return ModelOutputs(logits=logits, hidden_states=None)


def explicit_latent_relevance(forward_fn, inputs_embeds, probe_shape):
    """Explicit-path latent relevance: per-layer relevance taps in the same
    single vjp as the input relevance (reference
    docs/source/latent-feature-attribution.rst — its torch backward hooks
    read the cotangent, which IS the relevance on this path; no
    Gradient*Input contraction).

    ``forward_fn(embeds, probes) -> scalar target``. Returns
    ``(value, input_rel [B, T], latent_rel [L, B, T])`` (features summed).
    """
    probes = jnp.zeros(probe_shape, inputs_embeds.dtype)
    value, vjp_fn = jax.vjp(forward_fn, inputs_embeds, probes)
    rel_in, rel_latent = vjp_fn(value)
    return (value, rel_in.astype(jnp.float32).sum(-1),
            rel_latent.astype(jnp.float32).sum(-1))


def explicit_input_relevance(target_fn, inputs_embeds):
    """Explicit-path attribution: one vjp seeded with the target VALUE
    (reference ``max_logit.backward(max_logit)``). The returned cotangent IS
    the relevance — summed over features to per-token scores."""
    value, vjp_fn = jax.vjp(target_fn, inputs_embeds)
    (rel,) = vjp_fn(value)
    return value, rel.astype(jnp.float32).sum(-1)
