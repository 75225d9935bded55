"""GPT-2 assembled entirely from EXPLICIT relevance-propagating ops.

Model-level validation of the explicit op set on the reference's third
vendored layout (after the Llama decoder and the BERT encoder): GPT-2's
Conv1D projections, learned absolute positions and pre-LN blocks, following
the rule placement of the reference's vendored explicit GPT-2
(``lxt/explicit/models/gpt2.py`` in rachtibat/LRP-eXplains-Transformers):

- Conv1D            -> ``lf.add2(bias, lf.linear_epsilon(x, W))``
                       (ref gpt2.py:89; HF stores W as [in, out])
- wte + wpe         -> ``lf.add2`` with DETACHED position embeddings
                       (ref gpt2.py:886-887)
- LayerNorm         -> ``lf.layer_norm`` std-detach (lm.LayerNormEpsilon,
                       ref gpt2.py:419-421,733)
- q@k^T             -> ``lf.matmul`` + ``lf.mul2(., 1/sqrt(hd), 1)``; the
                       ``scale_attn_by_inverse_layer_idx`` factor is a
                       second ``lf.mul2`` (ref gpt2.py:229-238)
- causal mask       -> ``where(mask, scores, finfo.min)`` (ref :240-247 —
                       a select, not an additive ``lf.add2`` mask)
- softmax           -> ``lf.softmax`` Deep-Taylor (attnlrp composite,
                       nn.Softmax -> SoftmaxDT, ref :1600-1604) or a full
                       stop (cp_lrp, StopRelevanceRule, ref :1608-1612)
- probs @ v         -> ``lf.matmul`` (UniformEpsilonRule on
                       AttentionValueMatmul) or epsilon with detached probs
                       under cp (ref :1602,1611)
- GELU (gelu_new)   -> identity rule (NewGELUActivation -> IdentityRule)
- residuals         -> ``lf.add2`` (ref :453,481)

The ``reorder_and_upcast_attn`` config path uses ``lf.baddbmm`` exactly
where the reference CALLS it (ref :288,292 — undefined there, a latent
bug; defined here in :mod:`lxt_tpu.ops.functional`): scores as
``baddbmm(0, q, k^T)`` with the scale pre-folded, in f32.

Under the explicit convention the cotangent IS the relevance: seed the vjp
with the explained logit's VALUE
(:func:`lxt_tpu.models.llama_explicit.explicit_input_relevance`).

Parameters/config are shared with :mod:`lxt_tpu.models.gpt2` (same pytree),
so any loaded checkpoint runs on either path.
"""

import jax
import jax.numpy as jnp

from lxt_tpu import composites, explicit as ex
from lxt_tpu.models import common
from lxt_tpu.models.common import ModelOutputs
from lxt_tpu.ops import functional as lf


def forward(
    params,
    cfg,
    inputs_embeds,
    composite: composites.Composite = composites.cp_lrp,
    *,
    position_embeds=None,
    remat: bool = True,
):
    """Explicit-path forward. ``cfg``/``params`` as in ``models/gpt2.py``."""
    B, T, D = inputs_embeds.shape
    cp = composite.attention == "cp"
    H, hd = cfg.num_heads, cfg.hd
    act_identity = ex.identity_rule_fn(common.ACTIVATIONS[cfg.act])
    mask_value = jnp.finfo(jnp.float32).min
    causal_mask = (jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
                   <= jax.lax.broadcasted_iota(jnp.int32, (T, T), 0))[None, None]

    if position_embeds is None:
        position_embeds = params["wpe"][jnp.arange(T)]
    h = lf.add2(inputs_embeds,
                jax.lax.stop_gradient(position_embeds.astype(inputs_embeds.dtype)))

    def conv1d(x, w, b):
        # HF Conv1D keeps weights [in, out]; epsilon rule on the matmul,
        # epsilon-add of the bias (ref gpt2.py:89)
        return lf.add2(b, lf.linear_epsilon(x, w))

    def scale_for(idx):
        scale = hd ** -0.5
        if cfg.scale_attn_by_inverse_layer_idx:
            scale = scale / (idx + 1.0)
        return scale

    def attn_scores(q, k, idx):
        if cfg.reorder_and_upcast_attn:
            # the reference's upcast path: scale folded BEFORE the batched
            # matmul, f32 throughout, via lf.baddbmm (ref gpt2.py:269-295).
            # The fold uses lf.mul2(., ., 1) — relevance passes a detached
            # scalar product unchanged — so the q branch stays symmetric
            # with k and with the plain path (a bare `q * scale` would
            # multiply the q-branch relevance by scale).
            zero = jnp.zeros((), jnp.float32)
            qs = lf.mul2(q, jnp.float32(scale_for(idx)), 1)
            return lf.baddbmm(zero, qs.astype(jnp.float32),
                              k.swapaxes(-1, -2).astype(jnp.float32))
        s = lf.mul2(lf.matmul(q, k.swapaxes(-1, -2)),
                    jnp.float32(hd ** -0.5), 1)
        if cfg.scale_attn_by_inverse_layer_idx:
            s = lf.mul2(s, 1.0 / (idx + 1.0), 1)
        return s

    def layer_fn(h, xs):
        lp, idx = xs
        res = h
        x = lf.layer_norm(h, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
        qkv = conv1d(x, lp["w_attn"], lp["b_attn"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = common.split_heads(q, H, hd)
        k = common.split_heads(k, H, hd)
        v = common.split_heads(v, H, hd)

        if cp:
            # CP-LRP: no relevance through the softmax branch at all
            scores = (jnp.matmul(q, k.swapaxes(-1, -2)).astype(jnp.float32)
                      * scale_for(idx))
            scores = jnp.where(causal_mask, scores, mask_value)
            probs = jax.lax.stop_gradient(jax.nn.softmax(scores, axis=-1))
            attn = ex.epsilon_rule(jnp.matmul)(probs.astype(v.dtype), v)
        else:
            scores = attn_scores(q, k, idx).astype(jnp.float32)
            scores = jnp.where(causal_mask, scores, mask_value)
            probs = lf.softmax(scores, -1).astype(v.dtype)
            attn = lf.matmul(probs, v)   # UniformEpsilonRule == Prop 3.3
        h = lf.add2(conv1d(common.merge_heads(attn), lp["w_proj"],
                           lp["b_proj"]), res)

        res = h
        x = lf.layer_norm(h, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
        x = act_identity(conv1d(x, lp["w_fc"], lp["b_fc"]))
        h = lf.add2(res, conv1d(x, lp["w_out"], lp["b_out"]))
        return h, None

    body = common.remat_wrap(lambda h, xs: layer_fn(h, xs), remat)
    idx = jnp.arange(cfg.num_layers, dtype=jnp.float32)
    h, _ = jax.lax.scan(body, h, (params["layers"], idx))

    h = lf.layer_norm(h, params["lnf_w"], params["lnf_b"], cfg.ln_eps)
    logits = lf.linear_epsilon(h, params["wte"].T)
    return ModelOutputs(logits=logits, hidden_states=None)
