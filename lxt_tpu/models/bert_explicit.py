"""BERT encoder assembled entirely from EXPLICIT relevance-propagating ops.

Model-level validation of the explicit op set on an ENCODER layout — the
counterpart of :mod:`lxt_tpu.models.llama_explicit` for the reference's
vendored explicit BERT (``lxt/explicit/models/bert.py`` in
rachtibat/LRP-eXplains-Transformers), whose composite is
LayerNormEpsilon-everywhere plus (ref bert.py:60-65):

- nn.Linear           -> EpsilonRule        -> ``lf.linear_epsilon``
- GELU/ReLU/Tanh      -> IdentityRule       -> ``ex.identity_rule_fn``
- LayerNorm           -> lm.LayerNormEpsilon-> ``lf.layer_norm`` (std-detach)
- embeddings          -> ``lf.add2`` of word + detached type + position
                         embeddings (ref bert.py:249-252)
- attention           -> ``lf.matmul`` scores, ``lf.mul2(., 1/sqrt(hd), 1)``
                         scale, ``lf.add2`` mask, ``lf.softmax`` Deep-Taylor,
                         ``lf.matmul`` probs @ v (ref bert.py:338-373)
- residual + LN       -> ``LayerNorm(lf.add2(h, res))`` (ref bert.py:396,471)
- pooler/classifier   -> dense + tanh identity on [CLS], dense head
                         (ref bert.py:661-673, 1522-)

Under the explicit convention the cotangent IS the relevance: seed the vjp
with the explained logit's VALUE and the input cotangent is the input
relevance — no final Gradient*Input contraction
(:func:`lxt_tpu.models.llama_explicit.explicit_input_relevance`).

Parameters/config are shared with :mod:`lxt_tpu.models.bert` (same pytree),
so any loaded checkpoint runs on either path.
"""

import math

import jax
import jax.numpy as jnp

from lxt_tpu import explicit as ex
from lxt_tpu.models import common
from lxt_tpu.models.common import ModelOutputs
from lxt_tpu.ops import functional as lf


def forward(
    params,
    cfg,
    inputs_embeds,
    *,
    attention_mask=None,
    token_type_ids=None,
    remat: bool = True,
):
    """Explicit-path BERT classification forward. ``cfg``/``params`` as in
    ``models/bert.py``; returns logits ``[B, num_labels]``."""
    B, T, D = inputs_embeds.shape
    H, hd = cfg.num_heads, cfg.hd
    gelu_identity = ex.identity_rule_fn(common.ACTIVATIONS[cfg.act])
    tanh_identity = ex.identity_rule_fn(jnp.tanh)
    inv_scale = jnp.float32(1.0 / math.sqrt(hd))

    # embeddings (ref bert.py:246-253): type embeddings detached, position
    # embeddings participating in the epsilon split, then LayerNormEpsilon
    if token_type_ids is None:
        token_type_ids = jnp.zeros((B, T), jnp.int32)
    type_emb = jax.lax.stop_gradient(params["type_emb"][token_type_ids])
    pos_emb = jnp.broadcast_to(params["pos_emb"][jnp.arange(T)][None],
                               (B, T, D))
    h = lf.add2(lf.add2(inputs_embeds, type_emb), pos_emb)
    h = lf.layer_norm(h, params["emb_ln_w"], params["emb_ln_b"], cfg.ln_eps)

    bias = None
    if attention_mask is not None:
        bias = jnp.where(attention_mask[:, None, None, :] > 0,
                         0.0, -jnp.inf).astype(jnp.float32)

    def layer_fn(h, lp):
        res = h
        q = common.split_heads(lf.linear_epsilon(h, lp["wq"], lp["bq"]), H, hd)
        k = common.split_heads(lf.linear_epsilon(h, lp["wk"], lp["bk"]), H, hd)
        v = common.split_heads(lf.linear_epsilon(h, lp["wv"], lp["bv"]), H, hd)
        scores = lf.mul2(lf.matmul(q, k.swapaxes(-1, -2)), inv_scale, 1)
        if bias is not None:
            scores = lf.add2(scores.astype(jnp.float32),
                             jax.lax.stop_gradient(bias))
        probs = lf.softmax(scores, -1).astype(v.dtype)
        attn = common.merge_heads(lf.matmul(probs, v))
        x = lf.linear_epsilon(attn, lp["wo"], lp["bo"])
        h = lf.layer_norm(lf.add2(x, res), lp["ln1_w"], lp["ln1_b"],
                          cfg.ln_eps)

        res = h
        x = gelu_identity(lf.linear_epsilon(h, lp["wi"], lp["bi"]))
        x = lf.linear_epsilon(x, lp["wout"], lp["bout"])
        h = lf.layer_norm(lf.add2(x, res), lp["ln2_w"], lp["ln2_b"],
                          cfg.ln_eps)
        return h, None

    body = common.remat_wrap(lambda h, xs: layer_fn(h, xs), remat)
    h, _ = jax.lax.scan(body, h, params["layers"])

    pooled = tanh_identity(
        lf.linear_epsilon(h[:, 0], params["pooler_w"], params["pooler_b"]))
    logits = lf.linear_epsilon(pooled, params["cls_w"], params["cls_b"])
    return ModelOutputs(logits=logits, hidden_states=None)
