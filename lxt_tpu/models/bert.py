"""BERT with LRP-aware forward (encoder + sequence-classification head).

The reference vendors a full patched modeling_bert (lxt/efficient/models/
bert.py, ~2000 LoC of inline edits). The actual rule content is small and is
what we reproduce: uniform rule at attention (q,k /4, v /2 — equivalent to
its /2-after-QK^T + /2-after-probs.V edits at bert.py:321,362,458-470),
identity rule on the intermediate/pooler/head activations (bert.py:563,772,
788), stop-grad-std LayerNorm, dropout off.

Padding masks enter as an additive bias (einsum attention path, non-causal).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lxt_tpu import composites
from lxt_tpu.models import common
from lxt_tpu.models.common import ModelOutputs
from lxt_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 512
    type_vocab_size: int = 2
    ln_eps: float = 1e-12
    act: str = "gelu_exact"
    num_labels: int = 2

    @property
    def hd(self):
        return self.hidden_size // self.num_heads

    @classmethod
    def from_hf(cls, hf_config, num_labels=None):
        return cls(
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            max_positions=hf_config.max_position_embeddings,
            type_vocab_size=hf_config.type_vocab_size,
            ln_eps=hf_config.layer_norm_eps,
            num_labels=num_labels or getattr(hf_config, "num_labels", 2),
        )


def init_params(cfg: BertConfig, key, dtype=jnp.float32):
    L, D, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    ks = jax.random.split(key, 12)
    u = lambda k, s: common.uniform_init(k, s, dtype=dtype)  # noqa: E731
    layers = {
        "wq": u(ks[0], (L, D, D)), "bq": jnp.zeros((L, D), dtype),
        "wk": u(ks[1], (L, D, D)), "bk": jnp.zeros((L, D), dtype),
        "wv": u(ks[2], (L, D, D)), "bv": jnp.zeros((L, D), dtype),
        "wo": u(ks[3], (L, D, D)), "bo": jnp.zeros((L, D), dtype),
        "ln1_w": jnp.ones((L, D), dtype), "ln1_b": jnp.zeros((L, D), dtype),
        "wi": u(ks[4], (L, D, I)), "bi": jnp.zeros((L, I), dtype),
        "wout": u(ks[5], (L, I, D)), "bout": jnp.zeros((L, D), dtype),
        "ln2_w": jnp.ones((L, D), dtype), "ln2_b": jnp.zeros((L, D), dtype),
    }
    return {
        "word_emb": u(ks[6], (cfg.vocab_size, D)),
        "pos_emb": u(ks[7], (cfg.max_positions, D)),
        "type_emb": u(ks[8], (cfg.type_vocab_size, D)),
        "emb_ln_w": jnp.ones((D,), dtype), "emb_ln_b": jnp.zeros((D,), dtype),
        "pooler_w": u(ks[9], (D, D)), "pooler_b": jnp.zeros((D,), dtype),
        "cls_w": u(ks[10], (D, cfg.num_labels)),
        "cls_b": jnp.zeros((cfg.num_labels,), dtype),
        "layers": layers,
    }


def embed(params, input_ids):
    """Word embeddings only — the attribution input (position/type embeddings
    and the embedding LayerNorm are applied inside forward, matching HF's
    inputs_embeds semantics)."""
    return params["word_emb"][input_ids]


def attention_bias_from_mask(attention_mask, dtype=jnp.float32):
    """HF-style [B, T] 1/0 mask -> additive [B, 1, 1, T] bias."""
    return jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -jnp.inf).astype(dtype)


def forward(
    params,
    cfg: BertConfig,
    inputs_embeds,
    composite: composites.Composite = composites.attnlrp,
    *,
    attention_mask=None,
    kv_end=None,
    token_type_ids=None,
    probes=None,
    output_hidden_states: bool = False,
    remat: bool = True,
    attn_impl: str = "auto",
    layer_driver=None,
):
    """Returns ModelOutputs with ``logits = [B, num_labels]`` (classification
    via pooler, the reference's BERT quickstart flow). The full sequence
    hidden states are in ``hidden_states`` when requested.

    Right-padded batches (the HF BERT convention): pass ``kv_end`` ([B]
    number of real tokens per example) instead of ``attention_mask`` to keep
    the flash-attention path engaged (padded key blocks are skipped
    in-kernel); an arbitrary ``attention_mask`` lowers to an additive bias
    on the einsum path."""
    B, T, D = inputs_embeds.shape
    act_fn = common.ACTIVATIONS[cfg.act]

    pos = params["pos_emb"][jnp.arange(T)]
    if token_type_ids is None:
        type_e = params["type_emb"][0]
    else:
        type_e = params["type_emb"][token_type_ids]
    h = inputs_embeds + pos + type_e
    h = composite.layer_norm(h, params["emb_ln_w"], params["emb_ln_b"], cfg.ln_eps)
    inputs_post = h

    bias = None
    if attention_mask is not None:
        assert kv_end is None, "pass attention_mask OR kv_end, not both"
        bias = attention_bias_from_mask(attention_mask, h.dtype)
    if kv_end is not None:
        kv_end = jnp.asarray(kv_end, jnp.int32)
    H, hd = cfg.num_heads, cfg.hd

    def make_layer(comp):
        def layer_fn(h, xs):
            lp, probe = xs
            q = common.split_heads(comp.linear(h, lp["wq"], lp["bq"], site="wq"), H, hd)
            k = common.split_heads(comp.linear(h, lp["wk"], lp["bk"], site="wk"), H, hd)
            v = common.split_heads(comp.linear(h, lp["wv"], lp["bv"], site="wv"), H, hd)
            attn = attention(q, k, v, bias=bias, composite=comp,
                             impl=attn_impl, kv_end=kv_end)
            a = comp.linear(common.merge_heads(attn), lp["wo"], lp["bo"], site="wo")
            h = comp.layer_norm(h + a, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
            x = comp.act(act_fn, comp.linear(h, lp["wi"], lp["bi"], site="wi"))
            x = comp.linear(x, lp["wout"], lp["bout"], site="wout")
            h = comp.layer_norm(h + x, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
            if probe is not None:
                h = h + probe
            return h, (h if output_hidden_states else None)
        return layer_fn

    h, hiddens = common.run_stacked_layers(
        make_layer, composite, remat, layer_driver, inputs_post,
        (params["layers"], probes))

    pooled = composite.act(
        jnp.tanh, composite.linear(h[:, 0], params["pooler_w"], params["pooler_b"], site="pooler_w"))
    logits = composite.linear(pooled, params["cls_w"], params["cls_b"], site="cls_w")

    if output_hidden_states:
        hiddens = jnp.concatenate([inputs_post[None], hiddens], axis=0)
    return ModelOutputs(logits=logits, hidden_states=hiddens)


def params_from_hf(state_dict, cfg: BertConfig, dtype=np.float32):
    """Convert HF BertForSequenceClassification weights."""

    def t(name):
        w = state_dict[name]
        if hasattr(w, "detach"):
            w = w.detach().to("cpu").float().numpy()
        return np.asarray(w, dtype=dtype)

    L = cfg.num_layers
    pre = "bert.encoder.layer."

    def stack(fmt, transpose=False):
        ws = [t(pre + fmt.format(i)) for i in range(L)]
        return jnp.asarray(np.stack([w.T if transpose else w for w in ws]))

    layers = {
        "wq": stack("{}.attention.self.query.weight", True),
        "bq": stack("{}.attention.self.query.bias"),
        "wk": stack("{}.attention.self.key.weight", True),
        "bk": stack("{}.attention.self.key.bias"),
        "wv": stack("{}.attention.self.value.weight", True),
        "bv": stack("{}.attention.self.value.bias"),
        "wo": stack("{}.attention.output.dense.weight", True),
        "bo": stack("{}.attention.output.dense.bias"),
        "ln1_w": stack("{}.attention.output.LayerNorm.weight"),
        "ln1_b": stack("{}.attention.output.LayerNorm.bias"),
        "wi": stack("{}.intermediate.dense.weight", True),
        "bi": stack("{}.intermediate.dense.bias"),
        "wout": stack("{}.output.dense.weight", True),
        "bout": stack("{}.output.dense.bias"),
        "ln2_w": stack("{}.output.LayerNorm.weight"),
        "ln2_b": stack("{}.output.LayerNorm.bias"),
    }
    return {
        "word_emb": jnp.asarray(t("bert.embeddings.word_embeddings.weight")),
        "pos_emb": jnp.asarray(t("bert.embeddings.position_embeddings.weight")),
        "type_emb": jnp.asarray(t("bert.embeddings.token_type_embeddings.weight")),
        "emb_ln_w": jnp.asarray(t("bert.embeddings.LayerNorm.weight")),
        "emb_ln_b": jnp.asarray(t("bert.embeddings.LayerNorm.bias")),
        "pooler_w": jnp.asarray(t("bert.pooler.dense.weight").T),
        "pooler_b": jnp.asarray(t("bert.pooler.dense.bias")),
        "cls_w": jnp.asarray(t("classifier.weight").T),
        "cls_b": jnp.asarray(t("classifier.bias")),
        "layers": layers,
    }
