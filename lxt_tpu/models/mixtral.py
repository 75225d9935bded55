"""Mixtral (sparse MoE) with LRP-aware forward.

The reference supports Mixtral only on its explicit path via a vendored
modeling file (``lxt/explicit/models/mixtral.py``): router softmax gets the
Deep-Taylor rule (lf.softmax at :453-504), the routing-weight x expert-output
product gets uniform/epsilon rules (composites at :1221-1249), and experts
run in a data-dependent Python loop — untraceable on TPU.

TPU-first redesign: the expert loop becomes a sort-by-expert grouped matmul
(``lax.ragged_dot`` — only the selected k experts per token compute, static
shapes, default) with a dense one-hot combine kept as the always-correct
parity reference (``moe_impl='dense'``). Both are shardable over an
``expert`` mesh axis and — crucially for LRP — exactly differentiable, so
the Gradient*Input relevance flows through the router softmax (Deep-Taylor
via G*I) and the uniform rule at the weight x expert product.

Under Gradient*Input the top-k hard selection is a piecewise-constant mask —
its zero derivative is mathematically correct (the reference's explicit path
likewise sends no relevance through the topk indices, only through the
selected weights).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lxt_tpu import composites
from lxt_tpu.models import common
from lxt_tpu.models.common import ACTIVATIONS, ModelOutputs, apply_rope
from lxt_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class MixtralConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    num_experts: int = 8
    experts_per_token: int = 2
    rope_theta: float = 1_000_000.0
    rms_eps: float = 1e-5
    act: str = "silu"
    tie_embeddings: bool = False
    #: 'ragged' = sort-by-expert grouped matmul via ``lax.ragged_dot`` —
    #: computes only the selected K experts per token (k/E of the dense
    #: FLOPs); 'dense' = every expert on every token with a one-hot combine
    #: (the always-correct reference path, kept for parity tests).
    moe_impl: str = "ragged"

    @property
    def hd(self):
        return self.hidden_size // self.num_heads

    @classmethod
    def from_hf(cls, hf_config):
        return cls(
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            num_experts=hf_config.num_local_experts,
            experts_per_token=hf_config.num_experts_per_tok,
            rope_theta=hf_config.rope_theta,
            rms_eps=hf_config.rms_norm_eps,
            tie_embeddings=getattr(hf_config, "tie_word_embeddings", False),
        )


def init_params(cfg: MixtralConfig, key, dtype=jnp.float32):
    L, D, I, hd = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size, cfg.hd
    H, Hkv, E = cfg.num_heads, cfg.num_kv_heads, cfg.num_experts
    ks = jax.random.split(key, 12)
    u = lambda k, s: common.uniform_init(k, s, dtype=dtype)  # noqa: E731
    layers = {
        "ln1": jnp.ones((L, D), dtype), "ln2": jnp.ones((L, D), dtype),
        "wq": u(ks[0], (L, D, H * hd)), "wk": u(ks[1], (L, D, Hkv * hd)),
        "wv": u(ks[2], (L, D, Hkv * hd)), "wo": u(ks[3], (L, H * hd, D)),
        "w_router": u(ks[4], (L, D, E)),
        "wg": u(ks[5], (L, E, D, I)),   # expert gate (HF w1)
        "wd": u(ks[6], (L, E, I, D)),   # expert down (HF w2)
        "wu": u(ks[7], (L, E, D, I)),   # expert up   (HF w3)
    }
    params = {
        "embed": u(ks[8], (cfg.vocab_size, D)),
        "final_norm": jnp.ones((D,), dtype),
        "layers": layers,
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = u(ks[9], (D, cfg.vocab_size))
    return params


def embed(params, input_ids):
    return params["embed"][input_ids]


def _route(x, lp, cfg, composite):
    """Router: f32 softmax over ALL experts -> top-k -> renormalize
    (HF semantics; relevance flows through the softmax via G*I = Deep
    Taylor, through top-k as a gather)."""
    router_logits = composite.linear(x, lp["w_router"], site="w_router")
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    top_w, top_idx = jax.lax.top_k(probs, cfg.experts_per_token)
    # renormalization denominator under the norm rule: stop-grad makes the
    # renorm LINEAR in top_w, so G*I through it IS the epsilon rule — the
    # efficient-framing counterpart of the reference's NormWeight ->
    # EpsilonRule (mixtral.py:1233); 'vanilla' keeps plain autodiff
    denom = top_w.sum(-1, keepdims=True)
    if composite.norm == "identity":
        denom = jax.lax.stop_gradient(denom)
    top_w = top_w / denom
    return top_w, top_idx


def _dq(w, dtype):
    from lxt_tpu.ops.quant import QuantizedTensor, dequantize
    return dequantize(w, dtype) if isinstance(w, QuantizedTensor) else w


def moe_block_dense(x, lp, cfg: MixtralConfig, composite, act_fn):
    """Sparse-MoE MLP as a dense one-hot combine (see module docstring):
    every expert runs on every token (E/k extra FLOPs), fully static."""
    B, T, D = x.shape
    E = cfg.num_experts

    top_w, top_idx = _route(x, lp, cfg, composite)                   # [B,T,K]
    # scatter the renormalized weights back to a dense [B,T,E] map; the
    # one-hot mask is piecewise-constant (no gradient), the weights carry it
    onehot = jax.nn.one_hot(top_idx, E, dtype=top_w.dtype)           # [B,T,K,E]
    dense_w = (top_w[..., None] * onehot).sum(-2).astype(x.dtype)    # [B,T,E]

    gate = jnp.einsum("btd,edi->btei", x, _dq(lp["wg"], x.dtype))
    up = jnp.einsum("btd,edi->btei", x, _dq(lp["wu"], x.dtype))
    hidden = composite.gated_mul(act_fn, gate, up)
    expert_out = jnp.einsum("btei,eid->bted", hidden, _dq(lp["wd"], x.dtype))

    # routing weight x expert output — uniform rule (reference
    # GateWeightMultiplication -> UniformRule, mixtral.py:1221-1249)
    weighted = composite.mul_uniform(dense_w[..., None], expert_out)
    return weighted.sum(-2)


def moe_block_ragged(x, lp, cfg: MixtralConfig, composite, act_fn):
    """Sparse-MoE MLP as a sort-by-expert grouped matmul: the N*K
    (token, expert) assignments are sorted by expert (static shapes — the
    sort is a gather under jit) and each expert multiplies only its own
    contiguous row group via ``jax.lax.ragged_dot``. k/E of the dense
    FLOPs, relevance-EXACT vs the dense path: gathers/scatter-adds are
    linear, and the same rules apply at the same sites (gated_mul uniform,
    routing-weight x expert-output uniform). Replaces the reference's
    data-dependent Python expert loop
    (lxt/explicit/models/mixtral.py:480-501), which is untraceable on TPU.
    """
    B, T, D = x.shape
    E, K = cfg.num_experts, cfg.experts_per_token
    N = B * T
    xf = x.reshape(N, D)

    top_w, top_idx = _route(xf, lp, cfg, composite)                  # [N,K]

    expert_flat = top_idx.reshape(-1)                                # [N*K]
    token_flat = jnp.arange(N * K, dtype=jnp.int32) // K
    order = jnp.argsort(expert_flat)
    tok_sorted = token_flat[order]
    gathered = xf[tok_sorted]                                        # [N*K,D]
    group_sizes = jnp.bincount(expert_flat, length=E).astype(jnp.int32)

    def grouped(lhs, w):
        return jax.lax.ragged_dot(lhs, _dq(w, x.dtype), group_sizes)

    gate = grouped(gathered, lp["wg"])
    up = grouped(gathered, lp["wu"])
    hidden = composite.gated_mul(act_fn, gate, up)
    expert_out = grouped(hidden, lp["wd"])                           # [N*K,D]

    w_sorted = top_w.reshape(-1)[order].astype(x.dtype)
    weighted = composite.mul_uniform(w_sorted[:, None], expert_out)
    out = jnp.zeros((N, D), weighted.dtype).at[tok_sorted].add(weighted)
    return out.reshape(B, T, D).astype(x.dtype)


def moe_block(x, lp, cfg: MixtralConfig, composite, act_fn):
    if cfg.moe_impl == "ragged":
        return moe_block_ragged(x, lp, cfg, composite, act_fn)
    return moe_block_dense(x, lp, cfg, composite, act_fn)


def forward(
    params,
    cfg: MixtralConfig,
    inputs_embeds,
    composite: composites.Composite = composites.attnlrp,
    *,
    probes=None,
    output_hidden_states: bool = False,
    remat: bool = True,
    positions=None,
    attention_mask=None,
    kv_begin=None,
    attn_impl: str = "auto",
    layer_driver=None,
    logits_at=None,
):
    B, T, D = inputs_embeds.shape
    act_fn = ACTIVATIONS[cfg.act]
    positions, bias, kv_begin = common.padding_setup(
        attention_mask, kv_begin, positions, T)
    cos, sin = common.rope_tables(positions, cfg.hd, cfg.rope_theta)
    scale = cfg.hd ** -0.5
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.hd

    def make_layer(comp):
        def layer_fn(h, xs):
            lp, probe = xs
            x = comp.rms_norm(h, lp["ln1"], cfg.rms_eps)
            q = common.split_heads(comp.linear(x, lp["wq"], site="wq"), H, hd)
            k = common.split_heads(comp.linear(x, lp["wk"], site="wk"), Hkv, hd)
            v = common.split_heads(comp.linear(x, lp["wv"], site="wv"), Hkv, hd)
            q, k = apply_rope(q, k, cos, sin)
            attn = attention(q, k, v, causal=True, bias=bias, composite=comp,
                             scale=scale, impl=attn_impl, kv_begin=kv_begin)
            h = h + comp.linear(common.merge_heads(attn), lp["wo"], site="wo")
            x = comp.rms_norm(h, lp["ln2"], cfg.rms_eps)
            h = h + moe_block(x, lp, cfg, comp, act_fn)
            if probe is not None:
                h = h + probe
            return h, (h if output_hidden_states else None)
        return layer_fn

    h, hiddens = common.run_stacked_layers(
        make_layer, composite, remat, layer_driver, inputs_embeds,
        (params["layers"], probes))

    h = composite.rms_norm(h, params["final_norm"], cfg.rms_eps)
    if logits_at is not None:
        h = common.take_frontier(h, logits_at)
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    logits = composite.linear(h, head)

    if output_hidden_states:
        hiddens = jnp.concatenate([inputs_embeds[None], hiddens], axis=0)
    return ModelOutputs(logits=logits, hidden_states=hiddens)


def params_from_hf(state_dict, cfg: MixtralConfig, dtype=np.float32):
    """Convert HF MixtralForCausalLM weights (experts stacked on axis 1)."""

    def t(name):
        w = state_dict[name]
        if hasattr(w, "detach"):
            w = w.detach().to("cpu").float().numpy()
        return np.asarray(w, dtype=dtype)

    L, E = cfg.num_layers, cfg.num_experts
    pre = "model.layers."

    def stack(fmt, transpose=False):
        ws = [t(pre + fmt.format(i)) for i in range(L)]
        return jnp.asarray(np.stack([w.T if transpose else w for w in ws]))

    def stack_experts(fmt):
        ws = [
            np.stack([t(pre + fmt.format(i, e)).T for e in range(E)])
            for i in range(L)
        ]
        return jnp.asarray(np.stack(ws))

    layers = {
        "ln1": stack("{}.input_layernorm.weight"),
        "ln2": stack("{}.post_attention_layernorm.weight"),
        "wq": stack("{}.self_attn.q_proj.weight", True),
        "wk": stack("{}.self_attn.k_proj.weight", True),
        "wv": stack("{}.self_attn.v_proj.weight", True),
        "wo": stack("{}.self_attn.o_proj.weight", True),
        "w_router": stack("{}.block_sparse_moe.gate.weight", True),
        "wg": stack_experts("{}.block_sparse_moe.experts.{}.w1.weight"),
        "wd": stack_experts("{}.block_sparse_moe.experts.{}.w2.weight"),
        "wu": stack_experts("{}.block_sparse_moe.experts.{}.w3.weight"),
    }
    params = {
        "embed": jnp.asarray(t("model.embed_tokens.weight")),
        "final_norm": jnp.asarray(t("model.norm.weight")),
        "layers": layers,
    }
    if not cfg.tie_embeddings and "lm_head.weight" in state_dict:
        params["lm_head"] = jnp.asarray(t("lm_head.weight").T)
    return params
