"""GPT-2 with LRP-aware forward.

Reference patch map: ``lxt/efficient/models/gpt2.py:11-32`` — identity rule on
the MLP activation, stop-grad-std LayerNorm, uniform rule at attention q/k/v;
CP-LRP is the reference's recommended composite for GPT-2 (negative logits
break the AttnLRP softmax bias handling, gpt2.py:24-26).

HF quirks preserved: Conv1D weights are already ``[in, out]`` (no transpose),
lm_head is tied to wte, learned absolute position embeddings, gelu_new.
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
class GPT2Config:
    vocab_size: int = 50257
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 1024
    ln_eps: float = 1e-5
    act: str = "gelu_new"
    scale_attn_by_inverse_layer_idx: bool = False
    #: HF GPT2Config.reorder_and_upcast_attn: compute attention scores in
    #: float32 with the scale folded before the matmul. Consumed (not
    #: ignored): our attention ALWAYS computes scores in f32 with the scale
    #: applied outside the matmul — in f32 the two orderings are the same
    #: operator, so this path is upcast-correct by construction (verified by
    #: tests/test_parity_gpt2 against HF's _upcast_and_reordered_attn; the
    #: reference's own flag path is broken — it calls the undefined
    #: lf.baddbmm, lxt/explicit/models/gpt2.py:288).
    reorder_and_upcast_attn: bool = False

    @property
    def hd(self):
        return self.hidden_size // self.num_heads

    @classmethod
    def from_hf(cls, hf_config):
        return cls(
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.n_embd,
            num_layers=hf_config.n_layer,
            num_heads=hf_config.n_head,
            max_positions=hf_config.n_positions,
            ln_eps=hf_config.layer_norm_epsilon,
            scale_attn_by_inverse_layer_idx=getattr(
                hf_config, "scale_attn_by_inverse_layer_idx", False),
            reorder_and_upcast_attn=getattr(
                hf_config, "reorder_and_upcast_attn", False),
        )


def init_params(cfg: GPT2Config, key, dtype=jnp.float32):
    L, D = cfg.num_layers, cfg.hidden_size
    ks = jax.random.split(key, 8)
    u = lambda k, s: common.uniform_init(k, s, dtype=dtype)  # noqa: E731
    layers = {
        "ln1_w": jnp.ones((L, D), dtype), "ln1_b": jnp.zeros((L, D), dtype),
        "ln2_w": jnp.ones((L, D), dtype), "ln2_b": jnp.zeros((L, D), dtype),
        "w_attn": u(ks[0], (L, D, 3 * D)), "b_attn": jnp.zeros((L, 3 * D), dtype),
        "w_proj": u(ks[1], (L, D, D)), "b_proj": jnp.zeros((L, D), dtype),
        "w_fc": u(ks[2], (L, D, 4 * D)), "b_fc": jnp.zeros((L, 4 * D), dtype),
        "w_out": u(ks[3], (L, 4 * D, D)), "b_out": jnp.zeros((L, D), dtype),
    }
    return {
        "wte": u(ks[4], (cfg.vocab_size, D)),
        "wpe": u(ks[5], (cfg.max_positions, D)),
        "lnf_w": jnp.ones((D,), dtype), "lnf_b": jnp.zeros((D,), dtype),
        "layers": layers,
    }


def embed(params, input_ids, positions=None):
    """Token + learned position embeddings (relevance flows into both; the
    reference attributes w.r.t. inputs_embeds which HF adds to wpe inside)."""
    T = input_ids.shape[-1]
    if positions is None:
        positions = jnp.arange(T)
    return params["wte"][input_ids], params["wpe"][positions]


def forward(
    params,
    cfg: GPT2Config,
    inputs_embeds,
    composite: composites.Composite = composites.cp_lrp,
    *,
    position_embeds=None,
    probes=None,
    output_hidden_states: bool = False,
    remat: bool = True,
    attention_mask=None,
    kv_begin=None,
    attn_impl: str = "auto",
    layer_driver=None,
    logits_at=None,
):
    """Causal-LM forward; default composite is CP-LRP (reference gpt2.py:24-26).

    ``inputs_embeds``: token embeddings [B, T, D]. Position embeddings are
    added here (pass ``position_embeds`` to customize/attribute them).
    """
    B, T, D = inputs_embeds.shape
    positions, bias, kv_begin = common.padding_setup(
        attention_mask, kv_begin, None, T)
    if position_embeds is None:
        position_embeds = params["wpe"][positions]
    h = inputs_embeds + position_embeds
    inputs_sum = h

    act_fn = common.ACTIVATIONS[cfg.act]
    H, hd = cfg.num_heads, cfg.hd
    layer_idx = jnp.arange(cfg.num_layers, dtype=jnp.float32)

    def make_layer(comp):
        def layer_fn(h, xs):
            lp, probe, idx = xs
            x = comp.layer_norm(h, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
            qkv = comp.linear(x, lp["w_attn"], lp["b_attn"], site="w_attn")
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = common.split_heads(q, H, hd)
            k = common.split_heads(k, H, hd)
            v = common.split_heads(v, H, hd)
            scale = hd ** -0.5
            if cfg.scale_attn_by_inverse_layer_idx:
                scale = scale / (idx + 1.0)
            attn = attention(q, k, v, causal=True, bias=bias, composite=comp,
                             scale=scale, impl=attn_impl, kv_begin=kv_begin)
            h = h + comp.linear(common.merge_heads(attn), lp["w_proj"],
                                lp["b_proj"], site="w_proj")
            x = comp.layer_norm(h, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
            x = comp.act(act_fn, comp.linear(x, lp["w_fc"], lp["b_fc"], site="w_fc"))
            h = h + comp.linear(x, lp["w_out"], lp["b_out"], site="w_out")
            if probe is not None:
                h = h + probe
            return h, (h if output_hidden_states else None)
        return layer_fn

    h, hiddens = common.run_stacked_layers(
        make_layer, composite, remat, layer_driver, inputs_sum,
        (params["layers"], probes, layer_idx))

    h = composite.layer_norm(h, params["lnf_w"], params["lnf_b"], cfg.ln_eps)
    if logits_at is not None:
        h = common.take_frontier(h, logits_at)
    logits = composite.linear(h, params["wte"].T, site="wte")

    if output_hidden_states:
        hiddens = jnp.concatenate([inputs_sum[None], hiddens], axis=0)
    return ModelOutputs(logits=logits, hidden_states=hiddens)


def params_from_hf(state_dict, cfg: GPT2Config, dtype=np.float32):
    """Convert an HF GPT2LMHeadModel state_dict. Conv1D weights are stored
    ``[in, out]`` in HF — no transpose needed."""

    def t(name):
        w = state_dict[name]
        if hasattr(w, "detach"):
            w = w.detach().to("cpu").float().numpy()
        return np.asarray(w, dtype=dtype)

    L = cfg.num_layers
    pre = "transformer.h." if any(k.startswith("transformer.") for k in state_dict) else "h."

    def stack(fmt):
        return jnp.asarray(np.stack([t(pre + fmt.format(i)) for i in range(L)]))

    root = "transformer." if pre.startswith("transformer.") else ""
    layers = {
        "ln1_w": stack("{}.ln_1.weight"), "ln1_b": stack("{}.ln_1.bias"),
        "ln2_w": stack("{}.ln_2.weight"), "ln2_b": stack("{}.ln_2.bias"),
        "w_attn": stack("{}.attn.c_attn.weight"), "b_attn": stack("{}.attn.c_attn.bias"),
        "w_proj": stack("{}.attn.c_proj.weight"), "b_proj": stack("{}.attn.c_proj.bias"),
        "w_fc": stack("{}.mlp.c_fc.weight"), "b_fc": stack("{}.mlp.c_fc.bias"),
        "w_out": stack("{}.mlp.c_proj.weight"), "b_out": stack("{}.mlp.c_proj.bias"),
    }
    return {
        "wte": jnp.asarray(t(root + "wte.weight")),
        "wpe": jnp.asarray(t(root + "wpe.weight")),
        "lnf_w": jnp.asarray(t(root + "ln_f.weight")),
        "lnf_b": jnp.asarray(t(root + "ln_f.bias")),
        "layers": layers,
    }
