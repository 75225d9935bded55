"""Gemma 3 (text) with LRP-aware forward.

Reference patch map: ``lxt/efficient/models/gemma3.py:11-26`` — stop-grad
rsqrt inside ``Gemma3RMSNorm._norm`` (the custom ``gemma3_norm``), gated-MLP
identity+uniform rules, attention q/k/v uniform rule.

Gemma-3 architectural specifics faithfully reproduced (HF modeling_gemma3):
- embeddings scaled by sqrt(hidden_size)
- RMSNorm computes in f32 and multiplies by ``(1 + weight)`` BEFORE casting
- per-head q/k RMSNorm, attention scale ``query_pre_attn_scalar**-0.5``
- sandwich norms: post-attention and post-feedforward norms apply to the
  block output before the residual add
- alternating local (sliding-window, rope_local_base_freq) and global
  (rope_theta, linear rope scaling) attention layers, selected per layer
  inside a single scanned body via the layer_types flag.
"""

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lxt_tpu import composites
from lxt_tpu.models import common
from lxt_tpu.models.common import ModelOutputs
from lxt_tpu.ops.attention import attention
from lxt_tpu.ops.rules import stop_gradient


@dataclasses.dataclass(frozen=True)
class Gemma3Config:
    vocab_size: int = 262144
    hidden_size: int = 2560
    intermediate_size: int = 10240
    num_layers: int = 34
    num_heads: int = 8
    num_kv_heads: int = 4
    head_dim: int = 256
    rope_theta: float = 1_000_000.0
    rope_local_theta: float = 10_000.0
    rope_global_scaling: float = 1.0   # linear rope_scaling factor (e.g. 8.0)
    rms_eps: float = 1e-6
    act: str = "gelu"                  # gelu_pytorch_tanh
    query_pre_attn_scalar: float = 256.0
    sliding_window: int = 1024
    layer_types: Tuple[str, ...] = ()  # 'sliding_attention' | 'full_attention'
    tie_embeddings: bool = True

    @classmethod
    def from_hf(cls, hf_config):
        rs = getattr(hf_config, "rope_scaling", None) or {}
        return cls(
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            head_dim=hf_config.head_dim,
            rope_theta=hf_config.rope_theta,
            rope_local_theta=getattr(hf_config, "rope_local_base_freq", 10_000.0),
            rope_global_scaling=float(rs.get("factor", 1.0)) if rs.get(
                "rope_type", rs.get("type")) == "linear" else 1.0,
            rms_eps=hf_config.rms_norm_eps,
            query_pre_attn_scalar=hf_config.query_pre_attn_scalar,
            sliding_window=hf_config.sliding_window,
            layer_types=tuple(hf_config.layer_types),
            tie_embeddings=getattr(hf_config, "tie_word_embeddings", True),
        )


def gemma_rms_norm(x, weight, eps, composite):
    """Gemma RMSNorm: f32 throughout, (1+w) multiplier applied before the
    cast; identity rule via stop-grad rsqrt (reference gemma3.py:11-12)."""
    x32 = x.astype(jnp.float32)
    rs = jax.lax.rsqrt((x32 * x32).mean(axis=-1, keepdims=True) + eps)
    if composite.norm == "identity":
        rs = stop_gradient(rs)
    y = x32 * rs * (1.0 + weight.astype(jnp.float32))
    return y.astype(x.dtype)


def init_params(cfg: Gemma3Config, key, dtype=jnp.float32):
    L, D, I, hd = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
    H, Hkv = cfg.num_heads, cfg.num_kv_heads
    ks = jax.random.split(key, 8)
    u = lambda k, s: common.uniform_init(k, s, dtype=dtype)  # noqa: E731
    layers = {
        "ln_in": jnp.zeros((L, D), dtype), "ln_post_attn": jnp.zeros((L, D), dtype),
        "ln_pre_ff": jnp.zeros((L, D), dtype), "ln_post_ff": jnp.zeros((L, D), dtype),
        "wq": u(ks[0], (L, D, H * hd)), "wk": u(ks[1], (L, D, Hkv * hd)),
        "wv": u(ks[2], (L, D, Hkv * hd)), "wo": u(ks[3], (L, H * hd, D)),
        "q_norm": jnp.zeros((L, hd), dtype), "k_norm": jnp.zeros((L, hd), dtype),
        "wg": u(ks[4], (L, D, I)), "wu": u(ks[5], (L, D, I)), "wd": u(ks[6], (L, I, D)),
    }
    return {
        "embed": u(ks[7], (cfg.vocab_size, D)),
        "final_norm": jnp.zeros((D,), dtype),
        "layers": layers,
    }


def embed(params, input_ids, cfg: Gemma3Config):
    """Scaled word embedding (Gemma3TextScaledWordEmbedding)."""
    scale = jnp.asarray(cfg.hidden_size ** 0.5, params["embed"].dtype)
    return params["embed"][input_ids] * scale


def layer_sliding_flags(cfg: Gemma3Config):
    """Per-layer 1.0/0.0 flags for sliding vs full attention (scannable;
    HF default pattern: every 6th layer is global). Shared by the full
    forward and the KV-cached decode so the alternation cannot diverge."""
    layer_types = cfg.layer_types or tuple(
        "sliding_attention" if (i + 1) % 6 else "full_attention"
        for i in range(cfg.num_layers))
    return jnp.asarray(
        [1.0 if t == "sliding_attention" else 0.0 for t in layer_types],
        jnp.float32)


def rope_table_pair(positions, cfg: Gemma3Config):
    """(global, local) rotary tables — global uses rope_theta with the
    linear scaling factor, local uses rope_local_base_freq unscaled."""
    cos_g, sin_g = common.rope_tables(positions, cfg.head_dim, cfg.rope_theta,
                                      scaling=cfg.rope_global_scaling)
    cos_l, sin_l = common.rope_tables(positions, cfg.head_dim,
                                      cfg.rope_local_theta)
    return (cos_g, sin_g), (cos_l, sin_l)


def forward(
    params,
    cfg: Gemma3Config,
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
    act_fn = common.ACTIVATIONS[cfg.act]
    positions, bias, kv_begin = common.padding_setup(
        attention_mask, kv_begin, positions, T)
    (cos_g, sin_g), (cos_l, sin_l) = rope_table_pair(positions, cfg)
    scale = cfg.query_pre_attn_scalar ** -0.5
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    is_sliding = layer_sliding_flags(cfg)

    def make_layer(comp):
        def layer_fn(h, xs):
            lp, probe, sliding = xs
            res = h
            x = gemma_rms_norm(h, lp["ln_in"], cfg.rms_eps, comp)
            q = common.split_heads(comp.linear(x, lp["wq"], site="wq"), H, hd)
            k = common.split_heads(comp.linear(x, lp["wk"], site="wk"), Hkv, hd)
            v = common.split_heads(comp.linear(x, lp["wv"], site="wv"), Hkv, hd)
            q = gemma_rms_norm(q, lp["q_norm"], cfg.rms_eps, comp)
            k = gemma_rms_norm(k, lp["k_norm"], cfg.rms_eps, comp)
            # select local vs global rope/mask for this layer (scanned
            # scalar flag)
            cos = jnp.where(sliding > 0, cos_l, cos_g)
            sin = jnp.where(sliding > 0, sin_l, sin_g)
            # full-attention layers must use an unbounded window, NOT T:
            # under ring/sequence-parallel attention T is the LOCAL shard
            # length and window comparisons run in global coordinates
            # (parallel/ring.py)
            window = jnp.where(sliding > 0, cfg.sliding_window,
                               jnp.int32(2**30)).astype(jnp.int32)
            q, k = common.apply_rope(q, k, cos, sin)
            attn = attention(q, k, v, causal=True, window=window, bias=bias,
                             composite=comp, scale=scale, impl=attn_impl,
                             kv_begin=kv_begin)
            attn_out = comp.linear(common.merge_heads(attn), lp["wo"], site="wo")
            attn_out = gemma_rms_norm(attn_out, lp["ln_post_attn"],
                                      cfg.rms_eps, comp)
            h = res + attn_out

            res = h
            x = gemma_rms_norm(h, lp["ln_pre_ff"], cfg.rms_eps, comp)
            g = comp.gated_mul(act_fn, comp.linear(x, lp["wg"], site="wg"),
                               comp.linear(x, lp["wu"], site="wu"))
            mlp_out = comp.linear(g, lp["wd"], site="wd")
            mlp_out = gemma_rms_norm(mlp_out, lp["ln_post_ff"],
                                     cfg.rms_eps, comp)
            h = res + mlp_out
            if probe is not None:
                h = h + probe
            return h, (h if output_hidden_states else None)
        return layer_fn

    h, hiddens = common.run_stacked_layers(
        make_layer, composite, remat, layer_driver, inputs_embeds,
        (params["layers"], probes, is_sliding))

    h = gemma_rms_norm(h, params["final_norm"], cfg.rms_eps, composite)
    if logits_at is not None:
        h = common.take_frontier(h, logits_at)
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    logits = composite.linear(h, head)

    if output_hidden_states:
        hiddens = jnp.concatenate([inputs_embeds[None], hiddens], axis=0)
    return ModelOutputs(logits=logits, hidden_states=hiddens)


def params_from_hf(state_dict, cfg: Gemma3Config, dtype=np.float32):
    """Convert HF Gemma3ForCausalLM (text) weights."""

    def t(name):
        w = state_dict[name]
        if hasattr(w, "detach"):
            w = w.detach().to("cpu").float().numpy()
        return np.asarray(w, dtype=dtype)

    L = cfg.num_layers
    pre = "model.layers."

    def stack(fmt, transpose=False):
        ws = [t(pre + fmt.format(i)) for i in range(L)]
        return jnp.asarray(np.stack([w.T if transpose else w for w in ws]))

    layers = {
        "ln_in": stack("{}.input_layernorm.weight"),
        "ln_post_attn": stack("{}.post_attention_layernorm.weight"),
        "ln_pre_ff": stack("{}.pre_feedforward_layernorm.weight"),
        "ln_post_ff": stack("{}.post_feedforward_layernorm.weight"),
        "wq": stack("{}.self_attn.q_proj.weight", transpose=True),
        "wk": stack("{}.self_attn.k_proj.weight", transpose=True),
        "wv": stack("{}.self_attn.v_proj.weight", transpose=True),
        "wo": stack("{}.self_attn.o_proj.weight", transpose=True),
        "q_norm": stack("{}.self_attn.q_norm.weight"),
        "k_norm": stack("{}.self_attn.k_norm.weight"),
        "wg": stack("{}.mlp.gate_proj.weight", transpose=True),
        "wu": stack("{}.mlp.up_proj.weight", transpose=True),
        "wd": stack("{}.mlp.down_proj.weight", transpose=True),
    }
    params = {
        "embed": jnp.asarray(t("model.embed_tokens.weight")),
        "final_norm": jnp.asarray(t("model.norm.weight")),
        "layers": layers,
    }
    if not cfg.tie_embeddings and "lm_head.weight" in state_dict:
        params["lm_head"] = jnp.asarray(t("lm_head.weight").T)
    return params


# ---------------------------------------------------------------------------
# Multimodal (image + text) — Gemma3ForConditionalGeneration
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Gemma3MultimodalConfig:
    """Text config + SigLIP vision tower + projector geometry (HF
    Gemma3Config / Gemma3MultiModalProjector)."""

    text: "Gemma3Config"
    vision: "object"           # lxt_tpu.models.siglip.SiglipConfig
    mm_tokens_per_image: int = 256
    image_token_id: int = 262144

    @classmethod
    def from_hf(cls, hf_config):
        from lxt_tpu.models import siglip
        return cls(
            text=Gemma3Config.from_hf(hf_config.text_config),
            vision=siglip.SiglipConfig.from_hf(hf_config.vision_config),
            mm_tokens_per_image=hf_config.mm_tokens_per_image,
            image_token_id=hf_config.image_token_index,
        )


def project_image_features(params, mmcfg: Gemma3MultimodalConfig,
                           vision_out, composite):
    """Gemma3MultiModalProjector: spatial avg-pool to mm_tokens_per_image,
    Gemma RMSNorm, linear projection into text embedding space.
    vision_out: [B, P, Dv] -> [B, mm_tokens, Dt]."""
    B, P, Dv = vision_out.shape
    pps = mmcfg.vision.image_size // mmcfg.vision.patch_size
    side = int(mmcfg.mm_tokens_per_image ** 0.5)
    k = pps // side
    x = vision_out.reshape(B, pps, pps, Dv)
    # avg pool k x k == mean over reshaped blocks; under LRP the pooling is a
    # linear op, handled exactly by the gradient
    x = x.reshape(B, side, k, side, k, Dv).mean(axis=(2, 4))
    x = x.reshape(B, side * side, Dv)
    x = gemma_rms_norm(x, params["mm_norm"], mmcfg.vision.ln_eps, composite)
    return composite.linear(x, params["mm_proj"], site="mm_proj")


def merge_image_embeds(params, mmcfg: Gemma3MultimodalConfig,
                       inputs_embeds, pixel_values, image_token_mask,
                       composite=composites.attnlrp):
    """SigLIP-encode the pixels, project into text space, and scatter the
    projected tokens over the <image> placeholder positions (HF scatter
    semantics). The single definition of the merge — used by the joint
    forward AND by the KV-cached caption decode's prefix."""
    from lxt_tpu.models import siglip

    vision_out = siglip.forward(params["vision"], mmcfg.vision, pixel_values,
                                composite)
    img_embeds = project_image_features(params, mmcfg, vision_out, composite)
    B, T, D = inputs_embeds.shape
    flat_img = img_embeds.reshape(-1, D).astype(inputs_embeds.dtype)

    # scatter: position t takes image token cumsum(mask)-1 where mask is set
    idx = jnp.clip(jnp.cumsum(image_token_mask.reshape(-1)) - 1, 0, None)
    merged = jnp.where(image_token_mask.reshape(-1)[:, None],
                       flat_img[idx], inputs_embeds.reshape(-1, D))
    return merged.reshape(B, T, D)


def multimodal_forward(params, mmcfg: Gemma3MultimodalConfig,
                       inputs_embeds, pixel_values, image_token_mask,
                       composite=composites.attnlrp, **kw):
    """Joint image+text forward: the merged prefix (see
    :func:`merge_image_embeds`) runs through the text model.

    ``pixel_values``: [B_img, H, W, 3] NHWC; ``image_token_mask``: [B, T]
    bool marking placeholder positions (count == B_img * mm_tokens_per_image).
    Relevance w.r.t. BOTH pixels and text embeds comes from one vjp.
    """
    merged = merge_image_embeds(params, mmcfg, inputs_embeds, pixel_values,
                                image_token_mask, composite)
    return forward(params["text"], mmcfg.text, merged, composite, **kw)


def multimodal_params_from_hf(state_dict, mmcfg: Gemma3MultimodalConfig,
                              dtype=np.float32):
    """Convert Gemma3ForConditionalGeneration weights (model.vision_tower.*,
    model.multi_modal_projector.*, model.language_model.*, lm_head)."""
    from lxt_tpu.models import siglip

    def t(name):
        w = state_dict[name]
        if hasattr(w, "detach"):
            w = w.detach().to("cpu").float().numpy()
        return np.asarray(w, dtype=dtype)

    text_sd = {k.replace("model.language_model.", "model."): v
               for k, v in state_dict.items()
               if k.startswith("model.language_model.")}
    if "lm_head.weight" in state_dict:
        text_sd["lm_head.weight"] = state_dict["lm_head.weight"]

    return {
        "vision": siglip.params_from_hf(
            state_dict, mmcfg.vision, dtype=dtype,
            prefix="model.vision_tower.vision_model."),
        "mm_proj": jnp.asarray(
            t("model.multi_modal_projector.mm_input_projection_weight")),
        "mm_norm": jnp.asarray(
            t("model.multi_modal_projector.mm_soft_emb_norm.weight")),
        "text": params_from_hf(text_sd, mmcfg.text, dtype=dtype),
    }
