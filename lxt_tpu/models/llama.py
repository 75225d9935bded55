"""Llama-family decoder with LRP-aware forward (Llama 2/3, Qwen 2/3, TinyLlama).

One generic implementation covers the family — the reference's per-model patch
maps for these models are near-identical (lxt/efficient/models/llama.py:9-21,
qwen2.py:9-21, qwen3.py:9-21): gated-SiLU MLP (identity+uniform rules),
RMSNorm (identity rule via stop-grad rsqrt), uniform rule at attention q/k/v.
Config switches handle the differences: Qwen2 adds qkv biases, Qwen3 adds
per-head q/k RMSNorm and an explicit head_dim.

TPU-first structure: layers are stacked on axis 0 and executed with
``jax.lax.scan`` over a rematerialized body (``jax.checkpoint``), giving one
compiled layer and the reference's checkpointed memory profile (2x fwd + 1x
bwd, README.md:54) in a single ``jax.vjp``.
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lxt_tpu import composites
from lxt_tpu.models import common
from lxt_tpu.models.common import ACTIVATIONS, ModelOutputs
from lxt_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 2048
    intermediate_size: int = 5632
    num_layers: int = 22
    num_heads: int = 32
    num_kv_heads: int = 4
    head_dim: Optional[int] = None
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    act: str = "silu"
    qkv_bias: bool = False      # Qwen2
    qk_norm: bool = False       # Qwen3
    tie_embeddings: bool = False
    #: hashable rope-scaling spec: None, ("linear", factor),
    #: ("llama3", factor, low_ff, high_ff, original_max_positions),
    #: ("longrope", short_factors, long_factors, original_max, max_pos, af)
    #: or ("yarn", factor, beta_fast, beta_slow, original_max, af)
    rope_scaling: Optional[tuple] = None
    #: causal sliding-window size (Mistral-7B: 4096, Phi-3-mini-4k: 2047);
    #: None = full causal attention
    sliding_window: Optional[int] = None
    dtype: str = "float32"

    @property
    def hd(self):
        return self.head_dim or self.hidden_size // self.num_heads

    @classmethod
    def from_hf(cls, hf_config):
        """Build from a transformers Llama/Qwen2/Qwen3 config object."""
        mt = getattr(hf_config, "model_type", "llama")
        return cls(
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=getattr(hf_config, "num_key_value_heads",
                                 hf_config.num_attention_heads),
            head_dim=getattr(hf_config, "head_dim", None),
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rms_eps=hf_config.rms_norm_eps,
            qkv_bias=(mt == "qwen2"),
            qk_norm=(mt == "qwen3"),
            tie_embeddings=getattr(hf_config, "tie_word_embeddings", False),
            rope_scaling=_rope_scaling_spec(
                getattr(hf_config, "rope_scaling", None), hf_config),
            sliding_window=_sliding_window_spec(hf_config),
        )


def _sliding_window_spec(hf_config):
    """Resolve the config's causal sliding window (Mistral, Phi-3).

    Qwen2 ships ``sliding_window`` in its config but applies it only when
    ``use_sliding_window`` is set, and then only to a per-layer subset
    (``max_window_layers``) — raise loudly on that instead of silently
    computing full attention (the HF default checkpoints have it off)."""
    sw = getattr(hf_config, "sliding_window", None)
    if sw is None:
        return None
    mt = getattr(hf_config, "model_type", "llama")
    if mt in ("qwen2", "qwen3"):
        if getattr(hf_config, "use_sliding_window", False):
            raise ValueError(
                f"{mt} use_sliding_window=True (layered sliding window via "
                f"max_window_layers) is not supported yet")
        return None
    if mt in ("mistral", "phi3"):
        return int(sw)
    return None


def _rope_scaling_spec(rs, hf_config=None):
    """HF rope_scaling dict -> hashable tuple (config dataclasses must hash).

    longrope/su (Phi-3 128k checkpoints) and yarn follow HF's
    ``_compute_longrope_parameters`` / ``_compute_yarn_parameters``; the
    reference vendors the same schedules as
    ``Phi3SuScaledRotaryEmbedding``/``Phi3YarnScaledRotaryEmbedding``
    (lxt/explicit/models/phi3.py:158-213, dispatch :349-362)."""
    if not rs:
        return None
    kind = rs.get("rope_type", rs.get("type"))
    if kind in (None, "default"):
        return None
    if kind == "linear":
        return ("linear", float(rs["factor"]))
    if kind == "llama3":
        return ("llama3", float(rs["factor"]),
                float(rs.get("low_freq_factor", 1.0)),
                float(rs.get("high_freq_factor", 4.0)),
                float(rs.get("original_max_position_embeddings", 8192)))
    if kind in ("longrope", "su"):
        old_ctx = rs.get("original_max_position_embeddings") or getattr(
            hf_config, "original_max_position_embeddings", None)
        max_ctx = getattr(hf_config, "max_position_embeddings", None)
        if old_ctx is None or max_ctx is None:
            raise ValueError("longrope scaling needs original/max position "
                             "embeddings in the HF config")
        af = rs.get("attention_factor", rs.get("attn_factor"))
        return ("longrope",
                tuple(float(f) for f in rs["short_factor"]),
                tuple(float(f) for f in rs["long_factor"]),
                float(old_ctx), float(max_ctx),
                float(af) if af is not None else None)
    if kind == "yarn":
        old_ctx = rs.get("original_max_position_embeddings") or getattr(
            hf_config, "original_max_position_embeddings", None) or getattr(
            hf_config, "max_position_embeddings", 4096)
        af = rs.get("attention_factor")
        return ("yarn", float(rs["factor"]),
                float(rs.get("beta_fast", 32.0)),
                float(rs.get("beta_slow", 1.0)),
                float(old_ctx),
                float(af) if af is not None else None)
    raise ValueError(f"unsupported rope scaling type: {kind}")


def init_params(cfg: LlamaConfig, key, dtype=None, quantize_bits=None):
    """Random parameters (bench / smoke tests), stacked over layers.

    ``quantize_bits`` (4/8) quantizes each projection matrix IMMEDIATELY
    after sampling it, so the full-precision tree never coexists with the
    quantized one — required to stage 8B-scale models on a 16 GB chip."""
    dtype = dtype or jnp.dtype(cfg.dtype)
    L, D, I, hd = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size, cfg.hd
    H, Hkv = cfg.num_heads, cfg.num_kv_heads
    ks = jax.random.split(key, 12)

    def u(k, shape):
        w = common.uniform_init(k, shape, dtype=dtype)
        if quantize_bits and len(shape) >= 3:
            from lxt_tpu.ops.quant import quantize
            w = jax.block_until_ready(quantize(w, quantize_bits))
        return w
    layers = {
        "ln1": jnp.ones((L, D), dtype),
        "ln2": jnp.ones((L, D), dtype),
        "wq": u(ks[0], (L, D, H * hd)),
        "wk": u(ks[1], (L, D, Hkv * hd)),
        "wv": u(ks[2], (L, D, Hkv * hd)),
        "wo": u(ks[3], (L, H * hd, D)),
        "wg": u(ks[4], (L, D, I)),
        "wu": u(ks[5], (L, D, I)),
        "wd": u(ks[6], (L, I, D)),
    }
    if cfg.qkv_bias:
        layers["bq"] = jnp.zeros((L, H * hd), dtype)
        layers["bk"] = jnp.zeros((L, Hkv * hd), dtype)
        layers["bv"] = jnp.zeros((L, Hkv * hd), dtype)
    if cfg.qk_norm:
        layers["q_norm"] = jnp.ones((L, hd), dtype)
        layers["k_norm"] = jnp.ones((L, hd), dtype)
    params = {
        "embed": u(ks[7], (cfg.vocab_size, D)),
        "final_norm": jnp.ones((D,), dtype),
        "layers": layers,
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = u(ks[8], (D, cfg.vocab_size))
    return params


def embed(params, input_ids):
    return params["embed"][input_ids]


def forward(
    params,
    cfg: LlamaConfig,
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
    """Causal-LM forward. Returns :class:`ModelOutputs`.

    ``logits_at`` (optional static int): compute logits ONLY at this
    position — returns ``[B, 1, V]``. Attribution explains one position, so
    this skips T-1/T of the lm_head matmul in forward AND its transpose in
    the relevance backward (and the [B, T, V] logits buffer, the largest
    activation at batch scale).

    ``probes`` (optional ``[L, B, T, D]`` zeros) are added to each layer
    output; their gradients are the per-layer relevance hooks for latent
    feature attribution (functional replacement for torch hooks).

    Left-padded variable-length batches: pass ``attention_mask`` ([B, T] of
    1/0, einsum path) or ``kv_begin`` ([B] first-valid index, flash-eligible
    — see :func:`lxt_tpu.models.common.padding_setup`). Positions are
    derived per example (HF convention).
    """
    positions, bias, kv_begin = common.padding_setup(
        attention_mask, kv_begin, positions, inputs_embeds.shape[1])
    h, hiddens = _run_layers(
        params["layers"], cfg, inputs_embeds, composite, probes=probes,
        output_hidden_states=output_hidden_states, remat=remat,
        positions=positions, bias=bias, kv_begin=kv_begin,
        attn_impl=attn_impl, layer_driver=layer_driver)

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


def _run_layers(layer_params, cfg, inputs_embeds, composite, *, probes,
                output_hidden_states, remat, positions, bias, kv_begin,
                attn_impl, layer_driver):
    """The decoder layer stack (no embedding, final norm, or lm_head):
    shared by :func:`forward` and the segment body :func:`forward_layers`."""
    B, T, D = inputs_embeds.shape
    act_fn = ACTIVATIONS[cfg.act]
    cos, sin = common.rope_tables(positions, cfg.hd, cfg.rope_theta,
                                  rope_scaling=cfg.rope_scaling, seq_len=T)
    scale = cfg.hd ** -0.5
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.hd
    # '+bthd' (static attn_impl option): keep q/k/v in the projection-native
    # [B, T, H, hd] layout — a FREE reshape — and let the flash kernels tile
    # it directly (ops/flash_attention layout='bthd'). The canonical path
    # instead pays two materialized [B,H,T,hd] transposes per layer, fenced
    # by identity barriers so XLA cannot fold them into the projections
    # (folding drops the matmuls to ~50% MXU efficiency; measured on v5e).
    # hd=64 rides the pair-packed tiling (two heads per 128-lane block,
    # flash_attention.pair_eligible); unsupported geometries stay canonical
    # — the barrier-free dispatcher fallback would otherwise reintroduce
    # the folded transposes
    from lxt_tpu.ops.flash_attention import bthd_supported
    bthd = "bthd" in attn_impl.split("+") and bthd_supported(H, Hkv, hd)

    def make_layer(comp):
        def layer_fn(h, xs):
            lp, probe = xs
            x = comp.rms_norm(h, lp["ln1"], cfg.rms_eps)
            q = comp.linear(x, lp["wq"], lp.get("bq"), site="wq")
            k = comp.linear(x, lp["wk"], lp.get("bk"), site="wk")
            v = comp.linear(x, lp["wv"], lp.get("bv"), site="wv")
            if bthd:
                q = q.reshape(B, T, H, hd)
                k = k.reshape(B, T, Hkv, hd)
                v = v.reshape(B, T, Hkv, hd)
            else:
                q, k, v = jax.lax.optimization_barrier((q, k, v))
                q = common.split_heads(q, H, hd)
                k = common.split_heads(k, Hkv, hd)
                v = common.split_heads(v, Hkv, hd)
            if cfg.qk_norm:
                q = comp.rms_norm(q, lp["q_norm"], cfg.rms_eps)
                k = comp.rms_norm(k, lp["k_norm"], cfg.rms_eps)
            # rope is passed INTO the dispatcher: the flash path fuses the
            # rotation into the kernels (apply_rope between the projections
            # and the custom call cost ~25 ms/step — XLA folded it into the
            # q/k matmuls at ~50% MXU efficiency); non-flash paths apply it
            # there
            attn = attention(q, k, v, causal=True, window=cfg.sliding_window,
                             bias=bias, composite=comp, rope=(cos, sin),
                             scale=scale, impl=attn_impl, kv_begin=kv_begin,
                             layout="bthd" if bthd else "bhtd")
            if bthd:
                merged = attn.reshape(B, T, H * hd)
            else:
                merged = jax.lax.optimization_barrier(
                    common.merge_heads(attn))
            h = h + comp.linear(merged, lp["wo"], site="wo")
            x = comp.rms_norm(h, lp["ln2"], cfg.rms_eps)
            g = comp.gated_mul(act_fn, comp.linear(x, lp["wg"], site="wg"),
                               comp.linear(x, lp["wu"], site="wu"))
            h = h + comp.linear(g, lp["wd"], site="wd")
            if probe is not None:
                h = h + probe
            return h, (h if output_hidden_states else None)
        return layer_fn

    # layer_driver (optional) replaces the plain layer scan — e.g. the
    # pipeline-parallel GPipe driver (parallel/pipeline_parallel.py);
    # composite.layer_overrides unroll the stack with per-depth composites
    return common.run_stacked_layers(
        make_layer, composite, remat, layer_driver,
        inputs_embeds, (layer_params, probes))


def forward_layers(layer_params, cfg, h, composite=composites.attnlrp, *,
                   remat=True, positions=None, attention_mask=None,
                   kv_begin=None, attn_impl: str = "auto"):
    """Run a SLICE of the decoder stack: ``h -> h`` over exactly the layers
    in ``layer_params`` (a per-layer slice of ``params['layers']``, e.g.
    ``jax.tree.map(lambda a: a[8:12], params['layers'])``).

    The segment body for :func:`lxt_tpu.attribution.segmented_input_relevance`
    — attribution as several bounded device programs instead of one
    monolithic step (remote-attached TPUs enforce per-execute deadlines that
    a slow full-depth step can exceed; segments also cap per-call latency for
    serving). Values are identical to the monolithic forward: same layer
    body, same scan, same remat policy.
    """
    positions, bias, kv_begin = common.padding_setup(
        attention_mask, kv_begin, positions, h.shape[1])
    out, _ = _run_layers(
        layer_params, cfg, h, composite, probes=None,
        output_hidden_states=False, remat=remat, positions=positions,
        bias=bias, kv_begin=kv_begin, attn_impl=attn_impl, layer_driver=None)
    return out


def forward_head(params, cfg, h, composite=composites.attnlrp, *,
                 logits_at=None):
    """Final norm + lm_head on a hidden state ``h`` — the closing piece of a
    segmented forward (see :func:`forward_layers`)."""
    h = composite.rms_norm(h, params["final_norm"], cfg.rms_eps)
    if logits_at is not None:
        h = common.take_frontier(h, logits_at)
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    return composite.linear(h, head)


# ---------------------------------------------------------------------------
# HF checkpoint conversion
# ---------------------------------------------------------------------------

def params_from_hf(state_dict, cfg: LlamaConfig, dtype=np.float32):
    """Convert an HF Llama/Qwen2/Qwen3 torch ``state_dict`` to our stacked
    pytree. Linear weights are transposed to ``[in, out]``."""

    def t(name):
        w = state_dict[name]
        if hasattr(w, "detach"):
            w = w.detach().to("cpu").float().numpy()
        return np.asarray(w, dtype=dtype)

    L = cfg.num_layers
    pre = "model.layers."

    def stack(fmt, transpose=False):
        ws = [t(fmt.format(i)) for i in range(L)]
        ws = [w.T if transpose else w for w in ws]
        return jnp.asarray(np.stack(ws))

    if "model.layers.0.self_attn.qkv_proj.weight" in state_dict:
        return _params_from_hf_phi3(state_dict, cfg, t, stack)

    layers = {
        "ln1": stack(pre + "{}.input_layernorm.weight"),
        "ln2": stack(pre + "{}.post_attention_layernorm.weight"),
        "wq": stack(pre + "{}.self_attn.q_proj.weight", transpose=True),
        "wk": stack(pre + "{}.self_attn.k_proj.weight", transpose=True),
        "wv": stack(pre + "{}.self_attn.v_proj.weight", transpose=True),
        "wo": stack(pre + "{}.self_attn.o_proj.weight", transpose=True),
        "wg": stack(pre + "{}.mlp.gate_proj.weight", transpose=True),
        "wu": stack(pre + "{}.mlp.up_proj.weight", transpose=True),
        "wd": stack(pre + "{}.mlp.down_proj.weight", transpose=True),
    }
    if cfg.qkv_bias:
        layers["bq"] = stack(pre + "{}.self_attn.q_proj.bias")
        layers["bk"] = stack(pre + "{}.self_attn.k_proj.bias")
        layers["bv"] = stack(pre + "{}.self_attn.v_proj.bias")
    if cfg.qk_norm:
        layers["q_norm"] = stack(pre + "{}.self_attn.q_norm.weight")
        layers["k_norm"] = stack(pre + "{}.self_attn.k_norm.weight")

    params = {
        "embed": jnp.asarray(t("model.embed_tokens.weight")),
        "final_norm": jnp.asarray(t("model.norm.weight")),
        "layers": layers,
    }
    if not cfg.tie_embeddings and "lm_head.weight" in state_dict:
        params["lm_head"] = jnp.asarray(t("lm_head.weight").T)
    return params


def _params_from_hf_phi3(state_dict, cfg: LlamaConfig, t, stack):
    """Phi-3 stores fused projections (qkv_proj: [q;k;v], gate_up_proj:
    [gate;up], HF modeling_phi3); split them into the Llama layout so the
    shared forward — and all its LRP rules — applies unchanged. Covers the
    reference's Phi-3 support (lxt/explicit/models/phi3.py)."""
    L, hd = cfg.num_layers, cfg.hd
    q_dim = cfg.num_heads * hd
    kv_dim = cfg.num_kv_heads * hd
    pre = "model.layers."

    wq, wk, wv, wg, wu = [], [], [], [], []
    for i in range(L):
        qkv = t(pre + f"{i}.self_attn.qkv_proj.weight").T  # [D, q+k+v]
        wq.append(qkv[:, :q_dim])
        wk.append(qkv[:, q_dim:q_dim + kv_dim])
        wv.append(qkv[:, q_dim + kv_dim:])
        gu = t(pre + f"{i}.mlp.gate_up_proj.weight").T     # [D, 2I]
        wg.append(gu[:, :cfg.intermediate_size])
        wu.append(gu[:, cfg.intermediate_size:])

    layers = {
        "ln1": stack(pre + "{}.input_layernorm.weight"),
        "ln2": stack(pre + "{}.post_attention_layernorm.weight"),
        "wq": jnp.asarray(np.stack(wq)),
        "wk": jnp.asarray(np.stack(wk)),
        "wv": jnp.asarray(np.stack(wv)),
        "wo": stack(pre + "{}.self_attn.o_proj.weight", transpose=True),
        "wg": jnp.asarray(np.stack(wg)),
        "wu": jnp.asarray(np.stack(wu)),
        "wd": stack(pre + "{}.mlp.down_proj.weight", transpose=True),
    }
    params = {
        "embed": jnp.asarray(t("model.embed_tokens.weight")),
        "final_norm": jnp.asarray(t("model.norm.weight")),
        "layers": layers,
    }
    if not cfg.tie_embeddings and "lm_head.weight" in state_dict:
        params["lm_head"] = jnp.asarray(t("lm_head.weight").T)
    return params
