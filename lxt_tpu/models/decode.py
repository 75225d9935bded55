"""KV-cached greedy decoding for the Llama family (Qwen 2/3, Mistral,
Phi-3 included).

The attribution forward (``llama.forward``) is full-sequence by design —
one fused program per heatmap. Generation is different: re-running the
full prefix per emitted token costs O(N·T) attention and O(N) full MLP
passes. This module adds the standard incremental-decoding split:

- :func:`prefill` — one full forward over the prompt that ALSO returns
  the per-layer rotary-embedded K/V, written into a ``[L, B, Hkv, Tmax,
  hd]`` cache padded to the final length;
- :func:`decode_step` — a single-token forward that appends its K/V into
  the cache with ``dynamic_update_slice`` and attends against the cached
  prefix (einsum; a 1×T attention row is bandwidth-trivial).

``AttributionModel.generate`` drives these inside one jitted
``fori_loop`` — the decode loop is O(T + N·(T·D + params)) instead of
N whole-prefix forwards, which makes the serving ``respond`` flow
decode-bound no more. Attribution itself still uses the full-sequence
forward (relevance needs all positions anyway).

Numerics: rope is applied before the attention (identical semantics to
the fused path, see ops/attention.py ``rope=``), scores accumulate in
f32. Greedy argmax equality with the uncached path is tested per family
variant (GQA, qkv_bias, qk_norm, sliding window, left padding).
"""

from typing import Optional

import jax
import jax.numpy as jnp

from lxt_tpu import composites
from lxt_tpu.models import common
from lxt_tpu.models.common import ACTIVATIONS
from lxt_tpu.ops.attention import attention


def _rope_at(positions, cfg, seq_len):
    """cos/sin for per-example positions [B, Tq] at a fixed total
    ``seq_len`` (longrope picks its factor schedule from seq_len — it
    must match the cache capacity, not the current frontier)."""
    return common.rope_tables(positions, cfg.hd, cfg.rope_theta,
                              rope_scaling=cfg.rope_scaling,
                              seq_len=seq_len)


def prefill(params, cfg, inputs_embeds, t_max: int, *,
            kv_begin=None, composite=composites.attnlrp):
    """Full forward over the prompt, returning the frontier hidden state
    and the K/V cache padded to ``t_max``.

    Returns ``(logits [B, 1, V], caches)`` with ``caches = {"k", "v"}``
    of ``[L, B, Hkv, t_max, hd]``. ``logits`` explain position T-1 (the
    frontier that predicts the first generated token).
    """
    B, T, D = inputs_embeds.shape
    act_fn = ACTIVATIONS[cfg.act]
    positions, _, kv_begin = common.padding_setup(None, kv_begin, None, T)
    cos, sin = _rope_at(positions, cfg, t_max)
    scale = cfg.hd ** -0.5
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.hd

    def layer_fn(h, lp):
        x = composite.rms_norm(h, lp["ln1"], cfg.rms_eps)
        q = composite.linear(x, lp["wq"], lp.get("bq"))
        k = composite.linear(x, lp["wk"], lp.get("bk"))
        v = composite.linear(x, lp["wv"], lp.get("bv"))
        q = common.split_heads(q, H, hd)
        k = common.split_heads(k, Hkv, hd)
        v = common.split_heads(v, Hkv, hd)
        if cfg.qk_norm:
            q = composite.rms_norm(q, lp["q_norm"], cfg.rms_eps)
            k = composite.rms_norm(k, lp["k_norm"], cfg.rms_eps)
        q, k = common.apply_rope(q, k, cos, sin)
        attn = attention(q, k, v, causal=True, window=cfg.sliding_window,
                         composite=composite, scale=scale,
                         kv_begin=kv_begin)
        h = h + composite.linear(common.merge_heads(attn), lp["wo"])
        x = composite.rms_norm(h, lp["ln2"], cfg.rms_eps)
        g = composite.gated_mul(act_fn, composite.linear(x, lp["wg"]),
                                composite.linear(x, lp["wu"]))
        h = h + composite.linear(g, lp["wd"])
        return h, (k, v)

    h, (ks, vs) = jax.lax.scan(layer_fn, inputs_embeds, params["layers"])
    pad = [(0, 0)] * 5
    pad[3] = (0, t_max - T)                     # [L, B, Hkv, T->t_max, hd]
    caches = {"k": jnp.pad(ks, pad), "v": jnp.pad(vs, pad)}
    return _head(params, cfg, h[:, T - 1:T], composite), caches


def decode_step(params, cfg, tok_embeds, caches, t, *,
                kv_begin=None, composite=composites.attnlrp):
    """One-token forward at frontier index ``t`` (traced scalar).

    ``tok_embeds [B, 1, D]`` is the embedding of the token AT position
    ``t``; its K/V are appended into ``caches`` and its query attends over
    cache slots ``[kv_begin, t]`` (windowed if the config says so).
    Returns ``(logits [B, 1, V], caches)``.
    """
    B = tok_embeds.shape[0]
    act_fn = ACTIVATIONS[cfg.act]
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.hd
    G = H // Hkv
    t_max = caches["k"].shape[3]
    scale = cfg.hd ** -0.5
    if kv_begin is None:
        kv_begin = jnp.zeros((B,), jnp.int32)
    pos = jnp.maximum(t - kv_begin, 0)[:, None]          # [B, 1]
    cos, sin = _rope_at(pos, cfg, t_max)

    j = jnp.arange(t_max)
    valid = (j[None, :] >= kv_begin[:, None]) & (j[None, :] <= t)   # [B, Tm]
    if cfg.sliding_window is not None:
        valid &= j[None, :] > t - cfg.sliding_window

    def layer_fn(h, xs):
        lp, ck, cv = xs
        x = composite.rms_norm(h, lp["ln1"], cfg.rms_eps)
        q = composite.linear(x, lp["wq"], lp.get("bq"))
        k = composite.linear(x, lp["wk"], lp.get("bk"))
        v = composite.linear(x, lp["wv"], lp.get("bv"))
        q = common.split_heads(q, H, hd)                 # [B, H, 1, hd]
        k = common.split_heads(k, Hkv, hd)               # [B, Hkv, 1, hd]
        v = common.split_heads(v, Hkv, hd)
        if cfg.qk_norm:
            q = composite.rms_norm(q, lp["q_norm"], cfg.rms_eps)
            k = composite.rms_norm(k, lp["k_norm"], cfg.rms_eps)
        q, k = common.apply_rope(q, k, cos, sin)
        ck = jax.lax.dynamic_update_slice(ck, k, (0, 0, t, 0))
        cv = jax.lax.dynamic_update_slice(cv, v, (0, 0, t, 0))
        # GQA attend: [B, Hkv, G, hd] x [B, Hkv, Tm, hd] -> [B, Hkv, G, Tm]
        qg = q.reshape(B, Hkv, G, hd)
        scores = jnp.einsum("bhgd,bhtd->bhgt", qg.astype(jnp.float32),
                            ck.astype(jnp.float32)) * scale
        scores = jnp.where(valid[:, None, None, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhgt,bhtd->bhgd", probs,
                         cv.astype(jnp.float32)).astype(h.dtype)
        merged = out.reshape(B, 1, H * hd)
        h = h + composite.linear(merged, lp["wo"])
        x = composite.rms_norm(h, lp["ln2"], cfg.rms_eps)
        g = composite.gated_mul(act_fn, composite.linear(x, lp["wg"]),
                                composite.linear(x, lp["wu"]))
        h = h + composite.linear(g, lp["wd"])
        return h, (ck, cv)

    h, (ks, vs) = jax.lax.scan(
        layer_fn, tok_embeds, (params["layers"], caches["k"], caches["v"]))
    return _head(params, cfg, h, composite), {"k": ks, "v": vs}


def _head(params, cfg, h, composite):
    h = composite.rms_norm(h, params["final_norm"], cfg.rms_eps)
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    return composite.linear(h, head)


# ---------------------------------------------------------------------------
# Gemma 3: sandwich norms, per-layer local/global rope + sliding window
# ---------------------------------------------------------------------------

def _gemma_setup(cfg):
    from lxt_tpu.models.gemma3 import gemma_rms_norm

    layer_types = cfg.layer_types or tuple(
        "sliding_attention" if (i + 1) % 6 else "full_attention"
        for i in range(cfg.num_layers))
    is_sliding = jnp.asarray(
        [1.0 if t == "sliding_attention" else 0.0 for t in layer_types],
        jnp.float32)
    return gemma_rms_norm, is_sliding


def _gemma_ropes(positions, cfg):
    cos_g, sin_g = common.rope_tables(positions, cfg.head_dim,
                                      cfg.rope_theta,
                                      scaling=cfg.rope_global_scaling)
    cos_l, sin_l = common.rope_tables(positions, cfg.head_dim,
                                      cfg.rope_local_theta)
    return (cos_g, sin_g), (cos_l, sin_l)


def gemma3_prefill(params, cfg, inputs_embeds, t_max: int, *,
                   kv_begin=None, composite=composites.attnlrp):
    """Gemma-3 counterpart of :func:`prefill` (same contract)."""
    from lxt_tpu.models.common import ACTIVATIONS

    B, T, D = inputs_embeds.shape
    act_fn = ACTIVATIONS[cfg.act]
    norm, is_sliding = _gemma_setup(cfg)
    positions, _, kv_begin = common.padding_setup(None, kv_begin, None, T)
    (cos_g, sin_g), (cos_l, sin_l) = _gemma_ropes(positions, cfg)
    scale = cfg.query_pre_attn_scalar ** -0.5
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def layer_fn(h, xs):
        lp, sliding = xs
        res = h
        x = norm(h, lp["ln_in"], cfg.rms_eps, composite)
        q = common.split_heads(composite.linear(x, lp["wq"]), H, hd)
        k = common.split_heads(composite.linear(x, lp["wk"]), Hkv, hd)
        v = common.split_heads(composite.linear(x, lp["wv"]), Hkv, hd)
        q = norm(q, lp["q_norm"], cfg.rms_eps, composite)
        k = norm(k, lp["k_norm"], cfg.rms_eps, composite)
        cos = jnp.where(sliding > 0, cos_l, cos_g)
        sin = jnp.where(sliding > 0, sin_l, sin_g)
        window = jnp.where(sliding > 0, cfg.sliding_window,
                           jnp.int32(2**30)).astype(jnp.int32)
        q, k = common.apply_rope(q, k, cos, sin)
        attn = attention(q, k, v, causal=True, window=window,
                         composite=composite, scale=scale,
                         kv_begin=kv_begin)
        out = composite.linear(common.merge_heads(attn), lp["wo"])
        h = res + norm(out, lp["ln_post_attn"], cfg.rms_eps, composite)
        res = h
        x = norm(h, lp["ln_pre_ff"], cfg.rms_eps, composite)
        g = composite.gated_mul(act_fn, composite.linear(x, lp["wg"]),
                                composite.linear(x, lp["wu"]))
        mlp = composite.linear(g, lp["wd"])
        h = res + norm(mlp, lp["ln_post_ff"], cfg.rms_eps, composite)
        return h, (k, v)

    h, (ks, vs) = jax.lax.scan(layer_fn, inputs_embeds,
                               (params["layers"], is_sliding))
    pad = [(0, 0)] * 5
    pad[3] = (0, t_max - T)
    caches = {"k": jnp.pad(ks, pad), "v": jnp.pad(vs, pad)}
    return _gemma_head(params, cfg, h[:, T - 1:T], composite), caches


def gemma3_decode_step(params, cfg, tok_embeds, caches, t, *,
                       kv_begin=None, composite=composites.attnlrp):
    """Gemma-3 counterpart of :func:`decode_step` (same contract)."""
    from lxt_tpu.models.common import ACTIVATIONS

    B = tok_embeds.shape[0]
    act_fn = ACTIVATIONS[cfg.act]
    norm, is_sliding = _gemma_setup(cfg)
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    G = H // Hkv
    t_max = caches["k"].shape[3]
    scale = cfg.query_pre_attn_scalar ** -0.5
    if kv_begin is None:
        kv_begin = jnp.zeros((B,), jnp.int32)
    pos = jnp.maximum(t - kv_begin, 0)[:, None]
    (cos_g, sin_g), (cos_l, sin_l) = _gemma_ropes(pos, cfg)

    j = jnp.arange(t_max)
    base = (j[None, :] >= kv_begin[:, None]) & (j[None, :] <= t)
    valid_g = base
    valid_l = base & (j[None, :] > t - cfg.sliding_window)

    def layer_fn(h, xs):
        lp, ck, cv, sliding = xs
        res = h
        x = norm(h, lp["ln_in"], cfg.rms_eps, composite)
        q = common.split_heads(composite.linear(x, lp["wq"]), H, hd)
        k = common.split_heads(composite.linear(x, lp["wk"]), Hkv, hd)
        v = common.split_heads(composite.linear(x, lp["wv"]), Hkv, hd)
        q = norm(q, lp["q_norm"], cfg.rms_eps, composite)
        k = norm(k, lp["k_norm"], cfg.rms_eps, composite)
        cos = jnp.where(sliding > 0, cos_l, cos_g)
        sin = jnp.where(sliding > 0, sin_l, sin_g)
        q, k = common.apply_rope(q, k, cos, sin)
        ck = jax.lax.dynamic_update_slice(ck, k, (0, 0, t, 0))
        cv = jax.lax.dynamic_update_slice(cv, v, (0, 0, t, 0))
        valid = jnp.where(sliding > 0, valid_l, valid_g)
        qg = q.reshape(B, Hkv, G, hd)
        scores = jnp.einsum("bhgd,bhtd->bhgt", qg.astype(jnp.float32),
                            ck.astype(jnp.float32)) * scale
        scores = jnp.where(valid[:, None, None, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhgt,bhtd->bhgd", probs,
                         cv.astype(jnp.float32)).astype(h.dtype)
        out = composite.linear(out.reshape(B, 1, H * hd), lp["wo"])
        h = res + norm(out, lp["ln_post_attn"], cfg.rms_eps, composite)
        res = h
        x = norm(h, lp["ln_pre_ff"], cfg.rms_eps, composite)
        g = composite.gated_mul(act_fn, composite.linear(x, lp["wg"]),
                                composite.linear(x, lp["wu"]))
        mlp = composite.linear(g, lp["wd"])
        h = res + norm(mlp, lp["ln_post_ff"], cfg.rms_eps, composite)
        return h, (ck, cv)

    h, (ks, vs) = jax.lax.scan(
        layer_fn, tok_embeds,
        (params["layers"], caches["k"], caches["v"], is_sliding))
    return _gemma_head(params, cfg, h, composite), {"k": ks, "v": vs}


def _gemma_head(params, cfg, h, composite):
    from lxt_tpu.models.gemma3 import gemma_rms_norm

    h = gemma_rms_norm(h, params["final_norm"], cfg.rms_eps, composite)
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    return composite.linear(h, head)


# ---------------------------------------------------------------------------
# GPT-2: learned position embeddings, fused qkv, per-layer scale, no rope
# ---------------------------------------------------------------------------

def gpt2_prefill(params, cfg, inputs_embeds, t_max: int, *,
                 kv_begin=None, composite=composites.cp_lrp):
    """GPT-2 counterpart of :func:`prefill` (same contract).
    ``inputs_embeds`` are TOKEN embeddings; wpe is added here (matching
    ``gpt2.forward``)."""
    from lxt_tpu.models.common import ACTIVATIONS

    B, T, D = inputs_embeds.shape
    act_fn = ACTIVATIONS[cfg.act]
    positions, _, kv_begin = common.padding_setup(None, kv_begin, None, T)
    h = inputs_embeds + params["wpe"][positions]
    H, hd = cfg.num_heads, cfg.hd
    layer_idx = jnp.arange(cfg.num_layers, dtype=jnp.float32)

    def layer_fn(h, xs):
        lp, idx = xs
        x = composite.layer_norm(h, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
        qkv = composite.linear(x, lp["w_attn"], lp["b_attn"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = common.split_heads(q, H, hd)
        k = common.split_heads(k, H, hd)
        v = common.split_heads(v, H, hd)
        scale = hd ** -0.5
        if cfg.scale_attn_by_inverse_layer_idx:
            scale = scale / (idx + 1.0)
        attn = attention(q, k, v, causal=True, composite=composite,
                         scale=scale, kv_begin=kv_begin)
        h = h + composite.linear(common.merge_heads(attn), lp["w_proj"],
                                 lp["b_proj"])
        x = composite.layer_norm(h, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
        x = composite.act(act_fn, composite.linear(x, lp["w_fc"],
                                                   lp["b_fc"]))
        h = h + composite.linear(x, lp["w_out"], lp["b_out"])
        return h, (k, v)

    h, (ks, vs) = jax.lax.scan(layer_fn, h, (params["layers"], layer_idx))
    pad = [(0, 0)] * 5
    pad[3] = (0, t_max - T)
    caches = {"k": jnp.pad(ks, pad), "v": jnp.pad(vs, pad)}
    return _gpt2_head(params, cfg, h[:, T - 1:T], composite), caches


def gpt2_decode_step(params, cfg, tok_embeds, caches, t, *,
                     kv_begin=None, composite=composites.cp_lrp):
    """GPT-2 counterpart of :func:`decode_step` (same contract)."""
    from lxt_tpu.models.common import ACTIVATIONS

    B = tok_embeds.shape[0]
    act_fn = ACTIVATIONS[cfg.act]
    H, hd = cfg.num_heads, cfg.hd
    t_max = caches["k"].shape[3]
    if kv_begin is None:
        kv_begin = jnp.zeros((B,), jnp.int32)
    pos = jnp.maximum(t - kv_begin, 0)                   # [B]
    h = tok_embeds + params["wpe"][pos][:, None, :]
    layer_idx = jnp.arange(cfg.num_layers, dtype=jnp.float32)

    j = jnp.arange(t_max)
    valid = (j[None, :] >= kv_begin[:, None]) & (j[None, :] <= t)

    def layer_fn(h, xs):
        lp, ck, cv, idx = xs
        x = composite.layer_norm(h, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
        qkv = composite.linear(x, lp["w_attn"], lp["b_attn"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = common.split_heads(q, H, hd)
        k = common.split_heads(k, H, hd)
        v = common.split_heads(v, H, hd)
        ck = jax.lax.dynamic_update_slice(ck, k, (0, 0, t, 0))
        cv = jax.lax.dynamic_update_slice(cv, v, (0, 0, t, 0))
        scale = hd ** -0.5
        if cfg.scale_attn_by_inverse_layer_idx:
            scale = scale / (idx + 1.0)
        scores = jnp.einsum("bhqd,bhtd->bhqt", q.astype(jnp.float32),
                            ck.astype(jnp.float32)) * scale
        scores = jnp.where(valid[:, None, None, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqt,bhtd->bhqd", probs,
                         cv.astype(jnp.float32)).astype(h.dtype)
        merged = out.transpose(0, 2, 1, 3).reshape(B, 1, H * hd)
        h = h + composite.linear(merged, lp["w_proj"], lp["b_proj"])
        x = composite.layer_norm(h, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
        x = composite.act(act_fn, composite.linear(x, lp["w_fc"],
                                                   lp["b_fc"]))
        h = h + composite.linear(x, lp["w_out"], lp["b_out"])
        return h, (ck, cv)

    h, (ks, vs) = jax.lax.scan(
        layer_fn, h,
        (params["layers"], caches["k"], caches["v"], layer_idx))
    return _gpt2_head(params, cfg, h, composite), {"k": ks, "v": vs}


def _gpt2_head(params, cfg, h, composite):
    h = composite.layer_norm(h, params["lnf_w"], params["lnf_b"], cfg.ln_eps)
    return composite.linear(h, params["wte"].T)


# ---------------------------------------------------------------------------
# Mixtral: llama-shaped attention + sparse-MoE MLP
# ---------------------------------------------------------------------------

def mixtral_prefill(params, cfg, inputs_embeds, t_max: int, *,
                    kv_begin=None, composite=composites.attnlrp):
    """Mixtral counterpart of :func:`prefill` (same contract); the MoE
    block follows ``cfg.moe_impl`` exactly like the full forward."""
    from lxt_tpu.models.common import ACTIVATIONS
    from lxt_tpu.models.mixtral import moe_block

    B, T, D = inputs_embeds.shape
    act_fn = ACTIVATIONS[cfg.act]
    positions, _, kv_begin = common.padding_setup(None, kv_begin, None, T)
    cos, sin = common.rope_tables(positions, cfg.hd, cfg.rope_theta)
    scale = cfg.hd ** -0.5
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.hd

    def layer_fn(h, lp):
        x = composite.rms_norm(h, lp["ln1"], cfg.rms_eps)
        q = common.split_heads(composite.linear(x, lp["wq"]), H, hd)
        k = common.split_heads(composite.linear(x, lp["wk"]), Hkv, hd)
        v = common.split_heads(composite.linear(x, lp["wv"]), Hkv, hd)
        q, k = common.apply_rope(q, k, cos, sin)
        attn = attention(q, k, v, causal=True, composite=composite,
                         scale=scale, kv_begin=kv_begin)
        h = h + composite.linear(common.merge_heads(attn), lp["wo"])
        x = composite.rms_norm(h, lp["ln2"], cfg.rms_eps)
        h = h + moe_block(x, lp, cfg, composite, act_fn)
        return h, (k, v)

    h, (ks, vs) = jax.lax.scan(layer_fn, inputs_embeds, params["layers"])
    pad = [(0, 0)] * 5
    pad[3] = (0, t_max - T)
    caches = {"k": jnp.pad(ks, pad), "v": jnp.pad(vs, pad)}
    return _head(params, cfg, h[:, T - 1:T], composite), caches


def mixtral_decode_step(params, cfg, tok_embeds, caches, t, *,
                        kv_begin=None, composite=composites.attnlrp):
    """Mixtral counterpart of :func:`decode_step` (same contract). The
    single-token MoE runs the DENSE one-hot combine — at q-length 1 the
    E/k FLOP overhead is negligible and it avoids a per-step sort."""
    from lxt_tpu.models.common import ACTIVATIONS
    from lxt_tpu.models.mixtral import moe_block_dense

    B = tok_embeds.shape[0]
    act_fn = ACTIVATIONS[cfg.act]
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.hd
    G = H // Hkv
    t_max = caches["k"].shape[3]
    scale = cfg.hd ** -0.5
    if kv_begin is None:
        kv_begin = jnp.zeros((B,), jnp.int32)
    pos = jnp.maximum(t - kv_begin, 0)[:, None]
    cos, sin = common.rope_tables(pos, cfg.hd, cfg.rope_theta)

    j = jnp.arange(t_max)
    valid = (j[None, :] >= kv_begin[:, None]) & (j[None, :] <= t)

    def layer_fn(h, xs):
        lp, ck, cv = xs
        x = composite.rms_norm(h, lp["ln1"], cfg.rms_eps)
        q = common.split_heads(composite.linear(x, lp["wq"]), H, hd)
        k = common.split_heads(composite.linear(x, lp["wk"]), Hkv, hd)
        v = common.split_heads(composite.linear(x, lp["wv"]), Hkv, hd)
        q, k = common.apply_rope(q, k, cos, sin)
        ck = jax.lax.dynamic_update_slice(ck, k, (0, 0, t, 0))
        cv = jax.lax.dynamic_update_slice(cv, v, (0, 0, t, 0))
        qg = q.reshape(B, Hkv, G, hd)
        scores = jnp.einsum("bhgd,bhtd->bhgt", qg.astype(jnp.float32),
                            ck.astype(jnp.float32)) * scale
        scores = jnp.where(valid[:, None, None, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhgt,bhtd->bhgd", probs,
                         cv.astype(jnp.float32)).astype(h.dtype)
        h = h + composite.linear(out.reshape(B, 1, H * hd), lp["wo"])
        x = composite.rms_norm(h, lp["ln2"], cfg.rms_eps)
        h = h + moe_block_dense(x, lp, cfg, composite, act_fn)
        return h, (ck, cv)

    h, (ks, vs) = jax.lax.scan(
        layer_fn, tok_embeds,
        (params["layers"], caches["k"], caches["v"]))
    return _head(params, cfg, h, composite), {"k": ks, "v": vs}
