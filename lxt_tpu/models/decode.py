"""KV-cached greedy decoding for every causal family (Llama/Qwen/Mistral/
Phi-3, Gemma 3, GPT-2, Mixtral).

The attribution forward (``llama.forward`` etc.) is full-sequence by
design — one fused program per heatmap. Generation is different:
re-running the full prefix per emitted token costs O(N·T) attention and
O(N) full MLP passes. This module adds the standard incremental-decoding
split:

- ``*_prefill`` — one full forward over the prompt that ALSO returns the
  per-layer rotary-embedded K/V, written into a ``[L, B, Hkv, Tmax, hd]``
  cache padded to the final length;
- ``*_decode_step`` — a single-token forward that appends its K/V into
  the cache and attends against the cached prefix (einsum; a 1×T
  attention row is bandwidth-trivial).

``AttributionModel.generate`` drives these inside one jitted
``fori_loop`` — the decode loop is O(T + N·(T·D + params)) instead of
N whole-prefix forwards, which makes the serving ``respond`` flow
decode-bound no more. Attribution itself still uses the full-sequence
forward (relevance needs all positions anyway).

Decode steps iterate layers with a ``fori_loop`` carrying the whole
``[L, ...]`` cache and writing ONE ``[B, Hkv, 1, hd]`` slot per layer via
``dynamic_update_slice`` — a ``lax.scan`` with the caches as xs→ys would
re-materialize the full cache every token (ys are fresh stacked outputs),
doubling decode HBM traffic.

Numerics: rope is applied before the attention (identical semantics to
the fused path, see ops/attention.py ``rope=``), scores accumulate in
f32. Greedy argmax equality with the uncached path is tested per family
variant (GQA, qkv_bias, qk_norm, sliding window, left padding).
"""

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


def _pad_cache(ks, vs, t_max):
    """Stacked per-layer K/V from a prefill scan -> [L, B, Hkv, t_max, hd]."""
    pad = [(0, 0)] * 5
    pad[3] = (0, t_max - ks.shape[3])
    return {"k": jnp.pad(ks, pad), "v": jnp.pad(vs, pad)}


def _layer_at(layers, l):
    """Per-layer parameter slice at a TRACED layer index (the decode
    step's fori_loop): same dynamic-slice reads a scan would do."""
    return jax.tree_util.tree_map(
        lambda a: jax.lax.dynamic_index_in_dim(a, l, 0, keepdims=False),
        layers)


def _append_and_read(caches, l, t, k, v):
    """Write the new [B, Hkv, 1, hd] K/V slot of layer ``l`` at time ``t``
    in place, then read the layer's rows back for the attend."""
    ck_all = jax.lax.dynamic_update_slice(caches["k"], k[None],
                                          (l, 0, 0, t, 0))
    cv_all = jax.lax.dynamic_update_slice(caches["v"], v[None],
                                          (l, 0, 0, t, 0))
    ck = jax.lax.dynamic_index_in_dim(ck_all, l, 0, keepdims=False)
    cv = jax.lax.dynamic_index_in_dim(cv_all, l, 0, keepdims=False)
    return {"k": ck_all, "v": cv_all}, ck, cv


def _attend_1tok(q, ck, cv, valid, scale):
    """Single-query GQA attention against the cache rows.

    ``q [B, H, 1, hd]``, ``ck/cv [B, Hkv, Tm, hd]``, ``valid [B, Tm]``.
    Scores and the probability-weighted sum accumulate in f32. Returns
    ``[B, 1, H*hd]`` in q's dtype (head-major merge order, matching
    ``common.merge_heads``).
    """
    B, H, _, hd = q.shape
    Hkv = ck.shape[1]
    G = H // Hkv
    qg = q.reshape(B, Hkv, G, hd)
    scores = jnp.einsum("bhgd,bhtd->bhgt", qg.astype(jnp.float32),
                        ck.astype(jnp.float32)) * scale
    scores = jnp.where(valid[:, None, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgt,bhtd->bhgd", probs, cv.astype(jnp.float32))
    return out.reshape(B, 1, H * hd).astype(q.dtype)


def _causal_valid(t_max, t, kv_begin, window=None):
    """[B, t_max] mask of cache slots visible to the frontier query."""
    j = jnp.arange(t_max)
    valid = (j[None, :] >= kv_begin[:, None]) & (j[None, :] <= t)
    if window is not None:
        valid &= j[None, :] > t - window
    return valid


def _kv_begin_or_zeros(kv_begin, B):
    if kv_begin is None:
        return jnp.zeros((B,), jnp.int32)
    return jnp.asarray(kv_begin, jnp.int32)


# ---------------------------------------------------------------------------
# Llama family (Qwen 2/3, Mistral, Phi-3)
# ---------------------------------------------------------------------------

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
        q = composite.linear(x, lp["wq"], lp.get("bq"), site="wq")
        k = composite.linear(x, lp["wk"], lp.get("bk"), site="wk")
        v = composite.linear(x, lp["wv"], lp.get("bv"), site="wv")
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
        h = h + composite.linear(common.merge_heads(attn), lp["wo"], site="wo")
        x = composite.rms_norm(h, lp["ln2"], cfg.rms_eps)
        g = composite.gated_mul(act_fn, composite.linear(x, lp["wg"], site="wg"),
                                composite.linear(x, lp["wu"], site="wu"))
        h = h + composite.linear(g, lp["wd"], site="wd")
        return h, (k, v)

    h, (ks, vs) = jax.lax.scan(layer_fn, inputs_embeds, params["layers"])
    return (_head(params, cfg, h[:, T - 1:T], composite),
            _pad_cache(ks, vs, t_max))


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
    t_max = caches["k"].shape[3]
    scale = cfg.hd ** -0.5
    kv_begin = _kv_begin_or_zeros(kv_begin, B)
    pos = jnp.maximum(t - kv_begin, 0)[:, None]          # [B, 1]
    cos, sin = _rope_at(pos, cfg, t_max)
    valid = _causal_valid(t_max, t, kv_begin, cfg.sliding_window)

    def body(l, state):
        h, caches = state
        lp = _layer_at(params["layers"], l)
        x = composite.rms_norm(h, lp["ln1"], cfg.rms_eps)
        q = composite.linear(x, lp["wq"], lp.get("bq"), site="wq")
        k = composite.linear(x, lp["wk"], lp.get("bk"), site="wk")
        v = composite.linear(x, lp["wv"], lp.get("bv"), site="wv")
        q = common.split_heads(q, H, hd)                 # [B, H, 1, hd]
        k = common.split_heads(k, Hkv, hd)               # [B, Hkv, 1, hd]
        v = common.split_heads(v, Hkv, hd)
        if cfg.qk_norm:
            q = composite.rms_norm(q, lp["q_norm"], cfg.rms_eps)
            k = composite.rms_norm(k, lp["k_norm"], cfg.rms_eps)
        q, k = common.apply_rope(q, k, cos, sin)
        caches, ck, cv = _append_and_read(caches, l, t, k, v)
        merged = _attend_1tok(q, ck, cv, valid, scale)
        h = h + composite.linear(merged, lp["wo"], site="wo")
        x = composite.rms_norm(h, lp["ln2"], cfg.rms_eps)
        g = composite.gated_mul(act_fn, composite.linear(x, lp["wg"], site="wg"),
                                composite.linear(x, lp["wu"], site="wu"))
        h = h + composite.linear(g, lp["wd"], site="wd")
        return h, caches

    h, caches = jax.lax.fori_loop(0, cfg.num_layers, body,
                                  (tok_embeds, caches))
    return _head(params, cfg, h, composite), caches


def _head(params, cfg, h, composite):
    h = composite.rms_norm(h, params["final_norm"], cfg.rms_eps)
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    return composite.linear(h, head)


# ---------------------------------------------------------------------------
# Gemma 3: sandwich norms, per-layer local/global rope + sliding window
# ---------------------------------------------------------------------------

def gemma3_prefill(params, cfg, inputs_embeds, t_max: int, *,
                   kv_begin=None, composite=composites.attnlrp):
    """Gemma-3 counterpart of :func:`prefill` (same contract)."""
    from lxt_tpu.models.gemma3 import (gemma_rms_norm, layer_sliding_flags,
                                       rope_table_pair)

    B, T, D = inputs_embeds.shape
    act_fn = ACTIVATIONS[cfg.act]
    norm = gemma_rms_norm
    is_sliding = layer_sliding_flags(cfg)
    positions, _, kv_begin = common.padding_setup(None, kv_begin, None, T)
    (cos_g, sin_g), (cos_l, sin_l) = rope_table_pair(positions, cfg)
    scale = cfg.query_pre_attn_scalar ** -0.5
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def layer_fn(h, xs):
        lp, sliding = xs
        res = h
        x = norm(h, lp["ln_in"], cfg.rms_eps, composite)
        q = common.split_heads(composite.linear(x, lp["wq"], site="wq"), H, hd)
        k = common.split_heads(composite.linear(x, lp["wk"], site="wk"), Hkv, hd)
        v = common.split_heads(composite.linear(x, lp["wv"], site="wv"), Hkv, hd)
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
        out = composite.linear(common.merge_heads(attn), lp["wo"], site="wo")
        h = res + norm(out, lp["ln_post_attn"], cfg.rms_eps, composite)
        res = h
        x = norm(h, lp["ln_pre_ff"], cfg.rms_eps, composite)
        g = composite.gated_mul(act_fn, composite.linear(x, lp["wg"], site="wg"),
                                composite.linear(x, lp["wu"], site="wu"))
        mlp = composite.linear(g, lp["wd"], site="wd")
        h = res + norm(mlp, lp["ln_post_ff"], cfg.rms_eps, composite)
        return h, (k, v)

    h, (ks, vs) = jax.lax.scan(layer_fn, inputs_embeds,
                               (params["layers"], is_sliding))
    return (_gemma_head(params, cfg, h[:, T - 1:T], composite),
            _pad_cache(ks, vs, t_max))


def gemma3_decode_step(params, cfg, tok_embeds, caches, t, *,
                       kv_begin=None, composite=composites.attnlrp):
    """Gemma-3 counterpart of :func:`decode_step` (same contract)."""
    from lxt_tpu.models.gemma3 import (gemma_rms_norm, layer_sliding_flags,
                                       rope_table_pair)

    B = tok_embeds.shape[0]
    act_fn = ACTIVATIONS[cfg.act]
    norm = gemma_rms_norm
    is_sliding = layer_sliding_flags(cfg)
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    t_max = caches["k"].shape[3]
    scale = cfg.query_pre_attn_scalar ** -0.5
    kv_begin = _kv_begin_or_zeros(kv_begin, B)
    pos = jnp.maximum(t - kv_begin, 0)[:, None]
    (cos_g, sin_g), (cos_l, sin_l) = rope_table_pair(pos, cfg)
    valid_g = _causal_valid(t_max, t, kv_begin)
    valid_l = _causal_valid(t_max, t, kv_begin, cfg.sliding_window)

    def body(l, state):
        h, caches = state
        lp = _layer_at(params["layers"], l)
        sliding = is_sliding[l]
        res = h
        x = norm(h, lp["ln_in"], cfg.rms_eps, composite)
        q = common.split_heads(composite.linear(x, lp["wq"], site="wq"), H, hd)
        k = common.split_heads(composite.linear(x, lp["wk"], site="wk"), Hkv, hd)
        v = common.split_heads(composite.linear(x, lp["wv"], site="wv"), Hkv, hd)
        q = norm(q, lp["q_norm"], cfg.rms_eps, composite)
        k = norm(k, lp["k_norm"], cfg.rms_eps, composite)
        cos = jnp.where(sliding > 0, cos_l, cos_g)
        sin = jnp.where(sliding > 0, sin_l, sin_g)
        q, k = common.apply_rope(q, k, cos, sin)
        caches, ck, cv = _append_and_read(caches, l, t, k, v)
        valid = jnp.where(sliding > 0, valid_l, valid_g)
        merged = _attend_1tok(q, ck, cv, valid, scale)
        out = composite.linear(merged, lp["wo"], site="wo")
        h = res + norm(out, lp["ln_post_attn"], cfg.rms_eps, composite)
        res = h
        x = norm(h, lp["ln_pre_ff"], cfg.rms_eps, composite)
        g = composite.gated_mul(act_fn, composite.linear(x, lp["wg"], site="wg"),
                                composite.linear(x, lp["wu"], site="wu"))
        mlp = composite.linear(g, lp["wd"], site="wd")
        h = res + norm(mlp, lp["ln_post_ff"], cfg.rms_eps, composite)
        return h, caches

    h, caches = jax.lax.fori_loop(0, cfg.num_layers, body,
                                  (tok_embeds, caches))
    return _gemma_head(params, cfg, h, composite), caches


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
    B, T, D = inputs_embeds.shape
    act_fn = ACTIVATIONS[cfg.act]
    positions, _, kv_begin = common.padding_setup(None, kv_begin, None, T)
    h = inputs_embeds + params["wpe"][positions]
    H, hd = cfg.num_heads, cfg.hd
    layer_idx = jnp.arange(cfg.num_layers, dtype=jnp.float32)

    def layer_fn(h, xs):
        lp, idx = xs
        x = composite.layer_norm(h, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
        qkv = composite.linear(x, lp["w_attn"], lp["b_attn"], site="w_attn")
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
                                 lp["b_proj"], site="w_proj")
        x = composite.layer_norm(h, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
        x = composite.act(act_fn, composite.linear(x, lp["w_fc"],
                                                   lp["b_fc"], site="w_fc"))
        h = h + composite.linear(x, lp["w_out"], lp["b_out"], site="w_out")
        return h, (k, v)

    h, (ks, vs) = jax.lax.scan(layer_fn, h, (params["layers"], layer_idx))
    return (_gpt2_head(params, cfg, h[:, T - 1:T], composite),
            _pad_cache(ks, vs, t_max))


def gpt2_decode_step(params, cfg, tok_embeds, caches, t, *,
                     kv_begin=None, composite=composites.cp_lrp):
    """GPT-2 counterpart of :func:`decode_step` (same contract)."""
    B = tok_embeds.shape[0]
    act_fn = ACTIVATIONS[cfg.act]
    H, hd = cfg.num_heads, cfg.hd
    t_max = caches["k"].shape[3]
    kv_begin = _kv_begin_or_zeros(kv_begin, B)
    pos = jnp.maximum(t - kv_begin, 0)                   # [B]
    h0 = tok_embeds + params["wpe"][pos][:, None, :]
    valid = _causal_valid(t_max, t, kv_begin)

    def body(l, state):
        h, caches = state
        lp = _layer_at(params["layers"], l)
        x = composite.layer_norm(h, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
        qkv = composite.linear(x, lp["w_attn"], lp["b_attn"], site="w_attn")
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = common.split_heads(q, H, hd)
        k = common.split_heads(k, H, hd)
        v = common.split_heads(v, H, hd)
        scale = hd ** -0.5
        if cfg.scale_attn_by_inverse_layer_idx:
            scale = scale / (l.astype(jnp.float32) + 1.0)
        caches, ck, cv = _append_and_read(caches, l, t, k, v)
        merged = _attend_1tok(q, ck, cv, valid, scale)
        h = h + composite.linear(merged, lp["w_proj"], lp["b_proj"], site="w_proj")
        x = composite.layer_norm(h, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
        x = composite.act(act_fn, composite.linear(x, lp["w_fc"],
                                                   lp["b_fc"], site="w_fc"))
        h = h + composite.linear(x, lp["w_out"], lp["b_out"], site="w_out")
        return h, caches

    h, caches = jax.lax.fori_loop(0, cfg.num_layers, body, (h0, caches))
    return _gpt2_head(params, cfg, h, composite), caches


def _gpt2_head(params, cfg, h, composite):
    h = composite.layer_norm(h, params["lnf_w"], params["lnf_b"], cfg.ln_eps)
    return composite.linear(h, params["wte"].T, site="wte")


# ---------------------------------------------------------------------------
# Mixtral: llama-shaped attention + sparse-MoE MLP
# ---------------------------------------------------------------------------

def mixtral_prefill(params, cfg, inputs_embeds, t_max: int, *,
                    kv_begin=None, composite=composites.attnlrp):
    """Mixtral counterpart of :func:`prefill` (same contract); the MoE
    block follows ``cfg.moe_impl`` exactly like the full forward."""
    from lxt_tpu.models.mixtral import moe_block

    B, T, D = inputs_embeds.shape
    act_fn = ACTIVATIONS[cfg.act]
    positions, _, kv_begin = common.padding_setup(None, kv_begin, None, T)
    cos, sin = common.rope_tables(positions, cfg.hd, cfg.rope_theta)
    scale = cfg.hd ** -0.5
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.hd

    def layer_fn(h, lp):
        x = composite.rms_norm(h, lp["ln1"], cfg.rms_eps)
        q = common.split_heads(composite.linear(x, lp["wq"], site="wq"), H, hd)
        k = common.split_heads(composite.linear(x, lp["wk"], site="wk"), Hkv, hd)
        v = common.split_heads(composite.linear(x, lp["wv"], site="wv"), Hkv, hd)
        q, k = common.apply_rope(q, k, cos, sin)
        attn = attention(q, k, v, causal=True, composite=composite,
                         scale=scale, kv_begin=kv_begin)
        h = h + composite.linear(common.merge_heads(attn), lp["wo"], site="wo")
        x = composite.rms_norm(h, lp["ln2"], cfg.rms_eps)
        h = h + moe_block(x, lp, cfg, composite, act_fn)
        return h, (k, v)

    h, (ks, vs) = jax.lax.scan(layer_fn, inputs_embeds, params["layers"])
    return (_head(params, cfg, h[:, T - 1:T], composite),
            _pad_cache(ks, vs, t_max))


def mixtral_decode_step(params, cfg, tok_embeds, caches, t, *,
                        kv_begin=None, composite=composites.attnlrp):
    """Mixtral counterpart of :func:`decode_step` (same contract). The
    single-token MoE uses ``cfg.moe_impl`` — the SAME block as the
    prefill and the full forward, so the cached path cannot diverge from
    the uncached one even at reduction-order (ULP) level."""
    from lxt_tpu.models.mixtral import moe_block

    B = tok_embeds.shape[0]
    act_fn = ACTIVATIONS[cfg.act]
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.hd
    t_max = caches["k"].shape[3]
    scale = cfg.hd ** -0.5
    kv_begin = _kv_begin_or_zeros(kv_begin, B)
    pos = jnp.maximum(t - kv_begin, 0)[:, None]
    cos, sin = common.rope_tables(pos, cfg.hd, cfg.rope_theta)
    valid = _causal_valid(t_max, t, kv_begin)

    def body(l, state):
        h, caches = state
        lp = _layer_at(params["layers"], l)
        x = composite.rms_norm(h, lp["ln1"], cfg.rms_eps)
        q = common.split_heads(composite.linear(x, lp["wq"], site="wq"), H, hd)
        k = common.split_heads(composite.linear(x, lp["wk"], site="wk"), Hkv, hd)
        v = common.split_heads(composite.linear(x, lp["wv"], site="wv"), Hkv, hd)
        q, k = common.apply_rope(q, k, cos, sin)
        caches, ck, cv = _append_and_read(caches, l, t, k, v)
        merged = _attend_1tok(q, ck, cv, valid, scale)
        h = h + composite.linear(merged, lp["wo"], site="wo")
        x = composite.rms_norm(h, lp["ln2"], cfg.rms_eps)
        h = h + moe_block(x, lp, cfg, composite, act_fn)
        return h, caches

    h, caches = jax.lax.fori_loop(0, cfg.num_layers, body,
                                  (tok_embeds, caches))
    return _head(params, cfg, h, composite), caches
