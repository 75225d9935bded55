"""Attention with LRP-correct relevance flow, kernel-agnostic.

The reference's deepest design fact (``lxt/efficient/patches.py:171-206``):
AttnLRP correctness for attention only needs gradient scaling *at the q/k/v
inputs* (q,k /4; v /2 — one /2 per surrounding matmul) plus dropout off. The
attention kernel itself runs standard math, so ANY implementation works —
here either a fused-by-XLA einsum path or the Pallas flash-attention kernel
(``ops/flash_attention.py``). Under Gradient*Input, the standard softmax
vjp composed with x*grad reproduces the Deep-Taylor softmax rule (Prop 3.1)
exactly; see tests/test_rules.py::test_gi_softmax_equals_deep_taylor.

Shapes follow the TPU-friendly convention ``[batch, heads, seq, head_dim]``;
GQA/MQA key/value heads are broadcast without materialization where possible.
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp

from lxt_tpu import composites


def repeat_kv(x, n_rep: int):
    """[B, Hkv, T, D] -> [B, Hkv*n_rep, T, D] (HF repeat_kv equivalent)."""
    if n_rep == 1:
        return x
    b, h, t, d = x.shape
    x = jnp.broadcast_to(x[:, :, None], (b, h, n_rep, t, d))
    return x.reshape(b, h * n_rep, t, d)


def causal_mask_bias(q_len: int, kv_len: int, dtype=jnp.float32):
    """Additive causal bias: 0 on/below the diagonal, -inf above (aligned to
    the end of the kv sequence, i.e. standard decoder convention)."""
    q_idx = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 0)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 1)
    allowed = k_idx <= q_idx + (kv_len - q_len)
    return jnp.where(allowed, 0.0, -jnp.inf).astype(dtype)


def sliding_window_mask_bias(q_len: int, kv_len: int, window: int, dtype=jnp.float32):
    """Causal + sliding-window additive bias (Gemma-3 local layers)."""
    q_idx = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 0)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 1)
    pos = q_idx + (kv_len - q_len)
    allowed = (k_idx <= pos) & (k_idx > pos - window)
    return jnp.where(allowed, 0.0, -jnp.inf).astype(dtype)


def _einsum_attention(q, k, v, bias, scale, softcap=None):
    """Reference attention: fp32 softmax, MXU-shaped einsums."""
    dtype = q.dtype
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if softcap is not None:
        scores = jnp.tanh(scores / softcap) * softcap
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(dtype)


def attention(
    q, k, v,
    bias=None,
    composite: composites.Composite = composites.attnlrp,
    scale: Optional[float] = None,
    impl: str = "auto",
    softcap: Optional[float] = None,
):
    """LRP-aware scaled dot-product attention.

    Parameters
    ----------
    q, k, v : [B, H, Tq, D] / [B, Hkv, Tk, D]
        Query/key/value after projections and RoPE. ``Hkv`` may divide ``H``.
    bias : optional additive mask bias, broadcastable to [B, H, Tq, Tk].
    composite : rule assignment; ``composite.qkv`` fixes the relevance flow
        (reference patches.py:196-206) regardless of kernel choice.
    scale : default 1/sqrt(D).
    impl : 'einsum' | 'flash' | 'auto'. 'auto' uses flash on TPU for long
        sequences, einsum otherwise.
    softcap : optional logit soft-capping (Gemma-style tanh cap).
    """
    n_rep = q.shape[1] // k.shape[1]
    k = repeat_kv(k, n_rep)
    v = repeat_kv(v, n_rep)

    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])

    q, k, v = composite.qkv(q, k, v)

    if impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        long_seq = q.shape[2] >= 512 and q.shape[2] == k.shape[2]
        impl = "flash" if (on_tpu and long_seq and softcap is None) else "einsum"

    if impl == "flash":
        from lxt_tpu.ops.flash_attention import flash_attention
        return flash_attention(q, k, v, bias=bias, scale=scale)
    return _einsum_attention(q, k, v, bias, scale, softcap=softcap)
