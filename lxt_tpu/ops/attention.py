"""Attention with LRP-correct relevance flow, kernel-agnostic.

The reference's deepest design fact (``lxt/efficient/patches.py:171-206``):
AttnLRP correctness for attention only needs gradient scaling *at the q/k/v
inputs* (q,k /4; v /2 — one /2 per surrounding matmul) plus dropout off. The
attention kernel itself runs standard math, so ANY implementation works —
here either a fused-by-XLA einsum path or the Pallas flash-attention kernel
(``ops/flash_attention.py``). Under Gradient*Input, the standard softmax
vjp composed with x*grad reproduces the Deep-Taylor softmax rule (Prop 3.1)
exactly; see tests/test_rules.py::test_gi_softmax_equals_deep_taylor.

Masking is structural where possible (``causal`` flag + runtime ``window``
scalar) so the flash path never materializes a [T, T] bias; arbitrary
additive ``bias`` arrays (e.g. BERT padding masks) take the einsum path.

Shapes follow the TPU convention ``[batch, heads, seq, head_dim]``; GQA/MQA
key/value heads are repeated to match (kernel-level broadcast is a later
optimization).
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
    """Additive causal bias (0 / -inf), decoder-aligned. For explicit-bias
    consumers; the structural path below never materializes this."""
    q_idx = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 0)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 1)
    allowed = k_idx <= q_idx + (kv_len - q_len)
    return jnp.where(allowed, 0.0, -jnp.inf).astype(dtype)


def sliding_window_mask_bias(q_len: int, kv_len: int, window, dtype=jnp.float32):
    """Causal + sliding-window additive bias. ``window`` may be traced."""
    q_idx = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 0)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 1)
    pos = q_idx + (kv_len - q_len)
    allowed = (k_idx <= pos) & (k_idx > pos - window)
    return jnp.where(allowed, 0.0, -jnp.inf).astype(dtype)


def _einsum_attention(q, k, v, bias, causal, window, scale, softcap=None):
    """Reference attention: fp32 softmax, MXU-shaped einsums."""
    dtype = q.dtype
    Tq, Tk = q.shape[2], k.shape[2]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if softcap is not None:
        scores = jnp.tanh(scores / softcap) * softcap
    if causal:
        w = window if window is not None else Tk
        scores = scores + sliding_window_mask_bias(Tq, Tk, w)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(dtype)


def attention(
    q, k, v,
    *,
    bias=None,
    causal: bool = False,
    window=None,
    composite: composites.Composite = composites.attnlrp,
    scale: Optional[float] = None,
    impl: str = "auto",
    softcap: Optional[float] = None,
    kv_begin=None,
    kv_end=None,
    rope=None,
    layout: str = "bhtd",
):
    """LRP-aware scaled dot-product attention.

    Parameters
    ----------
    q, k, v : [B, H, Tq, D] / [B, Hkv, Tk, D]
        After projections (and RoPE, unless ``rope`` is passed);
        ``Hkv`` may divide ``H``. With ``layout="bthd"`` the activations are
        projection-native ``[B, T, H, D]`` instead: the flash kernels tile
        that layout DIRECTLY (no head split/merge transposes anywhere in the
        program — the strided gather rides the kernel DMA pipeline), while
        every other path transposes to the canonical layout here.
    rope : optional ``(cos, sin)`` rotary tables ([T, D], or [B, T, D] for
        per-example positions). On the flash path with 2-D tables and a
        native head dim the rotation fuses INTO the kernels (~25 ms/step
        saved on the bench config); every other path applies
        ``common.apply_rope`` here — either way the semantics equal
        rotating q/k before the call (rope commutes with the composite's
        q/k gradient scaling: both are linear).
    bias : optional additive array broadcastable to [B, H, Tq, Tk]
        (padding masks etc.) — forces the einsum path.
    causal : static causal flag (structural mask, flash-compatible).
    window : optional sliding-window size; may be a TRACED scalar (Gemma's
        per-layer local/global alternation inside one scan).
    composite : rule assignment; ``composite.qkv`` fixes the relevance flow
        (reference patches.py:196-206) regardless of kernel choice.
    impl : 'einsum' | 'flash' | 'auto' ('auto': flash on TPU when eligible),
        or 'ring:<axis>' — sequence-parallel ring attention inside a
        ``shard_map`` over mesh axis ``<axis>`` (q/k/v hold this device's
        sequence slice; see parallel/ring.py). 'flash'/'auto' accept
        '+split' and/or '+delta' suffixes (e.g. 'flash+split+delta')
        enabling the diagonal-split forward kernel and the in-kernel
        backward delta — static per-call perf options that are SAFE ONLY
        with non-scan layer drivers (see flash_attention's docstring for
        the grad-of-scan compile pathology they trigger otherwise).
    softcap : optional tanh logit soft-capping.
    kv_begin, kv_end : optional int32 [B] — per-example valid-key span
        (kv_begin: left padding; kv_end: right padding, the HF BERT
        convention). Structural like ``causal``/``window``, so they stay
        flash-eligible (the kernel takes them as scalar-prefetch inputs and
        skips fully-padded blocks); the einsum path folds them into an
        additive bias. Fully-padded query rows return zeros with zero grads
        on the flash path.
    """
    from lxt_tpu.models import common as _mcommon

    if layout not in ("bhtd", "bthd"):
        raise ValueError(f"layout must be 'bhtd' or 'bthd', got {layout!r}")
    _sw = lambda x: x.swapaxes(1, 2)  # noqa: E731 — layout flip

    if impl.startswith("ring:"):
        from lxt_tpu.parallel.ring import ring_flash_attention
        assert (bias is None and softcap is None and kv_begin is None
                and kv_end is None), \
            "ring attention supports structural masks only"
        if layout == "bthd":   # ring shards over the canonical layout
            q, k, v = _sw(q), _sw(k), _sw(v)
        if rope is not None:   # per-shard global offsets preclude in-kernel
            q, k = _mcommon.apply_rope(q, k, *rope)
        q, k, v = composite.qkv(q, k, v)
        # '+split/+delta/...' perf suffixes are no-ops for the ring kernels;
        # strip them so 'ring:sp+delta' doesn't parse into the axis name
        axis = impl.split(":", 1)[1].partition("+")[0]
        out = ring_flash_attention(q, k, v, axis,
                                   scale=scale, causal=causal, window=window)
        return _sw(out) if layout == "bthd" else out

    h_ax, t_ax = (1, 2) if layout == "bhtd" else (2, 1)
    n_rep = q.shape[h_ax] // k.shape[h_ax]

    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])

    # rule scaling commutes with the GQA broadcast (grad of a broadcast sums
    # over the group), so apply it on the unrepeated kv
    q, k, v = composite.qkv(q, k, v)

    Tq, Tk = q.shape[t_ax], k.shape[t_ax]
    # static flash perf options encoded as impl suffixes ('flash+split',
    # 'auto+split+delta', ...) so they thread through every model's
    # hashable attn_impl argument without new plumbing
    base, _, opts_s = impl.partition("+")
    split_fwd = "split" in opts_s.split("+")
    inline_delta = "delta" in opts_s.split("+")
    impl = base
    # non-causal (bidirectional, e.g. BERT/ViT towers) is flash-eligible
    # too: the causal flag is static in the kernels
    flash_ok = (bias is None and softcap is None and Tq == Tk
                and Tq % 128 == 0)
    if impl == "auto":
        impl = "flash" if (jax.default_backend() == "tpu" and flash_ok) else "einsum"
    if impl == "flash" and not flash_ok:
        impl = "einsum"

    if impl == "flash":
        from lxt_tpu.ops.flash_attention import flash_attention
        D = q.shape[-1]
        # in-kernel rope needs native-width 2-D tables (padding would break
        # the rotate-half split; 3-D = per-example positions); otherwise
        # apply the rotation here, exactly as the models used to
        rope_in_kernel = (rope is not None and rope[0].ndim == 2
                          and D in (64, 128, 256))
        # hd=64/128/256 run natively (measured faster than lane-padding on
        # v5e: 64-wide tiles beat padded-128 by 1.2-4x, scripts/bench_flash);
        # other head dims zero-pad to the next supported width (exact: padded
        # q/k columns add 0 to scores, padded v columns are sliced off)
        Dp = D if D in (64, 128, 256) else min(
            p for p in (64, 128, 256, -(-D // 128) * 128) if p >= D)
        from lxt_tpu.ops.flash_attention import bthd_supported
        transpose_out = False
        if layout == "bthd" and (
                # packed lane-block illegal (D % 128 != 0 and not hd=64
                # pair-eligible — see flash_attention.pair_eligible)
                not bthd_supported(q.shape[2], k.shape[2], Dp)
                or (rope is not None and not rope_in_kernel)):  # apply_rope
            q, k, v = _sw(q), _sw(k), _sw(v)  # is canonical-layout-only
            layout, transpose_out = "bhtd", True
        if rope is not None and not rope_in_kernel:
            q, k = _mcommon.apply_rope(q, k, *rope)
        if Dp != D:
            pad = [(0, 0)] * 3 + [(0, Dp - D)]
            q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
        out = flash_attention(q, k, v, window, scale=scale, causal=causal,
                              kv_begin=kv_begin, kv_end=kv_end,
                              inline_delta=inline_delta, split_fwd=split_fwd,
                              rope=(rope if rope_in_kernel else None),
                              layout=layout)
        out = out[..., :D] if Dp != D else out
        return _sw(out) if transpose_out else out
    if layout == "bthd":           # einsum reference path is canonical-only
        q, k, v = _sw(q), _sw(k), _sw(v)
    if rope is not None:
        q, k = _mcommon.apply_rope(q, k, *rope)
    if kv_begin is not None or kv_end is not None:
        Tk_ = k.shape[2]
        k_idx = jax.lax.broadcasted_iota(jnp.int32, (Tk_,), 0)[None]
        ok = jnp.ones((1, Tk_), bool)
        if kv_begin is not None:
            ok = ok & (k_idx >= jnp.asarray(kv_begin)[:, None])
        if kv_end is not None:
            ok = ok & (k_idx < jnp.asarray(kv_end)[:, None])
        pad_bias = jnp.where(ok, 0.0, -1e30).astype(jnp.float32)[:, None, None, :]
        bias = pad_bias if bias is None else bias + pad_bias
    k = repeat_kv(k, n_rep)
    v = repeat_kv(v, n_rep)
    out = _einsum_attention(q, k, v, bias, causal, window, scale,
                            softcap=softcap)
    return _sw(out) if layout == "bthd" else out
