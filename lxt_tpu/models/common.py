"""Shared building blocks for the model zoo.

Functional, pytree-parameterized modules. Design rules (TPU-first):

- layers are stacked on a leading axis and iterated with ``jax.lax.scan`` so
  XLA compiles ONE layer body regardless of depth (fast compiles, and the
  natural unit for ``jax.checkpoint`` rematerialization — the TPU-native
  equivalent of the reference's HF gradient checkpointing, README.md:54).
- all linear weights are stored ``[in, out]`` so the forward is a plain
  ``x @ w`` on the MXU (HF torch stores ``[out, in]``; the loaders transpose).
- rotary tables are computed in float32 from integer positions (no gradient
  path), matching HF semantics and the reference's detached cos/sin
  (explicit/models/llama.py:258-259).
"""

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

ACTIVATIONS: Dict[str, Callable] = {
    "silu": jax.nn.silu,
    "gelu": jax.nn.gelu,  # tanh approximation (HF 'gelu_pytorch_tanh')
    "gelu_exact": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_new": jax.nn.gelu,  # GPT-2 'new' gelu == tanh approximation
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    # OpenCLIP QuickGELU: x * sigmoid(1.702 x)
    "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
}


def _inv_freq(head_dim, theta, scaling, rope_scaling, seq_len=None):
    """Host-side (float64) inverse frequencies + attention scale factor,
    with optional HF-style rope scaling. ``rope_scaling``: None, or a
    hashable tuple
    ("linear", factor),
    ("llama3", factor, low_freq_factor, high_freq_factor,
     original_max_position_embeddings),
    ("longrope", short_factors, long_factors, original_max_positions,
     max_positions, attention_factor_or_None)  — Phi-3 'longrope'/'su';
     the short/long per-dim factor schedule switches on ``seq_len`` vs
     original_max (reference vendors the same schedule,
     lxt/explicit/models/phi3.py:158-213), or
    ("yarn", factor, beta_fast, beta_slow, original_max_positions,
     attention_factor_or_None)  — HF _compute_yarn_parameters.
    Returns (inv_freq [head_dim//2] f32, attention_factor float) — the
    factor multiplies cos/sin (HF attention_scaling)."""
    import math

    import numpy as np
    half = np.arange(0, head_dim, 2, dtype=np.float64)
    inv = 1.0 / (theta ** (half / head_dim))
    attn_factor = 1.0
    if rope_scaling is not None:
        kind = rope_scaling[0]
        if kind == "linear":
            inv = inv / rope_scaling[1]
        elif kind == "llama3":
            # HF _compute_llama3_parameters: scale low-frequency components
            # by 1/factor with a smooth band in between
            _, factor, low_ff, high_ff, old_ctx = rope_scaling
            wavelen = 2 * np.pi / inv
            low_wl = old_ctx / low_ff
            high_wl = old_ctx / high_ff
            smooth = (old_ctx / wavelen - low_ff) / (high_ff - low_ff)
            inv_scaled = np.where(wavelen > low_wl, inv / factor, inv)
            smoothed = (1 - smooth) * inv / factor + smooth * inv
            is_mid = (wavelen <= low_wl) & (wavelen >= high_wl)
            inv = np.where(is_mid, smoothed, inv_scaled)
        elif kind == "longrope":
            _, short, long, old_ctx, max_ctx, af = rope_scaling
            ext = np.asarray(
                long if (seq_len or 0) > old_ctx else short, np.float64)
            if ext.shape != half.shape:
                raise ValueError(
                    f"longrope factor length {ext.shape[0]} != head_dim//2 "
                    f"({half.shape[0]}) — HF ships one factor per rotary "
                    f"frequency pair")
            inv = 1.0 / (ext * theta ** (half / head_dim))
            factor = max_ctx / old_ctx
            if af is not None:
                attn_factor = af
            elif factor > 1:
                attn_factor = math.sqrt(1 + math.log(factor) / math.log(old_ctx))
        elif kind == "yarn":
            _, factor, beta_fast, beta_slow, old_ctx, af = rope_scaling
            # HF _compute_yarn_parameters: NTK-by-parts interpolation between
            # extrapolated and position-interpolated frequencies
            def correction_dim(n_rot):
                return (head_dim * math.log(old_ctx / (n_rot * 2 * math.pi))
                        ) / (2 * math.log(theta))
            low = max(math.floor(correction_dim(beta_fast)), 0)
            high = min(math.ceil(correction_dim(beta_slow)), head_dim - 1)
            if low == high:
                high += 0.001
            ramp = np.clip((np.arange(head_dim // 2, dtype=np.float64) - low)
                           / (high - low), 0.0, 1.0)
            extrap_w = 1.0 - ramp
            inv = (inv / factor) * (1 - extrap_w) + inv * extrap_w
            attn_factor = af if af is not None else 0.1 * math.log(factor) + 1.0
        else:
            raise ValueError(f"unsupported rope scaling: {kind}")
    return jnp.asarray((inv / scaling).astype(np.float32)), attn_factor


def rope_tables(positions, head_dim, theta=10000.0, scaling=1.0,
                rope_scaling=None, seq_len=None):
    """cos/sin tables (half-frequencies duplicated, HF convention).

    ``positions``: int32 ``[T]`` -> tables ``[T, head_dim]``, or ``[B, T]``
    (per-example positions for left-padded batches) -> ``[B, T, head_dim]``.

    ``seq_len`` (static int): the total sequence length, used by longrope
    scaling to pick the short vs long factor schedule.

    ``inv_freq`` is computed in float64 on the host and baked in as an f32
    constant — HF torch does the double-precision pow too, and the 1e-5 table
    error from an f32 pow measurably degrades relevance parity after a few
    layers."""
    inv_freq, attn_factor = _inv_freq(head_dim, theta, scaling, rope_scaling,
                                      seq_len=seq_len)
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    if attn_factor != 1.0:
        return jnp.cos(emb) * attn_factor, jnp.sin(emb) * attn_factor
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(q, k, cos, sin):
    """q,k: [B, H, T, D]; cos/sin: [T, D] or [B, T, D] (padded batches).

    The rotation runs in the ACTIVATION dtype (HF torch semantics:
    apply_rotary_pos_emb casts cos/sin to x.dtype) — a profiled bf16 step
    spent ~12% of its time on the previous f32 upcast + the transpose
    copies it forced. The tables themselves are precomputed in f32/f64
    (rope_tables), so only the rotation arithmetic narrows."""
    dt = q.dtype
    if cos.ndim == 3:
        c = cos[:, None].astype(dt)
        s = sin[:, None].astype(dt)
    else:
        c = cos[None, None].astype(dt)
        s = sin[None, None].astype(dt)
    q_out = q * c + rotate_half(q) * s
    k_out = k * c + rotate_half(k) * s
    return q_out, k_out


def padding_setup(attention_mask, kv_begin, positions, T):
    """Resolve ``(positions, bias, kv_begin)`` for batched prompts.

    Two mutually-exclusive ways to express variable-length left-padded
    batches:

    - ``attention_mask`` ([B, T] of 1/0, arbitrary pattern): lowered to an
      additive bias — forces the einsum attention path.
    - ``kv_begin`` ([B] int32, index of each example's first real token):
      structural, stays flash-eligible (the Pallas kernel takes it as a
      scalar-prefetch input and skips fully-padded blocks).

    Positions follow the HF convention (0 at the first real token).
    """
    bias = None
    if attention_mask is not None:
        assert kv_begin is None, "pass attention_mask OR kv_begin, not both"
        mask = jnp.asarray(attention_mask)
        if positions is None:
            positions = jnp.clip(jnp.cumsum(mask, axis=-1) - 1, 0, None)
        # large-but-finite so fully-padded QUERY rows (pad attending pads)
        # softmax to uniform instead of NaN; their outputs never reach real
        # positions (HF uses finfo.min for the same reason)
        bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e30
                         ).astype(jnp.float32)
    elif kv_begin is not None:
        kv_begin = jnp.asarray(kv_begin, jnp.int32)
        if positions is None:
            positions = jnp.clip(
                jnp.arange(T, dtype=jnp.int32)[None] - kv_begin[:, None],
                0, None)
    if positions is None:
        positions = jnp.arange(T, dtype=jnp.int32)
    return positions, bias, kv_begin


def split_heads(x, n_heads, head_dim):
    """[B, T, n*d] -> [B, n, T, d]"""
    b, t, _ = x.shape
    return x.reshape(b, t, n_heads, head_dim).transpose(0, 2, 1, 3)


def merge_heads(x):
    """[B, n, T, d] -> [B, T, n*d]"""
    b, n, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, n * d)


def unrolled(f, h, xs):
    """Fully-unrolled layer driver (drop-in for the default ``lax.scan``).

    A ``layer_driver`` that runs the stacked layers as straight-line code
    with STATIC per-layer slices. Under ``jax.vjp`` with ``remat=False``
    the default scan stacks every saved residual with a
    dynamic-update-slice per layer and reads it back with a dynamic-slice
    in the backward — pure HBM copy traffic that a profiled bench step
    spent ~25% of its time on (scripts/profile_step.py). Unrolled, XLA
    writes residuals in place and the copies vanish (measured +12%
    end-to-end on the headline config; compile time ~3x the scan's).

    Use when throughput matters more than compile time and ``remat`` is
    off; the scan stays the default everywhere else.
    """
    L = jax.tree_util.tree_leaves(xs)[0].shape[0]
    ys = []
    for i in range(L):
        xi = jax.tree_util.tree_map(lambda a: a[i], xs)
        h, y = f(h, xi)
        ys.append(y)
    if ys and ys[0] is not None:
        return h, jnp.stack(ys)
    return h, None


def run_stacked_layers(make_layer, composite, remat, layer_driver, h, xs):
    """Drive a model's stacked layer axis. ``make_layer(comp)`` returns the
    scan-shaped layer body ``layer_fn(h, xs_slice) -> (h, y)``.

    With ``composite.layer_overrides`` (per-depth rule maps,
    :meth:`lxt_tpu.Composite.override_layers`) the stack runs UNROLLED,
    resolving ``composite.for_layer(i, L)`` at each static depth — rules
    are trace-time static, so a depth-varying composite cannot live inside
    one scanned body. Otherwise one compiled body runs under the default
    ``lax.scan`` (or the provided ``layer_driver``: pipeline parallel,
    :func:`unrolled`, ...).
    """
    overrides = getattr(composite, "layer_overrides", ())
    if overrides:
        if layer_driver is not None and layer_driver is not unrolled:
            raise ValueError(
                "composite.layer_overrides require the unrolled layer "
                "stack; a custom layer_driver (e.g. pipeline parallel) "
                "cannot vary rules with depth")
        L = jax.tree_util.tree_leaves(xs)[0].shape[0]
        ys = []
        for i in range(L):
            body = remat_wrap(make_layer(composite.for_layer(i, L)), remat)
            xi = jax.tree_util.tree_map(lambda a: a[i], xs)
            h, y = body(h, xi)
            ys.append(y)
        if ys and ys[0] is not None:
            return h, jnp.stack(ys)
        return h, None
    body = remat_wrap(make_layer(composite), remat)
    run = layer_driver or (lambda f, c, x: jax.lax.scan(f, c, x))
    return run(body, h, xs)


def remat_wrap(layer_fn, remat):
    """Rematerialization policy for a scanned layer body.

    - True  : full remat (recompute everything; O(1) activation memory per
              layer — the reference's gradient-checkpointing profile)
    - "dots": save matmul outputs, recompute elementwise ops — much less
              recompute for a modest memory increase (often the sweet spot)
    - "offload": full remat AND the per-layer input (the only tensor full
              remat still keeps on device per layer) offloads to pinned
              HOST memory — device activation memory becomes O(1) in
              depth, the regime for contexts past one chip's HBM (the
              offload DMA overlaps the layer compute)
    - False : save everything (fastest when activations fit HBM)
    """
    if remat is True:
        return jax.checkpoint(layer_fn)
    if remat == "dots":
        return jax.checkpoint(
            layer_fn, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    if remat == "offload":
        from jax.ad_checkpoint import checkpoint_name
        policy = jax.checkpoint_policies.save_and_offload_only_these_names(
            names_which_can_be_saved=[],
            names_which_can_be_offloaded=["lxt_layer_in"],
            offload_src="device", offload_dst="pinned_host")

        def named(h, xs):
            return layer_fn(checkpoint_name(h, "lxt_layer_in"), xs)

        return jax.checkpoint(named, policy=policy)
    return layer_fn


def take_frontier(h, logits_at):
    """Slice the single position whose logits will be computed.

    ``dynamic_slice``: ``logits_at`` may be a TRACED scalar (the jitted
    greedy-decode loop slices at the growing frontier); identical lowering
    for the usual static ``-1``."""
    return jax.lax.dynamic_slice_in_dim(h, logits_at % h.shape[1], 1, axis=1)


def uniform_init(key, shape, scale=0.02, dtype=jnp.float32):
    # generate directly in the target dtype: a f32 intermediate for a
    # multi-GB stacked weight would not fit HBM at 8B scale
    return jax.random.normal(key, shape, dtype) * jnp.asarray(scale, dtype)


@dataclasses.dataclass
class ModelOutputs:
    """Forward outputs. ``hidden_states`` is ``[L+1, B, T, D]`` when
    requested (embeddings + each layer output) — the substrate for latent
    feature attribution (reference docs/latent-feature-attribution)."""
    logits: Any
    hidden_states: Optional[Any] = None
