"""Ring (sequence-parallel) flash attention with a relevance-correct VJP.

For contexts larger than one chip's HBM, the sequence is sharded over a mesh
axis: each device holds a slice of q/k/v. At ring step s, every device
computes flash attention between its local queries and the kv slice that
originated on device ``(idx - s) mod n``, then passes its current kv slice
to the right neighbor (``lax.ppermute`` — XLA lowers it onto the ICI ring).
Partial results merge by logsumexp reweighting; the merge, the permute and
the per-step flash kernel are all differentiable, so ONE ``jax.vjp`` over
the whole ring yields exactly the relevance of monolithic attention —
including the gradient paths through the merge weights, because
``flash_attention_lse``'s backward folds the lse cotangent into its delta
term.

Causality costs nothing extra: kv slices entirely in a query's future are
skipped inside the kernel via the global q_start/k_start offsets (their rows
return lse = -1e30, i.e. zero merge weight).

Reference status: the reference has no sequence scaling beyond gradient
checkpointing (SURVEY.md §2.4); its explicit path materializes the full
B x H x T x T probabilities. This module is the "ring-attention relevance
pass over ICI" called for by the survey's build plan.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from lxt_tpu.ops.flash_attention import flash_attention_lse


def _merge(out_a, lse_a, out_b, lse_b):
    """Combine two normalized partial attentions via logsumexp weights."""
    m = jnp.maximum(lse_a, lse_b)
    wa = jnp.exp(lse_a - m)
    wb = jnp.exp(lse_b - m)
    denom = wa + wb
    out = (out_a * (wa / denom)[..., None] + out_b * (wb / denom)[..., None])
    return out, m + jnp.log(denom)


def ring_flash_attention(q, k, v, axis_name: str,
                         scale: Optional[float] = None,
                         causal: bool = True,
                         window=None):
    """Sequence-parallel attention inside ``shard_map``.

    q: local ``[B, H, T_local, D]``; k, v: local ``[B, Hkv, T_local, D]``
    (this device's slice of the global sequence, sharded over ``axis_name``).
    Returns the local slice of softmax(QK^T)V as if computed globally.
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, H, Tl, D = q.shape
    q_start = idx * Tl

    def body(s, carry):
        out_acc, lse_acc, (k_cur, v_cur) = carry
        src = (idx - s) % n          # device the current kv slice came from
        out_s, lse_s = flash_attention_lse(
            q, k_cur, v_cur, window, q_start=q_start, k_start=src * Tl,
            scale=scale, causal=causal)
        out_acc, lse_acc = _merge(out_acc, lse_acc,
                                  out_s.astype(jnp.float32), lse_s)
        # rotate kv to the right neighbor (last rotation is redundant but
        # keeps the loop uniform; XLA overlaps it with the merge)
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return out_acc, lse_acc, (k_nxt, v_nxt)

    out0 = jnp.zeros((B, H, Tl, D), jnp.float32)
    lse0 = jnp.full((B, H, Tl), -1e30, jnp.float32)
    out, lse, _ = jax.lax.fori_loop(0, n, body, (out0, lse0, (k, v)))
    return out.astype(q.dtype)


def attribute_sequence_parallel(forward_fn, params, cfg, inputs_embeds,
                                mesh, composite, axis: str = "sp",
                                position: int = -1, param_shardings=None):
    """End-to-end long-context attribution with the sequence sharded over
    ``axis``: every positionwise op runs on local slices, attention runs as
    a ring, and ONE vjp over the shard_mapped program returns per-token
    relevance — still sharded, so the full sequence never gathers on one
    device. The explained target is the argmax logit at the last global
    position.

    ``forward_fn(params, cfg, embeds, composite, positions=..., attn_impl=
    "ring:<axis>")`` must accept per-shard positions (all model families
    here do). Returns ``(value, relevance [B, T])`` with T global.

    sp x tp composition: the shard_map is MANUAL only over ``axis``
    (``axis_names={axis}``); every other mesh axis stays under GSPMD. Pass
    ``param_shardings`` (e.g. ``mesh.family_param_shardings``) to shard the
    weights over a ``model`` axis — XLA inserts the tensor-parallel psums
    inside the ring program, in forward and in the relevance backward, so a
    long-context 8B fits neither-weights-nor-sequence-on-one-chip meshes.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lxt_tpu.attribution import select_logit

    n = mesh.shape[axis]
    B, T, D = inputs_embeds.shape
    assert T % n == 0, f"sequence {T} must divide over {n} devices"
    Tl = T // n

    if param_shardings is not None:
        params = jax.device_put(params, param_shardings)

    # manual only over the sequence axis; auto (GSPMD) over the rest
    pspec = jax.tree.map(lambda _: P(), params)

    @jax.shard_map(mesh=mesh,
                   in_specs=(pspec, P(None, axis, None)),
                   out_specs=P(),
                   axis_names={axis},
                   check_vma=False)
    def target(params, e_local):
        idx = jax.lax.axis_index(axis)
        positions = idx * Tl + jnp.arange(Tl, dtype=jnp.int32)
        logits = forward_fn(params, cfg, e_local, composite,
                            positions=positions,
                            attn_impl=f"ring:{axis}").logits
        # the last global position lives on the last device; psum broadcasts
        local = select_logit(logits, position=position)
        return jax.lax.psum(
            jnp.where(idx == n - 1, local, 0.0), axis)

    embeds = jax.device_put(
        inputs_embeds,
        NamedSharding(mesh, jax.sharding.PartitionSpec(None, axis, None)))

    def tgt(e):
        return target(params, e)

    value, grad = jax.jit(jax.value_and_grad(tgt))(embeds)
    rel = (embeds.astype(jnp.float32) * grad.astype(jnp.float32)).sum(-1)
    return value, rel
