"""Pallas TPU flash attention with a relevance-correct custom VJP.

The AttnLRP rules wrap *around* the attention kernel (gradient scaling at
q/k/v — ``ops/attention.py``), so this kernel computes standard flash
attention math and its VJP is the standard flash backward. That composition
is exactly how the reference stays kernel-agnostic (``lxt/efficient/
patches.py:196-206`` wraps HF's sdpa/flash kernels the same way) — but here
the O(T^2) probability matrix is never materialized in forward OR relevance
backward, which is what unlocks long-context attribution on TPU (the
reference's explicit path materializes B x H x T x T probabilities,
``lxt/explicit/functional.py:308-322``).

Layout: q,k,v are ``[B, H, T, D]``; grids are ``(B, H, nq, nk)`` (forward,
dq) and ``(B, H, nk, nq)`` (dk/dv) with the reduction loop innermost — TPU
grids execute sequentially, so VMEM scratch carries the online-softmax /
accumulator state across steps. The causal mask is static; the sliding
window is a *runtime scalar* (scalar-prefetch) so models that alternate
local/global attention per layer (Gemma 3) can scan one compiled kernel:
``window >= T`` degenerates to plain causal. Fully-masked blocks are skipped.

On non-TPU backends the kernels run in interpreter mode (tests).
"""

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512  # measured on v5e: 512/512 is ~3x faster than 128/128
DEFAULT_BLOCK_K = 512  # at T=4096 (see tuning sweep in the commit message)
LSE_LANES = 8  # trailing lane dim for [B,H,T]-shaped stats (TPU tiling rule)
NEG_INF = -1e30


def _interpret():
    return jax.default_backend() != "tpu"


def _block_mask(iq, ik, window, blk_q, blk_k, causal):
    """Additive mask [blk_q, blk_k] for the (iq, ik) block pair (f32)."""
    q_pos = iq * blk_q + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 0)
    k_pos = ik * blk_k + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 1)
    allowed = k_pos > q_pos - window
    if causal:
        allowed = allowed & (k_pos <= q_pos)
    return jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)


def _skip_block(iq, ik, window, blk_q, blk_k, causal):
    """Scalar bool: the (iq, ik) block is entirely masked."""
    skip = ik * blk_k + blk_k - 1 <= iq * blk_q - window  # entirely pre-window
    if causal:
        skip = skip | (ik * blk_k > iq * blk_q + blk_q - 1)  # entirely future
    return skip


def _interior_block(iq, ik, window, blk_q, blk_k, causal):
    """Scalar bool: the (iq, ik) block is entirely VISIBLE (no mask needed) —
    the common case away from the causal diagonal / window edge, where the
    mask add is skipped to keep the VPU off the critical path."""
    inside = ik * blk_k > iq * blk_q - window  # whole block within window
    if causal:
        inside = inside & (ik * blk_k + blk_k - 1 <= iq * blk_q)
    return inside


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(w_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                acc, m_scr, l_scr, *, scale, causal, blk_q, blk_k):
    iq, ik = pl.program_id(2), pl.program_id(3)
    nk = pl.num_programs(3)
    window = w_ref[0]

    @pl.when(ik == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    def _step(apply_mask):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if apply_mask:
            s = s + _block_mask(iq, ik, window, blk_q, blk_k, causal)

        m_prev = m_scr[:, :1]
        m_cur = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur)
        l_scr[:, :1] = l_scr[:, :1] * alpha + p.sum(axis=-1, keepdims=True)
        acc[:] = acc[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:, :1] = m_cur

    visible = jnp.logical_not(_skip_block(iq, ik, window, blk_q, blk_k, causal))
    interior = _interior_block(iq, ik, window, blk_q, blk_k, causal)
    pl.when(visible & interior)(lambda: _step(False))
    pl.when(visible & jnp.logical_not(interior))(lambda: _step(True))

    @pl.when(ik == nk - 1)
    def _epilogue():
        l = l_scr[:, :1]
        o_ref[0, 0] = (acc[:] / l).astype(o_ref.dtype)
        # TPU block tiling needs >=2 trailing dims with sublane%8==0, so the
        # [blk_q] logsumexp is broadcast into LSE_LANES lanes
        lse_ref[0, 0] = jnp.broadcast_to(
            m_scr[:, :1] + jnp.log(l), (l.shape[0], LSE_LANES))


def _fwd(q, k, v, window, scale, causal, blk_q, blk_k):
    B, H, T, D = q.shape
    n_rep = H // k.shape[1]  # GQA: kv blocks indexed by h // n_rep, never
    # materialized per-query-head
    nq, nk = pl.cdiv(T, blk_q), pl.cdiv(T, blk_k)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, blk_q, D), lambda b, h, iq, ik, w: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, blk_k, D),
                         lambda b, h, iq, ik, w: (b, h // n_rep, ik, 0)),
            pl.BlockSpec((1, 1, blk_k, D),
                         lambda b, h, iq, ik, w: (b, h // n_rep, ik, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, blk_q, D), lambda b, h, iq, ik, w: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, blk_q, LSE_LANES),
                         lambda b, h, iq, ik, w: (b, h, iq, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk_q, D), jnp.float32),
            pltpu.VMEM((blk_q, 128), jnp.float32),
            pltpu.VMEM((blk_q, 128), jnp.float32),
        ],
    )

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, causal=causal,
                          blk_q=blk_q, blk_k=blk_k),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, T, LSE_LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(window, q, k, v)
    return out, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _dq_kernel(w_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
               dq_acc, *, scale, causal, blk_q, blk_k):
    iq, ik = pl.program_id(2), pl.program_id(3)
    nk = pl.num_programs(3)
    window = w_ref[0]

    @pl.when(ik == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    def _step(apply_mask):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if apply_mask:
            s = s + _block_mask(iq, ik, window, blk_q, blk_k, causal)
        p = jnp.exp(s - lse_ref[0, 0][:, :1])
        dp = jax.lax.dot_general(
            do_ref[0, 0], v_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0, 0][:, :1])
        dq_acc[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    visible = jnp.logical_not(_skip_block(iq, ik, window, blk_q, blk_k, causal))
    interior = _interior_block(iq, ik, window, blk_q, blk_k, causal)
    pl.when(visible & interior)(lambda: _step(False))
    pl.when(visible & jnp.logical_not(interior))(lambda: _step(True))

    @pl.when(ik == nk - 1)
    def _epilogue():
        dq_ref[0, 0] = dq_acc[:].astype(dq_ref.dtype)


def _dkv_kernel(w_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_acc, dv_acc,
                *, scale, causal, blk_q, blk_k):
    # grid (B, Hkv, nk, nq, n_rep): for each kv block, accumulate over all
    # query blocks AND all query heads in the GQA group (r innermost keeps
    # the dk/dv output block resident across the whole reduction)
    ik, iq, r = pl.program_id(2), pl.program_id(3), pl.program_id(4)
    nq, n_rep = pl.num_programs(3), pl.num_programs(4)
    window = w_ref[0]

    @pl.when((iq == 0) & (r == 0))
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    def _step(apply_mask):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if apply_mask:
            s = s + _block_mask(iq, ik, window, blk_q, blk_k, causal)
        p = jnp.exp(s - lse_ref[0, 0][:, :1])           # [blk_q, blk_k]
        do = do_ref[0, 0]
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0, 0][:, :1])
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    visible = jnp.logical_not(_skip_block(iq, ik, window, blk_q, blk_k, causal))
    interior = _interior_block(iq, ik, window, blk_q, blk_k, causal)
    pl.when(visible & interior)(lambda: _step(False))
    pl.when(visible & jnp.logical_not(interior))(lambda: _step(True))

    @pl.when((iq == nq - 1) & (r == n_rep - 1))
    def _epilogue():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_impl(q, k, v, out, lse, do, window, scale, causal, blk_q, blk_k):
    B, H, T, D = q.shape
    Hkv = k.shape[1]
    n_rep = H // Hkv
    nq, nk = pl.cdiv(T, blk_q), pl.cdiv(T, blk_k)

    delta = (out.astype(jnp.float32) * do.astype(jnp.float32)).sum(-1)
    delta = jnp.broadcast_to(delta[..., None], (*delta.shape, LSE_LANES))

    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, blk_q, D), lambda b, h, iq, ik, w: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, blk_k, D),
                         lambda b, h, iq, ik, w: (b, h // n_rep, ik, 0)),
            pl.BlockSpec((1, 1, blk_k, D),
                         lambda b, h, iq, ik, w: (b, h // n_rep, ik, 0)),
            pl.BlockSpec((1, 1, blk_q, D), lambda b, h, iq, ik, w: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, blk_q, LSE_LANES),
                         lambda b, h, iq, ik, w: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, blk_q, LSE_LANES),
                         lambda b, h, iq, ik, w: (b, h, iq, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, blk_q, D), lambda b, h, iq, ik, w: (b, h, iq, 0)),
        scratch_shapes=[pltpu.VMEM((blk_q, D), jnp.float32)],
    )
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, causal=causal,
                          blk_q=blk_q, blk_k=blk_k),
        grid_spec=dq_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(window, q, k, v, do, lse, delta)

    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv, nk, nq, n_rep),
        in_specs=[
            pl.BlockSpec((1, 1, blk_q, D),
                         lambda b, hk, ik, iq, r, w: (b, hk * n_rep + r, iq, 0)),
            pl.BlockSpec((1, 1, blk_k, D),
                         lambda b, hk, ik, iq, r, w: (b, hk, ik, 0)),
            pl.BlockSpec((1, 1, blk_k, D),
                         lambda b, hk, ik, iq, r, w: (b, hk, ik, 0)),
            pl.BlockSpec((1, 1, blk_q, D),
                         lambda b, hk, ik, iq, r, w: (b, hk * n_rep + r, iq, 0)),
            pl.BlockSpec((1, 1, blk_q, LSE_LANES),
                         lambda b, hk, ik, iq, r, w: (b, hk * n_rep + r, iq, 0)),
            pl.BlockSpec((1, 1, blk_q, LSE_LANES),
                         lambda b, hk, ik, iq, r, w: (b, hk * n_rep + r, iq, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, blk_k, D),
                         lambda b, hk, ik, iq, r, w: (b, hk, ik, 0)),
            pl.BlockSpec((1, 1, blk_k, D),
                         lambda b, hk, ik, iq, r, w: (b, hk, ik, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk_k, D), jnp.float32),
            pltpu.VMEM((blk_k, D), jnp.float32),
        ],
    )
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, causal=causal,
                          blk_q=blk_q, blk_k=blk_k),
        grid_spec=dkv_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, T, D), k.dtype),
            jax.ShapeDtypeStruct((B, Hkv, T, D), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary", "arbitrary")),
        interpret=_interpret(),
    )(window, q, k, v, do, lse, delta)

    return dq, dk, dv


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

def _pick_block(T, want):
    """Largest block size <= want that divides T (T is a multiple of 128,
    guaranteed by the dispatcher), so no padded tail blocks exist."""
    b = min(want, T)
    while T % b:
        b //= 2
    return b


def _canon(q, window, scale, block_q, block_k):
    T = q.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if window is None:
        window = jnp.full((1,), T, jnp.int32)
    else:
        window = jnp.asarray(window, jnp.int32).reshape(1)
    return window, scale, _pick_block(T, block_q), _pick_block(T, block_k)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_attention(
    q, k, v,
    window=None,
    scale: Optional[float] = None,
    causal: bool = True,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
):
    """Fused attention: softmax(q k^T * scale + mask) v, O(T) memory.

    q: ``[B, H, T, D]``; k, v: ``[B, Hkv, T, D]`` with ``Hkv`` dividing
    ``H`` — GQA groups are resolved by block indexing, the kv repeat is
    never materialized and dk/dv come back at ``Hkv`` (group-summed).
    ``window`` is a RUNTIME scalar (sliding-window size; None or >= T means
    plain causal), so Gemma-style local/global layer alternation scans one
    compiled kernel. T must be a multiple of 128 (the dispatcher in
    ops/attention.py guarantees this or falls back).
    """
    w, scale, bq, bk = _canon(q, window, scale, block_q, block_k)
    out, _ = _fwd(q, k, v, w, scale, causal, bq, bk)
    return out


def _flash_fwd(q, k, v, window, scale, causal, block_q, block_k):
    w, s, bq, bk = _canon(q, window, scale, block_q, block_k)
    out, lse = _fwd(q, k, v, w, s, causal, bq, bk)
    return out, (q, k, v, w, out, lse)


def _flash_bwd(scale, causal, block_q, block_k, res, do):
    q, k, v, w, out, lse = res
    _, s, bq, bk = _canon(q, w, scale, block_q, block_k)
    dq, dk, dv = _bwd_impl(q, k, v, out, lse, do, w, s, causal, bq, bk)
    return dq, dk, dv, None


flash_attention.defvjp(_flash_fwd, _flash_bwd)
