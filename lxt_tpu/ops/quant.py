"""Weight-only quantization (int8 / int4 / nf4) for attribution of large models.

Replaces the reference's bitsandbytes dependency (4-bit/8-bit quantized
attribution, ``examples/quantized_llama.py:13-19``, composites mapping
``Linear4bit/Linear8bitLt -> EpsilonRule`` at ``lxt/explicit/models/
llama.py:91-105``). The LRP story is identical: weights carry no relevance,
so quantization only changes the forward values — the rules are untouched.

TPU-first design: symmetric per-output-channel scales; int4 packs two
nibbles per uint8 along the input axis. Dequantization is a convert+scale
that XLA fuses into the consuming matmul; HBM traffic (the true cost of big
weights on one chip) drops 2x/4x, which is what makes Mixtral-scale
attribution fit (reference quotes ~30 GB for Mixtral 4-bit,
docs/explicit_quickstart.rst:182-183).

NF4 (``bits="nf4"``) reproduces the numerics class of the reference's
quantized setting (bitsandbytes ``bnb_4bit_quant_type="nf4"``,
examples/quantized_llama.py:13-19): a 16-entry normal-float codebook with
per-block absmax scales (block 64 along the input axis — exactly
bitsandbytes' flat-order blocks once the torch ``[out, in]`` weight is
transposed to our ``[in, out]``). :func:`ingest_bnb_state_dict` additionally
reads bitsandbytes-SERIALIZED 4-bit checkpoints (the ``weight.absmax`` /
``weight.quant_map`` / ``weight.quant_state.bitsandbytes__nf4`` key scheme,
including double-quantized absmax) back to full precision on the host, so a
checkpoint saved from the reference's quantized flow loads directly.
"""

import dataclasses
import functools
import json
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

#: The NF4 codebook (QLoRA, Dettmers et al. 2023): the 16 quantiles of a
#: standard normal, normalized to [-1, 1] — identical to bitsandbytes'
#: ``create_normal_map`` output used for ``quant_type="nf4"``.
NF4_CODE = np.array([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0], np.float32)

#: Decision thresholds: midpoints between adjacent code entries. bitsandbytes'
#: ``dQuantizeNF4`` compares with strict ``>`` against exactly these midpoints,
#: which ``searchsorted(..., side='left')`` reproduces (ties round DOWN).
_NF4_MID = (NF4_CODE[1:] + NF4_CODE[:-1]) / 2.0


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedTensor:
    """Weight-only quantized tensor.

    ``q``: int8 values (bits=8), or uint8 with two 4-bit values packed along
    axis -2 (bits=4: signed nibbles; bits="nf4": codebook indices).
    ``scale``: f32 per-output-channel scale ``[..., 1, out]`` (int8/int4), or
    per-block absmax ``[..., in/block, out]`` (nf4). ``bits`` and ``block``
    are static metadata.
    """

    q: Any
    scale: Any
    bits: Any = 8
    block: int = 0

    def tree_flatten(self):
        return (self.q, self.scale), (self.bits, self.block)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0], leaves[1], *aux)

    @property
    def shape(self):
        if self.bits in (4, "nf4"):
            s = list(self.q.shape)
            s[-2] *= 2
            return tuple(s)
        return self.q.shape


def _nf4_block(K, block):
    """Largest power-of-two block <= ``block`` dividing K (real-model input
    dims are multiples of 64; tiny test geometries shrink gracefully).
    NOTE: the block size must match bitsandbytes' (64) for re-quantization
    of ingested bnb checkpoints to stay representationally exact — the
    Pallas dequant kernel additionally wants block | K/2 and falls back to
    the XLA path when that doesn't hold (tiny geometries only)."""
    while block > 2 and K % block:
        block //= 2
    if K % block:
        raise ValueError(f"nf4 needs an even input dimension, got {K}")
    return block


def _quantize_one(w32, bits, block=64):
    if bits == "nf4":
        K, N = w32.shape[-2], w32.shape[-1]
        blocks = w32.reshape(w32.shape[:-2] + (K // block, block, N))
        absmax = jnp.abs(blocks).max(axis=-2)          # [..., K/block, N]
        norm = blocks / jnp.maximum(absmax[..., None, :], 1e-12)
        idx = jnp.searchsorted(jnp.asarray(_NF4_MID), norm, side="left")
        idx = idx.reshape(w32.shape).astype(jnp.uint8)
        # HALF-SPLIT packing (not even/odd interleave): packed row j holds
        # original row j (low nibble) and row j + K/2 (high nibble), so
        # dequantization is two contiguous halves — layout-friendly for
        # both the XLA concat path and the Pallas dequant kernel (an
        # interleaved layout forces a strided scatter no backend fuses)
        lo = idx[..., : K // 2, :]
        hi = idx[..., K // 2:, :]
        return (lo | (hi << 4)).astype(jnp.uint8), absmax
    absmax = jnp.abs(w32).max(axis=-2, keepdims=True)
    if bits == 8:
        scale = absmax / 127.0
        q = jnp.clip(jnp.round(w32 / jnp.maximum(scale, 1e-12)), -127, 127)
        return q.astype(jnp.int8), scale
    scale = absmax / 7.0
    q = jnp.clip(jnp.round(w32 / jnp.maximum(scale, 1e-12)), -7, 7) + 8
    q = q.astype(jnp.uint8)
    lo = q[..., 0::2, :]
    hi = q[..., 1::2, :]
    return (lo | (hi << 4)).astype(jnp.uint8), scale


def quantize(w, bits=8, block: int = 64) -> QuantizedTensor:
    """Quantize ``[..., in, out]`` weights: per output channel (axis -1) for
    int8/int4, per (input-block, output-channel) NF4 codebook for "nf4"
    (``block`` along the input axis, bitsandbytes' default 64 — in the
    transposed torch layout these are exactly bnb's flat-order blocks).

    Layer-stacked (ndim >= 3) weights are processed one leading slice at a
    time with ``lax.map`` so the f32 intermediate never exceeds one layer's
    matrix — required to quantize 8B-scale stacks on a 16 GB chip."""
    if bits not in (8, 4, "nf4"):
        raise ValueError(f"unsupported bits: {bits!r} (8, 4 or 'nf4')")
    if bits in (4, "nf4") and w.shape[-2] % 2:
        raise ValueError("4-bit packing needs an even input dimension")
    block = _nf4_block(w.shape[-2], block) if bits == "nf4" else 0
    if w.ndim >= 3:
        lead = w.shape[:-2]
        flat = w.reshape((-1,) + w.shape[-2:])
        q, scale = jax.lax.map(
            lambda x: _quantize_one(x.astype(jnp.float32), bits, block), flat)
        return QuantizedTensor(q.reshape(lead + q.shape[1:]),
                               scale.reshape(lead + scale.shape[1:]),
                               bits, block)
    q, scale = _quantize_one(jnp.asarray(w, jnp.float32), bits, block)
    return QuantizedTensor(q, scale, bits, block)


def dequantize(qt: QuantizedTensor, dtype=jnp.float32):
    if qt.bits == 8:
        w = qt.q.astype(jnp.float32) * qt.scale
        return w.astype(dtype)
    if qt.bits == "nf4":
        # XLA fallback path (CPU tests / non-2D / explicit-rule callers).
        # Half-split packing makes this a contiguous concat of two halves;
        # the hot TPU matmul path uses the Pallas kernel in quant_matmul.
        lo = (qt.q & 0xF).astype(jnp.int32)
        hi = (qt.q >> 4).astype(jnp.int32)
        idx = jnp.concatenate([lo, hi], axis=-2)      # [..., in, out]
        vals = jnp.asarray(NF4_CODE)[idx]
        shape = list(idx.shape)
        K, N = shape[-2], shape[-1]
        lead = tuple(shape[:-2])
        blocks = vals.reshape(lead + (K // qt.block, qt.block, N))
        w = blocks * qt.scale[..., None, :]
        return w.reshape(lead + (K, N)).astype(dtype)
    lo = (qt.q & 0xF).astype(jnp.int32) - 8
    hi = (qt.q >> 4).astype(jnp.int32) - 8
    # un-interleave back to the original input axis
    stacked = jnp.stack([lo, hi], axis=-2)            # [..., in/2, 2, out]
    shape = list(qt.q.shape)
    shape[-2] *= 2
    w = stacked.reshape(shape).astype(jnp.float32) * qt.scale
    return w.astype(dtype)


# ---------------------------------------------------------------------------
# Pallas NF4 dequantization (the hot path for nf4 matmuls on TPU)
# ---------------------------------------------------------------------------
#
# Why a kernel: the nonlinear 16-entry codebook cannot ride the int4
# nibble-plane matmul trick, and every XLA-level formulation of
# "unpack + LUT + per-block scale" (gather or select-chain) failed to fuse
# into the dot operand — a single [4096,14336] nf4 matmul measured
# 31 ms fwd / 110-1112 ms grad on v5e (~50-500x the bare matmul), enough
# that the 8B 32-layer attribution step exceeded the remote TPU execution
# deadline. The kernel writes the bf16 weight at HBM speed (one pass:
# read packed codes + scales, write dequantized tile); the matmul then
# reads a plain dense operand.


def _nf4_lut(idx):
    vals = jnp.zeros(idx.shape, jnp.float32)
    for i, c in enumerate(NF4_CODE):
        vals = jnp.where(idx == i, jnp.float32(c), vals)
    return vals


def _nf4_dequant_kernel(q_ref, s_ref, o_ref, *, block):
    h = jax.lax.eq(pl.program_id(0), 0)
    q = q_ref[:].astype(jnp.int32)
    idx = jnp.where(h, q & 0xF, q >> 4)
    vals = _nf4_lut(idx)                                  # [bk, bn] f32
    bk, bn = vals.shape
    s = s_ref[:]                                          # [bk/block, bn]
    w = vals.reshape(bk // block, block, bn) * s[:, None, :]
    o_ref[:] = w.reshape(bk, bn).astype(o_ref.dtype)


def nf4_dequant(q, scale, block, dtype):
    """Dequantize half-split-packed nf4 codes ``q [K/2, N]`` with per-block
    ``scale [K/block, N]`` to a dense ``[K, N]`` weight via a Pallas kernel
    (grid: nibble-half x K-tiles x N-tiles; each out tile is one contiguous
    read-LUT-scale-write pass). Falls back to the XLA path off-TPU or for
    unaligned shapes."""
    import os
    if os.environ.get("LXT_NF4_NO_PALLAS"):               # debug/safety knob
        return None
    if q.ndim != 2:                                       # layer-stacked q:
        return None                                       # caller falls back
    Kh, N = q.shape
    bk = 512
    while bk > block and (Kh % bk or bk % block):
        bk //= 2
    bn = 512
    while bn > 128 and N % bn:
        bn //= 2
    # Kh % block: the high half must start block-aligned or the kernel's
    # scale-tile indexing is wrong (tiny test geometries; fall back)
    if Kh % bk or N % bn or bk % block or Kh % block:
        return None                                       # caller falls back
    sb = bk // block                                      # scale rows / tile
    grid = (2, Kh // bk, N // bn)
    return pl.pallas_call(
        functools.partial(_nf4_dequant_kernel, block=block),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bk, bn), lambda h, i, j: (i, j)),
            pl.BlockSpec((sb, bn), lambda h, i, j: (h * (Kh // bk) + i, j)),
        ],
        out_specs=pl.BlockSpec((bk, bn),
                               lambda h, i, j: (h * (Kh // bk) + i, j)),
        out_shape=jax.ShapeDtypeStruct((2 * Kh, N), dtype),
        interpret=jax.default_backend() != "tpu",
    )(q, scale.astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _nf4_matmul(x, q, scale, block):
    """x @ dequant(q, scale) with an explicit transpose-free backward
    (dx = dot_general(g, w) contracting the shared N axis — autodiff's
    transposed reconstruction of the dequant graph was the 1.1 s/grad
    pathology)."""
    return jnp.matmul(x, _nf4_w(q, scale, block, x.dtype))


def _nf4_w(q, scale, block, dtype):
    w = nf4_dequant(q, scale, block, dtype)
    if w is None:                                         # fallback
        w = dequantize(QuantizedTensor(q, scale, "nf4", block), dtype)
    return w


def _nf4_matmul_fwd(x, q, scale, block):
    return _nf4_matmul(x, q, scale, block), (x, q, scale)


def _nf4_matmul_bwd(block, res, g):
    x, q, scale = res
    w = _nf4_w(q, scale, block, g.dtype)
    dx = jax.lax.dot_general(g, w, (((g.ndim - 1,), (1,)), ((), ())))
    # integer primals take float0 cotangents (symbolic zero, no buffer) —
    # materialized uint8 zeros would be stacked across the scan backward
    dq = np.zeros(q.shape, jax.dtypes.float0)
    return dx.astype(x.dtype), dq, jnp.zeros_like(scale)


_nf4_matmul.defvjp(_nf4_matmul_fwd, _nf4_matmul_bwd)


@jax.custom_vjp
def _int4_matmul(x, q, scale):
    """Nibble-plane int4 matmul with a transpose-free custom backward.

    Forward: the interleaved nibble planes multiply the even/odd input
    columns as two half-contraction matmuls (unpack never materializes;
    int-valued bf16 operands are exact, the per-output-channel scale is
    applied once on the output in f32).

    Backward: autodiff's transpose of the forward re-derives dx through the
    transpose of ``x[..., 0::2]`` — a strided pad/scatter per matmul that no
    backend fuses (the same pathology class as nf4's, measured +47% over
    int8 at 8B/4k, BENCH_8B_SWEEP.json). Here dx rides two plain
    ``dot_general`` calls contracting the shared output axis, and the
    even/odd planes re-interleave with one stack+reshape (a concat, not a
    scatter)."""
    lo = ((q & 0xF).astype(jnp.int8) - 8).astype(x.dtype)
    hi = ((q >> 4).astype(jnp.int8) - 8).astype(x.dtype)
    y = jnp.matmul(x[..., 0::2], lo) + jnp.matmul(x[..., 1::2], hi)
    return (y * scale).astype(x.dtype)


def _int4_matmul_fwd(x, q, scale):
    return _int4_matmul(x, q, scale), (x, q, scale)


def _int4_matmul_bwd(res, g):
    x, q, scale = res
    gs = (g * scale).astype(g.dtype)                  # scale folds into g
    lo = ((q & 0xF).astype(jnp.int8) - 8).astype(gs.dtype)
    hi = ((q >> 4).astype(jnp.int8) - 8).astype(gs.dtype)
    nd = (((gs.ndim - 1,), (1,)), ((), ()))           # contract the out axis
    dxe = jax.lax.dot_general(gs, lo, nd)             # [..., in/2] (even cols)
    dxo = jax.lax.dot_general(gs, hi, nd)             # [..., in/2] (odd cols)
    dx = jnp.stack([dxe, dxo], axis=-1).reshape(x.shape)
    dq = np.zeros(q.shape, jax.dtypes.float0)
    return dx.astype(x.dtype), dq, jnp.zeros_like(scale)


_int4_matmul.defvjp(_int4_matmul_fwd, _int4_matmul_bwd)


def quant_matmul(x, qt: QuantizedTensor, bias=None):
    """``x @ dequant(qt) (+ bias)`` with the dequantization FUSED into the
    matmul instead of materializing the full-precision weight.

    int8: the int->bf16 convert fuses into the dot operand (measured faster
    than a resident bf16 weight on v5e — half the HBM traffic). int4: the
    interleaved nibble planes multiply the even/odd input columns as two
    half-contraction matmuls, so the unpack reshape never materializes;
    the per-output-channel scale applies once on the output (measured ~13%
    faster than materializing, and more precise — int-valued bf16 operands
    are exact, the scale is applied in f32), with a transpose-free custom
    backward (see :func:`_int4_matmul`). nf4: Pallas dequant kernel +
    transpose-free custom backward (see :func:`nf4_dequant`)."""
    if qt.bits == "nf4":
        y = _nf4_matmul(x, qt.q, qt.scale, qt.block)
    elif qt.bits == 8:
        y = jnp.matmul(x, dequantize(qt, x.dtype))
    elif qt.q.ndim == 2:
        y = _int4_matmul(x, qt.q, qt.scale)
    else:
        # layer-stacked (batched) int4: rare outside the per-layer scan —
        # keep the plain autodiff path rather than generalizing the vjp
        lo = ((qt.q & 0xF).astype(jnp.int8) - 8).astype(x.dtype)
        hi = ((qt.q >> 4).astype(jnp.int8) - 8).astype(x.dtype)
        y = jnp.matmul(x[..., 0::2], lo) + jnp.matmul(x[..., 1::2], hi)
        y = (y * qt.scale).astype(x.dtype)
    return y if bias is None else y + bias


# ---------------------------------------------------------------------------
# bitsandbytes serialized-checkpoint ingest (host-side, numpy)
# ---------------------------------------------------------------------------

def dequantize_bnb_4bit(packed, absmax, shape, blocksize=64, code=None,
                        nested_absmax=None, nested_quant_map=None,
                        nested_blocksize=256, nested_offset=0.0):
    """Dequantize one bitsandbytes 4-bit tensor to f32 (numpy, host-side).

    Reproduces bnb's ``dequantize_4bit`` semantics: ``packed`` uint8 holds two
    codebook indices per byte in FLAT row-major order of the torch ``shape``,
    FIRST element in the HIGH nibble; each run of ``blocksize`` flat elements
    shares one ``absmax``. With double quantization (``nested_*`` given) the
    absmax themselves are uint8 indices into ``nested_quant_map`` with a
    second-level blockwise ``nested_absmax`` scale plus a global
    ``nested_offset`` (the mean bnb subtracts before nesting).

    ``code`` defaults to :data:`NF4_CODE`; pass the checkpoint's own stored
    ``quant_map`` (covers fp4 checkpoints too — the map *is* the format).
    """
    code = NF4_CODE if code is None else np.asarray(code, np.float32)
    packed = np.asarray(packed, np.uint8).reshape(-1)
    absmax = np.asarray(absmax)
    if nested_absmax is not None:
        nqm = np.asarray(nested_quant_map, np.float32)
        na = np.asarray(nested_absmax, np.float32)
        scaled = nqm[absmax.astype(np.int64).reshape(-1)]
        scaled *= np.repeat(na, nested_blocksize)[:scaled.size]
        absmax = scaled + np.float32(nested_offset)
    absmax = absmax.astype(np.float32).reshape(-1)
    n = int(np.prod(shape))
    flat = np.empty(packed.size * 2, np.float32)
    flat[0::2] = code[packed >> 4]
    flat[1::2] = code[packed & 0xF]
    flat = flat[:n] * np.repeat(absmax, blocksize)[:n]
    return flat.reshape(shape)


def dequantize_bnb_8bit(cb, scb):
    """Dequantize one bitsandbytes ``Linear8bitLt`` tensor to f32 (numpy,
    host-side): ``cb`` int8 ``[out, in]`` codes with per-ROW absmax ``scb``
    — bnb's vector-wise scheme, ``w = CB * SCB / 127`` row-wise. bnb maps
    each row's absmax to ±127, so re-quantizing the result with our
    symmetric per-output-channel int8 (after the [out,in]->[in,out]
    transpose makes rows output channels) is representationally exact."""
    cb = np.asarray(cb, np.int8).astype(np.float32)
    scb = np.asarray(scb, np.float32).reshape(-1, 1)
    return cb * scb / np.float32(127.0)


def ingest_bnb_state_dict(state):
    """Rewrite bitsandbytes-serialized 4-bit AND 8-bit entries of an HF
    state dict to plain full-precision arrays, IN PLACE; returns the list
    of rewritten weight names (empty for a non-bnb checkpoint).

    4-bit: the key scheme ``QuantState.as_dict(packed=True)`` saves —
    ``<w>`` (packed uint8), ``<w>.absmax``, ``<w>.quant_map``,
    ``<w>.quant_state.bitsandbytes__{nf4,fp4}`` (JSON metadata as uint8),
    and ``<w>.nested_absmax``/``<w>.nested_quant_map`` when the checkpoint
    used double quantization. This is the checkpoint the reference's
    quantized flow produces when saved (examples/quantized_llama.py:13-19).

    8-bit: the ``Linear8bitLt`` scheme — ``<w>`` int8 codes plus ``<w>.SCB``
    per-row absmax scales (and an optional ``<w>.weight_format`` /
    ``<w>_format`` marker, always "row" in serialized checkpoints). The
    reference attributes 8-bit bnb models through the same EpsilonRule
    mapping (lxt/explicit/models/llama.py:91-105).
    """
    suffixes = (".quant_state.bitsandbytes__nf4",
                ".quant_state.bitsandbytes__fp4")
    ingested = []
    for qs_key in [k for k in list(state) if k.endswith(suffixes)]:
        base = qs_key[:qs_key.index(".quant_state.bitsandbytes__")]
        meta = json.loads(np.asarray(state[qs_key], np.uint8).tobytes())
        aux = {}
        if f"{base}.nested_absmax" in state:
            aux = dict(
                nested_absmax=state.pop(f"{base}.nested_absmax"),
                nested_quant_map=state.pop(f"{base}.nested_quant_map"),
                nested_blocksize=int(meta.get("nested_blocksize", 256)),
                nested_offset=float(meta.get("nested_offset", 0.0)))
        state[base] = dequantize_bnb_4bit(
            state.pop(base), state.pop(f"{base}.absmax"), meta["shape"],
            blocksize=int(meta["blocksize"]),
            code=state.pop(f"{base}.quant_map", None), **aux)
        del state[qs_key]
        ingested.append(base)
    for scb_key in [k for k in list(state) if k.endswith(".SCB")]:
        base = scb_key[: -len(".SCB")]
        if base not in state:
            continue
        state[base] = dequantize_bnb_8bit(state.pop(base),
                                          state.pop(scb_key))
        state.pop(f"{base}.weight_format", None)
        state.pop(f"{base}_format", None)
        ingested.append(base)
    return ingested


#: Explicit per-family quantizable leaves (the linear projection matrices,
#: matching bitsandbytes' Linear-only scope): quantizing by NAME SPEC is
#: robust to future layouts where the heuristics below could misfire.
FAMILY_QUANTIZABLE = {
    # lm_head is deliberately absent everywhere: bitsandbytes leaves the
    # output head full-precision by default, the heuristic path's skip list
    # agrees, and the explained logit is exactly what attribution reads.
    "llama": ("wq", "wk", "wv", "wo", "wg", "wu", "wd"),
    "gemma3": ("wq", "wk", "wv", "wo", "wg", "wu", "wd"),
    "mixtral": ("wq", "wk", "wv", "wo", "wg", "wu", "wd", "w_router"),
    "gpt2": ("w_attn", "w_proj", "w_fc", "w_out"),
    "bert": ("wq", "wk", "wv", "wo", "wi", "wout", "pooler_w"),
    "siglip": ("wq", "wk", "wv", "wo", "w_fc", "w_out"),
    "vit": ("w_qkv", "w_proj", "w_fc", "w_out", "head_w"),
}


def quantize_params(params, bits=8, min_ndim: int = 2,
                    family: str = None,
                    skip=("embed", "wte", "wpe", "word_emb", "pos_emb",
                          "type_emb", "lm_head")):
    """Quantize the weight matrices in a model pytree (norms, biases and
    embeddings stay full precision, like bitsandbytes' Linear-only scope).
    ``bits``: 8, 4, or "nf4" (blockwise normal-float codebook, the
    reference's bitsandbytes ``load_in_4bit`` numerics class).

    With ``family`` given, EXACTLY the leaves in
    :data:`FAMILY_QUANTIZABLE[family]` are quantized (explicit spec);
    families sharing the llama layout (qwen/mistral/phi3/gemma3_text)
    resolve to the llama spec. Otherwise a name heuristic selects matrices
    and skips norms/biases/embeddings."""
    aliases = {"qwen2": "llama", "qwen3": "llama", "mistral": "llama",
               "phi3": "llama", "gemma3_text": "gemma3"}
    if family is not None:
        family = aliases.get(family, family)
        if family not in FAMILY_QUANTIZABLE:
            raise ValueError(
                f"no quantizable-leaf spec for family {family!r}; "
                f"known: {sorted(FAMILY_QUANTIZABLE)}")
    spec = None if family is None else frozenset(FAMILY_QUANTIZABLE[family])

    def eligible(name, leaf):
        if not hasattr(leaf, "ndim"):
            return False
        if spec is not None:
            return (name in spec and leaf.ndim >= min_ndim
                    and (bits == 8 or leaf.shape[-2] % 2 == 0))
        is_norm = "ln" in name or "norm" in name
        # bias vectors stack to 2D under the layer axis — never quantize
        is_bias = name.startswith("b") or name.endswith("_b") or "bias" in name
        return (leaf.ndim >= min_ndim and name not in skip and not is_norm
                and not is_bias and min(leaf.shape[-2:]) >= 16
                and leaf.shape[-2] % 2 == 0)

    def walk(tree, path=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{path}/{k}") for k, v in tree.items()}
        name = path.rsplit("/", 1)[-1]
        return quantize(tree, bits) if eligible(name, tree) else tree

    return walk(params)
