"""Weight-only int8/int4 quantization: roundtrip accuracy and quantized
attribution (the bitsandbytes-path parity, reference examples/quantized_*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lxt_tpu
from lxt_tpu.attribution import input_relevance, select_logit
from lxt_tpu.models import llama as jllama
from lxt_tpu.ops.quant import QuantizedTensor, dequantize, quantize, quantize_params


@pytest.mark.parametrize("bits", [8, 4, "nf4"])
def test_quantize_roundtrip(bits):
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
    qt = quantize(w, bits)
    assert qt.shape == (64, 32)
    w2 = dequantize(qt)
    err = float(jnp.abs(w2 - w).max() / jnp.abs(w).max())
    assert err < (0.01 if bits == 8 else 0.12)


def test_int4_packing_layout():
    """Packing interleaves rows 2-per-byte; dequant restores exact order."""
    w = jnp.arange(-8.0, 8.0).reshape(8, 2) / 2.0
    qt = quantize(w, 4)
    assert qt.q.shape == (4, 2)
    w2 = dequantize(qt)
    # symmetric 4-bit grid has 15 levels; order must be preserved exactly
    assert jnp.argsort(w2[:, 0]).tolist() == jnp.argsort(w[:, 0]).tolist()


# ---------------------------------------------------------------------------
# NF4: blockwise normal-float codebook (the reference's bitsandbytes
# load_in_4bit numerics class, examples/quantized_llama.py:13-19)
# ---------------------------------------------------------------------------

def _bnb_quantize_ref(w_flat, blocksize=64, code=None):
    """Independent numpy model of bitsandbytes' 4-bit blockwise quantizer:
    flat row-major blocks of ``blocksize`` share one absmax; values map to
    the NEAREST codebook entry; two indices pack per byte, FIRST element in
    the HIGH nibble (bnb kQuantizeBlockwise layout)."""
    from lxt_tpu.ops.quant import NF4_CODE
    code = NF4_CODE if code is None else code
    assert w_flat.size % blocksize == 0
    blocks = w_flat.reshape(-1, blocksize).astype(np.float32)
    absmax = np.abs(blocks).max(axis=1)
    norm = blocks / np.maximum(absmax[:, None], 1e-12)
    idx = np.argmin(np.abs(norm[..., None] - code), axis=-1)
    flat_idx = idx.reshape(-1).astype(np.uint8)
    packed = (flat_idx[0::2] << 4) | flat_idx[1::2]
    return packed, absmax.astype(np.float32), code[idx] * absmax[:, None]


def test_nf4_code_values_exact():
    """Weights that ARE codebook points reconstruct bit-exactly (the
    representational-exactness invariant the bnb re-quantization relies on)."""
    from lxt_tpu.ops.quant import NF4_CODE
    rng = np.random.RandomState(0)
    absmax = rng.uniform(0.5, 2.0, (2, 16)).astype(np.float32)  # 2 K-blocks
    idx = rng.randint(0, 16, (128, 16))
    w = NF4_CODE[idx] * np.repeat(absmax, 64, axis=0)           # [128, 16]
    qt = quantize(jnp.asarray(w), "nf4", block=64)
    assert qt.block == 64 and qt.q.shape == (64, 16)
    assert qt.scale.shape == (2, 16)
    np.testing.assert_array_equal(np.asarray(dequantize(qt)), w)


def test_nf4_requantize_idempotent():
    """quantize(dequantize(q)) reproduces q and scale exactly."""
    w = jax.random.normal(jax.random.PRNGKey(3), (128, 24))
    qt = quantize(w, "nf4")
    qt2 = quantize(dequantize(qt), "nf4")
    np.testing.assert_array_equal(np.asarray(qt.q), np.asarray(qt2.q))
    np.testing.assert_array_equal(np.asarray(qt.scale), np.asarray(qt2.scale))


def test_nf4_matches_bnb_semantics():
    """Our [in, out]-layout NF4 with K-axis blocks equals the bnb flat-order
    reference on the transposed torch [out, in] weight — same blocks, same
    codebook decisions, same dequantized values."""
    rng = np.random.RandomState(7)
    w_torch = rng.randn(24, 128).astype(np.float32)        # [out, in], in%64==0
    _, _, deq_flat = _bnb_quantize_ref(w_torch.reshape(-1))
    want = deq_flat.reshape(24, 128).T                     # ours: [in, out]

    qt = quantize(jnp.asarray(w_torch.T), "nf4", block=64)
    np.testing.assert_allclose(np.asarray(dequantize(qt)), want,
                               rtol=0, atol=0)


def test_bnb_ingest_state_dict():
    """bitsandbytes-serialized checkpoint entries (packed uint8 + absmax +
    quant_map + JSON quant_state, with and without double-quantized absmax)
    dequantize back to the reference values and vanish from the dict."""
    import json as _json

    from lxt_tpu.ops.quant import NF4_CODE, ingest_bnb_state_dict

    rng = np.random.RandomState(11)
    shape = (16, 128)
    w = rng.randn(*shape).astype(np.float32)
    packed, absmax, deq = _bnb_quantize_ref(w.reshape(-1))
    want = deq.reshape(shape)

    def qs_tensor(meta):
        return np.frombuffer(_json.dumps(meta).encode(), np.uint8).copy()

    # plain (no double quant)
    state = {
        "a.weight": packed.reshape(-1, 1).copy(),
        "a.weight.absmax": absmax.copy(),
        "a.weight.quant_map": NF4_CODE.copy(),
        "a.weight.quant_state.bitsandbytes__nf4": qs_tensor(
            {"blocksize": 64, "quant_type": "nf4", "dtype": "bfloat16",
             "shape": list(shape)}),
        "other": np.ones(3, np.float32),
    }
    assert ingest_bnb_state_dict(state) == ["a.weight"]
    assert set(state) == {"a.weight", "other"}
    np.testing.assert_array_equal(state["a.weight"], want)

    # double-quantized absmax: uint8 indices into a nested map, second-level
    # blockwise scale, global offset (bnb nested scheme)
    offset = np.float32(absmax.mean())
    centered = absmax - offset
    nested_bs = 16
    nmap = np.linspace(-1.0, 1.0, 256).astype(np.float32)
    nabs = np.abs(centered.reshape(-1, nested_bs)).max(axis=1).astype(np.float32)
    nrm = centered.reshape(-1, nested_bs) / np.maximum(nabs[:, None], 1e-12)
    aidx = np.argmin(np.abs(nrm[..., None] - nmap), axis=-1).astype(np.uint8)
    absmax_dq = (nmap[aidx.reshape(-1).astype(np.int64)]
                 * np.repeat(nabs, nested_bs) + offset)
    state2 = {
        "b.weight": packed.reshape(-1, 1).copy(),
        "b.weight.absmax": aidx.reshape(-1),
        "b.weight.quant_map": NF4_CODE.copy(),
        "b.weight.nested_absmax": nabs,
        "b.weight.nested_quant_map": nmap,
        "b.weight.quant_state.bitsandbytes__nf4": qs_tensor(
            {"blocksize": 64, "quant_type": "nf4", "dtype": "bfloat16",
             "shape": list(shape), "nested_blocksize": nested_bs,
             "nested_offset": float(offset), "nested_dtype": "float32"}),
    }
    assert ingest_bnb_state_dict(state2) == ["b.weight"]
    assert set(state2) == {"b.weight"}
    # reconstruct expected with the dequantized absmax
    flat_idx = np.empty(packed.size * 2, np.uint8)
    flat_idx[0::2] = packed >> 4
    flat_idx[1::2] = packed & 0xF
    want2 = (NF4_CODE[flat_idx.astype(np.int64)]
             * np.repeat(absmax_dq, 64)).reshape(shape)
    np.testing.assert_allclose(state2["b.weight"], want2, rtol=0, atol=0)

    # non-bnb dict: no-op
    plain = {"w": np.ones(4, np.float32)}
    assert ingest_bnb_state_dict(plain) == []


def _bnb8_quantize_ref(w):
    """bitsandbytes Linear8bitLt vector-wise reference: per-row absmax maps
    to +-127; serialization stores int8 codes + SCB per-row scales."""
    scb = np.abs(w).max(axis=1)
    cb = np.round(w / np.maximum(scb[:, None], 1e-12) * 127.0)
    cb = np.clip(cb, -127, 127).astype(np.int8)
    deq = cb.astype(np.float32) * scb[:, None] / np.float32(127.0)
    return cb, scb.astype(np.float32), deq


def test_bnb_ingest_8bit_scb():
    """Linear8bitLt serialization (int8 codes + weight.SCB per-row scales)
    ingests to CB*SCB/127 and the auxiliary keys vanish."""
    from lxt_tpu.ops.quant import ingest_bnb_state_dict

    rng = np.random.RandomState(3)
    w = rng.randn(16, 32).astype(np.float32)
    cb, scb, deq = _bnb8_quantize_ref(w)
    state = {"a.weight": cb, "a.weight.SCB": scb,
             "a.weight.weight_format": np.zeros((), np.int64),
             "other": np.ones(2, np.float32)}
    assert ingest_bnb_state_dict(state) == ["a.weight"]
    assert set(state) == {"a.weight", "other"}
    np.testing.assert_array_equal(state["a.weight"], deq)


def test_from_pretrained_bnb_8bit_checkpoint(tmp_path):
    """An 8-bit bitsandbytes llama checkpoint (weight int8 + weight.SCB)
    loads through from_pretrained, re-quantizes as int8 representationally
    exactly, and attributes — the reference's Linear8bitLt scenario
    (lxt/explicit/models/llama.py:91-105)."""
    import torch
    from safetensors.numpy import save_file
    from transformers.models.llama.modeling_llama import (
        LlamaConfig, LlamaForCausalLM)

    from lxt_tpu.models.registry import from_pretrained
    from lxt_tpu.ops.quant import QuantizedTensor

    torch.manual_seed(6)
    hf = LlamaForCausalLM(LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=128)).eval()
    hf.config.save_pretrained(tmp_path)

    state, dequantized = {}, {}
    for name, p in hf.state_dict().items():
        arr = p.detach().numpy().astype(np.float32)
        if not (name.endswith(".weight") and arr.ndim == 2
                and "_proj" in name):
            state[name] = arr
            continue
        cb, scb, deq = _bnb8_quantize_ref(arr)
        dequantized[name] = deq
        state[name] = cb
        state[f"{name}.SCB"] = scb
    assert dequantized, "no projection matched the bnb rewrite"
    save_file(state, str(tmp_path / "model.safetensors"))

    model = from_pretrained(tmp_path)
    assert isinstance(model.params["layers"]["wq"], QuantizedTensor)
    assert model.params["layers"]["wq"].bits == 8
    got = np.asarray(dequantize(model.params["layers"]["wq"]))[0]
    want = dequantized["model.layers.0.self_attn.q_proj.weight"].T
    np.testing.assert_allclose(got, want.astype(np.float32),
                               rtol=0, atol=1e-7 * np.abs(want).max())

    ids = np.random.RandomState(1).randint(0, 256, (1, 8))
    value, rel = model.attribute(ids)
    assert bool(jnp.isfinite(rel).all())


def test_from_pretrained_bnb_checkpoint(tmp_path):
    """A bitsandbytes-serialized llama checkpoint loads through
    from_pretrained: bnb entries are ingested, the model defaults to NF4
    re-quantization (representationally exact), and attribution runs."""
    import torch
    from safetensors.numpy import save_file
    from transformers.models.llama.modeling_llama import (
        LlamaConfig, LlamaForCausalLM)

    from lxt_tpu.models.registry import from_pretrained
    from lxt_tpu.ops.quant import NF4_CODE

    torch.manual_seed(5)
    hf = LlamaForCausalLM(LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=128)).eval()
    hf.config.save_pretrained(tmp_path)

    state = {}
    dequantized = {}
    for name, p in hf.state_dict().items():
        arr = p.detach().numpy().astype(np.float32)
        is_proj = name.endswith(".weight") and arr.ndim == 2 and (
            "_proj" in name) and arr.size % 64 == 0
        if not is_proj:
            state[name] = arr
            continue
        packed, absmax, deq = _bnb_quantize_ref(arr.reshape(-1))
        dequantized[name] = deq.reshape(arr.shape)
        state[name] = packed.reshape(-1, 1)
        state[f"{name}.absmax"] = absmax
        state[f"{name}.quant_map"] = NF4_CODE.copy()
        state[f"{name}.quant_state.bitsandbytes__nf4"] = np.frombuffer(
            json_bytes({"blocksize": 64, "quant_type": "nf4",
                        "dtype": "float32", "shape": list(arr.shape)}),
            np.uint8).copy()
    assert dequantized, "no projection matched the bnb rewrite"
    save_file(state, str(tmp_path / "model.safetensors"))

    model = from_pretrained(tmp_path)
    from lxt_tpu.ops.quant import QuantizedTensor
    assert isinstance(model.params["layers"]["wq"], QuantizedTensor)
    assert model.params["layers"]["wq"].bits == "nf4"
    # the nf4 re-quantization is representationally exact vs the ingested
    # (bnb-dequantized) weight
    got = np.asarray(dequantize(model.params["layers"]["wq"]))[0]
    want = dequantized["model.layers.0.self_attn.q_proj.weight"].T
    np.testing.assert_array_equal(got, want.astype(np.float32))

    ids = np.random.RandomState(1).randint(0, 256, (1, 8))
    value, rel = model.attribute(ids)
    assert bool(jnp.isfinite(rel).all())

    # explicit quantize_bits="nf4" on a PLAIN checkpoint also works
    hf.save_pretrained(tmp_path / "plain")
    m2 = from_pretrained(tmp_path / "plain", quantize_bits="nf4")
    assert m2.params["layers"]["wq"].bits == "nf4"
    _, rel2 = m2.attribute(ids)
    assert bool(jnp.isfinite(rel2).all())


def json_bytes(d):
    import json as _json
    return _json.dumps(d).encode()


@pytest.mark.parametrize("bits", [8, 4, "nf4"])
def test_quantized_llama_attribution(bits):
    cfg = jllama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, rms_eps=1e-6)
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_params(params, bits=bits)

    # embeddings/norms untouched, projections quantized
    assert isinstance(qparams["layers"]["wq"], QuantizedTensor)
    assert not isinstance(qparams["embed"], QuantizedTensor)
    assert not isinstance(qparams["layers"]["ln1"], QuantizedTensor)

    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, 128)
    embeds = jllama.embed(params, ids)

    def target(p):
        def f(e):
            return select_logit(jllama.forward(p, cfg, e, lxt_tpu.attnlrp).logits)
        return f

    _, rel_full = input_relevance(target(params), embeds)
    _, rel_q = jax.jit(lambda e: input_relevance(target(qparams), e))(embeds)

    assert bool(jnp.isfinite(rel_q).all())
    a, b = np.asarray(rel_q).ravel(), np.asarray(rel_full).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    # quantization changes forward values, so heatmaps only correlate
    assert cos > (0.99 if bits == 8 else 0.9)


def test_family_quantizable_spec():
    """family= selects exactly the spec'd leaves (robust vs the name
    heuristics); quantized forward still matches the heuristic selection."""
    import jax

    from lxt_tpu.models import llama as jllama
    from lxt_tpu.ops.quant import FAMILY_QUANTIZABLE, QuantizedTensor, quantize_params

    cfg = jllama.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=2, num_kv_heads=2, tie_embeddings=False)
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    qp = quantize_params(params, bits=8, family="llama")

    quantized = {k for k, v in qp["layers"].items()
                 if isinstance(v, QuantizedTensor)}
    assert quantized == {"wq", "wk", "wv", "wo", "wg", "wu", "wd"}
    # lm_head stays full precision on BOTH selection paths (bitsandbytes
    # skips the output head by default, and the explained logit is exactly
    # what attribution reads)
    assert not isinstance(qp["lm_head"], QuantizedTensor)
    assert not isinstance(qp["embed"], QuantizedTensor)
    assert not isinstance(qp["final_norm"], QuantizedTensor)

    # heuristic path picks the same layer matrices for this layout
    qh = quantize_params(params, bits=8)
    assert quantized == {k for k, v in qh["layers"].items()
                        if isinstance(v, QuantizedTensor)}


def test_quant_matmul_matches_dequantized():
    """Fused quant_matmul (int8 fused convert; int4 two-half nibble-plane
    matmuls) matches x @ dequantize(qt) at quantization precision, and its
    gradient w.r.t. x is consistent."""
    import jax

    from lxt_tpu.ops.quant import dequantize, quant_matmul, quantize

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (6, 64))
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 48))
    b = jax.random.normal(jax.random.PRNGKey(2), (48,))

    for bits in (8, 4, "nf4"):
        qt = quantize(w, bits)
        ref = x @ dequantize(qt) + b
        out = quant_matmul(x, qt, b)
        scale = float(np.abs(np.asarray(ref)).max())
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=3e-5 * scale)

        g_ref = jax.grad(lambda x: (x @ dequantize(qt)).sum())(x)
        g_out = jax.grad(lambda x: quant_matmul(x, qt).sum())(x)
        np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                                   rtol=0, atol=3e-5 * scale)


def test_int4_custom_backward_matches_dense():
    """The int4 transpose-free custom vjp (dot_general contracting the out
    axis + stack/reshape re-interleave) must equal g @ dequant(qt).T for
    batched 3D activations, the hot shape in the per-layer scan."""
    from lxt_tpu.ops.quant import _int4_matmul, dequantize, quantize

    w = jax.random.normal(jax.random.PRNGKey(0), (64, 48), jnp.float32)
    qt = quantize(w, 4)
    wd = dequantize(qt, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 64), jnp.float32)
    g_seed = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 48), jnp.float32)

    y, vjp = jax.vjp(lambda xx: _int4_matmul(xx, qt.q, qt.scale), x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ wd),
                               rtol=1e-5, atol=1e-5)
    (dx,) = vjp(g_seed)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(g_seed @ wd.T),
                               rtol=1e-5, atol=1e-5)


def test_nf4_pallas_dequant_matches_xla_path():
    """The Pallas dequant kernel (interpret mode on CPU) must produce
    exactly the XLA fallback's weights on an aligned shape, and the
    custom-vjp matmul's forward/backward must match dense ops."""
    from lxt_tpu.ops.quant import nf4_dequant, quant_matmul, quantize

    w = jax.random.normal(jax.random.PRNGKey(0), (128, 256), jnp.float32)
    qt = quantize(w, "nf4")
    assert qt.block == 64 and qt.q.shape == (64, 256)
    got = nf4_dequant(qt.q, qt.scale, qt.block, jnp.float32)
    assert got is not None, "aligned shape must take the kernel path"
    want = dequantize(qt, jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 128), jnp.float32)
    y = quant_matmul(x, qt)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ want),
                               rtol=1e-5, atol=1e-5)
    # backward: dx == g @ w.T with zero relevance into codes/scales
    g = jax.grad(lambda xx: quant_matmul(xx, qt).sum())(x)
    np.testing.assert_allclose(np.asarray(g),
                               np.asarray(jnp.ones((4, 256)) @ want.T),
                               rtol=1e-5, atol=1e-5)


def test_nf4_unaligned_falls_back():
    from lxt_tpu.ops.quant import nf4_dequant, quantize

    w = jax.random.normal(jax.random.PRNGKey(2), (64, 48), jnp.float32)
    qt = quantize(w, "nf4")
    # K/2=32 < block=64: kernel refuses, dequantize still exact
    assert nf4_dequant(qt.q, qt.scale, qt.block, jnp.float32) is None
    round_trip = dequantize(quantize(dequantize(qt), "nf4"))
    np.testing.assert_array_equal(np.asarray(round_trip),
                                  np.asarray(dequantize(qt)))
