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


@pytest.mark.parametrize("bits", [8, 4])
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


@pytest.mark.parametrize("bits", [8, 4])
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

    for bits in (8, 4):
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
