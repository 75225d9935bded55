"""Canonizers: (params, cfg) pre-transforms — the reference's
``Composite(canonizers=...)`` hook (lxt/explicit/core.py:25-37,63-72) as
pure functions. fold_norm_scales must be exact in forward AND leave
relevance unchanged under every composite (the folded matmul is the same
linear map of the normalized input)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lxt_tpu
from lxt_tpu.attribution import input_relevance, select_logit
from lxt_tpu.canonizers import apply_canonizers, fold_norm_scales
from lxt_tpu.models import llama as jllama


def _tiny(tie=False, seed=0):
    cfg = jllama.LlamaConfig(vocab_size=64, hidden_size=32,
                             intermediate_size=64, num_layers=2, num_heads=4,
                             num_kv_heads=2, tie_embeddings=tie)
    params = jllama.init_params(cfg, jax.random.PRNGKey(seed))
    # non-trivial norm scales (init is all-ones, which would fold trivially)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed + 1), 3)
    layers = dict(params["layers"])
    layers["ln1"] = 1.0 + 0.3 * jax.random.normal(k1, layers["ln1"].shape)
    layers["ln2"] = 1.0 + 0.3 * jax.random.normal(k2, layers["ln2"].shape)
    params = dict(params, layers=layers,
                  final_norm=1.0 + 0.3 * jax.random.normal(
                      k3, params["final_norm"].shape))
    return cfg, params


def _rel(params, cfg, ids, comp):
    embeds = jllama.embed(params, ids)

    def target(e):
        return select_logit(
            jllama.forward(params, cfg, e, comp, logits_at=-1).logits)

    return input_relevance(target, embeds)


@pytest.mark.parametrize("comp_name", ["attnlrp", "cp_lrp"])
def test_fold_norm_scales_preserves_forward_and_relevance(comp_name):
    comp = getattr(lxt_tpu, comp_name)
    cfg, params = _tiny()
    folded, cfg2 = apply_canonizers(params, cfg, "llama", [fold_norm_scales])
    assert cfg2 is cfg
    # the norms really were reset (the fold is not a no-op)
    assert np.allclose(np.asarray(folded["layers"]["ln1"]), 1.0)
    assert not np.allclose(np.asarray(params["layers"]["ln1"]), 1.0)

    ids = jnp.asarray(np.random.RandomState(0).randint(0, 64, (2, 8)))
    v0, r0 = _rel(params, cfg, ids, comp)
    v1, r1 = _rel(folded, cfg, ids, comp)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1),
                               rtol=1e-4, atol=1e-6)


def test_fold_keeps_final_norm_when_tied():
    cfg, params = _tiny(tie=True)
    assert "lm_head" not in params
    folded = fold_norm_scales(params, cfg, "llama")
    # tied embeddings: folding final_norm into the shared matrix would
    # corrupt the input embedding, so the scale must survive
    np.testing.assert_array_equal(np.asarray(folded["final_norm"]),
                                  np.asarray(params["final_norm"]))
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 64, (1, 6)))
    v0, r0 = _rel(params, cfg, ids, lxt_tpu.attnlrp)
    v1, r1 = _rel(folded, cfg, ids, lxt_tpu.attnlrp)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1),
                               rtol=1e-4, atol=1e-6)


def test_fold_rejects_quantized_weights():
    from lxt_tpu.ops.quant import quantize_params

    cfg, params = _tiny()
    qparams = quantize_params(params, bits=8, family="llama")
    with pytest.raises(ValueError, match="BEFORE quantize_params"):
        fold_norm_scales(qparams, cfg, "llama")


def test_fold_rejects_wrong_family():
    cfg, params = _tiny()
    with pytest.raises(ValueError, match="llama param family"):
        fold_norm_scales(params, cfg, "gemma3")


def test_attribution_model_canonize_and_from_hf_kwarg():
    import torch
    from transformers.models.llama.modeling_llama import (LlamaConfig,
                                                          LlamaForCausalLM)

    torch.manual_seed(0)
    hf = LlamaForCausalLM(LlamaConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=64,
        max_position_embeddings=64)).eval()

    model = lxt_tpu.from_hf(hf)
    canon = lxt_tpu.from_hf(hf, canonizers=[fold_norm_scales])
    ids = np.random.RandomState(0).randint(0, 64, (1, 8))
    v0, r0 = model.attribute(ids)
    v1, r1 = canon.attribute(ids)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1),
                               rtol=1e-4, atol=1e-6)
    # method form too, on the already-converted model
    again = model.canonize(fold_norm_scales)
    v2, r2 = again.attribute(ids)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r2),
                               rtol=1e-4, atol=1e-6)
