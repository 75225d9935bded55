"""One-call API: from_hf over every supported family + error path."""

import jax.numpy as jnp
import numpy as np
import pytest

import lxt_tpu
from lxt_tpu.models.registry import detect_family


def test_from_hf_llama_end_to_end():
    import torch
    from transformers.models.llama.modeling_llama import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf = LlamaForCausalLM(LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=128)).eval()

    model = lxt_tpu.from_hf(hf)
    assert model.family == "llama"
    assert model.composite.name == "attnlrp"

    ids = np.random.RandomState(0).randint(0, 256, (1, 8))
    value, rel = model.attribute(ids)
    assert rel.shape == (1, 8)
    assert bool(jnp.isfinite(rel).all())

    # latent relevance: one backward. Under AttnLRP the softmax Deep-Taylor
    # rule absorbs bias relevance, so per-layer sums only approximate the
    # target; under CP-LRP every op in the Llama block conserves exactly.
    val, in_rel, latent = model.attribute_latent(ids)
    assert latent.shape[:3] == (2, 1, 8)
    assert bool(jnp.isfinite(latent).all())

    val, in_rel, latent = model.attribute_latent(ids, composite=lxt_tpu.cp_lrp)
    sums = np.asarray(latent.sum(axis=(1, 2, 3)))
    np.testing.assert_allclose(sums, float(val), rtol=1e-3)


def test_from_hf_gpt2_defaults_to_cp():
    import torch
    from transformers.models.gpt2.modeling_gpt2 import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(0)
    hf = GPT2LMHeadModel(GPT2Config(
        n_embd=64, n_layer=2, n_head=4, vocab_size=256, n_positions=64)).eval()
    model = lxt_tpu.from_hf(hf)
    assert model.composite.name == "cp_lrp"
    value, rel = model.attribute(np.arange(6)[None])
    assert rel.shape == (1, 6)


def test_unsupported_model_lists_families():
    class FakeConfig:
        model_type = "t5"

    with pytest.raises(ValueError, match="not yet supported.*llama"):
        detect_family(FakeConfig())


def test_from_hf_phi3_forward_parity():
    """Phi-3's fused qkv/gate_up projections split into the Llama layout;
    forward matches HF exactly (the reference's efficient path cannot patch
    Phi-3 at all — its gated_mlp_forward expects split projections)."""
    import torch
    from transformers.models.phi3.modeling_phi3 import Phi3Config, Phi3ForCausalLM

    torch.manual_seed(0)
    hf = Phi3ForCausalLM(Phi3Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=128, pad_token_id=0)).eval()

    ids = torch.randint(0, 256, (1, 10), generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        ref_logits = hf(input_ids=ids, use_cache=False).logits.numpy()

    model = lxt_tpu.from_hf(hf)
    assert model.family == "phi3"
    logits = model.logits(ids.numpy(), composite=lxt_tpu.vanilla_gradient)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=0, atol=3e-4)

    value, rel = model.attribute(ids.numpy())
    assert bool(jnp.isfinite(rel).all()) and float(jnp.abs(rel).sum()) > 0


def test_from_pretrained_matches_from_hf(tmp_path):
    """from_pretrained loads a checkpoint DIRECTORY through the native
    safetensors reader (no torch model instantiated) and must produce the
    same logits as from_hf on the loaded torch model; quantize_bits= applies
    the per-family spec (incl. the llama-layout alias families)."""
    import torch
    from transformers.models.llama.modeling_llama import (
        LlamaConfig, LlamaForCausalLM)

    from lxt_tpu.models.registry import from_pretrained
    from lxt_tpu.ops.quant import QuantizedTensor

    torch.manual_seed(1)
    hf = LlamaForCausalLM(LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=128)).eval()
    hf.save_pretrained(tmp_path)

    ref = lxt_tpu.from_hf(hf)
    model = from_pretrained(tmp_path)
    assert model.family == "llama"
    ids = np.random.RandomState(1).randint(0, 256, (1, 8))
    np.testing.assert_allclose(np.asarray(model.logits(ids)),
                               np.asarray(ref.logits(ids)),
                               rtol=0, atol=2e-5)

    qmodel = from_pretrained(tmp_path, quantize_bits=8)
    assert isinstance(qmodel.params["layers"]["wq"], QuantizedTensor)
    assert not isinstance(qmodel.params["lm_head"], QuantizedTensor)
    value, rel = qmodel.attribute(ids)
    assert bool(jnp.isfinite(rel).all())


def test_serve_build_server_from_checkpoint(tmp_path, monkeypatch):
    """The CLI wiring (python -m lxt_tpu.serve): checkpoint dir ->
    AttributionServer; end-to-end attribution through the server."""
    import torch
    from transformers.models.llama.modeling_llama import (
        LlamaConfig, LlamaForCausalLM)

    from lxt_tpu import serve as lserve

    torch.manual_seed(2)
    hf = LlamaForCausalLM(LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=128)).eval()
    hf.save_pretrained(tmp_path)

    from test_pipeline import ToyTokenizer
    import transformers
    monkeypatch.setattr(transformers.AutoTokenizer, "from_pretrained",
                        staticmethod(lambda *_a, **_k: ToyTokenizer(256)))

    args = lserve._parse_args(["--model", str(tmp_path), "--dtype", "float32"])
    server = lserve.build_server(args)
    try:
        hm = server.attribute("alpha beta gamma")
        assert len(hm.tokens) == 3
        assert np.isfinite(hm.relevance).all()
    finally:
        server.close()


def test_attribution_model_jit_cache_reuse():
    """attribute/logits/attribute_latent compile once per (shape,
    composite): repeated calls must NOT rebuild jitted programs, and params
    are jit arguments (a closure constant would embed the weight tree in
    the serialized program — rejected by the remote-TPU compile service)."""
    import torch
    from transformers.models.llama.modeling_llama import (
        LlamaConfig, LlamaForCausalLM)

    torch.manual_seed(3)
    hf = LlamaForCausalLM(LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=128)).eval()
    model = lxt_tpu.from_hf(hf)

    ids = np.random.RandomState(2).randint(0, 256, (1, 8))
    model.attribute(ids)
    model.logits(ids)
    model.attribute_latent(ids)
    n = len(model._jit)
    ids2 = np.random.RandomState(3).randint(0, 256, (1, 8))
    v1, r1 = model.attribute(ids2)
    model.logits(ids2)
    model.attribute_latent(ids2)
    assert len(model._jit) == n  # same shapes -> no new programs

    v2, r2 = model.attribute(ids2, composite=lxt_tpu.cp_lrp)
    assert len(model._jit) == n + 1  # distinct composite -> one new program
    assert not np.allclose(np.asarray(r1), np.asarray(r2))


def test_composite_by_name():
    """Entry points accept predefined composite names as strings and reject
    unknown names/types with clear errors (instead of a deep trace-time
    AttributeError)."""
    import pytest
    import torch
    from transformers.models.llama.modeling_llama import (
        LlamaConfig, LlamaForCausalLM)

    from lxt_tpu import composites

    torch.manual_seed(4)
    hf = LlamaForCausalLM(LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=128)).eval()
    model = lxt_tpu.from_hf(hf, composite="cp_lrp")
    assert model.composite == composites.cp_lrp

    ids = np.random.RandomState(5).randint(0, 256, (1, 8))
    # name and object must select the same compiled program / result
    _, r_name = model.attribute(ids, composite="attnlrp")
    _, r_obj = model.attribute(ids, composite=composites.attnlrp)
    assert np.array_equal(np.asarray(r_name), np.asarray(r_obj))

    with pytest.raises(ValueError, match="unknown composite name"):
        model.logits(ids, composite="nope")
    with pytest.raises(TypeError, match="must be a lxt_tpu.Composite"):
        model.logits(ids, composite=42)


def test_out_of_registry_llama_clone_auto_detected():
    """A Hub model_type that is a pure Llama re-registration (same config
    attributes, same parameter naming) converts via the structural fallback
    with a warning; family='llama' silences it; family='nope' raises."""
    import torch
    from transformers.models.llama.modeling_llama import (LlamaConfig,
                                                          LlamaForCausalLM)

    torch.manual_seed(0)
    hf = LlamaForCausalLM(LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=128)).eval()
    hf.config.model_type = "smollm-clone"  # out-of-registry alias

    with pytest.warns(UserWarning, match="match the Llama family"):
        model = lxt_tpu.from_hf(hf)
    assert model.family == "llama"

    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")       # forcing must not warn
        forced = lxt_tpu.from_hf(hf, family="llama")
    ids = np.random.RandomState(0).randint(0, 256, (1, 8))
    v1, r1 = model.attribute(ids)
    v2, r2 = forced.attribute(ids)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2))

    with pytest.raises(ValueError, match="family='nope' is not one of"):
        lxt_tpu.from_hf(hf, family="nope")


def test_structural_fallback_rejects_non_llama_layout():
    """A config that quacks like Llama but whose weights use different
    parameter naming must NOT silently convert (OLMo/StableLM shape)."""
    from lxt_tpu.models.registry import _convert

    class FakeConfig:
        model_type = "not-llama"
        vocab_size = 64
        hidden_size = 16
        intermediate_size = 32
        num_hidden_layers = 1
        num_attention_heads = 2
        rms_norm_eps = 1e-5
        hidden_act = "silu"

    sd = {"transformer.h.0.attn.weight": np.zeros((16, 16), np.float32)}
    with pytest.raises(ValueError, match="not yet supported"):
        _convert(sd, FakeConfig(), None, None)


def test_structural_fallback_rejects_extra_computation_weights():
    """A clone with the full Llama key set PLUS extra layer-0 computation
    weights (q/k norms, qkv biases) must NOT auto-convert — the converter
    would silently drop those weights and attribute the wrong model."""
    from lxt_tpu.models.registry import _llama_structural_match

    class FakeConfig:
        model_type = "llama-plus-qknorm"
        vocab_size = 64
        hidden_size = 16
        intermediate_size = 32
        num_hidden_layers = 1
        num_attention_heads = 2
        rms_norm_eps = 1e-5
        hidden_act = "silu"

    z = np.zeros((16, 16), np.float32)
    sd = {"model.layers.0.self_attn.q_proj.weight": z,
          "model.layers.0.self_attn.k_proj.weight": z,
          "model.layers.0.self_attn.v_proj.weight": z,
          "model.layers.0.self_attn.o_proj.weight": z,
          "model.layers.0.mlp.gate_proj.weight": z,
          "model.layers.0.mlp.up_proj.weight": z,
          "model.layers.0.mlp.down_proj.weight": z,
          "model.layers.0.input_layernorm.weight": z[0],
          "model.layers.0.post_attention_layernorm.weight": z[0],
          "model.embed_tokens.weight": np.zeros((64, 16), np.float32),
          "model.norm.weight": z[0], "lm_head.weight": z}
    assert _llama_structural_match(FakeConfig(), sd)
    sd_extra = dict(sd)
    sd_extra["model.layers.0.self_attn.q_norm.weight"] = z[0]
    assert not _llama_structural_match(FakeConfig(), sd_extra)
    sd_bias = dict(sd)
    sd_bias["model.layers.0.mlp.gate_proj.bias"] = z[0]
    assert not _llama_structural_match(FakeConfig(), sd_bias)
