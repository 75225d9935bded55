"""KV-cached incremental decoding (models/decode.py): the fast generate
path must be token-exact with the full-prefix loop on every Llama-family
config variant, including left-padded serving batches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lxt_tpu
from lxt_tpu.models import llama as jl
from lxt_tpu.models.registry import AttributionModel, _family_table

pytestmark = pytest.mark.slow

BASE = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=2, rms_eps=1e-6)


def _model(cfg, seed=0, randomize_biases=True):
    params = jl.init_params(cfg, jax.random.PRNGKey(seed))
    if randomize_biases and cfg.qkv_bias:
        # init_params zeros the biases; random ones make the bias path
        # observable
        ks = jax.random.split(jax.random.PRNGKey(seed + 1), 3)
        for i, name in enumerate(("bq", "bk", "bv")):
            params["layers"][name] = 0.1 * jax.random.normal(
                ks[i], params["layers"][name].shape)
    return AttributionModel("llama", cfg, params, lxt_tpu.attnlrp,
                            _family_table()["llama"])


@pytest.mark.parametrize("variant,kw", [
    ("gqa", {}),
    ("qkv_bias", {"qkv_bias": True}),
    ("qk_norm", {"qk_norm": True}),
    ("window", {"sliding_window": 4}),
    ("tied", {"tie_embeddings": True}),
])
def test_cached_matches_uncached(variant, kw):
    cfg = jl.LlamaConfig(**{**BASE, **kw})
    m = _model(cfg)
    ids = np.random.RandomState(1).randint(1, cfg.vocab_size, (2, 6))
    a = np.asarray(m.generate(ids, 5, use_cache=True))
    b = np.asarray(m.generate(ids, 5, use_cache=False))
    np.testing.assert_array_equal(a, b)


def test_cached_matches_uncached_left_padded():
    cfg = jl.LlamaConfig(**BASE)
    m = _model(cfg)
    ids = np.random.RandomState(2).randint(1, cfg.vocab_size, (2, 6))
    kb = np.asarray([3, 0], np.int32)
    a = np.asarray(m.generate(ids, 4, kv_begin=kb, use_cache=True))
    b = np.asarray(m.generate(ids, 4, kv_begin=kb, use_cache=False))
    np.testing.assert_array_equal(a, b)
    # and the padded row equals the unpadded run of its suffix
    solo = np.asarray(m.generate(ids[:1, 3:], 4, use_cache=True))
    np.testing.assert_array_equal(a[0, 3:], solo[0])


def test_cached_eos_latching():
    cfg = jl.LlamaConfig(**BASE)
    m = _model(cfg)
    ids = np.random.RandomState(3).randint(1, cfg.vocab_size, (1, 5))
    first = int(np.asarray(m.generate(ids, 1, use_cache=True))[0, -1])
    out = np.asarray(m.generate(ids, 6, eos_token_id=first, use_cache=True))
    assert (out[0, 5:] == first).all()


def test_prefill_step_logits_match_full_forward():
    """The per-step logits themselves (not just the argmax) agree with
    the full-sequence forward at every frontier."""
    from lxt_tpu.models import decode

    cfg = jl.LlamaConfig(**BASE)
    m = _model(cfg)
    ids = np.random.RandomState(4).randint(1, cfg.vocab_size, (2, 7))
    T0, N = ids.shape[1], 3
    out = np.asarray(m.generate(ids, N, use_cache=True))

    e = m.embed(out)
    full = np.asarray(m._fns["forward"](
        m.params, cfg, e, lxt_tpu.attnlrp).logits)

    logits0, caches = decode.prefill(m.params, cfg, m.embed(ids), T0 + N)
    np.testing.assert_allclose(np.asarray(logits0)[:, 0], full[:, T0 - 1],
                               rtol=0, atol=2e-4)
    for k in range(1, N):
        tok = jnp.asarray(out[:, T0 + k - 1: T0 + k])
        le, caches = decode.decode_step(
            m.params, cfg, m.embed(tok), caches, T0 + k - 1)
        np.testing.assert_allclose(np.asarray(le)[:, 0], full[:, T0 + k - 1],
                                   rtol=0, atol=2e-4)


def test_gemma3_cached_matches_uncached():
    """Gemma-3's local/global alternation, sandwich norms and two rope
    bases survive the cached split (and HF-golden generate is covered by
    test_multimodal's parity fixture)."""
    from lxt_tpu.models import gemma3 as jg

    cfg = jg.Gemma3Config(
        vocab_size=256, hidden_size=48, intermediate_size=96, num_layers=4,
        num_heads=4, num_kv_heads=2, head_dim=12, sliding_window=4,
        query_pre_attn_scalar=12.0,
        layer_types=("sliding_attention", "full_attention",
                     "sliding_attention", "sliding_attention"))
    params = jg.init_params(cfg, jax.random.PRNGKey(0))
    m = AttributionModel("gemma3_text", cfg, params, lxt_tpu.attnlrp,
                         _family_table()["gemma3_text"])
    ids = np.random.RandomState(7).randint(1, 256, (2, 9))
    a = np.asarray(m.generate(ids, 5, use_cache=True))
    b = np.asarray(m.generate(ids, 5, use_cache=False))
    np.testing.assert_array_equal(a, b)
    kb = np.asarray([4, 0], np.int32)
    a = np.asarray(m.generate(ids, 4, kv_begin=kb, use_cache=True))
    b = np.asarray(m.generate(ids, 4, kv_begin=kb, use_cache=False))
    np.testing.assert_array_equal(a, b)


def test_gpt2_cached_matches_uncached_and_hf():
    import torch
    from transformers import GPT2Config as HFGPT2Config
    from transformers import GPT2LMHeadModel

    torch.manual_seed(0)
    hf = GPT2LMHeadModel(HFGPT2Config(
        vocab_size=256, n_embd=48, n_layer=3, n_head=4, n_positions=64,
        scale_attn_by_inverse_layer_idx=True)).eval()
    m = lxt_tpu.from_hf(hf)
    ids = np.random.RandomState(9).randint(1, 256, (2, 6))

    a = np.asarray(m.generate(ids, 5, use_cache=True))
    b = np.asarray(m.generate(ids, 5, use_cache=False))
    np.testing.assert_array_equal(a, b)
    with torch.no_grad():
        ref = hf.generate(torch.from_numpy(ids), max_new_tokens=5,
                          do_sample=False).numpy()
    np.testing.assert_array_equal(a, ref)

    # left padding: wpe index and mask must shift per example
    kb = np.asarray([2, 0], np.int32)
    a = np.asarray(m.generate(ids, 4, kv_begin=kb, use_cache=True))
    b = np.asarray(m.generate(ids, 4, kv_begin=kb, use_cache=False))
    np.testing.assert_array_equal(a, b)


def test_mixtral_cached_matches_uncached_and_hf():
    import torch
    from transformers.models.mixtral.modeling_mixtral import (
        MixtralConfig as HFMixtralConfig, MixtralForCausalLM)

    torch.manual_seed(0)
    hf = MixtralForCausalLM(HFMixtralConfig(
        vocab_size=256, hidden_size=48, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=64)).eval()
    m = lxt_tpu.from_hf(hf)
    ids = np.random.RandomState(10).randint(1, 256, (2, 6))

    a = np.asarray(m.generate(ids, 5, use_cache=True))
    b = np.asarray(m.generate(ids, 5, use_cache=False))
    np.testing.assert_array_equal(a, b)
    with torch.no_grad():
        ref = hf.generate(torch.from_numpy(ids), max_new_tokens=5,
                          do_sample=False).numpy()
    np.testing.assert_array_equal(a, ref)

    kb = np.asarray([3, 0], np.int32)
    a = np.asarray(m.generate(ids, 4, kv_begin=kb, use_cache=True))
    b = np.asarray(m.generate(ids, 4, kv_begin=kb, use_cache=False))
    np.testing.assert_array_equal(a, b)


def test_sampled_generate():
    """temperature>0 + key: deterministic per key, different across keys,
    and top_k=1 degenerates to greedy exactly."""
    cfg = jl.LlamaConfig(**BASE)
    m = _model(cfg)
    ids = np.random.RandomState(11).randint(1, cfg.vocab_size, (2, 5))

    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)
    a = np.asarray(m.generate(ids, 8, temperature=1.0, key=k0))
    a2 = np.asarray(m.generate(ids, 8, temperature=1.0, key=k0))
    b = np.asarray(m.generate(ids, 8, temperature=1.0, key=k1))
    np.testing.assert_array_equal(a, a2)            # same key -> same draw
    assert not np.array_equal(a, b)                 # (vocab 256, N=8)

    greedy = np.asarray(m.generate(ids, 6))
    top1 = np.asarray(m.generate(ids, 6, temperature=0.7, top_k=1, key=k0))
    np.testing.assert_array_equal(top1, greedy)

    import pytest
    with pytest.raises(ValueError, match="temperature"):
        m.generate(ids, 2, key=k0)                  # key without temperature

    # sampling rides the cached and uncached paths identically
    c = np.asarray(m.generate(ids, 8, temperature=1.0, key=k0,
                              use_cache=False))
    np.testing.assert_array_equal(a, c)


def test_quantized_cached_matches_uncached():
    """int8 weight-only params ride the cached path (_layer_at tree-maps
    over QuantizedTensor leaves, which carry the stacked L axis)."""
    from lxt_tpu.ops.quant import quantize_params

    cfg = jl.LlamaConfig(**BASE)
    params = quantize_params(jl.init_params(cfg, jax.random.PRNGKey(0)),
                             bits=8)
    m = AttributionModel("llama", cfg, params, lxt_tpu.attnlrp,
                         _family_table()["llama"])
    ids = np.random.RandomState(12).randint(1, cfg.vocab_size, (2, 6))
    a = np.asarray(m.generate(ids, 5, use_cache=True))
    b = np.asarray(m.generate(ids, 5, use_cache=False))
    np.testing.assert_array_equal(a, b)


def test_decode_logits_close_at_bf16():
    """Production dtype: per-step decode logits track the full forward at
    bf16 tolerances (reduction orders differ between the flash prefill
    and the einsum steps, so exactness is not required — closeness is)."""
    from lxt_tpu.models import decode

    cfg = jl.LlamaConfig(**{**BASE, "dtype": "bfloat16"})
    m = _model(cfg)
    ids = np.random.RandomState(13).randint(1, cfg.vocab_size, (2, 7))
    T0, N = ids.shape[1], 3
    out = np.asarray(m.generate(ids, N, use_cache=True))

    e = m.embed(out)
    full = np.asarray(m._fns["forward"](
        m.params, cfg, e, lxt_tpu.attnlrp).logits, dtype=np.float32)

    logits0, caches = decode.prefill(m.params, cfg, m.embed(ids), T0 + N)
    np.testing.assert_allclose(
        np.asarray(logits0[:, 0], dtype=np.float32), full[:, T0 - 1],
        rtol=0, atol=0.05)
    for k in range(1, N):
        tok = jnp.asarray(out[:, T0 + k - 1: T0 + k])
        le, caches = decode.decode_step(
            m.params, cfg, m.embed(tok), caches, T0 + k - 1)
        np.testing.assert_allclose(
            np.asarray(le[:, 0], dtype=np.float32), full[:, T0 + k - 1],
            rtol=0, atol=0.05)
