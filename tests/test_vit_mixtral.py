"""ViT self-consistency and Mixtral forward parity vs HF torch + relevance
sanity, plus ragged-vs-dense MoE equivalence. (Golden relevance parity for
both families lives in test_parity_vit.py / test_parity_explicit.py.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lxt_tpu
from lxt_tpu.attribution import input_relevance, select_logit
from lxt_tpu.models import mixtral as jmix
from lxt_tpu.models import vit as jvit

pytestmark = pytest.mark.slow


def _vit_cfg():
    return jvit.ViTConfig(image_size=32, patch_size=8, hidden_size=64,
                          intermediate_size=128, num_layers=2, num_heads=4,
                          num_classes=10)


def test_vit_forward_and_relevance():
    cfg = _vit_cfg()
    params = jvit.init_params(cfg, jax.random.PRNGKey(0))
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))

    # forward identical across composites (rules only change backward)
    logits_cp = jvit.forward(params, cfg, img, lxt_tpu.cp_lrp).logits
    logits_v = jvit.forward(params, cfg, img, lxt_tpu.vanilla_gradient).logits
    np.testing.assert_allclose(np.asarray(logits_cp), np.asarray(logits_v),
                               rtol=0, atol=1e-5)
    # gamma composite changes only the backward too
    gamma = lxt_tpu.cp_lrp.with_gamma(conv_gamma=0.25, linear_gamma=0.05)
    logits_g = jvit.forward(params, cfg, img, gamma).logits
    np.testing.assert_allclose(np.asarray(logits_g), np.asarray(logits_v),
                               rtol=0, atol=1e-5)

    def target(x, comp):
        out = jvit.forward(params, cfg, x, comp).logits
        return out[jnp.arange(2), out.argmax(-1)].sum()

    for comp in (lxt_tpu.cp_lrp, gamma):
        val, grad = jax.value_and_grad(lambda x: target(x, comp))(img)
        heat = jvit.patch_relevance(img, grad)
        assert heat.shape == (2, 32, 32)
        assert bool(jnp.isfinite(heat).all())


def test_vit_torchvision_statedict_roundtrip():
    """params_from_torchvision consumes a synthetic state dict with the exact
    torchvision key layout (torchvision itself is not installed here)."""
    import torch

    cfg = _vit_cfg()
    D, I, P, L = 64, 128, 8, 2
    g = torch.Generator().manual_seed(0)
    sd = {
        "conv_proj.weight": torch.randn(D, 3, P, P, generator=g),
        "conv_proj.bias": torch.randn(D, generator=g),
        "class_token": torch.randn(1, 1, D, generator=g),
        "encoder.pos_embedding": torch.randn(1, 17, D, generator=g),
        "encoder.ln.weight": torch.randn(D, generator=g),
        "encoder.ln.bias": torch.randn(D, generator=g),
        "heads.head.weight": torch.randn(10, D, generator=g),
        "heads.head.bias": torch.randn(10, generator=g),
    }
    for i in range(L):
        p = f"encoder.layers.encoder_layer_{i}."
        sd |= {
            p + "ln_1.weight": torch.randn(D, generator=g),
            p + "ln_1.bias": torch.randn(D, generator=g),
            p + "ln_2.weight": torch.randn(D, generator=g),
            p + "ln_2.bias": torch.randn(D, generator=g),
            p + "self_attention.in_proj_weight": torch.randn(3 * D, D, generator=g),
            p + "self_attention.in_proj_bias": torch.randn(3 * D, generator=g),
            p + "self_attention.out_proj.weight": torch.randn(D, D, generator=g),
            p + "self_attention.out_proj.bias": torch.randn(D, generator=g),
            p + "mlp.0.weight": torch.randn(I, D, generator=g),
            p + "mlp.0.bias": torch.randn(I, generator=g),
            p + "mlp.3.weight": torch.randn(D, I, generator=g),
            p + "mlp.3.bias": torch.randn(D, generator=g),
        }
    params = jvit.params_from_torchvision(sd, cfg)
    img = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
    out = jvit.forward(params, cfg, img, lxt_tpu.cp_lrp)
    assert out.logits.shape == (1, 10)
    assert bool(jnp.isfinite(out.logits).all())


def test_mixtral_forward_parity_and_relevance():
    """Forward logits match HF MixtralForCausalLM (dense-combine == HF's
    expert loop), and AttnLRP relevance is finite and attributes mostly to
    real tokens."""
    import torch
    from transformers.models.mixtral.modeling_mixtral import (
        MixtralConfig, MixtralForCausalLM)

    torch.manual_seed(0)
    hf_cfg = MixtralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, tie_word_embeddings=False)
    hf = MixtralForCausalLM(hf_cfg).eval()

    ids = torch.randint(0, 256, (1, 10), generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        ref_logits = hf(input_ids=ids, use_cache=False).logits.numpy()

    cfg = jmix.MixtralConfig.from_hf(hf_cfg)
    params = jmix.params_from_hf(hf.state_dict(), cfg)
    embeds = jmix.embed(params, jnp.asarray(ids.numpy()))

    logits = jmix.forward(params, cfg, embeds, lxt_tpu.vanilla_gradient).logits
    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=0, atol=3e-4)

    def target(e):
        return select_logit(jmix.forward(params, cfg, e, lxt_tpu.attnlrp).logits)

    val, rel = jax.jit(lambda e: input_relevance(target, e))(embeds)
    assert bool(jnp.isfinite(rel).all())
    assert float(jnp.abs(rel).sum()) > 0


def test_openclip_vit_variant():
    """OpenCLIP layout: ln_pre, QuickGELU, no conv bias, projected+normalized
    embedding output; relevance of an embedding direction is finite."""
    import torch

    cfg = jvit.ViTConfig(image_size=32, patch_size=8, hidden_size=64,
                         intermediate_size=128, num_layers=2, num_heads=4,
                         act="quick_gelu", openclip=True, proj_dim=32)
    D, I, L = 64, 128, 2
    g = torch.Generator().manual_seed(0)
    sd = {
        "conv1.weight": torch.randn(D, 3, 8, 8, generator=g) * 0.1,
        "class_embedding": torch.randn(D, generator=g),
        "positional_embedding": torch.randn(17, D, generator=g),
        "ln_pre.weight": torch.ones(D), "ln_pre.bias": torch.zeros(D),
        "ln_post.weight": torch.ones(D), "ln_post.bias": torch.zeros(D),
        "proj": torch.randn(D, 32, generator=g) * 0.1,
    }
    for i in range(L):
        p = f"transformer.resblocks.{i}."
        sd |= {
            p + "ln_1.weight": torch.ones(D), p + "ln_1.bias": torch.zeros(D),
            p + "ln_2.weight": torch.ones(D), p + "ln_2.bias": torch.zeros(D),
            p + "attn.in_proj_weight": torch.randn(3 * D, D, generator=g) * 0.1,
            p + "attn.in_proj_bias": torch.zeros(3 * D),
            p + "attn.out_proj.weight": torch.randn(D, D, generator=g) * 0.1,
            p + "attn.out_proj.bias": torch.zeros(D),
            p + "mlp.c_fc.weight": torch.randn(I, D, generator=g) * 0.1,
            p + "mlp.c_fc.bias": torch.zeros(I),
            p + "mlp.c_proj.weight": torch.randn(D, I, generator=g) * 0.1,
            p + "mlp.c_proj.bias": torch.zeros(D),
        }
    params = jvit.params_from_openclip(sd, cfg)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))

    out = jvit.forward(params, cfg, img, lxt_tpu.cp_lrp)
    emb = out.logits
    assert emb.shape == (1, 32)
    np.testing.assert_allclose(float(jnp.linalg.norm(emb)), 1.0, rtol=1e-5)

    # relevance of an embedding direction (CLIP text-image similarity proxy)
    direction = jax.random.normal(jax.random.PRNGKey(1), (32,))
    def target(x):
        e = jvit.forward(params, cfg, x, lxt_tpu.cp_lrp).logits
        return (e @ direction).sum()
    val, grad = jax.value_and_grad(target)(img)
    heat = jvit.patch_relevance(img, grad)
    assert bool(jnp.isfinite(heat).all()) and float(jnp.abs(heat).sum()) > 0


def test_mixtral_ragged_matches_dense():
    """The ragged (sort-by-expert grouped matmul) MoE dispatch is
    relevance-EXACT vs the dense one-hot combine at k/E of the FLOPs."""
    import dataclasses

    from lxt_tpu.attribution import input_relevance, select_logit
    from lxt_tpu.models import mixtral as jmix

    cfg_d = jmix.MixtralConfig(
        vocab_size=128, hidden_size=48, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, num_experts=4, experts_per_token=2,
        moe_impl="dense")
    cfg_r = dataclasses.replace(cfg_d, moe_impl="ragged")
    params = jmix.init_params(cfg_d, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, 128)
    embeds = jmix.embed(params, ids)

    for composite in (lxt_tpu.attnlrp, lxt_tpu.cp_lrp):
        logits_d = jmix.forward(params, cfg_d, embeds, composite).logits
        logits_r = jmix.forward(params, cfg_r, embeds, composite).logits
        np.testing.assert_allclose(np.asarray(logits_r), np.asarray(logits_d),
                                   rtol=0, atol=1e-5)

        def t(c):
            def tgt(e):
                return select_logit(jmix.forward(params, c, e, composite).logits)
            return tgt

        _, rel_d = input_relevance(t(cfg_d), embeds)
        _, rel_r = input_relevance(t(cfg_r), embeds)
        np.testing.assert_allclose(np.asarray(rel_r), np.asarray(rel_d),
                                   rtol=0, atol=1e-5)
