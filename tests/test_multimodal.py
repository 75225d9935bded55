"""Gemma 3 multimodal (image+text): forward parity vs HF and joint
pixel+token attribution in one vjp (BASELINE config 5 — the reference only
attributes Gemma 3 text)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lxt_tpu
from lxt_tpu.attribution import select_logit
from lxt_tpu.models import gemma3 as jg

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_mm():
    import torch
    from transformers.models.gemma3.modeling_gemma3 import (
        Gemma3Config, Gemma3ForConditionalGeneration, Gemma3TextConfig)
    from transformers.models.siglip import SiglipVisionConfig

    tc = Gemma3TextConfig(
        vocab_size=270, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, sliding_window=8, query_pre_attn_scalar=12,
        max_position_embeddings=128)
    vc = SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14)
    cfg = Gemma3Config(text_config=tc, vision_config=vc, mm_tokens_per_image=1,
                       image_token_index=260, boi_token_index=258,
                       eoi_token_index=259)
    torch.manual_seed(0)
    model = Gemma3ForConditionalGeneration(cfg).eval()
    # HF initializes the projector weight to zeros, which makes a random
    # model degenerate (images contribute nothing) — randomize it
    with torch.no_grad():
        model.model.multi_modal_projector.mm_input_projection_weight.normal_(
            0, 0.2, generator=torch.Generator().manual_seed(3))
    return model


def test_multimodal_forward_parity(tiny_mm):
    import torch

    hf = tiny_mm
    mmcfg = jg.Gemma3MultimodalConfig.from_hf(hf.config)
    params = jg.multimodal_params_from_hf(hf.state_dict(), mmcfg)

    g = torch.Generator().manual_seed(1)
    T = 10
    ids = torch.randint(0, 256, (1, T), generator=g)
    ids[0, 2] = hf.config.image_token_index  # one image placeholder
    pixels = torch.randn(1, 3, 28, 28, generator=g)

    with torch.no_grad():
        ref = hf(input_ids=ids, pixel_values=pixels, use_cache=False).logits.numpy()

    embeds = jg.embed(params["text"], jnp.asarray(ids.numpy()), mmcfg.text)
    mask = jnp.asarray((ids.numpy() == hf.config.image_token_index))
    pix = jnp.asarray(pixels.numpy().transpose(0, 2, 3, 1))  # NCHW -> NHWC

    out = jg.multimodal_forward(params, mmcfg, embeds, pix, mask,
                                lxt_tpu.vanilla_gradient)
    np.testing.assert_allclose(np.asarray(out.logits), ref, rtol=0, atol=3e-4)


def test_multimodal_joint_attribution(tiny_mm):
    import torch

    hf = tiny_mm
    mmcfg = jg.Gemma3MultimodalConfig.from_hf(hf.config)
    params = jg.multimodal_params_from_hf(hf.state_dict(), mmcfg)

    g = torch.Generator().manual_seed(2)
    ids = torch.randint(0, 256, (1, 8), generator=g)
    ids[0, 1] = hf.config.image_token_index
    pixels = torch.randn(1, 3, 28, 28, generator=g)

    embeds = jg.embed(params["text"], jnp.asarray(ids.numpy()), mmcfg.text)
    mask = jnp.asarray((ids.numpy() == hf.config.image_token_index))
    pix = jnp.asarray(pixels.numpy().transpose(0, 2, 3, 1))

    def target(e, p):
        logits = jg.multimodal_forward(params, mmcfg, e, p, mask,
                                       lxt_tpu.attnlrp).logits
        return select_logit(logits)

    (val, (g_emb, g_pix)) = jax.jit(
        lambda e, p: jax.value_and_grad(target, argnums=(0, 1))(e, p))(embeds, pix)

    token_rel = (embeds * g_emb).sum(-1)
    pixel_rel = (pix * g_pix).sum(-1)          # [B, H, W] image heatmap
    assert bool(jnp.isfinite(token_rel).all())
    assert bool(jnp.isfinite(pixel_rel).all())
    # the image placeholder token itself carries no text relevance (its
    # embedding was replaced), but the pixels do
    assert float(jnp.abs(pixel_rel).sum()) > 0
    assert abs(float(token_rel[0, 1])) < 1e-6


def _mm_model(hf):
    from lxt_tpu.models.registry import MultimodalAttributionModel
    mmcfg = jg.Gemma3MultimodalConfig.from_hf(hf.config)
    params = jg.multimodal_params_from_hf(hf.state_dict(), mmcfg)
    return MultimodalAttributionModel(cfg=mmcfg, params=params,
                                      composite=lxt_tpu.attnlrp)


def test_multimodal_generate_matches_hf(tiny_mm):
    import torch

    hf = tiny_mm
    model = _mm_model(hf)
    g = torch.Generator().manual_seed(4)
    ids = torch.randint(0, 256, (2, 7), generator=g)
    ids[:, 1] = hf.config.image_token_index
    pixels = torch.randn(2, 3, 28, 28, generator=g)

    out = np.asarray(model.generate(
        ids.numpy(), pixels.numpy().transpose(0, 2, 3, 1), 4))
    with torch.no_grad():
        ref = hf.generate(input_ids=ids, pixel_values=pixels,
                          max_new_tokens=4, do_sample=False).numpy()
    np.testing.assert_array_equal(out, ref)


def test_multimodal_attribute_response(tiny_mm):
    """Each of the K fused response maps equals the single-site joint
    attribution at that (position, token)."""
    import torch

    hf = tiny_mm
    model = _mm_model(hf)
    g = torch.Generator().manual_seed(5)
    ids = torch.randint(0, 256, (1, 6), generator=g)
    ids[0, 0] = hf.config.image_token_index
    pixels = torch.randn(1, 3, 28, 28, generator=g)
    pix = pixels.numpy().transpose(0, 2, 3, 1)

    out = np.asarray(model.generate(ids.numpy(), pix, 3))
    T0 = ids.shape[1]
    values, rel_tok, rel_pix = model.attribute_response(out, pix, T0)
    values, rel_tok, rel_pix = (np.asarray(values), np.asarray(rel_tok),
                                np.asarray(rel_pix))
    assert rel_tok.shape == (3, 1, T0 + 3)
    assert rel_pix.shape == (3, 1, 28, 28)
    assert np.isfinite(rel_tok).all() and np.isfinite(rel_pix).all()

    for k in range(3):
        v, rt, rp = model.attribute(out, pix, position=T0 + k - 1,
                                    token=out[:, T0 + k])
        np.testing.assert_allclose(values[k], np.asarray(v), rtol=1e-4)
        np.testing.assert_allclose(rel_tok[k], np.asarray(rt), rtol=0,
                                   atol=2e-4)
        np.testing.assert_allclose(rel_pix[k], np.asarray(rp), rtol=0,
                                   atol=2e-4)
