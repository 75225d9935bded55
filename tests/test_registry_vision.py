"""One-call vision + multimodal registry surface (VERDICT r2 next #4):
``from_hf`` accepts torchvision-/OpenCLIP-shaped vision models (the
reference's DEFAULT_MAP covers torchvision ViT one-call,
/root/reference/lxt/efficient/models/__init__.py:10-18) and returns
``VisionAttributionModel.attribute_image`` pixel heatmaps;
Gemma3ForConditionalGeneration converts to a MultimodalAttributionModel
whose ``attribute(ids, pixels)`` yields joint token+pixel relevance."""

import jax.numpy as jnp
import numpy as np
import pytest

import lxt_tpu
from lxt_tpu.models.registry import (
    from_hf, from_openclip, from_siglip, from_torchvision)

pytestmark = pytest.mark.golden


@pytest.fixture(scope="module")
def torch_vit():
    from tests._reference_golden import _TorchViT
    return _TorchViT.build()


def test_from_hf_torchvision_shape_detection(torch_vit):
    """from_hf on a config-less torchvision-shaped module routes to
    from_torchvision; geometry is inferred from the state dict."""
    am = from_hf(torch_vit)
    assert am.kind == "vit"
    assert (am.cfg.image_size, am.cfg.patch_size, am.cfg.hidden_size,
            am.cfg.num_layers, am.cfg.num_heads, am.cfg.num_classes) == (
        32, 8, 64, 2, 4, 10)


def test_vit_attribute_image_matches_manual(torch_vit):
    """attribute_image == the manual vit.forward + patch_relevance flow
    (tests/test_parity_vit.py pins that flow to the reference golden)."""
    import jax

    from lxt_tpu.attribution import input_relevance
    from lxt_tpu.models import vit as jvit

    am = from_hf(torch_vit)
    rng = np.random.default_rng(0)
    images = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)

    value, heat = am.attribute_image(images)
    assert heat.shape == (2, 32, 32)
    assert np.isfinite(np.asarray(heat)).all()

    def tgt(x):
        return jvit.forward(am.params, am.cfg, x,
                            lxt_tpu.cp_lrp).logits.max(axis=-1).sum()
    v_ref, g = jax.value_and_grad(tgt)(jnp.asarray(images))
    ref = jvit.patch_relevance(jnp.asarray(images), g)
    np.testing.assert_allclose(np.asarray(heat), np.asarray(ref),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(float(value), float(v_ref), rtol=1e-6)


def test_vit_attribute_image_label_and_nchw(torch_vit):
    """Explicit labels select that class's logit; NCHW input is accepted
    (torch convention)."""
    am = from_hf(torch_vit)
    rng = np.random.default_rng(1)
    nhwc = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    v1, h1 = am.attribute_image(nhwc, label=[3])
    v2, h2 = am.attribute_image(nhwc.transpose(0, 3, 1, 2), label=[3])
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)
    logits = am.logits(nhwc)
    np.testing.assert_allclose(float(v1), float(np.asarray(logits)[0, 3]),
                               rtol=1e-5)


def test_from_hf_openclip_shape_detection():
    from tests._reference_golden import _TorchOpenCLIP
    model = _TorchOpenCLIP.build()
    am = from_hf(model)
    assert am.kind == "openclip"
    assert am.cfg.openclip and am.cfg.proj_dim == 32
    rng = np.random.default_rng(2)
    images = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    # embedding target direction: attribute w.r.t. a text-embedding dot
    direction = rng.standard_normal(32).astype(np.float32)
    value, heat = am.attribute_image(images, target=direction)
    assert heat.shape == (1, 32, 32)
    emb = np.asarray(am.logits(images))
    np.testing.assert_allclose(float(value), float(emb[0] @ direction),
                               rtol=1e-4)


def test_openclip_act_default_matches_quickgelu():
    """from_openclip defaults to QuickGELU (stock OpenCLIP); the golden
    torch builder uses nn.GELU, so its conversion must override act."""
    from tests._reference_golden import _TorchOpenCLIP
    model = _TorchOpenCLIP.build()
    am_q = from_openclip(model)
    am_g = from_openclip(model, act="gelu_exact")
    assert am_q.cfg.act == "quick_gelu" and am_g.cfg.act == "gelu_exact"
    rng = np.random.default_rng(3)
    images = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    assert not np.allclose(np.asarray(am_q.logits(images)),
                           np.asarray(am_g.logits(images)))


def test_bare_state_dict_needs_num_heads(torch_vit):
    sd = torch_vit.state_dict()
    with pytest.raises(ValueError, match="num_heads"):
        from_torchvision(sd)
    am = from_torchvision(sd, num_heads=4)
    assert am.cfg.num_heads == 4


def test_from_siglip():
    import torch
    from transformers.models.siglip import SiglipVisionConfig
    from transformers.models.siglip.modeling_siglip import SiglipVisionModel

    torch.manual_seed(0)
    hf = SiglipVisionModel(SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14)).eval()
    am = from_hf(hf)
    assert am.kind == "siglip"
    rng = np.random.default_rng(4)
    images = rng.standard_normal((1, 28, 28, 3)).astype(np.float32)
    # headless tower: target required
    with pytest.raises(ValueError, match="headless"):
        am.attribute_image(images)
    value, heat = am.attribute_image(
        images, target=lambda out: (out.mean(axis=1) ** 2).sum())
    assert heat.shape == (1, 28, 28)
    assert np.isfinite(np.asarray(heat)).all()


@pytest.fixture(scope="module")
def tiny_mm_model():
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
    cfg = Gemma3Config(text_config=tc, vision_config=vc,
                       mm_tokens_per_image=1, image_token_index=260,
                       boi_token_index=258, eoi_token_index=259)
    torch.manual_seed(0)
    model = Gemma3ForConditionalGeneration(cfg).eval()
    with torch.no_grad():
        model.model.multi_modal_projector.mm_input_projection_weight.normal_(
            0, 0.2, generator=torch.Generator().manual_seed(3))
    return model


def test_from_hf_multimodal(tiny_mm_model):
    """Gemma3ForConditionalGeneration with vision weights -> joint model;
    logits match HF; attribute returns token AND pixel relevance."""
    import torch

    hf = tiny_mm_model
    mm = from_hf(hf)
    assert mm.family == "gemma3_multimodal"

    g = torch.Generator().manual_seed(1)
    ids = torch.randint(0, 256, (1, 10), generator=g)
    ids[0, 2] = hf.config.image_token_index
    pixels = torch.randn(1, 3, 28, 28, generator=g)
    with torch.no_grad():
        ref = hf(input_ids=ids, pixel_values=pixels,
                 use_cache=False).logits.numpy()
    logits = mm.logits(ids.numpy(), pixels.numpy())  # NCHW accepted
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=0, atol=3e-4)

    value, rel_tok, rel_pix = mm.attribute(ids.numpy(), pixels.numpy())
    assert rel_tok.shape == (1, 10) and rel_pix.shape == (1, 28, 28)
    assert np.isfinite(np.asarray(rel_tok)).all()
    assert np.isfinite(np.asarray(rel_pix)).all()
    # the image genuinely contributes: pixel relevance is nonzero
    assert np.abs(np.asarray(rel_pix)).sum() > 0


def test_from_hf_multimodal_text_only(tiny_mm_model):
    """text_only=True keeps the round-2 behavior: extract the language
    model as a plain AttributionModel."""
    from lxt_tpu.models.registry import AttributionModel

    am = from_hf(tiny_mm_model, text_only=True)
    assert isinstance(am, AttributionModel)
    ids = np.random.default_rng(5).integers(0, 256, (1, 8))
    _, rel = am.attribute(jnp.asarray(ids))
    assert np.isfinite(np.asarray(rel)).all()


def test_vit_attribute_topk_matches_per_label(torch_vit):
    """Top-k class heatmaps from one forward: candidate 0 == the argmax
    attribute_image map, candidate k == attribute_image(label=label_k)."""
    am = from_hf(torch_vit)
    rng = np.random.default_rng(1)
    images = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)

    labels, values, heats = am.attribute_topk(images, k=3)
    assert labels.shape == (3, 2)
    assert heats.shape == (3, 2, 32, 32)

    logits = np.asarray(am.logits(images))
    np.testing.assert_array_equal(np.asarray(labels),
                                  np.argsort(-logits, -1)[:, :3].T)

    v0, h0 = am.attribute_image(images)
    np.testing.assert_allclose(np.asarray(heats[0]), np.asarray(h0),
                               rtol=0, atol=1e-5)
    for k in range(3):
        vk, hk = am.attribute_image(images, label=np.asarray(labels[k]))
        np.testing.assert_allclose(np.asarray(heats[k]), np.asarray(hk),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(float(values[k].sum()), float(vk),
                                   rtol=1e-6)


def test_non_vit_attribute_topk_raises():
    from tests._reference_golden import _TorchOpenCLIP

    am = from_hf(_TorchOpenCLIP.build())
    rng = np.random.default_rng(0)
    images = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    with pytest.raises(ValueError, match="classification head"):
        am.attribute_topk(images, k=2)
