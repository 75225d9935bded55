"""Golden end-to-end parity: lxt_tpu vs the torch reference (Llama family).

Reference relevances are computed by ``tests/_reference_golden.py`` in fresh
subprocesses (the reference's monkey-patching is global and irreversible, so
attnLRP and cp_LRP each need their own interpreter). We rebuild the same tiny
random HF models here (same torch seed => identical weights), convert the
weights, and compare per-token relevance. This is the model-level test class
the reference itself lacks (its validation is visual-only, SURVEY.md §4).
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lxt_tpu
from lxt_tpu.attribution import input_relevance, select_logit
from lxt_tpu.models import llama as jllama

pytestmark = pytest.mark.golden

FAMILIES = ["llama", "qwen2", "qwen3"]
_GOLDEN_CACHE = {}


@pytest.fixture(scope="session")
def golden(reference_lxt, tmp_path_factory):
    def get(composite):
        if composite not in _GOLDEN_CACHE:
            out = tmp_path_factory.mktemp("golden") / f"{composite}.npz"
            script = os.path.join(os.path.dirname(__file__), "_reference_golden.py")
            subprocess.run(
                [sys.executable, script, composite, str(out)] + FAMILIES,
                check=True, capture_output=True, text=True)
            _GOLDEN_CACHE[composite] = dict(np.load(out))
        return _GOLDEN_CACHE[composite]
    return get


def _build_ours(family):
    """Rebuild the tiny HF model (same seed as the golden subprocess) and
    convert its weights to our pytree."""
    from tests._reference_golden import build_tiny
    _, _, hf_model = build_tiny(family)
    cfg = jllama.LlamaConfig.from_hf(hf_model.config)
    params = jllama.params_from_hf(hf_model.state_dict(), cfg)
    return cfg, params


@pytest.mark.parametrize("family", FAMILIES)
@pytest.mark.parametrize("composite_name", ["attnlrp", "cp_lrp"])
def test_llama_family_parity(golden, family, composite_name):
    data = golden(composite_name)
    ids = data[f"{family}.ids"]
    ref_logits = data[f"{family}.logits"]
    ref_rel = data[f"{family}.rel"]

    cfg, params = _build_ours(family)
    composite = {"attnlrp": lxt_tpu.attnlrp, "cp_lrp": lxt_tpu.cp_lrp}[composite_name]

    embeds = jllama.embed(params, jnp.asarray(ids))

    logits = jllama.forward(params, cfg, embeds, composite).logits
    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=0, atol=2e-4)

    def target(e):
        return select_logit(jllama.forward(params, cfg, e, composite).logits)

    _, rel = jax.jit(lambda e: input_relevance(target, e))(embeds)
    scale = np.abs(ref_rel).max()
    np.testing.assert_allclose(np.asarray(rel), ref_rel, rtol=0, atol=5e-4 * max(scale, 1.0))

    # relevance heatmaps must correlate essentially perfectly
    a, b = np.asarray(rel).ravel(), ref_rel.ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.9999


def test_llama3_rope_scaling_forward_parity():
    """Llama-3.x checkpoints use the 'llama3' rope scaling (frequency-band
    smoothing); forward must match HF exactly."""
    import torch
    from transformers.models.llama.modeling_llama import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf = LlamaForCausalLM(LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=256,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 64})).eval()

    cfg = jllama.LlamaConfig.from_hf(hf.config)
    assert cfg.rope_scaling == ("llama3", 8.0, 1.0, 4.0, 64.0)
    params = jllama.params_from_hf(hf.state_dict(), cfg)
    ids = torch.randint(0, 256, (1, 48), generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        ref = hf(input_ids=ids, use_cache=False).logits.numpy()
    e = jllama.embed(params, jnp.asarray(ids.numpy()))
    logits = jllama.forward(params, cfg, e, lxt_tpu.vanilla_gradient).logits
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=0, atol=2e-5)


def test_llama_bf16_parity(reference_lxt, tmp_path):
    """bf16 end-to-end relevance vs the torch bf16 reference — pins the
    mixed-precision semantics (f32 RMSNorm upcast, f32 relevance sums)."""
    import subprocess
    import sys as _sys

    out = tmp_path / "llama_bf16.npz"
    script = os.path.join(os.path.dirname(__file__), "_reference_golden.py")
    r = subprocess.run(
        [_sys.executable, script, "attnlrp", str(out), "llama_bf16"],
        capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(r.stdout + r.stderr)
    data = dict(np.load(out))
    ids, ref_rel = data["llama_bf16.ids"], data["llama_bf16.rel"]

    cfg, _ = _build_ours("llama")
    from tests._reference_golden import build_tiny
    _, _, hf_model = build_tiny("llama")
    import numpy as _np
    params = jllama.params_from_hf(hf_model.state_dict(), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    embeds = jllama.embed(params, jnp.asarray(ids))

    def target(e):
        return select_logit(jllama.forward(params, cfg, e, lxt_tpu.attnlrp).logits)

    _, rel = input_relevance(target, embeds)
    a, b = _np.asarray(rel, _np.float32).ravel(), ref_rel.ravel()
    cos = a @ b / (_np.linalg.norm(a) * _np.linalg.norm(b) + 1e-12)
    assert cos > 0.99, cos
