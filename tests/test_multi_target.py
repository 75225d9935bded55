"""Multi-target attribution: K heatmaps sharing one forward pass.

The reference explains one target per backward (and one forward per
backward, examples/quantized_llama.py:39-47); `multi_token_relevance` /
`topk_relevance` reuse a single jax.vjp's residuals for all K pullbacks.
Ground truth here: K separate `input_relevance` calls must match exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lxt_tpu
from lxt_tpu.attribution import (input_relevance, multi_token_relevance,
                                 select_logit, topk_relevance)
from lxt_tpu.models import llama as jllama

pytestmark = pytest.mark.golden


@pytest.fixture(scope="module")
def tiny():
    cfg = jllama.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=2, num_kv_heads=2)
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    ids = np.random.RandomState(0).randint(1, 64, (2, 12))
    embeds = jllama.embed(params, jnp.asarray(ids))
    return cfg, params, embeds


def _logits_fn(cfg, params, attn_impl="einsum"):
    return lambda e: jllama.forward(params, cfg, e, lxt_tpu.attnlrp,
                                    attn_impl=attn_impl).logits


def _separate(cfg, params, embeds, tokens):
    """Ground truth: one input_relevance per token (K forwards)."""
    fn = _logits_fn(cfg, params)
    vals, rels = [], []
    for tok in tokens:
        tok_b = jnp.broadcast_to(jnp.asarray(tok), (embeds.shape[0],))
        def tgt(e, tok_b=tok_b):
            return select_logit(fn(e), token=tok_b)
        v, r = input_relevance(tgt, embeds)
        vals.append(v)
        rels.append(r)
    return np.asarray(vals), np.stack([np.asarray(r) for r in rels])


@pytest.mark.parametrize("via", ["scan", "vmap"])
def test_multi_matches_separate(tiny, via):
    cfg, params, embeds = tiny
    tokens = jnp.asarray([3, 17, 42])
    values, rel = multi_token_relevance(
        _logits_fn(cfg, params), embeds, tokens, via=via)
    assert values.shape == (3, 2) and rel.shape == (3, 2, 12)

    vals_ref, rel_ref = _separate(cfg, params, embeds, [3, 17, 42])
    # separate targets sum the value over the batch; ours is per-example
    np.testing.assert_allclose(np.asarray(values).sum(-1), vals_ref,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rel), rel_ref, rtol=0, atol=2e-5)


def test_multi_per_row_tokens(tiny):
    """tokens [K, B]: different candidate per batch row."""
    cfg, params, embeds = tiny
    tokens = jnp.asarray([[3, 5], [17, 9]])          # K=2, B=2
    values, rel = multi_token_relevance(
        _logits_fn(cfg, params), embeds, tokens)
    # row b of map k must equal the single-target map for tokens[k, b]
    for k in range(2):
        def tgt(e, k=k):
            return select_logit(_logits_fn(cfg, params)(e),
                                token=tokens[k])
        _, r = input_relevance(tgt, embeds)
        np.testing.assert_allclose(np.asarray(rel[k]), np.asarray(r),
                                   rtol=0, atol=2e-5)


def test_topk_tokens_and_argmax_map(tiny):
    cfg, params, embeds = tiny
    fn = _logits_fn(cfg, params)
    toks, values, rel = topk_relevance(fn, embeds, k=3)
    assert toks.shape == (3, 2) and rel.shape == (3, 2, 12)

    row = np.asarray(fn(embeds)[:, -1, :])
    order = np.argsort(-row, axis=-1)[:, :3].T       # [K, B]
    np.testing.assert_array_equal(np.asarray(toks), order)
    np.testing.assert_allclose(np.asarray(values),
                               np.stack([row[np.arange(2), order[k]]
                                         for k in range(3)]), rtol=1e-6)

    # map 0 (the argmax candidate) == the default single-target map
    def tgt(e):
        return select_logit(fn(e))
    _, r0 = input_relevance(tgt, embeds)
    np.testing.assert_allclose(np.asarray(rel[0]), np.asarray(r0),
                               rtol=0, atol=2e-5)


@pytest.mark.parametrize("via", ["scan", "vmap"])
def test_multi_flash_path(tiny, via):
    """The K pullbacks traverse the Pallas flash backward (interpret mode
    on CPU) — both the scanned and the vmapped drivers must agree with the
    einsum ground truth."""
    cfg, params, embeds = tiny
    tokens = jnp.asarray([3, 17])
    values, rel = multi_token_relevance(
        _logits_fn(cfg, params, attn_impl="flash"), embeds, tokens, via=via)
    vals_ref, rel_ref = _separate(cfg, params, embeds, [3, 17])
    np.testing.assert_allclose(np.asarray(values).sum(-1), vals_ref,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rel), rel_ref, rtol=0, atol=3e-5)


def test_registry_attribute_multi_and_topk():
    import torch
    from transformers.models.llama.modeling_llama import (LlamaConfig,
                                                          LlamaForCausalLM)

    torch.manual_seed(0)
    hf = LlamaForCausalLM(LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=128)).eval()
    model = lxt_tpu.from_hf(hf)
    ids = np.random.RandomState(0).randint(0, 256, (1, 8))

    values, rel = model.attribute_multi(ids, [7, 80, 200])
    assert values.shape == (3, 1) and rel.shape == (3, 1, 8)
    # each map equals the single-target attribute for that token
    for k, tok in enumerate([7, 80, 200]):
        v, r = model.attribute(ids, token=[tok])
        np.testing.assert_allclose(np.asarray(rel[k]), np.asarray(r),
                                   rtol=0, atol=2e-5)
        np.testing.assert_allclose(float(values[k, 0]), float(v), rtol=1e-6)

    toks, tvals, trel = model.attribute_topk(ids, k=4)
    assert toks.shape == (4, 1) and trel.shape == (4, 1, 8)
    row = np.asarray(model.logits(ids))[:, -1, :]
    np.testing.assert_array_equal(np.asarray(toks[:, 0]),
                                  np.argsort(-row[0])[:4])


def test_multi_site_matches_separate_positions(tiny):
    """Sites at DIFFERENT positions: each map equals the single-target
    map with select_logit(position=p, token=t)."""
    cfg, params, embeds = tiny
    fn = _logits_fn(cfg, params)
    positions = jnp.asarray([4, 7, 11])
    tokens = jnp.asarray([3, 17, 42])
    from lxt_tpu.attribution import multi_site_relevance
    values, rel = multi_site_relevance(fn, embeds, positions, tokens)
    assert values.shape == (3, 2) and rel.shape == (3, 2, 12)
    for k in range(3):
        p, t = int(positions[k]), int(tokens[k])
        def tgt(e, p=p, t=t):
            return select_logit(fn(e), position=p,
                                token=jnp.full((2,), t))
        v, r = input_relevance(tgt, embeds)
        np.testing.assert_allclose(np.asarray(rel[k]), np.asarray(r),
                                   rtol=0, atol=2e-5)
        np.testing.assert_allclose(float(np.asarray(values[k]).sum()),
                                   float(v), rtol=1e-6)


def test_attribute_response_per_token_maps():
    """attribute_response: map k explains response token k at its
    predicting position; matches attribute(position=p-1, token=tok)."""
    import torch
    from transformers.models.llama.modeling_llama import (LlamaConfig,
                                                          LlamaForCausalLM)

    torch.manual_seed(0)
    hf = LlamaForCausalLM(LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=128)).eval()
    model = lxt_tpu.from_hf(hf)
    ids = np.random.RandomState(1).randint(0, 256, (1, 10))
    start = 6
    values, rel = model.attribute_response(ids, start)
    K = 10 - start
    assert values.shape == (K, 1) and rel.shape == (K, 1, 10)
    for k in range(K):
        p = start + k
        v, r = model.attribute(ids, position=p - 1, token=[int(ids[0, p])])
        np.testing.assert_allclose(np.asarray(rel[k]), np.asarray(r),
                                   rtol=0, atol=2e-5)
        np.testing.assert_allclose(float(values[k, 0]), float(v),
                                   rtol=1e-6)

    # response_start bounds
    import pytest
    with pytest.raises(ValueError, match="response_start"):
        model.attribute_response(ids, 0)


def test_generate_matches_hf_greedy():
    """Jitted greedy decode == HF generate(do_sample=False), and the
    generate -> attribute_response roundtrip works from ids alone."""
    import torch
    from transformers.models.llama.modeling_llama import (LlamaConfig,
                                                          LlamaForCausalLM)

    torch.manual_seed(0)
    hf = LlamaForCausalLM(LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=128)).eval()
    model = lxt_tpu.from_hf(hf)
    ids = np.random.RandomState(5).randint(1, 256, (2, 6))

    out = np.asarray(model.generate(ids, 5))
    with torch.no_grad():
        ref = hf.generate(torch.from_numpy(ids), max_new_tokens=5,
                          do_sample=False).numpy()
    np.testing.assert_array_equal(out, ref)

    values, rels = model.attribute_response(out, ids.shape[1])
    assert rels.shape == (5, 2, 11)
    assert np.isfinite(np.asarray(rels)).all()


def test_generate_eos_latching():
    import torch
    from transformers.models.llama.modeling_llama import (LlamaConfig,
                                                          LlamaForCausalLM)

    torch.manual_seed(0)
    hf = LlamaForCausalLM(LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=128)).eval()
    model = lxt_tpu.from_hf(hf)
    ids = np.random.RandomState(6).randint(1, 256, (1, 4))

    # whatever greedy emits first becomes the eos id: every later token
    # must then be that same id
    first = int(np.asarray(model.generate(ids, 1))[0, -1])
    out = np.asarray(model.generate(ids, 6, eos_token_id=first))
    assert (out[0, 4:] == first).all()


def test_contrastive_response_is_map_difference():
    """Contrastive site k == map(token) - map(rival) by vjp linearity,
    with the rival being the strongest non-target token at the site."""
    from lxt_tpu.attribution import multi_site_relevance

    import torch
    from transformers.models.llama.modeling_llama import (LlamaConfig,
                                                          LlamaForCausalLM)

    torch.manual_seed(0)
    hf = LlamaForCausalLM(LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=128)).eval()
    model = lxt_tpu.from_hf(hf)
    ids = np.random.RandomState(21).randint(1, 256, (2, 5))
    out = np.asarray(model.generate(ids, 3))
    T0, B = ids.shape[1], ids.shape[0]

    fwd, cfg = model._fns["forward"], model.cfg
    e = model.embed(out)
    f = lambda ee: fwd(model.params, cfg, ee, model.composite).logits

    positions = np.arange(T0 - 1, out.shape[1] - 1)
    toks = out[:, T0:].T.copy()                         # [K, B]
    logits = np.asarray(model.logits(out))
    rivals = []
    for k, p in enumerate(positions):
        row = logits[:, p].copy()
        row[np.arange(B), toks[k]] = -np.inf
        rivals.append(row.argmax(-1))
    rivals = np.stack(rivals)

    va, ra = multi_site_relevance(f, e, positions, toks)
    vb, rb = multi_site_relevance(f, e, positions, rivals)
    vc, rc = multi_site_relevance(f, e, positions, toks, contrastive=True)
    np.testing.assert_allclose(np.asarray(vc), np.asarray(va - vb),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rc), np.asarray(ra - rb),
                               rtol=0, atol=2e-4)

    # and through the public surface
    values, rels = model.attribute_response(out, T0, contrastive=True)
    np.testing.assert_allclose(np.asarray(values), np.asarray(vc),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rels), np.asarray(rc),
                               rtol=0, atol=1e-5)


def test_attribute_response_latent():
    """Latent response traces: input maps match attribute_response, and
    site 0's layer trace matches the single-target attribute_latent."""
    import torch
    from transformers.models.llama.modeling_llama import (LlamaConfig,
                                                          LlamaForCausalLM)

    torch.manual_seed(0)
    hf = LlamaForCausalLM(LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=128)).eval()
    model = lxt_tpu.from_hf(hf)
    ids = np.random.RandomState(22).randint(1, 256, (2, 5))
    out = np.asarray(model.generate(ids, 3))
    T0 = ids.shape[1]

    values, rel, latent = model.attribute_response_latent(out, T0)
    assert np.asarray(latent).shape == (3, 2, 2, out.shape[1])  # [K,L,B,T]
    assert np.isfinite(np.asarray(latent)).all()

    v2, r2 = model.attribute_response(out, T0)
    np.testing.assert_allclose(np.asarray(values), np.asarray(v2),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rel), np.asarray(r2),
                               rtol=0, atol=1e-5)

    # cross-check site 0 against the single-target latent path
    pos, tok = T0 - 1, jnp.asarray(out[:, T0])

    def tgt(logits):
        row = logits[:, pos, :]
        return jnp.take_along_axis(row, tok[:, None], -1).sum()

    _, in_rel, lat = model.attribute_latent(out, target=tgt)
    np.testing.assert_allclose(np.asarray(rel)[0], np.asarray(in_rel),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(latent)[0],
                               np.asarray(lat).sum(-1), rtol=0, atol=1e-5)


def test_attribute_response_golden_vs_reference(reference_lxt,
                                                tmp_path_factory):
    """GOLDEN: every map of attribute_response equals the torch
    reference's single-target attnLRP backward at that (position, token)
    — K reference forward+backward runs reproduced by ONE shared
    forward here."""
    import os
    import subprocess
    import sys as _sys

    out = tmp_path_factory.mktemp("golden") / "response.npz"
    script = os.path.join(os.path.dirname(__file__), "_reference_golden.py")
    subprocess.run([_sys.executable, script, "response", str(out)],
                   check=True, capture_output=True, text=True)
    data = dict(np.load(out))
    ids = data["response.ids"]
    start = int(data["response.start"])
    ref_rel = data["response.rel"]                     # [K, T]
    ref_vals = data["response.values"]                 # [K]

    from tests._reference_golden import build_tiny
    _, _, hf_model = build_tiny("llama")
    cfg = jllama.LlamaConfig.from_hf(hf_model.config)
    params = jllama.params_from_hf(hf_model.state_dict(), cfg)
    from lxt_tpu.models.registry import AttributionModel, _family_table
    model = AttributionModel("llama", cfg, params, lxt_tpu.attnlrp,
                             _family_table()["llama"])

    values, rel = model.attribute_response(ids, start)
    values, rel = np.asarray(values), np.asarray(rel)
    assert rel.shape == (ids.shape[1] - start, 1, ids.shape[1])
    for k in range(ref_rel.shape[0]):
        np.testing.assert_allclose(values[k, 0], ref_vals[k], rtol=2e-4)
        a, b = rel[k, 0], ref_rel[k]
        cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.9999, (k, cos)
        np.testing.assert_allclose(a, b, rtol=0, atol=5e-4)
