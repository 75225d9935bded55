"""Batched variable-length attribution: padding must not change relevances.

The key invariant: attributing a prompt alone equals attributing it inside a
left-padded batch with other prompts (padded keys masked, per-example rope
positions)."""

import jax
import jax.numpy as jnp
import numpy as np

import lxt_tpu
from lxt_tpu.attribution import input_relevance, select_logit
from lxt_tpu.models import llama as jllama
from lxt_tpu.pipeline import AttributionPipeline
import pytest

pytestmark = pytest.mark.slow


class ToyTokenizer:
    """Whitespace tokenizer over a fixed vocab (tests only)."""

    pad_token_id = 0

    def __init__(self, vocab_size=128):
        self.vocab_size = vocab_size

    def __call__(self, text):
        ids = [1 + (hash(w) % (self.vocab_size - 2)) for w in text.split()]
        return {"input_ids": ids}

    def convert_ids_to_tokens(self, ids):
        return [f"▁t{i}" for i in ids]


def _model():
    from lxt_tpu.models.registry import AttributionModel, _family_table

    cfg = jllama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, rms_eps=1e-6)
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    return AttributionModel("llama", cfg, params, lxt_tpu.attnlrp,
                            _family_table()["llama"]), cfg, params


def test_padding_invariance():
    model, cfg, params = _model()
    ids_short = np.random.RandomState(0).randint(1, 128, (1, 5))

    # unpadded single-prompt relevance
    embeds = jllama.embed(params, jnp.asarray(ids_short))

    def target(e):
        return select_logit(jllama.forward(params, cfg, e, lxt_tpu.attnlrp).logits)

    _, rel_solo = input_relevance(target, embeds)

    # the same prompt left-padded to length 9 inside a batch
    T = 9
    ids_pad = np.zeros((1, T), np.int32)
    mask = np.zeros((1, T), np.int32)
    ids_pad[0, T - 5:] = ids_short[0]
    mask[0, T - 5:] = 1
    embeds_pad = jllama.embed(params, jnp.asarray(ids_pad))

    def target_pad(e):
        logits = jllama.forward(params, cfg, e, lxt_tpu.attnlrp,
                                attention_mask=jnp.asarray(mask)).logits
        return select_logit(logits, position=-1)

    _, rel_pad = input_relevance(target_pad, embeds_pad)
    np.testing.assert_allclose(np.asarray(rel_pad[0, T - 5:]),
                               np.asarray(rel_solo[0]), rtol=0, atol=2e-5)


def test_pipeline_batches_variable_lengths():
    model, _, _ = _model()
    pipe = AttributionPipeline(model, ToyTokenizer())
    prompts = ["alpha beta gamma", "one two three four five six", "x y"]
    heatmaps = pipe(prompts)
    assert len(heatmaps) == 3
    for hm, p in zip(heatmaps, prompts):
        assert len(hm.tokens) == len(p.split())
        assert hm.relevance.shape == (len(hm.tokens),)
        assert np.isfinite(hm.relevance).all()
        assert abs(hm.relevance).max() <= 1.0 + 1e-6


def test_padding_invariance_gpt2_gemma3_mixtral():
    """attention_mask support across the other causal families: left-padded
    relevance equals the unpadded one."""
    from lxt_tpu.models import gemma3 as jg
    from lxt_tpu.models import gpt2 as jgpt2
    from lxt_tpu.models import mixtral as jmix

    rng = np.random.RandomState(1)

    def check(forward, embed_fn, cfg, params, extra=()):
        ids = rng.randint(1, 100, (1, 5))
        e = embed_fn(jnp.asarray(ids))
        def t(x):
            return select_logit(forward(params, cfg, x, lxt_tpu.attnlrp).logits)
        _, rel = input_relevance(t, e)

        T = 8
        ids_p = np.zeros((1, T), np.int32); ids_p[0, T-5:] = ids[0]
        mask = np.zeros((1, T), np.int32); mask[0, T-5:] = 1
        ep = embed_fn(jnp.asarray(ids_p))
        def tp(x):
            return select_logit(forward(params, cfg, x, lxt_tpu.attnlrp,
                                        attention_mask=jnp.asarray(mask)).logits)
        _, rel_p = input_relevance(tp, ep)
        np.testing.assert_allclose(np.asarray(rel_p[0, T-5:]),
                                   np.asarray(rel[0]), rtol=0, atol=3e-5)

    gcfg = jg.Gemma3Config(vocab_size=128, hidden_size=48, intermediate_size=96,
                           num_layers=2, num_heads=4, num_kv_heads=2, head_dim=12,
                           sliding_window=4, query_pre_attn_scalar=12,
                           layer_types=("sliding_attention", "full_attention"))
    gp = jg.init_params(gcfg, jax.random.PRNGKey(0))
    check(jg.forward, lambda i: jg.embed(gp, i, gcfg), gcfg, gp)

    pcfg = jgpt2.GPT2Config(vocab_size=128, hidden_size=48, num_layers=2,
                            num_heads=4, max_positions=64)
    pp = jgpt2.init_params(pcfg, jax.random.PRNGKey(1))
    check(jgpt2.forward, lambda i: jgpt2.embed(pp, i)[0], pcfg, pp)

    mcfg = jmix.MixtralConfig(vocab_size=128, hidden_size=48, intermediate_size=64,
                              num_layers=2, num_heads=4, num_kv_heads=2,
                              num_experts=4, experts_per_token=2)
    mp = jmix.init_params(mcfg, jax.random.PRNGKey(2))
    check(jmix.forward, lambda i: jmix.embed(mp, i), mcfg, mp)


def test_pipeline_per_example_values():
    """Each Heatmap.value is that prompt's OWN explained (max last-position)
    logit, not a batch-summed scalar (regression)."""
    model, cfg, params = _model()
    tok = ToyTokenizer()
    pipe = AttributionPipeline(model, tok)
    prompts = ["alpha beta gamma", "one two three four five"]
    heatmaps = pipe(prompts)

    for p, hm in zip(prompts, heatmaps):
        ids = jnp.asarray(tok(p)["input_ids"])[None]
        logits = jllama.forward(params, cfg, jllama.embed(params, ids),
                                lxt_tpu.attnlrp).logits
        expect = float(logits[0, -1].max())
        np.testing.assert_allclose(hm.value, expect, rtol=1e-5)

        # the pipeline's logits_at=-1 shortcut must not change relevance
        def tgt(e):
            return select_logit(jllama.forward(params, cfg, e,
                                               lxt_tpu.attnlrp).logits)
        _, rel_full = input_relevance(tgt, jllama.embed(params, ids))
        np.testing.assert_allclose(hm.raw_relevance, np.asarray(rel_full[0]),
                                   rtol=0, atol=2e-5)
    assert heatmaps[0].value != heatmaps[1].value


def test_pipeline_gamma_composites_get_distinct_programs():
    """Two gamma variants share the name 'attnlrp+gamma'; the jit cache must
    key on the composite OBJECT so they compile separately (regression)."""
    model, _, _ = _model()
    pipe = AttributionPipeline(model, ToyTokenizer())
    g1 = lxt_tpu.attnlrp.with_gamma(linear_gamma=0.25)
    g2 = lxt_tpu.attnlrp.with_gamma(linear_gamma=4.0)
    assert g1.name == g2.name

    hm1 = pipe(["alpha beta gamma"], composite=g1)[0]
    hm2 = pipe(["alpha beta gamma"], composite=g2)[0]
    assert len(pipe._jitted) == 2
    assert not np.allclose(hm1.raw_relevance, hm2.raw_relevance)


def test_pipeline_mesh_sharded_matches_single_device():
    """AttributionPipeline with mesh=: batch sharded over 'data', results
    identical to the unsharded pipeline (incl. the batch rounded up with
    fully-padded dummy rows)."""
    from lxt_tpu.parallel import make_mesh

    model, _, _ = _model()
    tok = ToyTokenizer()
    prompts = ["alpha beta gamma", "one two three four five six", "x y"]

    plain = AttributionPipeline(model, tok)
    sharded = AttributionPipeline(model, tok, mesh=make_mesh(data=4, model=2))

    hp = plain(prompts)
    hs = sharded(prompts)   # B=3 rounds up to 4 (one dummy row)
    assert len(hs) == len(hp) == 3
    for a, b in zip(hp, hs):
        np.testing.assert_allclose(a.value, b.value, rtol=1e-5)
        np.testing.assert_allclose(a.raw_relevance, b.raw_relevance,
                                   rtol=0, atol=1e-4)


def test_pipeline_bucket_batch():
    """bucket_batch=True rounds ragged batch sizes up to powers of two
    (dummy fully-padded rows), so different coalesced sizes share compiled
    programs — and results match the unbucketed pipeline exactly."""
    model, _, _ = _model()
    tok = ToyTokenizer()
    plain = AttributionPipeline(model, tok)
    bucketed = AttributionPipeline(model, tok, bucket_batch=True)

    prompts = ["alpha beta gamma", "one two three four five", "x y"]
    hp = plain(prompts)
    hb = bucketed(prompts)          # B=3 -> bucket 4
    hb2 = bucketed(prompts[:4])     # B=3 again -> same bucket
    assert len(bucketed._jitted) == 1
    for a, b in zip(hp, hb):
        assert a.tokens == b.tokens
        np.testing.assert_allclose(b.raw_relevance, a.raw_relevance,
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(b.value, a.value, rtol=1e-6)


def test_pipeline_mesh_topk_matches_single_device():
    """topk>1 under mesh=: the [K, B(, T)] outputs shard batch-second; maps
    and candidate order match the unsharded topk pipeline."""
    from lxt_tpu.parallel import make_mesh

    model, _, _ = _model()
    tok = ToyTokenizer()
    prompts = ["alpha beta gamma", "one two three four", "x y"]

    plain = AttributionPipeline(model, tok)
    sharded = AttributionPipeline(model, tok, mesh=make_mesh(data=4, model=2))

    hp = plain(prompts, topk=3)
    hs = sharded(prompts, topk=3)
    assert len(hs) == len(hp) == 3
    for cp, cs in zip(hp, hs):
        assert [c.target_token_id for c in cp] == \
            [c.target_token_id for c in cs]
        for a, b in zip(cp, cs):
            np.testing.assert_allclose(a.value, b.value, rtol=1e-5)
            np.testing.assert_allclose(a.raw_relevance, b.raw_relevance,
                                       rtol=0, atol=1e-4)
