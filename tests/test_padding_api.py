"""Padding-aware one-call attribution + per-call sanitizer API.

The reference handles variable-length batches implicitly through the HF
attention_mask (examples/quantized_llama.py:35-44); here the model-level
``attribute``/``attribute_multi``/``attribute_topk`` take ``kv_begin``/
``attention_mask`` (``kv_end`` for BERT) directly. The invariance these
tests pin down: a left-padded batch must reproduce the per-prompt unpadded
results exactly at the real positions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lxt_tpu
from lxt_tpu.models import llama as jl
from lxt_tpu.models.registry import AttributionModel, _family_table

CFG = jl.LlamaConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                     num_layers=2, num_heads=4, num_kv_heads=2, rms_eps=1e-6)


def _model(seed=0):
    params = jl.init_params(CFG, jax.random.PRNGKey(seed))
    return AttributionModel("llama", CFG, params, lxt_tpu.attnlrp,
                            _family_table()["llama"])


def _padded_batch():
    """Two prompts of different lengths, left-padded to T=8."""
    rng = np.random.RandomState(3)
    a = rng.randint(1, CFG.vocab_size, 8)          # full row
    b = rng.randint(1, CFG.vocab_size, 5)          # 3 pad positions
    ids = np.zeros((2, 8), np.int64)
    ids[0] = a
    ids[1, 3:] = b
    kv_begin = np.array([0, 3], np.int32)
    return ids, kv_begin, a, b


def test_attribute_padded_matches_per_prompt():
    m = _model()
    ids, kv_begin, a, b = _padded_batch()

    val, rel = m.attribute(ids, kv_begin=kv_begin)
    val_a, rel_a = m.attribute(a[None])
    val_b, rel_b = m.attribute(b[None])

    np.testing.assert_allclose(np.asarray(rel)[0], np.asarray(rel_a)[0],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rel)[1, 3:], np.asarray(rel_b)[0],
                               rtol=1e-4, atol=1e-6)
    # pad positions carry (numerically) no relevance
    np.testing.assert_allclose(np.asarray(rel)[1, :3], 0.0, atol=1e-6)


def test_attribute_attention_mask_matches_kv_begin():
    m = _model()
    ids, kv_begin, _, _ = _padded_batch()
    mask = (np.arange(8)[None] >= kv_begin[:, None]).astype(np.int64)

    _, rel_kb = m.attribute(ids, kv_begin=kv_begin)
    _, rel_am = m.attribute(ids, attention_mask=mask)
    np.testing.assert_allclose(np.asarray(rel_kb), np.asarray(rel_am),
                               rtol=1e-4, atol=1e-6)


def test_attribute_topk_and_multi_padded():
    m = _model()
    ids, kv_begin, a, b = _padded_batch()

    toks, vals, rel = m.attribute_topk(ids, k=2, kv_begin=kv_begin)
    toks_b, vals_b, rel_b = m.attribute_topk(b[None], k=2)
    np.testing.assert_array_equal(np.asarray(toks)[:, 1],
                                  np.asarray(toks_b)[:, 0])
    np.testing.assert_allclose(np.asarray(rel)[:, 1, 3:],
                               np.asarray(rel_b)[:, 0],
                               rtol=1e-4, atol=1e-6)

    cand = np.array([5, 9])
    vals_m, rel_m = m.attribute_multi(ids, cand, kv_begin=kv_begin)
    vals_u, rel_u = m.attribute_multi(b[None], cand)
    np.testing.assert_allclose(np.asarray(rel_m)[:, 1, 3:],
                               np.asarray(rel_u)[:, 0],
                               rtol=1e-4, atol=1e-6)


def test_padding_arg_validation():
    m = _model()
    ids = np.arange(6)[None] + 1
    with pytest.raises(ValueError, match="BERT .*right-padded"):
        from lxt_tpu.models.registry import _padding_args
        _padding_args("bert", np.array([0]), None)
    with pytest.raises(ValueError, match="kv_end is the BERT"):
        m.attribute(ids, kv_end=np.array([6]))
    with pytest.raises(ValueError, match="not both"):
        m.attribute(ids, kv_begin=np.array([0]),
                    attention_mask=np.ones((1, 6)))


def test_bert_kv_end_matches_per_prompt():
    from lxt_tpu.models import bert as jb
    from lxt_tpu.models.registry import _family_table

    cfg = jb.BertConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                        num_layers=2, num_heads=4, num_labels=3)
    params = jb.init_params(cfg, jax.random.PRNGKey(0))
    m = AttributionModel("bert", cfg, params, lxt_tpu.attnlrp,
                         _family_table()["bert"])
    rng = np.random.RandomState(5)
    a = rng.randint(1, cfg.vocab_size, 8)
    b = rng.randint(1, cfg.vocab_size, 5)
    ids = np.zeros((2, 8), np.int64)
    ids[0] = a
    ids[1, :5] = b                                  # right padding
    _, rel = m.attribute(ids, kv_end=np.array([8, 5]))
    _, rel_b = m.attribute(b[None])
    np.testing.assert_allclose(np.asarray(rel)[1, :5], np.asarray(rel_b)[0],
                               rtol=1e-4, atol=1e-6)


def test_check_nan_raises_on_nan_weights():
    """check='nan' embeds checkify assertions in the rules' backwards; a
    poisoned weight makes them fire — even when an UNCHECKED program for
    the same shapes was compiled and cached first (the trace-time-flag
    footgun the per-call API removes)."""
    m = _model()
    ids = np.arange(1, 7)[None]
    m.attribute(ids)                       # cache the unchecked program
    bad = jax.tree_util.tree_map(lambda x: x, m.params)
    bad["layers"]["wq"] = bad["layers"]["wq"].at[0, 0, 0].set(jnp.nan)
    m.params = bad
    with pytest.raises(Exception, match="NaN/Inf relevance"):
        m.attribute(ids, check="nan")


def test_check_clean_run_and_validation():
    m = _model()
    ids = np.arange(1, 7)[None]
    val, rel = m.attribute(ids, check="nan")
    assert bool(jnp.isfinite(rel).all())
    # conservation mode traces and runs (redistribution semantics)
    val_c, rel_c = m.attribute(ids, check="conservation")
    assert rel_c.shape == rel.shape
    with pytest.raises(ValueError, match="check must be one of"):
        m.attribute(ids, check="bogus")
