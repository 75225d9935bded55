"""Perturbation-curve faithfulness evaluation (utils/faithfulness.py)."""

import jax
import jax.numpy as jnp
import numpy as np

import lxt_tpu
from lxt_tpu.attribution import input_relevance
from lxt_tpu.utils.faithfulness import aopc_scores, perturbation_curve


def test_exact_on_linear_model():
    """For a linear target the G*I relevance is exact, so ablating the top-k
    tokens removes exactly their summed contributions."""
    B, T, D = 2, 7, 5
    w = jax.random.normal(jax.random.PRNGKey(0), (D,))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))

    def logit_fn(e):
        return (e @ w).sum(-1)  # [B]

    _, rel = input_relevance(lambda e: logit_fn(e).sum(), x)
    curve = perturbation_curve(logit_fn, x, rel, steps=T, order="morf")

    contrib = np.asarray(x @ w)                      # [B, T] per-token value
    order = np.argsort(-np.asarray(rel), axis=-1)
    full = contrib.sum(-1)
    for s in range(T + 1):
        k = s
        for b in range(B):
            expect = full[b] - contrib[b, order[b, :k]].sum()
            np.testing.assert_allclose(float(curve.values[s, b]), expect,
                                       rtol=1e-5, atol=1e-5)
    # step 0 is the unperturbed logit
    np.testing.assert_allclose(np.asarray(curve.values[0]), full,
                               rtol=1e-5, atol=1e-5)


def test_attnlrp_beats_random_on_llama():
    """Model-level sanity: AttnLRP relevance yields morf > random > lerf
    AOPC on a (random-weight) llama — the faithfulness ordering the paper
    establishes."""
    from lxt_tpu.models import llama as jllama

    cfg = jllama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2)
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 24), 0, 128)
    embeds = jllama.embed(params, ids)

    def logit_fn(e):
        out = jllama.forward(params, cfg, e, lxt_tpu.attnlrp, logits_at=-1)
        return out.logits[:, -1, :].max(-1)

    _, rel = input_relevance(lambda e: logit_fn(e).sum(), embeds)
    morf, lerf, rand = aopc_scores(jax.jit(logit_fn), embeds, rel, steps=8)
    # averaged over the batch the faithfulness ordering must hold
    assert float(morf.mean()) > float(rand.mean()) > float(lerf.mean()), (
        float(morf.mean()), float(rand.mean()), float(lerf.mean()))


def test_padding_not_ablated():
    """valid_mask: padded positions are never counted in the fractions."""
    B, T, D = 1, 8, 4
    x = jnp.ones((B, T, D))
    rel = jnp.arange(T, dtype=jnp.float32)[None]
    valid = jnp.asarray([[0, 0, 1, 1, 1, 1, 1, 1]], bool)

    def logit_fn(e):
        return e.sum((-1, -2))

    curve = perturbation_curve(logit_fn, x, rel, steps=6, order="morf",
                               valid_mask=valid)
    # full ablation removes exactly the 6 valid tokens' mass (6*D), never
    # touching the 2 padded ones
    np.testing.assert_allclose(float(curve.values[0, 0]), 8 * D)
    np.testing.assert_allclose(float(curve.values[-1, 0]), 2 * D)


# ---------------------------------------------------------------------------
# auc / abpc / faithfulness_report
# ---------------------------------------------------------------------------

def test_auc_trapezoid():
    from lxt_tpu.utils.faithfulness import auc
    vals = jnp.asarray([[4.0], [2.0], [0.0]])        # line 4 -> 0 over [0, 1]
    np.testing.assert_allclose(float(auc(vals)[0]), 2.0, rtol=1e-6)


def test_report_abpc_positive_for_exact_attribution():
    """Linear model with positive contributions: the exact attribution's
    ABPC must be positive and the auc ordering morf <= random <= lerf
    deterministic."""
    from lxt_tpu.utils.faithfulness import faithfulness_report

    rng = np.random.RandomState(1)
    w = jnp.asarray(np.abs(rng.randn(4)).astype(np.float32))
    x = jnp.asarray(np.abs(rng.randn(2, 10, 4)).astype(np.float32))

    def logit_fn(e):
        return (e @ w).sum(-1)

    _, rel = input_relevance(lambda e: logit_fn(e).sum(), x)
    rep = faithfulness_report(logit_fn, x, rel, steps=10,
                              key=jax.random.PRNGKey(0))
    assert np.all(np.asarray(rep["auc_morf"]) <= np.asarray(rep["auc_random"]))
    assert np.all(np.asarray(rep["auc_random"]) <= np.asarray(rep["auc_lerf"]))
    assert np.all(np.asarray(rep["abpc"]) > 0)
    # aopc and auc agree on direction: aopc_morf = f(x) - mean(curve tail)
    assert np.all(np.asarray(rep["aopc_morf"]) > np.asarray(rep["aopc_lerf"]))


def test_report_jittable_and_mean_baseline():
    from lxt_tpu.utils.faithfulness import faithfulness_report, perturbation_curve

    w = jax.random.normal(jax.random.PRNGKey(2), (4,))
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 4))

    def logit_fn(e):
        return (e @ w).sum(-1)

    _, rel = input_relevance(lambda e: logit_fn(e).sum(), x)

    @jax.jit
    def run(xx, rr):
        return faithfulness_report(logit_fn, xx, rr, steps=4)["abpc"]

    assert np.isfinite(np.asarray(run(x, rel))).all()

    # 'mean' baseline == passing the mean embedding explicitly
    mean_vec = x.mean(-2, keepdims=True)
    c1 = perturbation_curve(logit_fn, x, rel, steps=3, baseline="mean")
    c2 = perturbation_curve(logit_fn, x, rel, steps=3, baseline=mean_vec)
    np.testing.assert_allclose(np.asarray(c1.values), np.asarray(c2.values),
                               rtol=1e-6)
    import pytest
    with pytest.raises(ValueError, match="mean"):
        perturbation_curve(logit_fn, x, rel, baseline="nope")


def test_random_key_changes_control():
    from lxt_tpu.utils.faithfulness import perturbation_curve

    w = jax.random.normal(jax.random.PRNGKey(4), (4,))
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 4))

    def logit_fn(e):
        return (e @ w).sum(-1)

    rel = jnp.ones((1, 16))
    c1 = perturbation_curve(logit_fn, x, rel, order="random",
                            key=jax.random.PRNGKey(0))
    c2 = perturbation_curve(logit_fn, x, rel, order="random",
                            key=jax.random.PRNGKey(7))
    assert float(jnp.abs(c1.values - c2.values).max()) > 1e-6


def test_mean_baseline_ignores_padding():
    """Regression: baseline='mean' must average VALID positions only —
    padding must not drag the replacement embedding."""
    from lxt_tpu.utils.faithfulness import perturbation_curve

    x = jnp.concatenate([jnp.full((1, 2, 4), 100.0),     # pad rows
                         jnp.ones((1, 6, 4))], axis=1)
    valid = jnp.asarray([[0, 0, 1, 1, 1, 1, 1, 1]], bool)
    rel = jnp.arange(8, dtype=jnp.float32)[None]

    def logit_fn(e):
        return e.sum((-1, -2))

    curve = perturbation_curve(logit_fn, x, rel, steps=6, order="morf",
                               baseline="mean", valid_mask=valid)
    # valid-only mean == 1.0, so a full flip leaves the total unchanged:
    # 2 pad rows (100 each) + 6 flipped-to-mean rows (1 each)
    want = 2 * 4 * 100.0 + 6 * 4 * 1.0
    np.testing.assert_allclose(float(curve.values[-1, 0]), want, rtol=1e-5)


def test_attribution_model_faithfulness_method():
    """AttributionModel.faithfulness: one-call report; attention_mask
    doubles as valid_mask and an unpadded example's scores are unchanged
    by the presence of padding elsewhere in the batch."""
    import lxt_tpu
    from lxt_tpu.models import llama as jllama, registry

    cfg = jllama.LlamaConfig(vocab_size=64, hidden_size=32,
                             intermediate_size=64, num_layers=2,
                             num_heads=2, num_kv_heads=2)
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    model = registry.AttributionModel(
        family="llama", cfg=cfg, params=params, composite=lxt_tpu.attnlrp,
        _fns={"embed": lambda p, ids, c: jllama.embed(p, ids),
              "forward": jllama.forward})

    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 64)
    rep = model.faithfulness(ids, steps=4, key=jax.random.PRNGKey(2))
    assert rep["morf"].values.shape == (5, 2)
    assert np.isfinite(np.asarray(rep["abpc"])).all()

    mask = jnp.asarray([[0, 0] + [1] * 8, [1] * 10])
    rep_pad = model.faithfulness(ids, steps=4, attention_mask=mask,
                                 key=jax.random.PRNGKey(2))
    # row 1 is unpadded: its scores must not move when row 0 is padded
    np.testing.assert_allclose(float(rep_pad["abpc"][1]),
                               float(rep["abpc"][1]), rtol=1e-4)


def test_faithfulness_pins_masked_argmax():
    """With a padded batch and token=None, the pinned 'unperturbed argmax'
    must come from a forward that applies the SAME padding kwargs as the
    evaluated forwards — not from a pad-attending logits() call."""
    import lxt_tpu
    from lxt_tpu.models import llama as jllama, registry

    cfg = jllama.LlamaConfig(vocab_size=64, hidden_size=32,
                             intermediate_size=64, num_layers=2,
                             num_heads=2, num_kv_heads=2)
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    model = registry.AttributionModel(
        family="llama", cfg=cfg, params=params, composite=lxt_tpu.attnlrp,
        _fns={"embed": lambda p, ids, c: jllama.embed(p, ids),
              "forward": jllama.forward})

    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 64)
    mask = jnp.asarray([[0, 0, 0, 0] + [1] * 6, [1] * 10])

    # ground truth: argmax of the MASK-APPLIED forward
    logits = jllama.forward(params, cfg, jllama.embed(params, ids),
                            lxt_tpu.attnlrp, attention_mask=mask).logits
    tok = jnp.argmax(logits[:, -1, :], axis=-1)

    rep_auto = model.faithfulness(ids, steps=3, attention_mask=mask,
                                  key=jax.random.PRNGKey(2))
    rep_pinned = model.faithfulness(ids, steps=3, attention_mask=mask,
                                    token=tok, key=jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(rep_auto["morf"].values),
                               np.asarray(rep_pinned["morf"].values),
                               rtol=1e-5)


def test_faithfulness_array_baseline_not_cached_by_shape():
    """Two different baseline ARRAYS of identical shape/dtype must not
    silently share one compiled program (the baseline rides as a traced
    argument, not baked into the closure)."""
    import lxt_tpu
    from lxt_tpu.models import llama as jllama, registry

    cfg = jllama.LlamaConfig(vocab_size=64, hidden_size=32,
                             intermediate_size=64, num_layers=1,
                             num_heads=2, num_kv_heads=2)
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    model = registry.AttributionModel(
        family="llama", cfg=cfg, params=params, composite=lxt_tpu.attnlrp,
        _fns={"embed": lambda p, ids, c: jllama.embed(p, ids),
              "forward": jllama.forward})

    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, 64)
    b0 = jnp.zeros((1, 1, 32), jnp.float32)
    b1 = jnp.full((1, 1, 32), 3.0, jnp.float32)
    rep0 = model.faithfulness(ids, steps=3, baseline=b0,
                              key=jax.random.PRNGKey(2))
    rep1 = model.faithfulness(ids, steps=3, baseline=b1,
                              key=jax.random.PRNGKey(2))
    # zero-array baseline agrees with the static "zero" baseline
    rep_zero = model.faithfulness(ids, steps=3, baseline="zero",
                                  key=jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(rep0["morf"].values),
                               np.asarray(rep_zero["morf"].values),
                               rtol=1e-5)
    # a different baseline array must change the perturbed curves
    assert not np.allclose(np.asarray(rep0["morf"].values),
                           np.asarray(rep1["morf"].values))
