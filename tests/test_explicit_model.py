"""Model-level validation of the explicit op set: a Llama assembled from
``lf.*`` ops (models/llama_explicit.py) must match

1. the reference's vendored explicit Llama (same rules, same seeding:
   ``max_logit.backward(max_logit)``) — golden from the ``explicit``
   subprocess, and
2. our own efficient Gradient*Input path (the two paths implement the same
   math; the reference documents this equivalence in
   docs/source/under-the-hood-*.rst).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lxt_tpu
from lxt_tpu.attribution import input_relevance, select_logit
from lxt_tpu.models import llama as jllama
from lxt_tpu.models import llama_explicit as jex
from tests.test_parity_explicit import golden_explicit  # noqa: F401 (fixture)

pytestmark = pytest.mark.golden


def _tiny():
    from tests._reference_golden import build_tiny_explicit

    model, _ = build_tiny_explicit("llama")
    cfg = jllama.LlamaConfig.from_hf(model.config)
    params = jllama.params_from_hf(model.state_dict(), cfg)
    return cfg, params


def test_explicit_model_matches_reference_golden(golden_explicit):
    data = golden_explicit
    ids = data["llama.ids"]
    ref_logits = data["llama.logits"]
    ref_rel = data["llama.rel"]

    cfg, params = _tiny()
    embeds = jllama.embed(params, jnp.asarray(ids))

    logits = jex.forward(params, cfg, embeds, lxt_tpu.attnlrp).logits
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               rtol=0, atol=3e-4)

    def target(e):
        return select_logit(jex.forward(params, cfg, e, lxt_tpu.attnlrp).logits)

    _, rel = jax.jit(
        lambda e: jex.explicit_input_relevance(target, e))(embeds)

    a, b = np.asarray(rel).ravel(), ref_rel.ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.9999, cos
    # small drift is expected: the reference masks with torch.finfo.min
    # (not -inf) inside lf.add2/lf.softmax, perturbing the epsilon terms
    scale = np.abs(b).max()
    np.testing.assert_allclose(a, b, rtol=0, atol=6e-3 * max(scale, 1e-6))


@pytest.mark.parametrize("composite_name", ["attnlrp", "cp_lrp"])
def test_explicit_model_matches_efficient_path(composite_name):
    """Cross-path equivalence inside our own framework: the explicit ops and
    the Gradient*Input rules compute the same relevance."""
    cfg, params = _tiny()
    composite = {"attnlrp": lxt_tpu.attnlrp, "cp_lrp": lxt_tpu.cp_lrp}[composite_name]
    ids = np.random.RandomState(3).randint(0, 256, (1, 10))
    embeds = jllama.embed(params, jnp.asarray(ids))

    # forward equivalence
    le = jex.forward(params, cfg, embeds, composite).logits
    lg = jllama.forward(params, cfg, embeds, composite).logits
    np.testing.assert_allclose(np.asarray(le), np.asarray(lg), rtol=0, atol=1e-5)

    def t_ex(e):
        return select_logit(jex.forward(params, cfg, e, composite).logits)

    def t_gi(e):
        return select_logit(jllama.forward(params, cfg, e, composite).logits)

    _, rel_ex = jex.explicit_input_relevance(t_ex, embeds)
    _, rel_gi = input_relevance(t_gi, embeds)

    a, b = np.asarray(rel_ex).ravel(), np.asarray(rel_gi).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.999, cos


def test_explicit_model_honors_sliding_window():
    """The explicit path must apply cfg.sliding_window like the efficient
    path (models/llama.py:275) — a Mistral-style config on T > window used
    to silently compute full attention here."""
    import dataclasses

    cfg = jllama.LlamaConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2, rms_eps=1e-6,
        dtype="float32")
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    T = 12
    ids = np.random.RandomState(5).randint(0, 256, (1, T))
    embeds = jllama.embed(params, jnp.asarray(ids))

    cfg_win = dataclasses.replace(cfg, sliding_window=4)
    le = jex.forward(params, cfg_win, embeds, lxt_tpu.attnlrp).logits
    lg = jllama.forward(params, cfg_win, embeds, lxt_tpu.attnlrp).logits
    np.testing.assert_allclose(np.asarray(le), np.asarray(lg),
                               rtol=0, atol=1e-5)

    # and the window genuinely changes the computation at T > window
    le_full = jex.forward(params, cfg, embeds, lxt_tpu.attnlrp).logits
    assert np.abs(np.asarray(le) - np.asarray(le_full)).max() > 1e-4


def test_explicit_latent_relevance_matches_efficient(reference_lxt):
    """Explicit-path latent taps (cotangent IS relevance, reference
    latent-feature-attribution.rst backward hooks) agree with the efficient
    path's hidden*grad latent trace."""
    from lxt_tpu.attribution import latent_relevance
    from lxt_tpu.models.llama_explicit import explicit_latent_relevance

    cfg, params = _tiny()
    L = cfg.num_layers
    ids = np.random.RandomState(7).randint(0, 256, (1, 8))
    embeds = jllama.embed(params, jnp.asarray(ids))
    B, T, D = embeds.shape

    def fwd_ex(e, probes):
        return select_logit(jex.forward(params, cfg, e, lxt_tpu.attnlrp,
                                        probes=probes).logits)

    _, in_ex, lat_ex = explicit_latent_relevance(fwd_ex, embeds, (L, B, T, D))

    def fwd_gi(e, probes):
        out = jllama.forward(params, cfg, e, lxt_tpu.attnlrp, probes=probes,
                             output_hidden_states=True)
        return select_logit(out.logits), out.hidden_states

    _, in_gi, lat_gi = latent_relevance(fwd_gi, embeds, (L, B, T, D),
                                        sum_features=True)

    a, b = np.asarray(lat_ex).ravel(), np.asarray(lat_gi).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.999, cos
    # input relevance agrees across conventions too
    a, b = np.asarray(in_ex).ravel(), np.asarray(in_gi).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.999, cos
