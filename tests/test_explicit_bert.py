"""Model-level validation of the explicit op set on an ENCODER layout: a
BERT assembled from ``lf.*`` ops (models/bert_explicit.py) vs the
reference's vendored explicit BERT (LayerNormEpsilon-everywhere composite,
/root/reference/lxt/explicit/models/bert.py:60-65) and our efficient path
(VERDICT r2 next #10)."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

import lxt_tpu
from lxt_tpu.models import bert as jbert
from lxt_tpu.models import bert_explicit as jexb
import pytest

pytestmark = pytest.mark.golden


def _tiny():
    from tests._reference_golden import build_tiny_explicit

    model, _ = build_tiny_explicit("bert")
    cfg = jbert.BertConfig.from_hf(model.config)
    params = jbert.params_from_hf(model.state_dict(), cfg)
    return cfg, params


def test_explicit_bert_matches_reference_golden(reference_lxt, tmp_path):
    out = tmp_path / "bert_explicit.npz"
    script = os.path.join(os.path.dirname(__file__), "_reference_golden.py")
    r = subprocess.run(
        [sys.executable, script, "explicit", str(out), "bert"],
        capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(r.stdout + r.stderr)
    data = dict(np.load(out))
    ids, ref_logits, ref_rel = (data["bert.ids"], data["bert.logits"],
                                data["bert.rel"])

    cfg, params = _tiny()
    embeds = jbert.embed(params, jnp.asarray(ids))

    logits = jexb.forward(params, cfg, embeds).logits
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               rtol=0, atol=3e-4)

    def target(e):
        return jexb.forward(params, cfg, e).logits[0].max()

    from lxt_tpu.models.llama_explicit import explicit_input_relevance
    _, rel = jax.jit(
        lambda e: explicit_input_relevance(target, e))(embeds)

    a, b = np.asarray(rel).ravel(), ref_rel.ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.9999, cos
    scale = np.abs(b).max()
    np.testing.assert_allclose(a, b, rtol=0, atol=6e-3 * max(scale, 1e-6))


def test_explicit_bert_matches_efficient_path():
    """Cross-path forward equivalence inside our framework (the efficient
    BERT applies the same rules via G*I; relevance equivalence between the
    two conventions is pinned per-op in test_rules.py)."""
    cfg, params = _tiny()
    ids = np.random.RandomState(3).randint(0, 256, (1, 10))
    embeds = jbert.embed(params, jnp.asarray(ids))

    le = jexb.forward(params, cfg, embeds).logits
    lg = jbert.forward(params, cfg, embeds, lxt_tpu.attnlrp).logits
    np.testing.assert_allclose(np.asarray(le), np.asarray(lg),
                               rtol=0, atol=1e-5)


def test_explicit_bert_attention_mask():
    """Padded positions under the explicit mask path: finite relevance, and
    the mask actually changes the logits."""
    cfg, params = _tiny()
    ids = np.random.RandomState(4).randint(0, 256, (1, 10))
    mask = np.ones((1, 10), np.int32)
    mask[0, 7:] = 0
    embeds = jbert.embed(params, jnp.asarray(ids))

    l_mask = jexb.forward(params, cfg, embeds,
                          attention_mask=jnp.asarray(mask)).logits
    l_full = jexb.forward(params, cfg, embeds).logits
    assert not np.allclose(np.asarray(l_mask), np.asarray(l_full), atol=1e-5)

    def target(e):
        return jexb.forward(params, cfg, e,
                            attention_mask=jnp.asarray(mask)).logits[0].max()

    from lxt_tpu.models.llama_explicit import explicit_input_relevance
    _, rel = explicit_input_relevance(target, embeds)
    assert np.isfinite(np.asarray(rel)).all()
