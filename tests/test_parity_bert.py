"""Golden end-to-end parity: BERT classification attribution vs the torch
reference (its vendored patched modeling_bert). The reference exports only
AttnLRP for BERT (efficient/models/bert.py:68-72)."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lxt_tpu
from lxt_tpu.attribution import input_relevance
from lxt_tpu.models import bert as jbert

pytestmark = pytest.mark.golden

_CACHE = {}


@pytest.fixture(scope="session")
def bert_golden(reference_lxt, tmp_path_factory):
    if "g" not in _CACHE:
        out = tmp_path_factory.mktemp("golden") / "bert-attnlrp.npz"
        script = os.path.join(os.path.dirname(__file__), "_reference_golden.py")
        r = subprocess.run(
            [sys.executable, script, "attnlrp", str(out), "bert"],
            capture_output=True, text=True)
        if r.returncode != 0:
            raise RuntimeError(r.stdout + r.stderr)
        _CACHE["g"] = dict(np.load(out))
    return _CACHE["g"]


def test_bert_parity(bert_golden):
    data = bert_golden
    ids, ref_logits, ref_rel = data["bert.ids"], data["bert.logits"], data["bert.rel"]

    from tests._reference_golden import build_tiny
    _, _, hf_model = build_tiny("bert")
    cfg = jbert.BertConfig.from_hf(hf_model.config)
    params = jbert.params_from_hf(hf_model.state_dict(), cfg)

    embeds = jbert.embed(params, jnp.asarray(ids))
    mask = jnp.ones(ids.shape, jnp.int32)

    out = jbert.forward(params, cfg, embeds, lxt_tpu.attnlrp, attention_mask=mask)
    np.testing.assert_allclose(np.asarray(out.logits), ref_logits, rtol=0, atol=2e-4)

    def target(e):
        logits = jbert.forward(params, cfg, e, lxt_tpu.attnlrp,
                               attention_mask=mask).logits
        return logits.max(axis=-1).sum()

    _, rel = jax.jit(lambda e: input_relevance(target, e))(embeds)
    scale = np.abs(ref_rel).max()
    np.testing.assert_allclose(np.asarray(rel), ref_rel, rtol=0, atol=5e-4 * max(scale, 1.0))
    a, b = np.asarray(rel).ravel(), ref_rel.ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.9999
