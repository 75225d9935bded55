"""Golden end-to-end parity: Gemma 3 (text) vs the torch reference.

Exercises the Gemma specifics: scaled embeddings, (1+w) RMSNorms with the
custom stop-grad _norm patch, sandwich norms, per-head q/k norms, and the
local(sliding)/global attention alternation with two rope bases."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lxt_tpu
from lxt_tpu.attribution import input_relevance, select_logit
from lxt_tpu.models import gemma3 as jg

pytestmark = pytest.mark.golden

_CACHE = {}


@pytest.fixture(scope="session")
def gemma_golden(reference_lxt, tmp_path_factory):
    def get(composite):
        if composite not in _CACHE:
            out = tmp_path_factory.mktemp("golden") / f"gemma3-{composite}.npz"
            script = os.path.join(os.path.dirname(__file__), "_reference_golden.py")
            r = subprocess.run(
                [sys.executable, script, composite, str(out), "gemma3"],
                capture_output=True, text=True)
            if r.returncode != 0:
                raise RuntimeError(r.stdout + r.stderr)
            _CACHE[composite] = dict(np.load(out))
        return _CACHE[composite]
    return get


@pytest.mark.parametrize("composite_name", ["attnlrp", "cp_lrp"])
def test_gemma3_parity(gemma_golden, composite_name):
    data = gemma_golden(composite_name)
    ids, ref_logits, ref_rel = (data["gemma3.ids"], data["gemma3.logits"],
                                data["gemma3.rel"])

    from tests._reference_golden import build_tiny
    _, _, hf_model = build_tiny("gemma3")
    cfg = jg.Gemma3Config.from_hf(hf_model.config)
    params = jg.params_from_hf(hf_model.state_dict(), cfg)
    composite = {"attnlrp": lxt_tpu.attnlrp, "cp_lrp": lxt_tpu.cp_lrp}[composite_name]

    embeds = jg.embed(params, jnp.asarray(ids), cfg)

    logits = jg.forward(params, cfg, embeds, composite).logits
    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=0, atol=3e-4)

    def target(e):
        return select_logit(jg.forward(params, cfg, e, composite).logits)

    _, rel = jax.jit(lambda e: input_relevance(target, e))(embeds)
    scale = np.abs(ref_rel).max()
    np.testing.assert_allclose(np.asarray(rel), ref_rel, rtol=0, atol=5e-4 * max(scale, 1.0))
    a, b = np.asarray(rel).ravel(), ref_rel.ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.9999
