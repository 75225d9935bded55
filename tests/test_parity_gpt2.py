"""Golden end-to-end parity: GPT-2 vs the torch reference (both composites).

The reference recommends CP-LRP for GPT-2 (lxt/efficient/models/gpt2.py:24-26)
but exports both; we test both.
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
from lxt_tpu.models import gpt2 as jgpt2

pytestmark = pytest.mark.golden

_CACHE = {}


@pytest.fixture(scope="session")
def gpt2_golden(reference_lxt, tmp_path_factory):
    def get(composite):
        if composite not in _CACHE:
            out = tmp_path_factory.mktemp("golden") / f"gpt2-{composite}.npz"
            script = os.path.join(os.path.dirname(__file__), "_reference_golden.py")
            subprocess.run(
                [sys.executable, script, composite, str(out), "gpt2"],
                check=True, capture_output=True, text=True)
            _CACHE[composite] = dict(np.load(out))
        return _CACHE[composite]
    return get


@pytest.mark.parametrize("composite_name", ["attnlrp", "cp_lrp"])
def test_gpt2_parity(gpt2_golden, composite_name):
    data = gpt2_golden(composite_name)
    ids, ref_logits, ref_rel = data["gpt2.ids"], data["gpt2.logits"], data["gpt2.rel"]

    from tests._reference_golden import build_tiny
    _, _, hf_model = build_tiny("gpt2")
    cfg = jgpt2.GPT2Config.from_hf(hf_model.config)
    params = jgpt2.params_from_hf(hf_model.state_dict(), cfg)
    composite = {"attnlrp": lxt_tpu.attnlrp, "cp_lrp": lxt_tpu.cp_lrp}[composite_name]

    tok_embeds, _ = jgpt2.embed(params, jnp.asarray(ids))

    logits = jgpt2.forward(params, cfg, tok_embeds, composite).logits
    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=0, atol=2e-4)

    def target(e):
        return select_logit(jgpt2.forward(params, cfg, e, composite).logits)

    _, rel = jax.jit(lambda e: input_relevance(target, e))(tok_embeds)
    scale = np.abs(ref_rel).max()
    np.testing.assert_allclose(np.asarray(rel), ref_rel, rtol=0, atol=5e-4 * max(scale, 1.0))
    a, b = np.asarray(rel).ravel(), ref_rel.ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.9999
