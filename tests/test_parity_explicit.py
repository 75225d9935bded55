"""Golden relevance parity vs the reference EXPLICIT path (Mixtral, Phi-3,
and Llama as a cross-path control).

The reference supports Mixtral/Phi-3 only through its explicit path: vendored
modeling files with ``lf.*`` calls plus a registered Composite
(``lxt/explicit/models/mixtral.py:1221-1249``, ``phi3.py:71-77``), seeded
``max_logit.backward(max_logit)`` so the input-embedding grad IS the
relevance. Our efficient Gradient*Input path must reproduce those relevances:
the explicit rules (epsilon linear, uniform matmul/mul, Deep-Taylor softmax)
are exactly what G*I computes implicitly (tests/test_rules.py proves the
op-level identities; this file pins the MODEL-level equivalence).

Goldens come from ``tests/_reference_golden.py explicit`` subprocesses.
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
from lxt_tpu.models import mixtral as jmix

pytestmark = pytest.mark.golden

FAMILIES = ["mixtral", "phi3", "llama"]
_CACHE = {}


@pytest.fixture(scope="session")
def golden_explicit(reference_lxt, tmp_path_factory):
    if "data" not in _CACHE:
        out = tmp_path_factory.mktemp("golden_explicit") / "explicit.npz"
        script = os.path.join(os.path.dirname(__file__), "_reference_golden.py")
        r = subprocess.run(
            [sys.executable, script, "explicit", str(out)] + FAMILIES,
            capture_output=True, text=True)
        if r.returncode != 0:
            raise RuntimeError(r.stdout + r.stderr)
        _CACHE["data"] = dict(np.load(out))
    return _CACHE["data"]


def _ours(family):
    """Rebuild the vendored explicit model (same seed), convert its weights
    (vendored classes keep HF state_dict naming) to our pytree."""
    from tests._reference_golden import build_tiny_explicit

    model, _ = build_tiny_explicit(family)
    if family == "mixtral":
        cfg = jmix.MixtralConfig.from_hf(model.config)
        params = jmix.params_from_hf(model.state_dict(), cfg)
        return cfg, params, jmix.forward, lambda ids: jmix.embed(params, ids)
    cfg = jllama.LlamaConfig.from_hf(model.config)
    params = jllama.params_from_hf(model.state_dict(), cfg)
    return cfg, params, jllama.forward, lambda ids: jllama.embed(params, ids)


@pytest.mark.parametrize("family", FAMILIES)
def test_explicit_path_parity(golden_explicit, family):
    data = golden_explicit
    ids = data[f"{family}.ids"]
    ref_logits = data[f"{family}.logits"]
    ref_rel = data[f"{family}.rel"]

    cfg, params, forward, embed = _ours(family)
    embeds = embed(jnp.asarray(ids))

    logits = forward(params, cfg, embeds, lxt_tpu.attnlrp).logits
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               rtol=0, atol=3e-4)

    def target(e):
        return select_logit(forward(params, cfg, e, lxt_tpu.attnlrp).logits)

    _, rel = jax.jit(lambda e: input_relevance(target, e))(embeds)
    a, b = np.asarray(rel).ravel(), ref_rel.ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.999, cos
    # the explicit path's epsilon stabilizers perturb magnitudes slightly;
    # values must still agree elementwise at a loose tolerance
    scale = np.abs(b).max()
    np.testing.assert_allclose(a, b, rtol=0, atol=3e-2 * max(scale, 1e-6))
