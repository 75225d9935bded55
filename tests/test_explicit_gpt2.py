"""Model-level validation of the explicit op set on the GPT-2 layout
(Conv1D projections, learned positions, pre-LN): a GPT-2 assembled from
``lf.*`` ops (models/gpt2_explicit.py) vs the reference's vendored explicit
GPT-2 (/root/reference/lxt/explicit/models/gpt2.py) and our efficient path.
Also exercises ``lf.baddbmm`` at model level via the
``reorder_and_upcast_attn`` config the reference's own path breaks on."""

import dataclasses
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

import lxt_tpu
from lxt_tpu.models import gpt2 as jgpt2
from lxt_tpu.models import gpt2_explicit as jexg
from lxt_tpu.models.llama_explicit import explicit_input_relevance
import pytest

pytestmark = pytest.mark.golden


def _tiny():
    from tests._reference_golden import build_tiny_explicit

    model, _ = build_tiny_explicit("gpt2")
    cfg = jgpt2.GPT2Config.from_hf(model.config)
    params = jgpt2.params_from_hf(model.state_dict(), cfg)
    return cfg, params


def test_explicit_gpt2_matches_reference_golden(reference_lxt, tmp_path):
    out = tmp_path / "gpt2_explicit.npz"
    script = os.path.join(os.path.dirname(__file__), "_reference_golden.py")
    r = subprocess.run(
        [sys.executable, script, "explicit", str(out), "gpt2"],
        capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(r.stdout + r.stderr)
    data = dict(np.load(out))
    ids, ref_logits, ref_rel = (data["gpt2.ids"], data["gpt2.logits"],
                                data["gpt2.rel"])

    cfg, params = _tiny()
    embeds = params["wte"][jnp.asarray(ids)]  # wpe added inside (detached)

    logits = jexg.forward(params, cfg, embeds, lxt_tpu.attnlrp).logits
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               rtol=0, atol=3e-4)

    def target(e):
        return jexg.forward(params, cfg, e, lxt_tpu.attnlrp).logits[0, -1].max()

    _, rel = jax.jit(lambda e: explicit_input_relevance(target, e))(embeds)

    a, b = np.asarray(rel).ravel(), ref_rel.ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.9999, cos
    scale = np.abs(b).max()
    np.testing.assert_allclose(a, b, rtol=0, atol=6e-3 * max(scale, 1e-6))


def test_explicit_gpt2_matches_efficient_path(reference_lxt):
    """Cross-path forward equivalence inside our framework, both composites."""
    cfg, params = _tiny()
    ids = np.random.RandomState(3).randint(0, 256, (1, 10))
    tok = params["wte"][jnp.asarray(ids)]
    pos = params["wpe"][jnp.arange(10)]

    for comp in (lxt_tpu.attnlrp, lxt_tpu.cp_lrp):
        le = jexg.forward(params, cfg, tok, comp).logits
        lg = jgpt2.forward(params, cfg, tok, comp,
                           position_embeds=pos).logits
        np.testing.assert_allclose(np.asarray(le), np.asarray(lg),
                                   rtol=0, atol=1e-5)


def test_explicit_gpt2_upcast_reorder_baddbmm(reference_lxt):
    """reorder_and_upcast_attn=True routes scores through lf.baddbmm with
    the scale pre-folded; in f32 this is the same operator — forward AND
    relevance must match the plain config (the reference's path here
    raises AttributeError on its undefined lf.baddbmm)."""
    cfg, params = _tiny()
    cfg_up = dataclasses.replace(cfg, reorder_and_upcast_attn=True,
                                 scale_attn_by_inverse_layer_idx=True)
    cfg_plain = dataclasses.replace(cfg, scale_attn_by_inverse_layer_idx=True)
    ids = np.random.RandomState(5).randint(0, 256, (1, 12))
    tok = params["wte"][jnp.asarray(ids)]

    l_up = jexg.forward(params, cfg_up, tok, lxt_tpu.attnlrp).logits
    l_plain = jexg.forward(params, cfg_plain, tok, lxt_tpu.attnlrp).logits
    np.testing.assert_allclose(np.asarray(l_up), np.asarray(l_plain),
                               rtol=0, atol=2e-5)

    def rel_of(cfg_x):
        def target(e):
            return jexg.forward(params, cfg_x, e,
                                lxt_tpu.attnlrp).logits[0, -1].max()
        return explicit_input_relevance(target, tok)[1]

    rel_up, rel_plain = rel_of(cfg_up), rel_of(cfg_plain)
    assert bool(jnp.isfinite(rel_up).all())
    assert float(jnp.abs(rel_up).sum()) > 0.0
    # the scale fold must be relevance-neutral: same attribution as the
    # semantically identical plain config (q-branch asymmetry regression)
    np.testing.assert_allclose(np.asarray(rel_up), np.asarray(rel_plain),
                               rtol=0, atol=2e-5)
