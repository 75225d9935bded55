"""Golden relevance parity for the OpenCLIP visual-tower variant vs the
reference's explicit OpenCLIP composite (``lxt/explicit/models/openclip.py:
20-31``): MultiheadAttention_CP (stop-grad q/k, epsilon in/out projections),
LayerNormEpsilon, GELU identity rule, ``lf.add2``/``lf.matmul``/
``lf.normalize`` function rewrites, seeded ``backward(logit)``.

open_clip itself is absent in this environment, but the reference composite
targets plain ``torch.nn`` classes plus function rewrites — the golden
subprocess runs the reference's actual rule code on a state_dict-compatible
stand-in (``tests/_reference_golden.py::_TorchOpenCLIP``).

Framing note: the two stacks agree up to ONE positive per-example scale —
the reference's ``lf.matmul`` at the projection splits relevance uniformly
with the weight (a global /2), and its pass-through ``lf.normalize``
identity differs from Gradient*Input pass-through by the per-example
1/||emb|| factor. Both are per-example scalars, so the comparison uses the
reference example's own normalization (``openclip.py:93``:
``heatmap / abs(heatmap).max()``).
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lxt_tpu
from lxt_tpu.models import vit as jvit

pytestmark = pytest.mark.golden

_CACHE = {}


@pytest.fixture(scope="session")
def golden_openclip(reference_lxt, tmp_path_factory):
    if "data" not in _CACHE:
        out = tmp_path_factory.mktemp("golden_openclip") / "openclip.npz"
        script = os.path.join(os.path.dirname(__file__), "_reference_golden.py")
        r = subprocess.run(
            [sys.executable, script, "openclip", str(out)],
            capture_output=True, text=True)
        if r.returncode != 0:
            raise RuntimeError(r.stdout + r.stderr)
        _CACHE["data"] = dict(np.load(out))
    return _CACHE["data"]


def test_openclip_cp_lrp_parity(golden_openclip):
    from tests._reference_golden import _TorchOpenCLIP

    data = golden_openclip
    x_ref = data["openclip.x"]              # [1, 3, 32, 32] NCHW
    ref_emb = data["openclip.emb"]          # [1, proj_dim], L2-normalized
    ref_heat = data["openclip.heatmap"]     # [1, 32, 32]
    top = int(data["openclip.top"])

    torch_model = _TorchOpenCLIP.build()    # same seed as the subprocess
    cfg = jvit.ViTConfig(image_size=32, patch_size=8, hidden_size=64,
                         intermediate_size=128, num_layers=2, num_heads=4,
                         ln_eps=1e-5, act="gelu_exact", openclip=True,
                         proj_dim=32)
    params = jvit.params_from_openclip(torch_model.state_dict(), cfg)

    images = jnp.asarray(x_ref.transpose(0, 2, 3, 1))  # NHWC

    emb = jvit.forward(params, cfg, images, lxt_tpu.cp_lrp).logits
    np.testing.assert_allclose(np.asarray(emb), ref_emb, rtol=0, atol=2e-4)
    assert int(np.asarray(emb)[0].argmax()) == top

    def target(imgs):
        out = jvit.forward(params, cfg, imgs, lxt_tpu.cp_lrp).logits
        return out[0, top]

    value, grad = jax.jit(jax.value_and_grad(target))(images)
    heat = np.asarray(jvit.patch_relevance(images, grad))

    # per-example max-abs normalization (the reference example's own
    # convention) absorbs the documented per-example scale difference
    a = heat.ravel()
    b = ref_heat.ravel()
    a = a / np.abs(a).max()
    b = b / np.abs(b).max()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.999, cos
    np.testing.assert_allclose(a, b, rtol=0, atol=5e-3)
