"""Golden relevance parity for the torchvision-layout ViT vs the reference's
efficient cp_LRP path (``lxt/efficient/models/vit_torch.py:7-11``, flow per
``examples/vit_torch.py:59-97``): LayerNorm identity rule, GELU identity
rule, CP multi-head attention (stop-grad q/k), channel-summed
Gradient*Input pixel heatmap.

torchvision itself is absent in this environment, but the reference's ViT
patch map targets plain ``torch.nn`` classes — the golden subprocess runs
the reference's actual rule code on a state_dict-compatible stand-in
(``tests/_reference_golden.py::_TorchViT``)."""

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
def golden_vit(reference_lxt, tmp_path_factory):
    if "data" not in _CACHE:
        out = tmp_path_factory.mktemp("golden_vit") / "vit.npz"
        script = os.path.join(os.path.dirname(__file__), "_reference_golden.py")
        r = subprocess.run(
            [sys.executable, script, "vit", str(out)],
            capture_output=True, text=True)
        if r.returncode != 0:
            raise RuntimeError(r.stdout + r.stderr)
        _CACHE["data"] = dict(np.load(out))
    return _CACHE["data"]


def test_vit_cp_lrp_parity(golden_vit):
    from tests._reference_golden import _TorchViT

    data = golden_vit
    x_ref = data["vit.x"]              # [1, 3, 32, 32] NCHW
    ref_logits = data["vit.logits"]
    ref_heat = data["vit.heatmap"]     # [1, 32, 32]
    top = int(data["vit.top"])

    torch_model = _TorchViT.build()    # same seed as the golden subprocess
    cfg = jvit.ViTConfig(image_size=32, patch_size=8, hidden_size=64,
                         intermediate_size=128, num_layers=2, num_heads=4,
                         num_classes=10, act="gelu_exact")
    params = jvit.params_from_torchvision(torch_model.state_dict(), cfg)

    images = jnp.asarray(x_ref.transpose(0, 2, 3, 1))  # NHWC

    logits = jvit.forward(params, cfg, images, lxt_tpu.cp_lrp).logits
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               rtol=0, atol=2e-4)
    assert int(np.asarray(logits)[0].argmax()) == top

    def target(imgs):
        out = jvit.forward(params, cfg, imgs, lxt_tpu.cp_lrp).logits
        return out[0, top]

    value, grad = jax.jit(jax.value_and_grad(target))(images)
    heat = np.asarray(jvit.patch_relevance(images, grad))

    a, b = heat.ravel(), ref_heat.ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.999, cos
    scale = np.abs(b).max()
    np.testing.assert_allclose(a, b, rtol=0, atol=5e-3 * max(scale, 1e-6))
