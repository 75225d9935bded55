"""Test harness: run all tests on a virtual 8-device CPU mesh.

Sharding/pjit paths are validated against 8 virtual CPU devices
(``xla_force_host_platform_device_count``); the real-TPU bench is separate
(``bench.py``). Env vars must be set before JAX initializes its backends,
hence this file manipulates the environment at import time.
"""

import os
import sys

# The ambient environment points JAX at the real TPU (JAX_PLATFORMS=axon) and
# this venv PRE-IMPORTS jax, so the platform must be hard-overridden here (the
# env var is read lazily at backend init) and the matmul precision set through
# jax.config (its env var was already consumed at jax import). Without both,
# tests silently run over the TPU tunnel with bf16 MXU matmuls — slow, flaky,
# and too imprecise for parity against torch f32.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# jax was already imported by sitecustomize, so JAX_PLATFORMS was consumed
# into jax.config before this file ran — override through the config API.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


def _install_reference():
    """Make the torch reference (read-only at /root/reference) importable for
    golden parity tests. Its package eagerly imports torchvision/zennit patch
    maps, which are absent here — stub just enough for the import to succeed.
    """
    import importlib.machinery as im
    import types

    if "/root/reference" in sys.path:
        return True
    if not os.path.isdir("/root/reference/lxt"):
        return False

    import torch.nn as nn

    def mkmod(name):
        m = types.ModuleType(name)
        m.__spec__ = im.ModuleSpec(name, loader=None)
        return m

    tv = mkmod("torchvision")
    tvm = mkmod("torchvision.models")
    vt = mkmod("torchvision.models.vision_transformer")
    tv.__version__ = "0.0.0"
    vt.nn = nn
    tvm.vision_transformer = vt
    tv.models = tvm
    sys.modules.update({
        "torchvision": tv,
        "torchvision.models": tvm,
        "torchvision.models.vision_transformer": vt,
    })
    sys.path.insert(0, "/root/reference")
    return True


@pytest.fixture(scope="session")
def reference_lxt():
    """Session fixture exposing the reference lxt package, or skip."""
    if not _install_reference():
        pytest.skip("reference repo not available")
    import lxt  # noqa: F401
    return lxt
