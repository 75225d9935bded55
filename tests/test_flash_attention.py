"""Pallas flash attention vs the einsum reference path: forward AND the
relevance backward (vjp) must agree, including sliding windows and GQA."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lxt_tpu
from lxt_tpu.ops.attention import attention
from lxt_tpu.ops.flash_attention import flash_attention


def _qkv(key, B=2, H=4, T=256, D=64):
    k1, k2, k3 = jax.random.split(key, 3)
    return (jax.random.normal(k1, (B, H, T, D)),
            jax.random.normal(k2, (B, H, T, D)),
            jax.random.normal(k3, (B, H, T, D)))


@pytest.mark.parametrize("window", [None, 64])
def test_flash_matches_einsum_fwd_bwd(window):
    q, k, v = _qkv(jax.random.PRNGKey(0))

    def f_flash(q, k, v):
        return flash_attention(q, k, v, window, None, True).sum()

    def f_ref(q, k, v):
        return attention(q, k, v, causal=True, window=window,
                         composite=lxt_tpu.vanilla_gradient,
                         impl="einsum").sum()

    out_f = flash_attention(q, k, v, window, None, True)
    out_r = attention(q, k, v, causal=True, window=window,
                      composite=lxt_tpu.vanilla_gradient, impl="einsum")
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=0, atol=2e-5)

    g_f = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_f, g_r, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-5, err_msg=f"d{name}")


def test_flash_via_attention_dispatch_with_rules():
    """attention(impl='flash') under the attnlrp composite == einsum path,
    including head-dim padding (D=64 -> padded to 128) and GQA repeat."""
    B, H, Hkv, T, D = 1, 4, 2, 256, 64
    key = jax.random.PRNGKey(1)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    q = jax.random.normal(k1, (B, H, T, D))
    k = jax.random.normal(k2, (B, Hkv, T, D))
    v = jax.random.normal(k3, (B, Hkv, T, D))
    rel = jax.random.normal(k4, (B, H, T, D))

    def run(impl):
        def f(q, k, v):
            out = attention(q, k, v, causal=True, composite=lxt_tpu.attnlrp,
                            impl=impl)
            return (out * rel).sum()
        val, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(q, k, v)
        return val, grads

    v_f, g_f = run("flash")
    v_r, g_r = run("einsum")
    np.testing.assert_allclose(float(v_f), float(v_r), rtol=1e-5)
    for a, b, name in zip(g_f, g_r, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-5, err_msg=f"d{name}")


def test_flash_traced_window():
    """window as a traced scalar (Gemma local/global alternation) works and
    window >= T equals plain causal."""
    q, k, v = _qkv(jax.random.PRNGKey(2), T=128)

    def f(w):
        return flash_attention(q, k, v, w, None, True)

    out_full = f(jnp.int32(128))
    out_none = flash_attention(q, k, v, None, None, True)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_none),
                               rtol=0, atol=1e-6)

    out_win = jax.jit(f)(jnp.int32(32))
    ref = attention(q, k, v, causal=True, window=32,
                    composite=lxt_tpu.vanilla_gradient, impl="einsum")
    np.testing.assert_allclose(np.asarray(out_win), np.asarray(ref),
                               rtol=0, atol=2e-5)
