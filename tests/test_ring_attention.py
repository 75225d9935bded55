"""Ring (sequence-parallel) attention == monolithic attention, forward AND
relevance backward, on the 8-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

import lxt_tpu
from lxt_tpu.ops.attention import attention
from lxt_tpu.parallel.ring import ring_flash_attention

pytestmark = pytest.mark.kernels


@pytest.mark.parametrize("window", [None, 96])
def test_ring_matches_monolithic(window):
    n = 4
    mesh = Mesh(np.asarray(jax.devices()[:n]), ("sp",))
    B, H, Hkv, T, D = 1, 4, 2, 512, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, H, T, D))
    k = jax.random.normal(ks[1], (B, Hkv, T, D))
    v = jax.random.normal(ks[2], (B, Hkv, T, D))
    rel = jax.random.normal(ks[3], (B, H, T, D))

    spec = P(None, None, "sp", None)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=P(),
        check_vma=False)
    def ring_target(q, k, v, rel):
        out = ring_flash_attention(q, k, v, "sp", window=window)
        return jax.lax.psum((out * rel).astype(jnp.float32).sum(), "sp")

    def mono_target(q, k, v, rel):
        out = attention(q, k, v, causal=True, window=window,
                        composite=lxt_tpu.vanilla_gradient, impl="einsum")
        return (out * rel).astype(jnp.float32).sum()

    v_ring, g_ring = jax.value_and_grad(ring_target, argnums=(0, 1, 2))(q, k, v, rel)
    v_mono, g_mono = jax.value_and_grad(mono_target, argnums=(0, 1, 2))(q, k, v, rel)

    np.testing.assert_allclose(float(v_ring), float(v_mono), rtol=1e-5)
    for a, b, name in zip(g_ring, g_mono, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-5, err_msg=f"d{name}")


def test_ring_attnlrp_relevance_matches():
    """Full AttnLRP relevance (q,k /4, v /2 scaling around the kernel) through
    the ring equals the single-device attnlrp attention."""
    from lxt_tpu.ops.rules import divide_gradient

    n = 4
    mesh = Mesh(np.asarray(jax.devices()[:n]), ("sp",))
    B, H, T, D = 1, 2, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], (B, H, T, D))
    k = jax.random.normal(ks[1], (B, H, T, D))
    v = jax.random.normal(ks[2], (B, H, T, D))
    rel = jax.random.normal(ks[3], (B, H, T, D))
    spec = P(None, None, "sp", None)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(spec, spec, spec, spec), out_specs=P(),
                       check_vma=False)
    def ring_target(q, k, v, rel):
        q = divide_gradient(q, 4)
        k = divide_gradient(k, 4)
        v = divide_gradient(v, 2)
        out = ring_flash_attention(q, k, v, "sp")
        return jax.lax.psum((out * rel).astype(jnp.float32).sum(), "sp")

    def mono_target(q, k, v, rel):
        out = attention(q, k, v, causal=True, composite=lxt_tpu.attnlrp,
                        impl="einsum")
        return (out * rel).astype(jnp.float32).sum()

    _, g_ring = jax.value_and_grad(ring_target, argnums=(0, 1, 2))(q, k, v, rel)
    _, g_mono = jax.value_and_grad(mono_target, argnums=(0, 1, 2))(q, k, v, rel)
    for a, b, name in zip(g_ring, g_mono, "qkv"):
        rel_a = np.asarray(a) * np.asarray(q if name == "q" else k if name == "k" else v)
        rel_b = np.asarray(b) * np.asarray(q if name == "q" else k if name == "k" else v)
        np.testing.assert_allclose(rel_a, rel_b, rtol=0, atol=5e-5,
                                   err_msg=f"R_{name}")


def test_sequence_parallel_llama_attribution():
    """End-to-end: llama attribution with the sequence ring-sharded over 4
    devices equals the single-device result."""
    from lxt_tpu.attribution import input_relevance, select_logit
    from lxt_tpu.models import llama as jllama
    from lxt_tpu.parallel.ring import attribute_sequence_parallel

    cfg = jllama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, rms_eps=1e-6)
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 512), 0, 128)
    embeds = jllama.embed(params, ids)

    # single-device reference
    def target(e):
        return select_logit(jllama.forward(params, cfg, e, lxt_tpu.attnlrp,
                                           attn_impl="einsum").logits)
    val_ref, rel_ref = input_relevance(target, embeds)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    val, rel = attribute_sequence_parallel(
        jllama.forward, params, cfg, embeds, mesh, lxt_tpu.attnlrp)

    np.testing.assert_allclose(float(val), float(val_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rel), np.asarray(rel_ref),
                               rtol=0, atol=2e-4)


def test_sequence_parallel_gemma3_attribution():
    """Gemma-3 alternating local/global layers on the ring: the FULL-attention
    layer's window must be unbounded in GLOBAL coordinates (regression: it was
    set to the local shard length T_local, silently truncating attention)."""
    from lxt_tpu.attribution import input_relevance, select_logit
    from lxt_tpu.models import gemma3 as jg
    from lxt_tpu.parallel.ring import attribute_sequence_parallel

    cfg = jg.Gemma3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, sliding_window=64,
        query_pre_attn_scalar=16.0,
        layer_types=("sliding_attention", "full_attention"))
    params = jg.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 512), 0, 128)
    embeds = jg.embed(params, ids, cfg)

    def target(e):
        return select_logit(jg.forward(params, cfg, e, lxt_tpu.attnlrp,
                                       attn_impl="einsum").logits)
    val_ref, rel_ref = input_relevance(target, embeds)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    val, rel = attribute_sequence_parallel(
        jg.forward, params, cfg, embeds, mesh, lxt_tpu.attnlrp)

    np.testing.assert_allclose(float(val), float(val_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rel), np.asarray(rel_ref),
                               rtol=0, atol=2e-4)


def test_ring_impl_ignores_perf_suffixes():
    """'ring:<axis>+split+delta' must parse the axis correctly (the '+opt'
    suffixes are no-ops for the ring kernels, not part of the axis name)."""
    n = 4
    mesh = Mesh(np.asarray(jax.devices()[:n]), ("sp",))
    B, H, Hkv, T, D = 1, 2, 2, 256, 16
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (B, H, T, D))
    k = jax.random.normal(ks[1], (B, Hkv, T, D))
    v = jax.random.normal(ks[2], (B, Hkv, T, D))
    spec = P(None, None, "sp", None)

    def run(impl):
        @functools.partial(
            shard_map, mesh=mesh, in_specs=(spec, spec, spec),
            out_specs=spec, check_vma=False)
        def f(q, k, v):
            return attention(q, k, v, causal=True,
                             composite=lxt_tpu.vanilla_gradient, impl=impl)
        return f(q, k, v)

    np.testing.assert_allclose(np.asarray(run("ring:sp+split+delta")),
                               np.asarray(run("ring:sp")), rtol=0, atol=0)
