"""Sharded batched attribution on the 8-device virtual CPU mesh.

Checks (a) dp+tp sharded attribution compiles and executes, (b) results
match the unsharded single-device computation, (c) the relevance backward
inherits shardings (no resharding errors under strict GSPMD)."""

import jax
import jax.numpy as jnp
import numpy as np

import lxt_tpu
from lxt_tpu.attribution import input_relevance, select_logit
from lxt_tpu.models import llama as jllama
from lxt_tpu.parallel import (
    attribute_sharded,
    llama_param_shardings,
    make_mesh,
    shard_params,
)


def _tiny_cfg():
    return jllama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, rms_eps=1e-6)


def test_dp_tp_attribution_matches_single_device():
    cfg = _tiny_cfg()
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    B, T = 4, 16
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, cfg.vocab_size)
    embeds = jllama.embed(params, ids)

    def target(e, p=params):
        return select_logit(jllama.forward(p, cfg, e, lxt_tpu.attnlrp).logits)

    # single device reference
    val_ref, rel_ref = input_relevance(target, embeds)

    # dp=4 x tp=2 mesh
    mesh = make_mesh(data=4, model=2)
    sharded_params, _ = shard_params(params, llama_param_shardings(mesh))

    def target_sharded(e):
        return select_logit(
            jllama.forward(sharded_params, cfg, e, lxt_tpu.attnlrp).logits)

    step = attribute_sharded(target_sharded, mesh)
    val, rel = step(embeds)

    np.testing.assert_allclose(float(val), float(val_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rel), np.asarray(rel_ref),
                               rtol=0, atol=1e-4)
    # relevance actually came back sharded over data
    assert "data" in str(rel.sharding)


def test_mixtral_expert_parallel():
    """Expert-parallel Mixtral attribution matches single-device (the expert
    axis is split over the model mesh axis; GSPMD inserts the reductions)."""
    from lxt_tpu.models import mixtral as jmix
    from lxt_tpu.parallel import mixtral_param_shardings

    cfg = jmix.MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_layers=2,
        num_heads=4, num_kv_heads=2, num_experts=4, experts_per_token=2)
    params = jmix.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 128)
    embeds = jmix.embed(params, ids)

    def target(p, e):
        return select_logit(jmix.forward(p, cfg, e, lxt_tpu.attnlrp).logits)

    val_ref, rel_ref = input_relevance(lambda e: target(params, e), embeds)

    mesh = make_mesh(data=2, model=4)
    sharded, _ = shard_params(params, mixtral_param_shardings(mesh))
    step = attribute_sharded(lambda e: target(sharded, e), mesh)
    val, rel = step(embeds)

    np.testing.assert_allclose(float(val), float(val_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rel), np.asarray(rel_ref),
                               rtol=0, atol=1e-4)
