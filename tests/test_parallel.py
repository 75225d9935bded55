"""Sharded batched attribution on the 8-device virtual CPU mesh.

Checks (a) dp+tp sharded attribution compiles and executes, (b) results
match the unsharded single-device computation, (c) the relevance backward
inherits shardings (no resharding errors under strict GSPMD)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lxt_tpu
from lxt_tpu.attribution import input_relevance, select_logit
from lxt_tpu.models import llama as jllama
from lxt_tpu.parallel import (
    attribute_sharded,
    llama_param_shardings,
    make_mesh,
    shard_params,
)

pytestmark = pytest.mark.slow


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


def test_family_tp_shardings_gemma3_gpt2_bert():
    """Tensor-parallel shardings for the other families: sharded attribution
    matches single-device (GSPMD inserts the per-block psums in forward and
    in the relevance backward)."""
    from lxt_tpu.models import bert as jbert
    from lxt_tpu.models import gemma3 as jg
    from lxt_tpu.models import gpt2 as jgpt2
    from lxt_tpu.parallel import family_param_shardings

    mesh = make_mesh(data=2, model=4)
    rng = np.random.RandomState(0)

    def check(family, forward, embed_fn, cfg, params, B=2, T=8):
        ids = rng.randint(1, 100, (B, T))
        e = embed_fn(jnp.asarray(ids))

        def target(p, x):
            return select_logit(forward(p, cfg, x, lxt_tpu.attnlrp).logits)

        _, rel_ref = input_relevance(lambda x: target(params, x), e)
        sharded = jax.device_put(
            params, family_param_shardings(family, params, mesh))
        step = attribute_sharded(lambda x: target(sharded, x), mesh)
        _, rel = step(e)
        np.testing.assert_allclose(np.asarray(rel), np.asarray(rel_ref),
                                   rtol=0, atol=1e-4, err_msg=family)

    gcfg = jg.Gemma3Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                           num_layers=2, num_heads=4, num_kv_heads=4, head_dim=16,
                           sliding_window=4, query_pre_attn_scalar=16,
                           layer_types=("sliding_attention", "full_attention"))
    gp = jg.init_params(gcfg, jax.random.PRNGKey(0))
    check("gemma3", jg.forward, lambda i: jg.embed(gp, i, gcfg), gcfg, gp)

    pcfg = jgpt2.GPT2Config(vocab_size=128, hidden_size=64, num_layers=2,
                            num_heads=4, max_positions=64)
    pp = jgpt2.init_params(pcfg, jax.random.PRNGKey(1))
    check("gpt2", jgpt2.forward, lambda i: jgpt2.embed(pp, i)[0], pcfg, pp)

    bcfg = jbert.BertConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                            num_layers=2, num_heads=4, max_positions=64,
                            num_labels=3)
    bp = jbert.init_params(bcfg, jax.random.PRNGKey(2))

    def bert_target(p, x):
        logits = jbert.forward(p, bcfg, x, lxt_tpu.attnlrp).logits
        return logits.max(axis=-1).sum()

    ids = rng.randint(1, 100, (2, 8))
    e = jbert.embed(bp, jnp.asarray(ids))
    _, rel_ref = input_relevance(lambda x: bert_target(bp, x), e)
    bsh = jax.device_put(bp, family_param_shardings("bert", bp, mesh))
    step = attribute_sharded(lambda x: bert_target(bsh, x), mesh)
    _, rel = step(e)
    np.testing.assert_allclose(np.asarray(rel), np.asarray(rel_ref),
                               rtol=0, atol=1e-4)


def test_sp_x_tp_ring_attribution():
    """Sequence parallelism COMPOSED with tensor parallelism: shard_map is
    manual only over 'sp' while the params shard over 'model' under GSPMD
    (the regime a long-context 8B needs)."""
    from jax.sharding import Mesh

    from lxt_tpu.parallel import family_param_shardings
    from lxt_tpu.parallel.ring import attribute_sequence_parallel

    cfg = _tiny_cfg()
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 256), 0, 128)
    embeds = jllama.embed(params, ids)

    def target(e):
        return select_logit(jllama.forward(params, cfg, e, lxt_tpu.attnlrp,
                                           attn_impl="einsum").logits)
    val_ref, rel_ref = input_relevance(target, embeds)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("sp", "model"))
    val, rel = attribute_sequence_parallel(
        jllama.forward, params, cfg, embeds, mesh, lxt_tpu.attnlrp,
        param_shardings=family_param_shardings("llama", params, mesh))

    np.testing.assert_allclose(float(val), float(val_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rel), np.asarray(rel_ref),
                               rtol=0, atol=2e-4)


def test_quantized_tensor_parallel():
    """int8-quantized weights sharded over the model axis: QuantizedTensor
    codes and scales both shard; relevance matches the quantized
    single-device run exactly."""
    from lxt_tpu.ops.quant import quantize_params
    from lxt_tpu.parallel import family_param_shardings

    cfg = _tiny_cfg()
    params = quantize_params(jllama.init_params(cfg, jax.random.PRNGKey(0)),
                             bits=8)
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 128)
    embeds = jllama.embed(params, ids)

    def target(p, e):
        return select_logit(jllama.forward(p, cfg, e, lxt_tpu.attnlrp).logits)

    val_ref, rel_ref = input_relevance(lambda e: target(params, e), embeds)

    mesh = make_mesh(data=4, model=2)
    sharded = jax.device_put(
        params, family_param_shardings("llama", params, mesh))
    step = attribute_sharded(lambda e: target(sharded, e), mesh)
    val, rel = step(embeds)

    np.testing.assert_allclose(float(val), float(val_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rel), np.asarray(rel_ref),
                               rtol=0, atol=1e-4)


def test_pipeline_parallel_attribution():
    """GPipe-style pipeline parallelism: layers sharded over 4 stages,
    microbatched activations hopping via ppermute; one vjp yields the same
    relevance as single-device (the backward is the reverse pipeline)."""
    from jax.sharding import Mesh

    from lxt_tpu.parallel import attribute_pipeline_parallel

    cfg = jllama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=4,
        num_heads=4, num_kv_heads=2, rms_eps=1e-6)
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 128)
    embeds = jllama.embed(params, ids)

    def target(e):
        return select_logit(jllama.forward(params, cfg, e, lxt_tpu.attnlrp).logits)

    val_ref, rel_ref = input_relevance(target, embeds)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("pp",))
    val, rel = attribute_pipeline_parallel(
        jllama.forward, params, cfg, embeds, mesh, lxt_tpu.attnlrp, n_micro=2)

    np.testing.assert_allclose(float(val), float(val_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rel), np.asarray(rel_ref),
                               rtol=0, atol=1e-4)


def test_unrolled_driver_matches_scan():
    """The unrolled layer driver (straight-line layers, no scan residual
    stacking — the bench perf path) is numerically identical to the scan,
    including hidden-state collection and the relevance backward."""
    from lxt_tpu.models import common as jcommon

    cfg = _tiny_cfg()
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    embeds = jllama.embed(params, ids)

    def target(e, driver=None):
        return select_logit(jllama.forward(
            params, cfg, e, lxt_tpu.attnlrp, remat=False,
            layer_driver=driver).logits)

    val_ref, rel_ref = input_relevance(lambda e: target(e), embeds)
    val, rel = input_relevance(
        lambda e: target(e, driver=jcommon.unrolled), embeds)
    np.testing.assert_allclose(float(val), float(val_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rel), np.asarray(rel_ref),
                               rtol=0, atol=1e-6)

    hs_scan = jllama.forward(params, cfg, embeds, lxt_tpu.attnlrp,
                             remat=False, output_hidden_states=True
                             ).hidden_states
    hs_unroll = jllama.forward(params, cfg, embeds, lxt_tpu.attnlrp,
                               remat=False, output_hidden_states=True,
                               layer_driver=jcommon.unrolled).hidden_states
    np.testing.assert_allclose(np.asarray(hs_unroll), np.asarray(hs_scan),
                               rtol=0, atol=1e-6)


def test_offload_remat_matches_full_remat():
    """remat='offload' (layer inputs offloaded to pinned host memory during
    the forward, fetched back for the backward recompute) is numerically
    identical to remat=True."""
    cfg = _tiny_cfg()
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    embeds = jllama.embed(params, ids)

    def run(remat):
        def target(e):
            return select_logit(jllama.forward(
                params, cfg, e, lxt_tpu.attnlrp, remat=remat).logits)
        return input_relevance(target, embeds)

    val_full, rel_full = run(True)
    val_off, rel_off = run("offload")
    np.testing.assert_allclose(float(val_off), float(val_full), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rel_off), np.asarray(rel_full),
                               rtol=0, atol=1e-6)
