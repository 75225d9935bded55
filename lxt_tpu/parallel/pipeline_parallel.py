"""Pipeline-parallel attribution: layers sharded over a ``pp`` mesh axis.

The models here are scans over layer-stacked params, so pipeline parallelism
is a different DRIVER for the same layer body: each device holds L/S
contiguous layers (the stacked leaves shard on axis 0), microbatches stream
through the stages GPipe-style, and activations hop stages via
``lax.ppermute`` over the ICI ring. One ``jax.vjp`` over the whole pipeline
gives the relevance backward — ``ppermute`` transposes to the reverse
permutation and ``scan`` to the reverse scan, so the backward is itself a
reverse pipeline with no extra code.

The reference has no pipeline parallelism (SURVEY.md §2.4 — its biggest
demonstrated model fits one GPU); this is the missing regime where a model's
LAYERS don't fit one chip and tensor parallelism alone is not wanted.

Usage (any family whose forward takes ``layer_driver=``):

    mesh = Mesh(devices, ("pp",))
    params = jax.device_put(params, pipeline_param_shardings(params, mesh))
    value, rel = attribute_pipeline_parallel(
        jllama.forward, params, cfg, embeds, mesh, lxt_tpu.attnlrp,
        n_micro=4)

Schedule: M microbatches over B (B % M == 0), M + S - 1 steps; ramp-up/down
bubbles execute masked garbage that never reaches the collected outputs.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pipeline_param_shardings(params, mesh: Mesh, axis: str = "pp"):
    """Shard every layer-stacked leaf (under ``params['layers']``) on its
    layer axis over ``axis``; everything else replicated."""

    def walk(tree, in_layers=False):
        if isinstance(tree, dict):
            return {k: walk(v, in_layers or k == "layers") for k, v in tree.items()}
        spec = P(axis) if in_layers else P()
        return NamedSharding(mesh, spec)

    return walk(params)


def make_pipeline_driver(mesh: Mesh, axis: str = "pp", n_micro=None):
    """A ``layer_driver(body, h, xs)`` replacement for the models' layer
    scan: runs ``body`` as an S-stage pipeline over mesh axis ``axis``.

    ``xs`` leaves must stack layers on axis 0 with L % S == 0; ``h`` is the
    [B, ...] activation with B % n_micro == 0. Hidden-state collection
    (``output_hidden_states``/probes) is not supported under PP.
    """
    S = mesh.shape[axis]

    def driver(body, h, xs):
        B = h.shape[0]
        M = n_micro or min(S, B)
        assert B % M == 0, f"batch {B} must split into {M} microbatches"

        specs_xs = jax.tree.map(lambda _: P(axis), xs)
        perm = [(i, (i + 1) % S) for i in range(S)]

        @partial(jax.shard_map, mesh=mesh, in_specs=(specs_xs, P()),
                 out_specs=P(), axis_names={axis}, check_vma=False)
        def run(local_xs, h):
            idx = jax.lax.axis_index(axis)
            micro = h.reshape(M, B // M, *h.shape[1:])

            def stage(h_mb):
                out, _ = jax.lax.scan(body, h_mb, local_xs)
                return out

            def step(carry, t):
                buf, outs = carry
                feed = micro[jnp.clip(t, 0, M - 1)]
                inp = jnp.where(idx == 0, feed, buf)
                out = stage(inp)
                mb = jnp.clip(t - (S - 1), 0, M - 1)
                valid = (t >= S - 1) & (idx == S - 1)
                outs = outs.at[mb].set(jnp.where(valid, out, outs[mb]))
                buf = jax.lax.ppermute(out, axis, perm)
                return (buf, outs), None

            init = (jnp.zeros_like(micro[0]), jnp.zeros_like(micro))
            (_, outs), _ = jax.lax.scan(step, init, jnp.arange(M + S - 1))
            # only the last stage holds real outputs; replicate them
            outs = jax.lax.psum(
                jnp.where(idx == S - 1, outs, jnp.zeros_like(outs)), axis)
            return outs.reshape(h.shape)

        return run(xs, h), None

    return driver


def attribute_pipeline_parallel(forward_fn, params, cfg, inputs_embeds,
                                mesh: Mesh, composite, axis: str = "pp",
                                n_micro=None, position: int = -1,
                                shard: bool = True):
    """End-to-end pipeline-parallel attribution (Gradient*Input) for any
    family forward that accepts ``layer_driver=``. Returns ``(value,
    relevance [B, T])``."""
    from lxt_tpu.attribution import select_logit

    if shard:
        params = jax.device_put(params,
                                pipeline_param_shardings(params, mesh, axis))
    driver = make_pipeline_driver(mesh, axis, n_micro)

    def target(e):
        logits = forward_fn(params, cfg, e, composite,
                            layer_driver=driver).logits
        return select_logit(logits, position=position)

    value, grad = jax.jit(jax.value_and_grad(target))(inputs_embeds)
    rel = (inputs_embeds.astype(jnp.float32) * grad.astype(jnp.float32)).sum(-1)
    return value, rel
