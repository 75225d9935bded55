"""Batch-parallel heatmaps over a device mesh (beyond-reference capability).

The reference attributes one prompt per backward on one GPU. Here a batch of
prompts is sharded over the ``data`` mesh axis and the model over ``model``
(tensor parallel); the relevance backward inherits both shardings from the
forward via GSPMD — zero communication code.

Run on a multi-chip host, or simulate:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/batch_attribution_sharded.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import lxt_tpu
from lxt_tpu.attribution import select_logit
from lxt_tpu.models import llama as jllama
from lxt_tpu.parallel import (
    attribute_sharded,
    llama_param_shardings,
    make_mesh,
    shard_params,
)


def main():
    n = jax.device_count()
    model_axis = 2 if n % 2 == 0 else 1
    mesh = make_mesh(data=n // model_axis, model=model_axis)
    print(f"mesh: data={n // model_axis} x model={model_axis}")

    cfg = jllama.LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=688,
        num_layers=4, num_heads=8, num_kv_heads=4)
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    params, _ = shard_params(params, llama_param_shardings(mesh))

    B, T = 2 * (n // model_axis), 32
    ids = np.random.RandomState(0).randint(0, 512, (B, T))
    embeds = jllama.embed(params, jax.numpy.asarray(ids))

    def target(e):
        return select_logit(jllama.forward(params, cfg, e, lxt_tpu.attnlrp).logits)

    step = attribute_sharded(target, mesh)
    value, relevance = step(embeds)
    print("batch relevance:", relevance.shape, "sharding:", relevance.sharding)
    print("per-prompt relevance sums:", np.round(np.asarray(relevance.sum(-1)), 3))


if __name__ == "__main__":
    main()
