"""Latent feature attribution: per-neuron relevance at every layer in ONE
backward pass (reference docs/latent-feature-attribution-efficient.rst).

Where the reference registers torch hooks on hidden states and multiplies
activation x gradient per layer, here zero-valued probes are added to each
layer output inside the jitted forward — their cotangents ARE the per-layer
gradients, so hidden * grad falls out of the same vjp that produces the
input heatmap. Also demonstrates activation steering: a non-zero probe
injects a latent-direction edit and the attribution shows its effect.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import lxt_tpu
from lxt_tpu.attribution import select_logit
from lxt_tpu.models import llama as jllama


def main():
    cfg = jllama.LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=344,
        num_layers=6, num_heads=8, num_kv_heads=4)
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 512, (1, 16)))
    embeds = jllama.embed(params, ids)
    L, (B, T, D) = cfg.num_layers, embeds.shape

    # ---- latent relevance: layer x token map --------------------------------
    from lxt_tpu.attribution import latent_relevance

    def fwd(e, probes):
        out = jllama.forward(params, cfg, e, lxt_tpu.attnlrp, probes=probes,
                             output_hidden_states=True)
        return select_logit(out.logits), out.hidden_states

    value, input_rel, latent = jax.jit(
        lambda e: latent_relevance(fwd, e, (L, B, T, D)))(embeds)
    per_layer_token = np.asarray(latent.sum(-1))[:, 0]   # [L, T]
    print("explained logit:", float(value))
    print("layer x token relevance trace:")
    for l in range(L):
        print(f"  layer {l}: {np.round(per_layer_token[l], 3)}")

    # ---- steering: inject a latent direction at layer 3 ---------------------
    direction = jax.random.normal(jax.random.PRNGKey(7), (D,)) * 0.5
    probes = jnp.zeros((L, B, T, D)).at[3, :, -1].set(direction)
    steered = jllama.forward(params, cfg, embeds, lxt_tpu.attnlrp,
                             probes=probes).logits
    base = jllama.forward(params, cfg, embeds, lxt_tpu.attnlrp).logits
    shift = float(jnp.abs(steered - base).max())
    print(f"steering at layer 3 shifted logits by up to {shift:.4f}")


if __name__ == "__main__":
    main()
