"""ViT heatmaps with a (conv_gamma, linear_gamma) grid search.

Reference flow: examples/vit_torch.py registers zennit gamma composites per
grid point and re-runs backward. Here each gamma pair is just a different
Composite — the grid is a Python loop over jitted programs (each compiles
once, then the sweep is pure device time).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import lxt_tpu
from lxt_tpu.models import vit as jvit


def main():
    cfg = jvit.ViTConfig(image_size=64, patch_size=16, hidden_size=128,
                         intermediate_size=256, num_layers=4, num_heads=4,
                         num_classes=10)
    params = jvit.init_params(cfg, jax.random.PRNGKey(0))
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))

    conv_gammas = [0.1, 0.25, 0.5]
    linear_gammas = [0.0, 0.05, 0.1, 0.5, 1.0]

    @jax.jit
    def predict(x):
        return jvit.forward(params, cfg, x, lxt_tpu.vanilla_gradient).logits

    top1 = int(predict(img).argmax())
    print("top-1 class:", top1)

    for cg in conv_gammas:
        for lg in linear_gammas:
            comp = lxt_tpu.cp_lrp.with_gamma(conv_gamma=cg, linear_gamma=lg)

            def target(x, comp=comp):
                return jvit.forward(params, cfg, x, comp).logits[0, top1]

            grad = jax.jit(jax.grad(target))(img)
            heat = jvit.patch_relevance(img, grad)[0]
            pos = float(jnp.clip(heat, 0, None).sum())
            tot = float(jnp.abs(heat).sum())
            print(f"conv_gamma={cg:4} linear_gamma={lg:4} "
                  f"pos-fraction={pos / tot:.3f}")

    # -- per-DEPTH gamma grid -------------------------------------------------
    # gamma denoises most in early blocks; sweep how many leading blocks get
    # it (Composite.override_layers — rules vary with STATIC layer depth, the
    # per-layer zennit rule maps of the reference's vit example)
    print("\nper-depth gamma (linear_gamma=0.25 on the first N blocks):")
    for n in range(cfg.num_layers + 1):
        comp = (lxt_tpu.cp_lrp.with_gamma(conv_gamma=0.25)
                .override_layers((0, n), linear_rule=("gamma", 0.25)))

        def target(x, comp=comp):
            return jvit.forward(params, cfg, x, comp).logits[0, top1]

        grad = jax.jit(jax.grad(target))(img)
        heat = jvit.patch_relevance(img, grad)[0]
        pos = float(jnp.clip(heat, 0, None).sum())
        tot = float(jnp.abs(heat).sum())
        print(f"  gamma on blocks [0, {n}): pos-fraction={pos / tot:.3f}")


if __name__ == "__main__":
    main()
