"""One-call vision attribution: torchvision ViT -> pixel heatmap.

The reference's vision flow is ``monkey_patch(vision_transformer_module)``
plus a manual backward (examples/vit_torch.py there); here the whole flow is
one conversion call and one attribute call. Works from a live torchvision
model OR a bare state dict (torch-free deployment).

Run (CPU works; substitute a real checkpoint + image for real use):
    JAX_PLATFORMS=cpu python examples/vision_one_call.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import lxt_tpu


def demo_state_dict(image_size=64, patch=16, hidden=96, mlp=192, heads=4,
                    layers=2, classes=10, seed=0):
    """A random torchvision-VisionTransformer-shaped state dict (stand-in
    for ``torchvision.models.vit_b_16(weights=...).state_dict()``)."""
    rng = np.random.RandomState(seed)
    n_tokens = (image_size // patch) ** 2 + 1
    u = lambda *s: rng.randn(*s).astype(np.float32) * 0.02  # noqa: E731
    sd = {
        "class_token": u(1, 1, hidden),
        "conv_proj.weight": u(hidden, 3, patch, patch),
        "conv_proj.bias": u(hidden),
        "encoder.pos_embedding": u(1, n_tokens, hidden),
        "encoder.ln.weight": np.ones(hidden, np.float32),
        "encoder.ln.bias": np.zeros(hidden, np.float32),
        "heads.head.weight": u(classes, hidden),
        "heads.head.bias": u(classes),
    }
    for i in range(layers):
        p = f"encoder.layers.encoder_layer_{i}."
        sd |= {
            p + "ln_1.weight": np.ones(hidden, np.float32),
            p + "ln_1.bias": np.zeros(hidden, np.float32),
            p + "self_attention.in_proj_weight": u(3 * hidden, hidden),
            p + "self_attention.in_proj_bias": u(3 * hidden),
            p + "self_attention.out_proj.weight": u(hidden, hidden),
            p + "self_attention.out_proj.bias": u(hidden),
            p + "ln_2.weight": np.ones(hidden, np.float32),
            p + "ln_2.bias": np.zeros(hidden, np.float32),
            p + "mlp.0.weight": u(mlp, hidden),
            p + "mlp.0.bias": u(mlp),
            p + "mlp.3.weight": u(hidden, mlp),
            p + "mlp.3.bias": u(hidden),
        }
    return sd


def main():
    # real use: model = torchvision.models.vit_b_16(weights="IMAGENET1K_V1")
    #           vm = lxt_tpu.from_torchvision(model)        (heads inferred)
    vm = lxt_tpu.from_torchvision(demo_state_dict(), num_heads=4)

    images = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32)
    value, heatmap = vm.attribute_image(images)          # argmax class
    print("explained logit sum:", float(value))
    print("pixel heatmap:", heatmap.shape,
          "sum |R| =", float(np.abs(np.asarray(heatmap)).sum()))

    # γ-rule denoising (the reference's zennit grid, natively):
    gamma = vm.composite.with_gamma(conv_gamma=0.25, linear_gamma=0.05)
    value, heatmap_g = vm.attribute_image(images, composite=gamma)
    print("gamma heatmap:", heatmap_g.shape)

    # explain a specific class per image
    value, _ = vm.attribute_image(images, label=np.array([3, 7]))
    print("class-3/7 logit sum:", float(value))


if __name__ == "__main__":
    main()
