"""Vision Transformer (torchvision layout) with LRP-aware forward.

Reference: ``lxt/efficient/models/vit_torch.py`` exports ONLY a CP-LRP map
(GELU identity rule with keep_original, stop-grad-std LayerNorm, CP
multi-head attention with stop-grad q/k) and composes it with zennit's
gamma rule on Conv2d/Linear for denoising (``examples/vit_torch.py:59-65``,
grid-searched over (conv_gamma, linear_gamma)). Here the gamma rule is
native (``ops/rules.py``): ``composite.with_gamma(conv_gamma, linear_gamma)``
reproduces the whole zennit interop without the dependency.

Architecture follows torchvision ``VisionTransformer``: conv patch embedding,
class token prepended, learned position embeddings, pre-norm encoder blocks,
classification from the class token after the final norm.
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lxt_tpu import composites
from lxt_tpu.models import common
from lxt_tpu.models.common import ModelOutputs
from lxt_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    num_classes: int = 1000
    ln_eps: float = 1e-6
    act: str = "gelu_exact"
    #: OpenCLIP visual-tower variant: LayerNorm before the encoder, no conv
    #: bias, QuickGELU, L2-normalized projected output instead of a
    #: classification head (reference lxt/explicit/models/openclip.py).
    openclip: bool = False
    proj_dim: Optional[int] = None

    @property
    def hd(self):
        return self.hidden_size // self.num_heads

    @property
    def num_patches(self):
        return (self.image_size // self.patch_size) ** 2


def init_params(cfg: ViTConfig, key, dtype=jnp.float32):
    L, D, I, P = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size, cfg.patch_size
    ks = jax.random.split(key, 10)
    u = lambda k, s: common.uniform_init(k, s, dtype=dtype)  # noqa: E731
    layers = {
        "ln1_w": jnp.ones((L, D), dtype), "ln1_b": jnp.zeros((L, D), dtype),
        "ln2_w": jnp.ones((L, D), dtype), "ln2_b": jnp.zeros((L, D), dtype),
        "w_qkv": u(ks[0], (L, D, 3 * D)), "b_qkv": jnp.zeros((L, 3 * D), dtype),
        "w_proj": u(ks[1], (L, D, D)), "b_proj": jnp.zeros((L, D), dtype),
        "w_fc": u(ks[2], (L, D, I)), "b_fc": jnp.zeros((L, I), dtype),
        "w_out": u(ks[3], (L, I, D)), "b_out": jnp.zeros((L, D), dtype),
    }
    return {
        "conv_w": u(ks[4], (P, P, 3, D)),   # HWIO
        "conv_b": jnp.zeros((D,), dtype),
        "cls_token": u(ks[5], (1, 1, D)),
        "pos_emb": u(ks[6], (1, cfg.num_patches + 1, D)),
        "lnf_w": jnp.ones((D,), dtype), "lnf_b": jnp.zeros((D,), dtype),
        "head_w": u(ks[7], (D, cfg.num_classes)),
        "head_b": jnp.zeros((cfg.num_classes,), dtype),
        "layers": layers,
    }


def forward(
    params,
    cfg: ViTConfig,
    images,
    composite: composites.Composite = composites.cp_lrp,
    *,
    probes=None,
    output_hidden_states: bool = False,
    remat: bool = True,
):
    """``images``: NHWC [B, H, W, 3]. Returns class logits [B, num_classes].

    Default composite is CP-LRP (the reference's only ViT map); compose with
    ``.with_gamma(conv_gamma=..., linear_gamma=...)`` for denoised heatmaps.
    """
    B = images.shape[0]
    D = cfg.hidden_size
    act_fn = common.ACTIVATIONS[cfg.act]

    x = composite.conv2d(images, params["conv_w"], params.get("conv_b"),
                         strides=(cfg.patch_size, cfg.patch_size),
                         padding="VALID", site="conv_w")
    x = x.reshape(B, -1, D)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (B, 1, D))
    h = jnp.concatenate([cls, x], axis=1) + params["pos_emb"]
    if cfg.openclip:
        h = composite.layer_norm(h, params["ln_pre_w"], params["ln_pre_b"],
                                 cfg.ln_eps)
    inputs_post = h
    H, hd = cfg.num_heads, cfg.hd

    def make_layer(comp):
        def layer_fn(h, xs):
            lp, probe = xs
            x = comp.layer_norm(h, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
            qkv = comp.linear(x, lp["w_qkv"], lp["b_qkv"], site="w_qkv")
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = common.split_heads(q, H, hd)
            k = common.split_heads(k, H, hd)
            v = common.split_heads(v, H, hd)
            attn = attention(q, k, v, composite=comp, impl="einsum")
            h = h + comp.linear(common.merge_heads(attn), lp["w_proj"],
                                lp["b_proj"], site="w_proj")
            x = comp.layer_norm(h, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
            x = comp.act(act_fn, comp.linear(x, lp["w_fc"], lp["b_fc"], site="w_fc"))
            h = h + comp.linear(x, lp["w_out"], lp["b_out"], site="w_out")
            if probe is not None:
                h = h + probe
            return h, (h if output_hidden_states else None)
        return layer_fn

    h, hiddens = common.run_stacked_layers(
        make_layer, composite, remat, None, inputs_post,
        (params["layers"], probes))

    h = composite.layer_norm(h, params["lnf_w"], params["lnf_b"], cfg.ln_eps)
    if cfg.openclip:
        # CLIP image embedding: project the class token, L2-normalize under
        # the identity rule (reference rewrites F.normalize the same way,
        # lxt/explicit/models/openclip.py:20-31)
        from lxt_tpu.ops import functional as lf
        emb = composite.linear(h[:, 0], params["proj"], site="proj")
        logits = lf.normalize(emb, 2.0, -1)
    else:
        logits = composite.linear(h[:, 0], params["head_w"], params["head_b"], site="head_w")

    if output_hidden_states:
        hiddens = jnp.concatenate([inputs_post[None], hiddens], axis=0)
    return ModelOutputs(logits=logits, hidden_states=hiddens)


def patch_relevance(images, grad):
    """Input heatmap: (x * grad) summed over channels -> [B, H, W] (the
    reference sums over the channel dim, examples/vit_torch.py:84)."""
    return (images.astype(jnp.float32) * grad.astype(jnp.float32)).sum(-1)


def params_from_torchvision(state_dict, cfg: ViTConfig, dtype=np.float32):
    """Convert a torchvision VisionTransformer state_dict.

    torchvision keys: conv_proj.*, class_token, encoder.pos_embedding,
    encoder.layers.encoder_layer_{i}.{ln_1,self_attention,ln_2,mlp}.*,
    encoder.ln.*, heads.head.*. MHA in_proj is fused [3D, D].
    """

    def t(name):
        w = state_dict[name]
        if hasattr(w, "detach"):
            w = w.detach().to("cpu").float().numpy()
        return np.asarray(w, dtype=dtype)

    L = cfg.num_layers

    def stack(fmt, transpose=False):
        ws = [t(f"encoder.layers.encoder_layer_{i}.{fmt}") for i in range(L)]
        return jnp.asarray(np.stack([w.T if transpose else w for w in ws]))

    layers = {
        "ln1_w": stack("ln_1.weight"), "ln1_b": stack("ln_1.bias"),
        "ln2_w": stack("ln_2.weight"), "ln2_b": stack("ln_2.bias"),
        "w_qkv": stack("self_attention.in_proj_weight", True),
        "b_qkv": stack("self_attention.in_proj_bias"),
        "w_proj": stack("self_attention.out_proj.weight", True),
        "b_proj": stack("self_attention.out_proj.bias"),
        "w_fc": stack("mlp.0.weight", True), "b_fc": stack("mlp.0.bias"),
        "w_out": stack("mlp.3.weight", True), "b_out": stack("mlp.3.bias"),
    }
    return {
        # torch conv weight OIHW -> HWIO
        "conv_w": jnp.asarray(t("conv_proj.weight").transpose(2, 3, 1, 0)),
        "conv_b": jnp.asarray(t("conv_proj.bias")),
        "cls_token": jnp.asarray(t("class_token")),
        "pos_emb": jnp.asarray(t("encoder.pos_embedding")),
        "lnf_w": jnp.asarray(t("encoder.ln.weight")),
        "lnf_b": jnp.asarray(t("encoder.ln.bias")),
        "head_w": jnp.asarray(t("heads.head.weight").T),
        "head_b": jnp.asarray(t("heads.head.bias")),
        "layers": layers,
    }


def params_from_openclip(state_dict, cfg: ViTConfig, dtype=np.float32):
    """Convert an OpenCLIP ``VisualTransformer`` state_dict (the ``visual.``
    subtree of a CLIP checkpoint, keys like conv1/class_embedding/
    positional_embedding/ln_pre/transformer.resblocks.N.*/ln_post/proj)."""

    def t(name):
        w = state_dict[name]
        if hasattr(w, "detach"):
            w = w.detach().to("cpu").float().numpy()
        return np.asarray(w, dtype=dtype)

    L = cfg.num_layers

    def stack(fmt, transpose=False):
        ws = [t(f"transformer.resblocks.{i}.{fmt}") for i in range(L)]
        return jnp.asarray(np.stack([w.T if transpose else w for w in ws]))

    layers = {
        "ln1_w": stack("ln_1.weight"), "ln1_b": stack("ln_1.bias"),
        "ln2_w": stack("ln_2.weight"), "ln2_b": stack("ln_2.bias"),
        "w_qkv": stack("attn.in_proj_weight", True),
        "b_qkv": stack("attn.in_proj_bias"),
        "w_proj": stack("attn.out_proj.weight", True),
        "b_proj": stack("attn.out_proj.bias"),
        "w_fc": stack("mlp.c_fc.weight", True), "b_fc": stack("mlp.c_fc.bias"),
        "w_out": stack("mlp.c_proj.weight", True), "b_out": stack("mlp.c_proj.bias"),
    }
    D = cfg.hidden_size
    return {
        "conv_w": jnp.asarray(t("conv1.weight").transpose(2, 3, 1, 0)),
        "cls_token": jnp.asarray(t("class_embedding")).reshape(1, 1, D),
        "pos_emb": jnp.asarray(t("positional_embedding"))[None],
        "ln_pre_w": jnp.asarray(t("ln_pre.weight")),
        "ln_pre_b": jnp.asarray(t("ln_pre.bias")),
        "lnf_w": jnp.asarray(t("ln_post.weight")),
        "lnf_b": jnp.asarray(t("ln_post.bias")),
        "proj": jnp.asarray(t("proj")),   # [D, proj_dim], applied as-is
        "layers": layers,
    }
