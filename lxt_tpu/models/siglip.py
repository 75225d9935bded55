"""SigLIP vision tower with LRP-aware forward (Gemma 3's image encoder).

HF reference: transformers ``modeling_siglip`` (SiglipVisionModel): conv
patch embedding with bias, learned position embeddings (no class token),
pre-norm encoder blocks with bidirectional attention and gelu-tanh MLPs,
final post-layernorm. Rules: identity on GELU, stop-grad-std LayerNorm,
uniform at attention q/k/v — the same recipe the reference applies to its
ViTs (lxt/efficient/models/vit_torch.py), applied here so image relevance
propagates faithfully into pixel space.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lxt_tpu import composites
from lxt_tpu.models import common
from lxt_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class SiglipConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_layers: int = 27
    num_heads: int = 16
    ln_eps: float = 1e-6
    act: str = "gelu"  # gelu_pytorch_tanh

    @property
    def hd(self):
        return self.hidden_size // self.num_heads

    @property
    def num_patches(self):
        return (self.image_size // self.patch_size) ** 2

    @classmethod
    def from_hf(cls, hf_config):
        return cls(
            image_size=hf_config.image_size,
            patch_size=hf_config.patch_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            ln_eps=hf_config.layer_norm_eps,
        )


def init_params(cfg: SiglipConfig, key, dtype=jnp.float32):
    L, D, I, P = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size, cfg.patch_size
    ks = jax.random.split(key, 8)
    u = lambda k, s: common.uniform_init(k, s, dtype=dtype)  # noqa: E731
    layers = {
        "ln1_w": jnp.ones((L, D), dtype), "ln1_b": jnp.zeros((L, D), dtype),
        "ln2_w": jnp.ones((L, D), dtype), "ln2_b": jnp.zeros((L, D), dtype),
        "wq": u(ks[0], (L, D, D)), "bq": jnp.zeros((L, D), dtype),
        "wk": u(ks[1], (L, D, D)), "bk": jnp.zeros((L, D), dtype),
        "wv": u(ks[2], (L, D, D)), "bv": jnp.zeros((L, D), dtype),
        "wo": u(ks[3], (L, D, D)), "bo": jnp.zeros((L, D), dtype),
        "w_fc": u(ks[4], (L, D, I)), "b_fc": jnp.zeros((L, I), dtype),
        "w_out": u(ks[5], (L, I, D)), "b_out": jnp.zeros((L, D), dtype),
    }
    return {
        "conv_w": u(ks[6], (P, P, 3, D)),
        "conv_b": jnp.zeros((D,), dtype),
        "pos_emb": u(ks[7], (cfg.num_patches, D)),
        "lnf_w": jnp.ones((D,), dtype), "lnf_b": jnp.zeros((D,), dtype),
        "layers": layers,
    }


def forward(params, cfg: SiglipConfig, pixels,
            composite: composites.Composite = composites.attnlrp,
            *, remat: bool = True):
    """``pixels``: NHWC [B, H, W, 3] -> patch features [B, P, D]."""
    B = pixels.shape[0]
    D = cfg.hidden_size
    act_fn = common.ACTIVATIONS[cfg.act]

    x = composite.conv2d(pixels, params["conv_w"], params["conv_b"],
                         strides=(cfg.patch_size, cfg.patch_size),
                         padding="VALID", site="conv_w")
    h = x.reshape(B, -1, D) + params["pos_emb"]
    H, hd = cfg.num_heads, cfg.hd

    def layer_fn(h, lp):
        x = composite.layer_norm(h, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
        q = common.split_heads(composite.linear(x, lp["wq"], lp["bq"], site="wq"), H, hd)
        k = common.split_heads(composite.linear(x, lp["wk"], lp["bk"], site="wk"), H, hd)
        v = common.split_heads(composite.linear(x, lp["wv"], lp["bv"], site="wv"), H, hd)
        attn = attention(q, k, v, composite=composite, impl="einsum")
        h = h + composite.linear(common.merge_heads(attn), lp["wo"], lp["bo"], site="wo")
        x = composite.layer_norm(h, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
        x = composite.act(act_fn, composite.linear(x, lp["w_fc"], lp["b_fc"], site="w_fc"))
        h = h + composite.linear(x, lp["w_out"], lp["b_out"], site="w_out")
        return h, None

    body = common.remat_wrap(layer_fn, remat)
    h, _ = jax.lax.scan(body, h, params["layers"])
    return composite.layer_norm(h, params["lnf_w"], params["lnf_b"], cfg.ln_eps)


def params_from_hf(state_dict, cfg: SiglipConfig, dtype=np.float32,
                   prefix="vision_tower.vision_model."):
    def t(name):
        w = state_dict[prefix + name]
        if hasattr(w, "detach"):
            w = w.detach().to("cpu").float().numpy()
        return np.asarray(w, dtype=dtype)

    L = cfg.num_layers

    def stack(fmt, transpose=False):
        ws = [t(f"encoder.layers.{i}.{fmt}") for i in range(L)]
        return jnp.asarray(np.stack([w.T if transpose else w for w in ws]))

    layers = {
        "ln1_w": stack("layer_norm1.weight"), "ln1_b": stack("layer_norm1.bias"),
        "ln2_w": stack("layer_norm2.weight"), "ln2_b": stack("layer_norm2.bias"),
        "wq": stack("self_attn.q_proj.weight", True), "bq": stack("self_attn.q_proj.bias"),
        "wk": stack("self_attn.k_proj.weight", True), "bk": stack("self_attn.k_proj.bias"),
        "wv": stack("self_attn.v_proj.weight", True), "bv": stack("self_attn.v_proj.bias"),
        "wo": stack("self_attn.out_proj.weight", True), "bo": stack("self_attn.out_proj.bias"),
        "w_fc": stack("mlp.fc1.weight", True), "b_fc": stack("mlp.fc1.bias"),
        "w_out": stack("mlp.fc2.weight", True), "b_out": stack("mlp.fc2.bias"),
    }
    return {
        "conv_w": jnp.asarray(
            t("embeddings.patch_embedding.weight").transpose(2, 3, 1, 0)),
        "conv_b": jnp.asarray(t("embeddings.patch_embedding.bias")),
        "pos_emb": jnp.asarray(t("embeddings.position_embedding.weight")),
        "lnf_w": jnp.asarray(t("post_layernorm.weight")),
        "lnf_b": jnp.asarray(t("post_layernorm.bias")),
        "layers": layers,
    }
