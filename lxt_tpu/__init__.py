"""lxt_tpu — TPU-native Layer-wise Relevance Propagation for transformers.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
rachtibat/LRP-eXplains-Transformers (LXT): AttnLRP / CP-LRP attributions for
LLaMA-family, Gemma 3, Qwen 2/3, BERT, GPT-2, Mixtral and ViT models — per-token
input heatmaps and per-neuron latent relevance in a single backward pass.

Where the reference monkey-patches PyTorch modules and registers autograd
hooks, this framework expresses every LRP rule as a ``jax.custom_vjp`` inside
functional model definitions, so ``relevance = x * grad(f)(x)`` is one jitted
XLA program: fused, shardable over device meshes, and rematerializable with
``jax.checkpoint`` for O(sqrt(N)) memory.
"""

__version__ = "0.1.0"

from lxt_tpu import ops
from lxt_tpu.composites import (
    Composite,
    attnlrp,
    cp_lrp,
    vanilla_gradient,
)


def from_hf(hf_model, composite=None, dtype=None, text_only=False,
            family=None, canonizers=None):
    """Convert a loaded HF torch model into an :class:`AttributionModel`
    (the one-call equivalent of the reference's ``monkey_patch``)."""
    from lxt_tpu.models.registry import from_hf as _from_hf
    return _from_hf(hf_model, composite=composite, dtype=dtype,
                    text_only=text_only, family=family,
                    canonizers=canonizers)


def from_pretrained(model_dir, composite=None, dtype=None, quantize_bits=None,
                    text_only=False, family=None, canonizers=None):
    """Load an :class:`AttributionModel` straight from an HF checkpoint
    directory via the native safetensors reader (no torch model built)."""
    from lxt_tpu.models.registry import from_pretrained as _fp
    return _fp(model_dir, composite=composite, dtype=dtype,
               quantize_bits=quantize_bits, text_only=text_only,
               family=family, canonizers=canonizers)


def __getattr__(name):
    # lazy top-level conveniences (keep `import lxt_tpu` light)
    if name in ("from_torchvision", "from_openclip", "from_siglip"):
        import lxt_tpu.models.registry as _r
        return getattr(_r, name)
    if name == "AttributionPipeline":
        from lxt_tpu.pipeline import AttributionPipeline
        return AttributionPipeline
    if name in ("input_relevance", "latent_relevance", "select_logit",
                "contrastive_target", "normalize_relevance",
                "multi_token_relevance", "topk_relevance", "multi_site_relevance",
                "multi_site_relevance"):
        import lxt_tpu.attribution as _a
        return getattr(_a, name)
    if name == "load_checkpoint_params":
        from lxt_tpu.io import load_checkpoint_params
        return load_checkpoint_params
    if name in ("audit", "AuditEntry", "UnruledOpError"):
        from lxt_tpu import rule_audit as _audit
        return getattr(_audit, name)
    if name in ("AttributionServer", "http_server"):
        import lxt_tpu.serve as _s
        return getattr(_s, name)
    if name in ("perturbation_curve", "faithfulness_report", "aopc_scores"):
        from lxt_tpu.utils import faithfulness as _e
        return getattr(_e, name)
    if name in ("integrated_gradients", "smoothgrad", "gradient_x_input"):
        from lxt_tpu import baselines as _b
        return getattr(_b, name)
    if name in ("apply_canonizers", "fold_norm_scales"):
        from lxt_tpu import canonizers as _c
        return getattr(_c, name)
    raise AttributeError(name)


__all__ = [
    "ops", "Composite", "attnlrp", "cp_lrp", "vanilla_gradient",
    "from_hf", "AttributionPipeline", "input_relevance", "latent_relevance",
    "select_logit", "contrastive_target", "normalize_relevance",
    "multi_token_relevance", "topk_relevance", "multi_site_relevance",
    "load_checkpoint_params", "AttributionServer", "http_server",
    "from_pretrained", "from_torchvision", "from_openclip", "from_siglip",
    "audit", "AuditEntry", "UnruledOpError",
    "perturbation_curve", "faithfulness_report", "aopc_scores",
    "integrated_gradients", "smoothgrad", "gradient_x_input",
    "apply_canonizers", "fold_norm_scales",
    "__version__",
]
