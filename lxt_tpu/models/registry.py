"""One-call user surface: HF model -> TPU attribution model.

Parity with the reference's ``lxt.efficient.monkey_patch(modeling_module)``
(``lxt/efficient/core.py:20-43`` + the DEFAULT_MAP registry at
``lxt/efficient/models/__init__.py:10-26``): one call makes a supported
model attribution-ready, and an unsupported model raises a ValueError that
lists the supported families. Instead of mutating torch classes, this
converts the weights once into a JAX pytree and returns an
:class:`AttributionModel` whose methods are jitted pure functions.

    import lxt_tpu
    model = lxt_tpu.from_hf(hf_model)               # any supported family
    value, relevance = model.attribute(input_ids)   # one fused TPU program
"""

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from lxt_tpu import composites
from lxt_tpu.attribution import input_relevance, latent_relevance, select_logit


def _llama_like(mod):
    return {
        "config": mod.LlamaConfig,
        "from_hf": mod.params_from_hf,
        "forward": mod.forward,
        "embed": lambda params, ids, cfg: mod.embed(params, ids),
    }


def _family_table():
    from lxt_tpu.models import bert, gemma3, gpt2, llama, mixtral

    return {
        "llama": _llama_like(llama),
        "qwen2": _llama_like(llama),
        "qwen3": _llama_like(llama),
        "mistral": _llama_like(llama),
        "phi3": _llama_like(llama),
        "gemma3": {
            "config": gemma3.Gemma3Config,
            "from_hf": gemma3.params_from_hf,
            "forward": gemma3.forward,
            "embed": gemma3.embed,
        },
        "gemma3_text": {
            "config": gemma3.Gemma3Config,
            "from_hf": gemma3.params_from_hf,
            "forward": gemma3.forward,
            "embed": gemma3.embed,
        },
        "gpt2": {
            "config": gpt2.GPT2Config,
            "from_hf": gpt2.params_from_hf,
            "forward": gpt2.forward,
            "embed": lambda params, ids, cfg: gpt2.embed(params, ids)[0],
        },
        "bert": {
            "config": bert.BertConfig,
            "from_hf": bert.params_from_hf,
            "forward": bert.forward,
            "embed": lambda params, ids, cfg: bert.embed(params, ids),
        },
        "mixtral": {
            "config": mixtral.MixtralConfig,
            "from_hf": mixtral.params_from_hf,
            "forward": mixtral.forward,
            "embed": lambda params, ids, cfg: mixtral.embed(params, ids),
        },
    }


SUPPORTED_FAMILIES = (
    "llama", "qwen2", "qwen3", "mistral", "phi3", "gemma3", "gemma3_text",
    "gpt2", "bert", "mixtral",
)


@dataclasses.dataclass
class AttributionModel:
    """A converted model plus its attribution entry points.

    Every entry point passes ``params`` as a jit ARGUMENT (a closure
    constant bakes the weight tree into the serialized program, which the
    remote-TPU compile service rejects for real model sizes) and caches
    compiled programs per (shape, composite, target) in ``_jit``."""

    family: str
    cfg: Any
    params: Any
    composite: composites.Composite
    _fns: dict
    _jit: dict = dataclasses.field(default_factory=dict, repr=False)

    def embed(self, input_ids):
        return self._fns["embed"](self.params, jnp.asarray(input_ids), self.cfg)

    def logits(self, input_ids, composite=None):
        composite = composite or self.composite
        fwd, cfg = self._fns["forward"], self.cfg
        embeds = self.embed(input_ids)
        key = ("logits", embeds.shape, embeds.dtype.name, composite)
        if key not in self._jit:
            self._jit[key] = jax.jit(
                lambda params, e: fwd(params, cfg, e, composite).logits)
        return self._jit[key](self.params, embeds)

    def attribute(self, input_ids, *, target: Optional[Callable] = None,
                  position: int = -1, token=None, composite=None, jit=True):
        """Per-token input relevance, one fused forward+backward.

        Default target: the argmax logit at ``position`` (the reference's
        canonical flow, examples/quantized_llama.py:39-47). Returns
        ``(target_value, relevance [B, T])``.
        """
        composite = composite or self.composite
        fwd, cfg = self._fns["forward"], self.cfg
        embeds = self.embed(input_ids)
        tok = None if token is None else jnp.asarray(token)
        key = ("attribute", embeds.shape, embeds.dtype.name, composite,
               position, target, tok is not None, jit)
        if key not in self._jit:
            def run(params, e, tok):
                def tgt(ee):
                    logits = fwd(params, cfg, ee, composite).logits
                    if target is not None:
                        return target(logits)
                    if logits.ndim == 2:  # classification head (BERT)
                        return logits.max(axis=-1).sum()
                    return select_logit(logits, position=position, token=tok)
                return input_relevance(tgt, e)
            self._jit[key] = jax.jit(run) if jit else run
        return self._jit[key](self.params, embeds, tok)

    def attribute_latent(self, input_ids, *, target: Optional[Callable] = None,
                         position: int = -1, composite=None):
        """Input relevance + per-layer latent relevance in ONE backward
        (reference docs/latent-feature-attribution-efficient.rst)."""
        composite = composite or self.composite
        fwd, cfg = self._fns["forward"], self.cfg
        embeds = self.embed(input_ids)
        L = cfg.num_layers
        B, T, D = embeds.shape
        key = ("latent", embeds.shape, embeds.dtype.name, composite,
               position, target)
        if key not in self._jit:
            def run(params, e):
                def forward_with_probes(ee, probes):
                    out = fwd(params, cfg, ee, composite, probes=probes,
                              output_hidden_states=True)
                    logits = out.logits
                    if target is not None:
                        val = target(logits)
                    elif logits.ndim == 2:
                        val = logits.max(axis=-1).sum()
                    else:
                        val = select_logit(logits, position=position)
                    return val, out.hidden_states
                return latent_relevance(forward_with_probes, e, (L, B, T, D))
            self._jit[key] = jax.jit(run)
        return self._jit[key](self.params, embeds)


def detect_family(hf_config) -> str:
    mt = getattr(hf_config, "model_type", None)
    if mt not in SUPPORTED_FAMILIES:
        supported = ", ".join(SUPPORTED_FAMILIES)
        raise ValueError(
            f"{mt!r} not yet supported. Supported models are: {supported}. "
            f"Contributions welcome — add a family module under "
            f"lxt_tpu/models/ and register it here.")
    return mt


def _convert(state_dict, hf_config, composite, dtype) -> AttributionModel:
    """Shared state_dict -> AttributionModel conversion (torch tensors or
    numpy arrays — the family converters accept either)."""
    import numpy as np

    # multimodal wrappers (e.g. Gemma3ForConditionalGeneration) expose the
    # text config underneath; extract the language-model weights (use
    # lxt_tpu.models.gemma3.multimodal_* for joint image+text attribution)
    if hasattr(hf_config, "text_config") and hf_config.model_type in (
            "gemma3",):
        hf_config = hf_config.text_config
        if any(k.startswith("model.language_model.") for k in state_dict):
            sd = {k.replace("model.language_model.", "model."): v
                  for k, v in state_dict.items()
                  if k.startswith("model.language_model.")}
            if "lm_head.weight" in state_dict:
                sd["lm_head.weight"] = state_dict["lm_head.weight"]
            state_dict = sd
    family = detect_family(hf_config)
    table = _family_table()[family]

    cfg = table["config"].from_hf(hf_config)
    params = table["from_hf"](state_dict, cfg, dtype=dtype or np.float32)
    if composite is None:
        composite = composites.cp_lrp if family == "gpt2" else composites.attnlrp
    return AttributionModel(family=family, cfg=cfg, params=params,
                            composite=composite, _fns=table)


def from_hf(hf_model, composite: composites.Composite = None,
            dtype=None) -> AttributionModel:
    """Convert a loaded HF torch model into an AttributionModel.

    ``composite`` defaults to AttnLRP except GPT-2, where the reference
    recommends CP-LRP (models/gpt2.py:24-26).
    """
    return _convert(hf_model.state_dict(), hf_model.config, composite, dtype)


def from_pretrained(model_dir, composite: composites.Composite = None,
                    dtype=None, quantize_bits: int = None) -> AttributionModel:
    """Load an AttributionModel straight from an HF checkpoint DIRECTORY —
    no torch model is ever instantiated: the config comes from
    ``transformers.AutoConfig`` and the weights stream through the native
    mmap safetensors loader (:mod:`lxt_tpu.io`), so an 8B checkpoint never
    holds a second full-precision torch copy in host RAM.

    ``quantize_bits`` (4/8) applies the per-family weight-only
    quantization spec after conversion (the bitsandbytes role in the
    reference's quantized examples, examples/quantized_llama.py:13-19).
    """
    from transformers import AutoConfig

    from lxt_tpu.io import load_checkpoint_state_dict

    import numpy as np

    hf_config = AutoConfig.from_pretrained(model_dir)
    # thread dtype into the loader: widening a bf16 checkpoint to a host
    # f32 dict only to cast back down would double peak host memory
    state = load_checkpoint_state_dict(model_dir, dtype=dtype or np.float32)
    model = _convert(state, hf_config, composite, dtype)
    if quantize_bits:
        from lxt_tpu.ops.quant import quantize_params
        model.params = quantize_params(model.params, bits=quantize_bits,
                                       family=model.family)
    return model
