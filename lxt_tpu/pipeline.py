"""Batched heatmap pipeline: prompts in, per-token relevances out.

Beyond-reference serving surface (the reference attributes one prompt per
script run): tokenizes a list of prompts, left-pads them into one batch,
runs ONE fused attribution program (optionally sharded over a mesh via
``lxt_tpu.parallel``), and returns per-prompt tokens + normalized relevance.
Left padding keeps every prompt's target at the last position; padded keys
are masked and per-example rope positions follow the HF convention.
"""

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from lxt_tpu.attribution import normalize_relevance


@dataclasses.dataclass
class Heatmap:
    tokens: List[str]
    relevance: np.ndarray       # [len(tokens)], normalized to [-1, 1]
    raw_relevance: np.ndarray   # unnormalized
    value: float                # this prompt's explained logit value


class AttributionPipeline:
    """``pipeline(prompts)`` -> list of :class:`Heatmap`.

    ``model`` is an :class:`~lxt_tpu.models.registry.AttributionModel` of a
    causal-LM family supporting ``attention_mask`` (Llama/Qwen/Mistral/Phi-3).
    """

    def __init__(self, model, tokenizer, composite=None):
        self.model = model
        self.tokenizer = tokenizer
        self.composite = composite or model.composite
        self._jitted = {}

    def _pad_id(self):
        pad = getattr(self.tokenizer, "pad_token_id", None)
        if pad is None:
            pad = getattr(self.tokenizer, "eos_token_id", 0) or 0
        return pad

    def _encode(self, prompts):
        seqs = [self.tokenizer(p)["input_ids"] for p in prompts]
        T = max(len(s) for s in seqs)
        pad = self._pad_id()
        ids = np.full((len(seqs), T), pad, np.int32)
        mask = np.zeros((len(seqs), T), np.int32)
        for i, s in enumerate(seqs):
            ids[i, T - len(s):] = s       # left padding
            mask[i, T - len(s):] = 1
        return ids, mask, seqs

    def _step(self, shape, composite):
        # Composite is a frozen (hashable) dataclass; keying on the object
        # itself distinguishes e.g. two gamma variants that share a name.
        key = (shape, composite)
        if key not in self._jitted:
            fwd, cfg, params = (self.model._fns["forward"], self.model.cfg,
                                self.model.params)

            def run(embeds, mask):
                def tgt(e):
                    logits = fwd(params, cfg, e, composite,
                                 attention_mask=mask).logits
                    row = logits[:, -1, :]
                    per_example = row.max(axis=-1)
                    # summing is safe: per-example targets have disjoint grads
                    return per_example.sum(), per_example
                (_, per_example), grad = jax.value_and_grad(
                    tgt, has_aux=True)(embeds)
                rel = (embeds.astype(jnp.float32) * grad.astype(jnp.float32)
                       ).sum(-1)
                return per_example, rel

            self._jitted[key] = jax.jit(run)
        return self._jitted[key]

    def __call__(self, prompts, composite=None) -> List[Heatmap]:
        composite = composite or self.composite
        ids, mask, seqs = self._encode(prompts)
        embeds = self.model.embed(ids)
        value, rel = self._step((ids.shape, embeds.dtype.name), composite)(
            embeds, jnp.asarray(mask))
        rel = np.asarray(rel)

        value = np.asarray(value)
        out = []
        for i, s in enumerate(seqs):
            r = rel[i, ids.shape[1] - len(s):]
            tokens = (self.tokenizer.convert_ids_to_tokens(s)
                      if hasattr(self.tokenizer, "convert_ids_to_tokens")
                      else [str(t) for t in s])
            out.append(Heatmap(
                tokens=tokens,
                relevance=np.asarray(normalize_relevance(jnp.asarray(r))),
                raw_relevance=r,
                value=float(value[i])))
        return out
