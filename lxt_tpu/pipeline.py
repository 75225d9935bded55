"""Batched heatmap pipeline: prompts in, per-token relevances out.

Beyond-reference serving surface (the reference attributes one prompt per
script run): tokenizes a list of prompts, left-pads them into one batch,
runs ONE fused attribution program, and returns per-prompt tokens +
normalized relevance. Left padding keeps every prompt's target at the last
position; padding is expressed as per-example ``kv_begin`` indices so the
Pallas flash-attention kernel stays engaged (padded key blocks are skipped
in-kernel — no O(T^2) bias materialization), and per-example rope positions
follow the HF convention.

Scale-out: pass ``mesh=`` to shard the batch over the mesh's ``data`` axis
(the north-star batched-heatmap workload); the jitted program is compiled
with sharded input layouts and XLA keeps the whole attribution collective-
free except the final gather of per-prompt relevances. ``pad_multiple``
rounds the padded length up (default 128 on TPU) so sequences stay
flash-eligible.
"""

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lxt_tpu import composites



@dataclasses.dataclass
class Heatmap:
    tokens: List[str]
    relevance: np.ndarray       # [len(tokens)], normalized to [-1, 1]
    raw_relevance: np.ndarray   # unnormalized
    value: float                # this prompt's explained logit value
    #: set by ``topk>1`` calls: which candidate token this map explains
    target_token: Optional[str] = None
    target_token_id: Optional[int] = None


@dataclasses.dataclass
class ResponseAttribution:
    """:meth:`AttributionPipeline.respond` result for one prompt: the
    greedy continuation plus one :class:`Heatmap` PER generated token
    (map k explains why token k was generated; its ``relevance`` spans
    prompt + response, causally zero after the predicting position)."""
    prompt_tokens: List[str]
    response_tokens: List[str]
    response_text: str
    heatmaps: List[Heatmap]


class AttributionPipeline:
    """``pipeline(prompts)`` -> list of :class:`Heatmap`.

    ``model`` is an :class:`~lxt_tpu.models.registry.AttributionModel` of a
    causal-LM family supporting ``kv_begin`` (Llama/Qwen/Mistral/Phi-3/
    Gemma-3/GPT-2/Mixtral).
    """

    def __init__(self, model, tokenizer, composite=None, mesh=None,
                 pad_multiple: Optional[int] = None,
                 bucket_batch: bool = False, jit_cache_size: int = 64):
        from lxt_tpu.utils.cache import JitCache

        self.model = model
        self.tokenizer = tokenizer
        self.composite = composites.resolve(composite or model.composite)
        self.mesh = mesh
        if pad_multiple is None:
            pad_multiple = 128 if jax.default_backend() == "tpu" else 1
        self.pad_multiple = pad_multiple
        #: round the batch up to the next power of two with fully-padded
        #: dummy rows — serving workloads produce ragged coalesced batches
        #: (7, then 3, then 8...) and every distinct batch size is
        #: otherwise a fresh XLA compile
        self.bucket_batch = bucket_batch
        #: bounded LRU: pad_multiple/bucket_batch keep the key space small
        #: in practice, but a long-running server fed adversarial length
        #: diversity must not accumulate compiled programs without limit
        self._jitted = JitCache(maxsize=jit_cache_size)

    def _pad_id(self):
        pad = getattr(self.tokenizer, "pad_token_id", None)
        if pad is None:
            pad = getattr(self.tokenizer, "eos_token_id", 0) or 0
        return pad

    def _encode(self, prompts):
        # items may be pre-tokenized id lists (the serving layer tokenizes
        # once for its length guard and passes the ids through)
        seqs = [self.tokenizer(p)["input_ids"] if isinstance(p, str)
                else list(p) for p in prompts]
        T = max(len(s) for s in seqs)
        m = self.pad_multiple
        T = -(-T // m) * m
        pad = self._pad_id()
        B = len(seqs)
        if self.bucket_batch:
            B = 1 << (B - 1).bit_length()   # next power of two
        if self.mesh is not None:
            n = self.mesh.shape["data"]
            B = -(-B // n) * n          # round the batch up to the data axis
        ids = np.full((B, T), pad, np.int32)
        kv_begin = np.full((B,), T, np.int32)  # dummy rows: fully padded
        for i, s in enumerate(seqs):
            ids[i, T - len(s):] = s            # left padding
            kv_begin[i] = T - len(s)
        return ids, kv_begin, seqs

    def _step(self, shape, composite, topk: int = 1):
        # Composite is a frozen (hashable) dataclass; keying on the object
        # itself distinguishes e.g. two gamma variants that share a name.
        key = (shape, composite, topk)
        fn = self._jitted.get(key)
        if fn is None:
            fwd, cfg = self.model._fns["forward"], self.model.cfg

            # params are a jit ARGUMENT, not a closure constant: closed-over
            # arrays bake into the serialized program, which the remote-TPU
            # compile service rejects outright for real model sizes
            if topk > 1:
                from lxt_tpu.attribution import topk_relevance

                def run(params, embeds, kv_begin):
                    # logits only at the explained last position (saves the
                    # T-1 unused lm_head rows in forward and backward); the
                    # k pullbacks share this single forward's residuals
                    return topk_relevance(
                        lambda e: fwd(params, cfg, e, composite,
                                      kv_begin=kv_begin, logits_at=-1).logits,
                        embeds, topk)
            else:
                def run(params, embeds, kv_begin):
                    def tgt(e):
                        # logits only at the explained last position (saves
                        # the T-1 unused lm_head rows in fwd and bwd)
                        logits = fwd(params, cfg, e, composite,
                                     kv_begin=kv_begin, logits_at=-1).logits
                        row = logits[:, -1, :]
                        per_example = row.max(axis=-1)
                        # summing is safe: per-example targets have disjoint
                        # gradients
                        return per_example.sum(), per_example
                    (_, per_example), grad = jax.value_and_grad(
                        tgt, has_aux=True)(embeds)
                    rel = (embeds.astype(jnp.float32)
                           * grad.astype(jnp.float32)).sum(-1)
                    return per_example, rel

            if self.mesh is None:
                fn = self._jitted[key] = jax.jit(run)
            else:
                from jax.sharding import NamedSharding, PartitionSpec as P
                data = NamedSharding(self.mesh, P("data"))
                in_sh = (None,
                         NamedSharding(self.mesh, P("data", None, None)),
                         data)
                if topk > 1:
                    kb = NamedSharding(self.mesh, P(None, "data"))
                    out_sh = (kb, kb,
                              NamedSharding(self.mesh, P(None, "data", None)))
                else:
                    out_sh = (data, NamedSharding(self.mesh, P("data", None)))
                fn = self._jitted[key] = jax.jit(run, in_shardings=in_sh,
                                                 out_shardings=out_sh)
        return fn

    def _tokens_of(self, s):
        return (self.tokenizer.convert_ids_to_tokens(s)
                if hasattr(self.tokenizer, "convert_ids_to_tokens")
                else [str(t) for t in s])

    def respond(self, prompts, max_new_tokens: int, composite=None,
                eos_token_id="auto", temperature: float = 0.0,
                top_k: Optional[int] = None, seed: int = 0,
                contrastive: bool = False) -> List[ResponseAttribution]:
        """Generate a continuation per prompt AND explain every token of
        it — the full "why did the model answer this?" flow in two fused
        programs (one decode loop + one multi-site attribution sharing a
        single forward), batched across prompts. Greedy by default;
        ``temperature > 0`` samples (optionally ``top_k``-truncated),
        deterministic per ``seed`` — explaining what the model *actually*
        said.

        ``eos_token_id="auto"`` reads the tokenizer; pass ``None`` to
        always emit ``max_new_tokens``. Rows that hit eos are trimmed
        (the eos token itself keeps its map). With ``mesh=``, the batch
        shards over the ``data`` axis (inputs are placed with data
        shardings; jit compiles per input sharding, so the decode loop
        and the attribution both run batch-parallel). ``contrastive``:
        each map explains the margin over the strongest rival token
        ("why this token and not the runner-up"); ``Heatmap.value``
        becomes that margin.
        """
        N = int(max_new_tokens)
        if N < 1:
            raise ValueError(f"max_new_tokens must be >= 1, got {N}")
        if eos_token_id == "auto":
            eos_token_id = getattr(self.tokenizer, "eos_token_id", None)
        composite = composites.resolve(composite or self.composite)
        sample_kw = {}
        if temperature > 0:
            sample_kw = dict(temperature=float(temperature), top_k=top_k,
                             key=jax.random.PRNGKey(int(seed)))
        ids, kv_begin, seqs = self._encode(prompts)
        T0 = ids.shape[1]
        kv_begin = jnp.asarray(kv_begin)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            ids = jax.device_put(
                ids, NamedSharding(self.mesh, P("data", None)))
            kv_begin = jax.device_put(
                kv_begin, NamedSharding(self.mesh, P("data")))
        out_dev = self.model.generate(ids, N, eos_token_id=eos_token_id,
                                      kv_begin=kv_begin, **sample_kw)
        # keep ids on device between the two programs: the generated batch
        # retains its (possibly data-sharded) layout into the attribution
        values, rel = self.model.attribute_response(
            out_dev, T0, composite=composite, kv_begin=kv_begin,
            contrastive=contrastive)
        # host-side post-processing only (eager jnp ops each pay a device
        # round-trip over a remote-TPU tunnel — see __call__)
        out = np.asarray(out_dev)
        values, rel = np.asarray(values), np.asarray(rel)

        results = []
        for i, s in enumerate(seqs):
            gen = out[i, T0:]
            keep = N
            if eos_token_id is not None:
                hits = np.nonzero(gen == eos_token_id)[0]
                if hits.size:
                    keep = int(hits[0]) + 1     # trim AFTER the first eos
            resp_ids = [int(t) for t in gen[:keep]]
            prompt_tokens = self._tokens_of(s)
            resp_tokens = self._tokens_of(resp_ids)
            tokens = prompt_tokens + resp_tokens
            lo = T0 - len(s)
            maps = []
            for k in range(keep):
                r = rel[k, i, lo:T0 + keep]
                maps.append(Heatmap(
                    tokens=tokens,
                    relevance=r / (np.abs(r).max() + 1e-12),
                    raw_relevance=r,
                    value=float(values[k, i]),
                    target_token=resp_tokens[k],
                    target_token_id=resp_ids[k]))
            text = (self.tokenizer.decode(resp_ids)
                    if hasattr(self.tokenizer, "decode")
                    else " ".join(resp_tokens))
            results.append(ResponseAttribution(
                prompt_tokens=prompt_tokens, response_tokens=resp_tokens,
                response_text=text, heatmaps=maps))
        return results

    def __call__(self, prompts, composite=None, topk: int = 1):
        """``topk=1`` (default): list of :class:`Heatmap`, one per prompt,
        explaining the argmax next token. ``topk>1``: list of LISTS — the
        k candidate heatmaps per prompt, all k sharing one forward pass
        (:func:`lxt_tpu.topk_relevance`), each tagged with its
        ``target_token``."""
        composite = composites.resolve(composite or self.composite)
        topk = int(topk)
        if topk < 1:
            raise ValueError(f"topk must be >= 1, got {topk}")
        ids, kv_begin, seqs = self._encode(prompts)
        embeds = self.model.embed(ids)
        fn = self._step((ids.shape, embeds.dtype.name), composite, topk)
        if topk > 1:
            toks, value, rel = fn(self.model.params, embeds,
                                  jnp.asarray(kv_begin))
            toks = np.asarray(toks)
        else:
            value, rel = fn(self.model.params, embeds, jnp.asarray(kv_begin))
        rel = np.asarray(rel)
        value = np.asarray(value)

        out = []
        for i, s in enumerate(seqs):
            tokens = self._tokens_of(s)
            lo = ids.shape[1] - len(s)
            # normalize on the HOST: per-prompt eager jnp ops each pay a
            # device round-trip (~1s/prompt over a remote-TPU tunnel —
            # measured 9.6s vs 0.15s for a batch of 8)
            if topk > 1:
                cands = []
                for k in range(topk):
                    r = rel[k, i, lo:]
                    tid = int(toks[k, i])
                    cands.append(Heatmap(
                        tokens=tokens,
                        relevance=r / (np.abs(r).max() + 1e-12),
                        raw_relevance=r,
                        value=float(value[k, i]),
                        target_token=self._tokens_of([tid])[0],
                        target_token_id=tid))
                out.append(cands)
            else:
                r = rel[i, lo:]
                out.append(Heatmap(
                    tokens=tokens,
                    relevance=r / (np.abs(r).max() + 1e-12),
                    raw_relevance=r,
                    value=float(value[i])))
        return out
