"""Generate a response and explain every token of it.

The question the reference leaves to the user — "the model answered X;
WHY did it produce each token of X?" — as one flow: a jitted greedy
decode produces the continuation, then a single multi-site attribution
(one shared forward) yields one heatmap per generated token
(reference anchor: its examples explain ONE logit per backward,
examples/quantized_llama.py; here K maps cost one forward + K fused
pullbacks).

Run with a local HF checkpoint directory:
    python examples/respond_and_explain.py --model /path/to/llama -n 16
or without one (random weights, demonstrates the API end-to-end):
    python examples/respond_and_explain.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import numpy as np

import lxt_tpu
from lxt_tpu.attribution import normalize_relevance


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, help="local HF checkpoint dir")
    ap.add_argument("-n", "--max-new-tokens", type=int, default=8)
    ap.add_argument("--temperature", type=float, default=0.0,
                    help="> 0 samples the response (deterministic per --seed)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--contrastive", action="store_true",
                    help="maps explain the margin over the runner-up token")
    args = ap.parse_args()

    if args.model:
        from transformers import AutoTokenizer

        from lxt_tpu.models.registry import from_pretrained
        from lxt_tpu.pipeline import AttributionPipeline

        model = from_pretrained(args.model)
        tokenizer = AutoTokenizer.from_pretrained(args.model)
        pipe = AttributionPipeline(model, tokenizer)
        prompt = ("The highest mountain on Earth measured from sea level "
                  "is located in")
        (res,) = pipe.respond([prompt], args.max_new_tokens,
                              temperature=args.temperature, seed=args.seed,
                              contrastive=args.contrastive)
        print("response:", res.response_text)
        for tok, hm in zip(res.response_tokens, res.heatmaps):
            top = np.argsort(np.abs(hm.relevance))[::-1][:5]
            drivers = ", ".join(f"{hm.tokens[i]}:{hm.relevance[i]:+.2f}"
                                for i in top)
            print(f"  {tok!r:16} <- {drivers}")
        from lxt_tpu.utils import clean_tokens, html_response_heatmap
        path = html_response_heatmap(
            clean_tokens(res.heatmaps[0].tokens), res.response_tokens,
            np.stack([h.raw_relevance for h in res.heatmaps]),
            path="response_heatmap.html")
        print("wrote", path)
    else:
        from lxt_tpu.models import llama as jllama
        from lxt_tpu.models.registry import AttributionModel, _family_table

        cfg = jllama.LlamaConfig(
            vocab_size=512, hidden_size=256, intermediate_size=688,
            num_layers=4, num_heads=8, num_kv_heads=4)
        params = jllama.init_params(cfg, jax.random.PRNGKey(0))
        model = AttributionModel("llama", cfg, params, lxt_tpu.attnlrp,
                                 _family_table()["llama"])
        ids = np.random.RandomState(0).randint(1, 512, (1, 12))
        out = np.asarray(model.generate(ids, args.max_new_tokens))
        print("generated ids:", out[0, ids.shape[1]:].tolist())
        values, rels = model.attribute_response(out, ids.shape[1])
        for k in range(rels.shape[0]):
            heat = np.asarray(normalize_relevance(rels[k, 0]))
            print(f"  map {k} (logit {float(values[k, 0]):+.2f}): "
                  f"{np.round(heat[:8], 2)} ...")


if __name__ == "__main__":
    main()
