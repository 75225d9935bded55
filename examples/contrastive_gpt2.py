"""Contrastive explanation with GPT-2: why token A rather than token B?

Reference flow: docs/source/quickstart.rst GPT-2 section — seed the backward
with logit(A) - logit(B). Here the contrast is just a different scalar
target for the same fused program. CP-LRP is the GPT-2 default (the
reference's own recommendation).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import numpy as np

import lxt_tpu
from lxt_tpu.attribution import contrastive_target, input_relevance, normalize_relevance


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, help="local GPT-2 checkpoint dir")
    args = ap.parse_args()

    if args.model:
        from transformers import AutoModelForCausalLM, AutoTokenizer
        tok = AutoTokenizer.from_pretrained(args.model)
        model = lxt_tpu.from_hf(AutoModelForCausalLM.from_pretrained(args.model))
        prompt = "The capital of France is"
        ids = np.asarray(tok(prompt)["input_ids"])[None]
        tok_a = tok(" Paris")["input_ids"][-1]
        tok_b = tok(" London")["input_ids"][-1]
        words = tok.convert_ids_to_tokens(ids[0])
    else:
        from lxt_tpu.models import gpt2 as jgpt2
        from lxt_tpu.models.registry import AttributionModel, _family_table
        cfg = jgpt2.GPT2Config(vocab_size=512, hidden_size=128, num_layers=4,
                               num_heads=4, max_positions=64)
        params = jgpt2.init_params(cfg, jax.random.PRNGKey(0))
        model = AttributionModel("gpt2", cfg, params, lxt_tpu.cp_lrp,
                                 _family_table()["gpt2"])
        ids = np.random.RandomState(0).randint(0, 512, (1, 12))
        tok_a, tok_b = 7, 11
        words = [f"tok{i}" for i in ids[0]]

    value, rel = model.attribute(
        ids, target=lambda logits: contrastive_target(logits, [tok_a], [tok_b]))
    heat = np.asarray(normalize_relevance(rel[0]))
    print(f"logit({tok_a}) - logit({tok_b}) = {float(value):+.4f}")
    for w, r in zip(words, heat):
        bar = "#" * int(abs(r) * 30)
        print(f"  {w:>12s} {r:+.3f} {bar}")


if __name__ == "__main__":
    main()
