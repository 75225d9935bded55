"""Per-token AttnLRP heatmap for a Llama-family causal LM.

Mirrors the reference's canonical flow (examples/quantized_llama.py): load a
model, attribute the top logit at the last position back to the prompt
tokens, normalize, render a heatmap. One fused TPU program does forward,
backward and the Gradient*Input contraction.

Run with a local HF checkpoint directory (no network in this environment):
    python examples/llama_attribution.py --model /path/to/llama [--bits 8]
or without one (random weights, demonstrates the API end-to-end):
    python examples/llama_attribution.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import numpy as np

import lxt_tpu
from lxt_tpu.attribution import normalize_relevance
from lxt_tpu.utils import clean_tokens, pdf_heatmap


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, help="local HF checkpoint dir")
    ap.add_argument("--bits", type=int, default=None, choices=(4, 8),
                    help="weight-only quantization (bitsandbytes parity)")
    ap.add_argument("--out", default="heatmap.pdf")
    args = ap.parse_args()

    if args.model:
        import torch
        from transformers import AutoModelForCausalLM, AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.model)
        hf = AutoModelForCausalLM.from_pretrained(
            args.model, torch_dtype=torch.float32)
        model = lxt_tpu.from_hf(hf)
        prompt = ("The highest mountain on Earth measured from sea level "
                  "is located in the Himalayas and is called")
        ids = np.asarray(tokenizer(prompt)["input_ids"])[None]
        words = tokenizer.convert_ids_to_tokens(ids[0])
    else:
        from lxt_tpu.models import llama as jllama
        from lxt_tpu.models.registry import AttributionModel, _family_table

        cfg = jllama.LlamaConfig(
            vocab_size=512, hidden_size=256, intermediate_size=688,
            num_layers=4, num_heads=8, num_kv_heads=4)
        params = jllama.init_params(cfg, jax.random.PRNGKey(0))
        model = AttributionModel("llama", cfg, params, lxt_tpu.attnlrp,
                                 _family_table()["llama"])
        ids = np.random.RandomState(0).randint(0, 512, (1, 24))
        words = [f"▁tok{i}" for i in ids[0]]

    if args.bits:
        from lxt_tpu.ops.quant import quantize_params
        model.params = quantize_params(model.params, bits=args.bits)

    value, relevance = model.attribute(ids)
    heat = np.asarray(normalize_relevance(relevance[0]))
    print("explained logit:", float(value))
    print("relevance:", np.round(heat, 3))

    path = pdf_heatmap(clean_tokens(words), heat, path=args.out)
    print("wrote", path)


if __name__ == "__main__":
    main()
