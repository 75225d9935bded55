"""One-time measurement of the torch reference's attribution throughput on
this host's CPU (the only hardware both frameworks can run on here; the
reference's own GPU numbers are unpublished, BASELINE.md).

Writes bench_baseline.json next to bench.py. Run:
    python scripts/measure_torch_baseline.py [--seq 1024] [--layers 22]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=1)
    args = ap.parse_args()

    from tests.conftest import _install_reference
    assert _install_reference()

    import torch
    from transformers.models.llama import modeling_llama
    from transformers.models.llama.modeling_llama import LlamaConfig, LlamaForCausalLM
    import lxt.efficient.models.llama as maps
    from lxt.efficient.core import monkey_patch

    monkey_patch(modeling_llama, maps.attnLRP)

    # TinyLlama-1.1B geometry — the flagship bench config (bench.py must match)
    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=5632,
        num_hidden_layers=22, num_attention_heads=32, num_key_value_heads=4,
        max_position_embeddings=4096, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval()
    model.gradient_checkpointing_enable()  # reference examples do this
    model.train()  # HF requires train mode for checkpointing (dropout is patched out)

    def run(batch, seq):
        ids = torch.randint(0, 32000, (batch, seq))
        emb = model.get_input_embeddings()(ids).detach().requires_grad_()
        t0 = time.time()
        logits = model(inputs_embeds=emb, use_cache=False).logits
        logits[:, -1, :].max(-1).values.sum().backward()
        rel = (emb * emb.grad).float().sum(-1)
        return time.time() - t0, rel

    print("warmup (seq 64)...", flush=True)
    run(1, 64)
    times = []
    for i in range(args.iters):
        dt, _ = run(args.batch, args.seq)
        times.append(dt)
        print(f"iter {i}: {dt:.1f}s", flush=True)

    best = min(times)
    hps = args.batch / best
    out = {
        "config": {
            "model": "llama-1.1b(TinyLlama geometry, random weights)",
            "batch": args.batch, "seq": args.seq, "dtype": "float32",
            "framework": "torch-2.13-cpu + reference lxt attnLRP + grad ckpt",
            "host_cpus": os.cpu_count(),
        },
        "seconds_per_batch": best,
        "heatmaps_per_sec": hps,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "bench_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
