"""Llama-3-8B-geometry AttnLRP attribution on ONE TPU v5e chip via int4.

The BASELINE north star targets Llama-3-8B at 4k context; a single v5e has
16 GB HBM, so bf16 weights alone (16 GB) don't fit — int4 weight-only
quantization (4 GB + scales) with bf16 embeddings does, exactly the role
bitsandbytes plays in the reference (examples/quantized_llama.py).

Run: python scripts/demo_llama8b_int4.py [--seq 2048] [--batch 1]
Prints seconds/attribution and heatmaps/sec on random weights.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--remat", choices=["full", "offload"], default="full")
    args = ap.parse_args()

    import lxt_tpu
    from lxt_tpu.attribution import input_relevance, select_logit
    from lxt_tpu.models import llama as jllama

    cfg = jllama.LlamaConfig(
        vocab_size=128256, hidden_size=4096, intermediate_size=14336,
        num_layers=32, num_heads=32, num_kv_heads=8, rms_eps=1e-5,
        rope_theta=500000.0, dtype="bfloat16")

    t0 = time.time()
    # quantize each projection as it is sampled: the bf16 8B tree (15 GiB)
    # must never fully exist on a 16 GiB chip
    params = jllama.init_params(cfg, jax.random.PRNGKey(0),
                                quantize_bits=args.bits)
    n_bytes = sum(x.nbytes for x in jax.tree.leaves(params))
    print(f"params ready: {n_bytes / 2**30:.2f} GiB on device "
          f"({time.time() - t0:.0f}s)", flush=True)

    remat = {"full": True, "offload": "offload"}[args.remat]

    def step(params, embeds):
        def target(e):
            # logits only at the explained position (the [B, T, V] buffer
            # would be ~1 GiB/example at the 128k vocab)
            return select_logit(jllama.forward(
                params, cfg, e, lxt_tpu.attnlrp, remat=remat,
                logits_at=-1).logits)
        return input_relevance(target, embeds)

    jstep = jax.jit(step)
    ids = jax.random.randint(jax.random.PRNGKey(1), (args.batch, args.seq),
                             0, cfg.vocab_size)
    embeds = jllama.embed(params, ids)

    def chain(n, e):
        v = None
        for _ in range(n):
            v, rel = jstep(params, e)
            e = e + (rel[..., None] * 1e-6).astype(e.dtype)
        return float(v)

    t0 = time.time()
    chain(1, embeds)
    print(f"compile+first step: {time.time() - t0:.0f}s", flush=True)
    t0 = time.time(); chain(1, embeds); t1 = time.time() - t0
    t0 = time.time(); chain(1 + args.iters, embeds); t2 = time.time() - t0
    dt = (t2 - t1) / args.iters
    print(f"llama-8B int{args.bits} AttnLRP @ b{args.batch} s{args.seq}: "
          f"{dt:.2f} s/attribution, {args.batch / dt:.2f} heatmaps/s")
    stats = jax.devices()[0].memory_stats() or {}
    if "peak_bytes_in_use" in stats:
        print(f"peak HBM: {stats['peak_bytes_in_use'] / 2**30:.2f} GiB")


if __name__ == "__main__":
    main()
