"""Serving-layer throughput on the real TPU: coalesced vs one-by-one.

Measures heatmaps/sec through AttributionServer (continuous micro-batching
over AttributionPipeline) for the flagship 1.1B geometry with a toy
whitespace tokenizer — quantifying the batching claim in docs/serving.md:
concurrent requests coalescing into shared steps multiply throughput.

Usage: python scripts/bench_serve.py [n_requests] [max_batch]
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


class ToyTokenizer:
    pad_token_id = 0

    def __init__(self, vocab_size):
        self.vocab_size = vocab_size

    def __call__(self, text):
        return {"input_ids":
                [1 + (hash(w) % (self.vocab_size - 2)) for w in text.split()]}

    def convert_ids_to_tokens(self, ids):
        return [f"t{i}" for i in ids]


def main():
    n_requests = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    max_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import lxt_tpu
    from lxt_tpu.models import llama as jllama
    from lxt_tpu.models.registry import AttributionModel, _family_table
    from lxt_tpu.pipeline import AttributionPipeline
    from lxt_tpu.serve import AttributionServer

    # 8-layer slice of the flagship geometry: serving-bench compile time
    # stays in seconds while per-step cost remains model-shaped
    cfg = jllama.LlamaConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=5632,
        num_layers=8, num_heads=32, num_kv_heads=4, rms_eps=1e-5,
        dtype="bfloat16")
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    model = AttributionModel("llama", cfg, params, lxt_tpu.attnlrp,
                             _family_table()["llama"])
    # bucket_batch: ragged coalesced batches round up to powers of two so
    # the jit cache holds a handful of programs, not one per batch size
    pipe = AttributionPipeline(model, ToyTokenizer(cfg.vocab_size),
                               bucket_batch=True)

    # prompts of varying length; all pad into one 128-token bucket
    prompts = [" ".join(f"w{i}{j}" for j in range(20 + (i * 13) % 90))
               for i in range(n_requests)]

    # warm the jit cache (compile excluded from both measurements)
    for warm_b in (1, max_batch):
        pipe(prompts[:warm_b])

    # one-by-one (no coalescing possible)
    t0 = time.time()
    for p in prompts[:8]:
        pipe([p])
    seq_hps = 8 / (time.time() - t0)
    print(f"sequential single-prompt: {seq_hps:.2f} heatmaps/s")

    # concurrent clients against the server
    server = AttributionServer(pipe, max_batch=max_batch, max_wait_ms=20)
    try:
        futures = []
        t0 = time.time()
        for p in prompts:
            futures.append(server.submit(p))
        for f in futures:
            f.result(timeout=600)
        dt = time.time() - t0
        sizes = list(server.batch_sizes)
        print(f"served {n_requests} concurrent: {n_requests / dt:.2f} "
              f"heatmaps/s ({dt:.2f}s, batches: {sizes})")
        print(f"coalescing speedup: {n_requests / dt / seq_hps:.2f}x")

        # topk=5: five candidate maps per request from ONE forward each —
        # heatmap throughput should beat 5 separate attributions by ~the
        # shared-forward fraction (fwd ~= 1/3 of fwd+bwd)
        K = 5
        server.attribute(prompts[0], topk=K)   # warm the topk program
        t0 = time.time()
        futures = [server.submit(p, topk=K) for p in prompts]
        for f in futures:
            f.result(timeout=600)
        dt = time.time() - t0
        print(f"served {n_requests} x topk={K}: "
              f"{n_requests * K / dt:.2f} heatmaps/s "
              f"({n_requests / dt:.2f} req/s, {dt:.2f}s)")

        # respond: greedy-decode N tokens + one map per generated token,
        # batched — N+1 fused programs total per batch (N decode steps
        # share one compiled loop, all N maps share one attribution)
        N = 8
        n_resp = max(1, n_requests // 4)
        server.attribute(prompts[0], respond_tokens=N)   # warm
        t0 = time.time()
        futures = [server.submit(p, respond_tokens=N)
                   for p in prompts[:n_resp]]
        maps = sum(len(f.result(timeout=600).heatmaps) for f in futures)
        dt = time.time() - t0
        print(f"served {n_resp} x respond(N={N}): "
              f"{maps / dt:.2f} response-token maps/s "
              f"({n_resp / dt:.2f} req/s, {dt:.2f}s)")
    finally:
        server.close()


if __name__ == "__main__":
    main()
