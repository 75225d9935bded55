"""Decode-loop throughput on the real TPU: KV-cached vs full-prefix.

Measures generate() tokens/sec for the flagship 1.1B geometry — the decode
half of the serving ``respond`` flow (the attribution half is covered by
bench.py / bench_serve.py). The KV-cached path (models/decode.py) should
approach weight-streaming bound: ~params_bytes/HBM_BW per token.

Usage: python scripts/bench_decode.py [batch] [prompt_len] [new_tokens]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    T0 = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    import lxt_tpu
    from lxt_tpu.models import llama as jllama
    from lxt_tpu.models.registry import AttributionModel, _family_table

    cfg = jllama.LlamaConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=5632,
        num_layers=22, num_heads=32, num_kv_heads=4, rms_eps=1e-5,
        dtype="bfloat16")
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    model = AttributionModel("llama", cfg, params, lxt_tpu.attnlrp,
                             _family_table()["llama"])
    ids = np.random.RandomState(0).randint(1, cfg.vocab_size, (B, T0))

    for cached in (True, False):
        out = model.generate(ids, N, use_cache=cached)      # compile
        jax.block_until_ready(out)
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = model.generate(ids, N, use_cache=cached)
            jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        print(f"{'kv-cached' if cached else 'full-prefix'}: "
              f"{B * N / dt:.1f} tok/s ({dt * 1e3 / N:.2f} ms/step, "
              f"B={B} T0={T0} N={N})")


if __name__ == "__main__":
    main()
