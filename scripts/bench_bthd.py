"""A/B the '+bthd' projection-native layout on an hd=128 geometry.

hd=64 rides the pair-packed bthd tiling (two heads per 128-lane block) and
is A/B'd end-to-end by bench.py itself (LXT_BENCH_BTHD=0/1); this script
covers the OTHER kernel regime — native D=128 lane blocks — on a
Llama-3-8B-shaped tower (hidden 4096, 32 q / 8 kv heads of 128) cut to a
layer count that fits one 16 GB chip in bf16 without remat.
Usage: python scripts/bench_bthd.py [batch] [seq] [layers]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp

from lxt_tpu.utils.profiling import chained_timeit


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import lxt_tpu
    from lxt_tpu.attribution import input_relevance, select_logit
    from lxt_tpu.models import common as jcommon
    from lxt_tpu.models import llama as jllama

    cfg = jllama.LlamaConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=14336,
        num_layers=L, num_heads=32, num_kv_heads=8, rms_eps=1e-5,
        dtype="bfloat16")
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, cfg.vocab_size)
    embeds = jllama.embed(params, ids)

    def attr_step(impl):
        @jax.jit
        def step(params, e):
            def tgt(x):
                return select_logit(jllama.forward(
                    params, cfg, x, lxt_tpu.attnlrp, remat=False,
                    attn_impl=impl, logits_at=-1,
                    layer_driver=jcommon.unrolled).logits)
            _, rel = input_relevance(tgt, e)
            return e + (rel[..., None] * 1e-9).astype(e.dtype)
        return lambda e: step(params, e)

    for impl in ("auto+split+delta", "auto+split+delta+bthd"):
        t = chained_timeit(attr_step(impl), embeds)
        hps = B / t
        print(f"{impl:28s}  {t*1e3:8.2f} ms/step  {hps:6.2f} heatmaps/s",
              flush=True)


if __name__ == "__main__":
    main()
