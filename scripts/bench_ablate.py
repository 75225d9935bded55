"""Ablate the end-to-end attribution step to locate the MFU gap.

Times (one chip, TinyLlama geometry): forward only vs full attribution,
attnlrp vs vanilla rules, flash vs einsum attention, remat policies.
Usage: python scripts/bench_ablate.py [batch] [seq]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lxt_tpu.utils.profiling import chained_timeit


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    import lxt_tpu
    from lxt_tpu.attribution import input_relevance, select_logit
    from lxt_tpu.models import llama as jllama

    cfg = jllama.LlamaConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=5632,
        num_layers=22, num_heads=32, num_kv_heads=4, rms_eps=1e-5,
        dtype="bfloat16")
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, cfg.vocab_size)
    embeds = jllama.embed(params, ids)

    # NOTE: params must be a jit ARGUMENT — closing over them bakes ~2 GB
    # of constants into the HLO and kills the remote-compile tunnel
    def fwd_step(composite, impl, remat):
        @jax.jit
        def step(params, e):
            out = jllama.forward(params, cfg, e, composite, remat=remat,
                                 attn_impl=impl, logits_at=-1)
            return e + (out.logits[..., :1] * 1e-9).astype(e.dtype)
        return lambda e: step(params, e)

    def attr_step(composite, impl, remat):
        @jax.jit
        def step(params, e):
            def tgt(x):
                return select_logit(jllama.forward(
                    params, cfg, x, composite, remat=remat,
                    attn_impl=impl, logits_at=-1).logits)
            _, rel = input_relevance(tgt, e)
            return e + (rel[..., None] * 1e-9).astype(e.dtype)
        return lambda e: step(params, e)

    rows = [
        ("fwd only, flash, no remat", fwd_step(lxt_tpu.attnlrp, "auto", False)),
        ("attr, flash, no remat", attr_step(lxt_tpu.attnlrp, "auto", False)),
        ("attr, einsum, no remat", attr_step(lxt_tpu.attnlrp, "einsum", False)),
        ("attr, vanilla rules, flash", attr_step(lxt_tpu.vanilla_gradient, "auto", False)),
        ("attr, flash, remat=dots", attr_step(lxt_tpu.attnlrp, "auto", "dots")),
        ("attr, flash, remat=full", attr_step(lxt_tpu.attnlrp, "auto", True)),
    ]
    for name, step in rows:
        try:
            dt = chained_timeit(step, embeds)
            print(f"{name:36s} {dt*1e3:8.2f} ms  ({B/dt:.2f} heatmaps/s)")
        except Exception as e:
            print(f"{name:36s} FAILED: {str(e)[:80]}")


if __name__ == "__main__":
    main()
