"""Llama-3-8B-geometry attribution sweep on one chip -> BENCH_8B_SWEEP.json.

Machine-readable record behind the README's big-model numbers: quantization
mode (int4 / int8 / nf4 — nf4 being the reference's own bitsandbytes
scenario, examples/quantized_llama.py:13-19) x context length, batch 1,
full rematerialization, chained timing (each step's input depends on the
previous relevance so no pipelining can hide the work; the final host fetch
drains the device).

Usage: python scripts/bench_8b_sweep.py  [writes BENCH_8B_SWEEP.json]
Env: CONFIGS="int8:4096,int4:2048" to restrict; ITERS=3.
"""

import json
import os
import sys
import time

import jax

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import lxt_tpu
from bench import attribution_flops, llama3_8b_config
from lxt_tpu.attribution import input_relevance, select_logit
from lxt_tpu.models import llama as jllama
from lxt_tpu.utils.profiling import PEAK_BF16

ITERS = int(os.environ.get("ITERS", 3))
DEFAULT = "int4:4096,int8:4096,nf4:4096,int4:2048,int8:2048"
CONFIGS = [c.split(":") for c in
           os.environ.get("CONFIGS", DEFAULT).split(",")]

cfg = llama3_8b_config(jllama)

results = {"config": {"geometry": "llama-3-8B", "batch": 1,
                      "remat": "full", "device": str(jax.devices()[0]),
                      "iters": ITERS},
           "runs": {}}

for quant, seq_s in CONFIGS:
    seq = int(seq_s)
    name = f"{quant}_s{seq}"
    try:
        bits = {"int4": 4, "int8": 8, "nf4": "nf4"}[quant]
        params = jllama.init_params(cfg, jax.random.PRNGKey(0),
                                    quantize_bits=bits)

        def step(params, embeds):
            def target(e):
                return select_logit(jllama.forward(
                    params, cfg, e, lxt_tpu.attnlrp, remat=True,
                    logits_at=-1).logits)
            return input_relevance(target, embeds)

        jstep = jax.jit(step)
        ids = jax.random.randint(jax.random.PRNGKey(1), (1, seq), 0,
                                 cfg.vocab_size)
        embeds = jllama.embed(params, ids)

        def chain(e, n):
            val = None
            for _ in range(n):
                val, rel = jstep(params, e)
                e = e + (rel[..., None] * 1e-6).astype(e.dtype)
            return float(val)

        t0 = time.time(); chain(embeds, 1); compile_s = time.time() - t0
        t0 = time.time(); chain(embeds, 1); t_one = time.time() - t0
        t0 = time.time(); chain(embeds, 1 + ITERS); t_many = time.time() - t0
        dt = max((t_many - t_one) / ITERS, 1e-9)
        stats = jax.devices()[0].memory_stats() or {}
        entry = {"s_per_attribution": round(dt, 3),
                 "heatmaps_per_sec": round(1.0 / dt, 3),
                 "tflops": round(attribution_flops(cfg, 1, seq) / dt / 1e12, 1),
                 "mfu_useful": round(attribution_flops(cfg, 1, seq) / dt
                                     / PEAK_BF16, 3),
                 "compile_s": round(compile_s, 1)}
        if "peak_bytes_in_use" in stats:
            entry["peak_hbm_gib"] = round(stats["peak_bytes_in_use"] / 2**30, 2)
        del params, embeds
    except Exception as e:
        entry = {"error": f"{type(e).__name__}: {e}"[:200]}
    results["runs"][name] = entry
    print(json.dumps({name: entry}), flush=True)

out = os.path.join(ROOT, "BENCH_8B_SWEEP.json")
# merge with prior runs (a TPU device error poisons the whole process, so
# partial sweeps re-run per-config in fresh processes and accumulate here)
if os.path.exists(out):
    with open(out) as f:
        prior = json.load(f)
    prior_runs = prior.get("runs", {})
    prior_runs.update(results["runs"])
    results["runs"] = prior_runs
with open(out, "w") as f:
    json.dump(results, f, indent=1)
print("wrote", out)
