"""One-off experiment: 8B-geometry int4 @ 4k attribution — layer-driver and
kernel-option variants on the real chip, to pick the north-star bench config.

Variants:
  scan      : lax.scan + remat=True (the current bench_8b config)
  unrolled  : unrolled driver + per-layer remat=True + '+split+delta+bthd'
              kernel options (safe: no grad-of-scan — the compile pathology
              the options are gated on lives in scan residual stacking)

Prints one JSON line per variant.

Measured (v5e, 2026-08-19): scan 1.766 s/attribution (compile ~12 s cached),
unrolled 1.781 s (compile 111 s). A statistical tie — at b1/s4096 under full
remat the step is recompute-bound, so the unrolled driver's kernel options
(split-fwd/in-kernel-delta/bthd) don't move it. bench_8b keeps the scan
driver: same speed, ~9x faster compile.

Remat-policy sweep (same day): scan_dots OOMs — saving the dot outputs
needs 20.87 G vs 15.75 G HBM (the 3x4096x14336 MLP dots alone are
~7.5 G across 32 layers); scan_offload runs but at 5.316 s (3x slower:
per-layer pinned-host DMA doesn't overlap enough at b1). Full remat is the
memory-feasible optimum on one 16 G chip at this geometry; note the
"useful-FLOPs" MFU of 0.373 already divides by int4's two nibble-plane
matmuls and the remat recompute, i.e. real MXU occupancy is ~0.7.
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
from lxt_tpu.attribution import input_relevance, select_logit
from lxt_tpu.models import common as jcommon
from lxt_tpu.models import llama as jllama

SEQ = int(os.environ.get("SEQ", 4096))
ITERS = int(os.environ.get("ITERS", 3))

from bench import llama3_8b_config

cfg = llama3_8b_config(jllama)
params = jllama.init_params(cfg, jax.random.PRNGKey(0), quantize_bits=4)
ids = jax.random.randint(jax.random.PRNGKey(1), (1, SEQ), 0, cfg.vocab_size)
embeds = jllama.embed(params, ids)

VARIANTS = {
    "scan": dict(attn_impl="auto", layer_driver=None),
    "unrolled": dict(attn_impl="auto+split+delta+bthd",
                     layer_driver=jcommon.unrolled),
    # remat-policy variants: full remat recomputes the whole layer (the
    # MFU-0.37 config); "dots" saves matmul outputs if they fit HBM
    "scan_dots": dict(attn_impl="auto", layer_driver=None, remat="dots"),
    "scan_offload": dict(attn_impl="auto", layer_driver=None,
                         remat="offload"),
}
only = os.environ.get("VARIANT")

for name, opts in VARIANTS.items():
    if only and name != only:
        continue

    def step(params, embeds, opts=opts):
        def target(e):
            kw = dict(opts)
            remat = kw.pop("remat", True)
            return select_logit(jllama.forward(
                params, cfg, e, lxt_tpu.attnlrp, remat=remat,
                logits_at=-1, **kw).logits)
        return input_relevance(target, embeds)

    jstep = jax.jit(step)

    def chain(e, n):
        val = None
        for _ in range(n):
            val, rel = jstep(params, e)
            e = e + (rel[..., None] * 1e-6).astype(e.dtype)
        return float(val)

    t0 = time.time()
    chain(embeds, 1)
    compile_s = time.time() - t0
    t0 = time.time(); chain(embeds, 1); t_one = time.time() - t0
    t0 = time.time(); chain(embeds, 1 + ITERS); t_many = time.time() - t0
    dt = (t_many - t_one) / ITERS
    print(json.dumps({"variant": name, "s_per_attribution": round(dt, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)
