"""Faithfulness artifact at flagship geometry -> FAITHFULNESS.json.

Pins the AttnLRP paper's headline claim — LRP beats gradient baselines on
perturbation faithfulness (reference README.md:54, the claim the reference
never made runnable) — as a regression-checked NUMBER instead of a test
tolerance: ABPC / MoRF / LeRF AUCs for attnlrp, cp_lrp, Gradient*Input,
IntegratedGradients(32) and SmoothGrad(16) on the TinyLlama-1.1B geometry
(22 layers, hidden 2048, GQA 32/4) at T=1024, fixed seeds throughout.

Caveat (recorded in the artifact): with no HF checkpoint on this host the
weights are random-init (seed 0). Random weights compress ABPC margins —
the artifact's value is as a TRIPWIRE (a rule-placement regression moves
these numbers even when golden parity stays green, since the torch
reference would share the bug) and as the protocol record; pass a real
checkpoint path to re-measure with trained weights.

Usage: python scripts/measure_faithfulness.py [hf_checkpoint_dir]
Env: SEQ=1024 BATCH=4 STEPS=16 (perturbation curve steps) LAYERS=22.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
if os.environ.get("LXT_PLATFORM"):      # e.g. cpu for smoke runs — the venv
    jax.config.update("jax_platforms",  # pre-imports jax so JAX_PLATFORMS
                      os.environ["LXT_PLATFORM"])  # alone is ignored
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import lxt_tpu
from lxt_tpu.attribution import input_relevance
from lxt_tpu.baselines import (gradient_x_input, integrated_gradients,
                               smoothgrad)
from lxt_tpu.models import llama as jllama
from lxt_tpu.utils.faithfulness import faithfulness_report

SEQ = int(os.environ.get("SEQ", 1024))
BATCH = int(os.environ.get("BATCH", 4))
STEPS = int(os.environ.get("STEPS", 16))
LAYERS = int(os.environ.get("LAYERS", 22))


def main():
    t0 = time.time()
    if len(sys.argv) > 1:
        model = lxt_tpu.from_pretrained(sys.argv[1])
        cfg, params = model.cfg, model.params
        weights = sys.argv[1]
    else:
        cfg = jllama.LlamaConfig(
            vocab_size=32000, hidden_size=2048, intermediate_size=5632,
            num_layers=LAYERS, num_heads=32, num_kv_heads=4)
        params = jllama.init_params(cfg, jax.random.PRNGKey(0))
        weights = ("random-init seed 0 — CAVEAT: random weights compress "
                   "ABPC margins; numbers are a regression tripwire + "
                   "protocol record, not trained-model faithfulness")
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)

    ids = jax.random.randint(jax.random.PRNGKey(1), (BATCH, SEQ), 0,
                             cfg.vocab_size)
    embeds = jllama.embed(params, ids)

    # one shared explained token per example: the model's argmax at the last
    # position, pinned BEFORE any perturbation so every method and every
    # curve step scores the same target
    def last_row(x, comp=lxt_tpu.attnlrp):
        return jllama.forward(params, cfg, x, comp, remat=True,
                              logits_at=-1).logits[:, 0, :]

    tok = jnp.argmax(jax.jit(last_row)(embeds), -1)

    def target(x):
        return jnp.take_along_axis(last_row(x), tok[:, None], -1)[:, 0]

    def lrp_rel(comp):
        def f(x):
            def tgt(xx):
                logits = jllama.forward(params, cfg, xx, comp, remat=True,
                                        logits_at=-1).logits[:, 0, :]
                return jnp.take_along_axis(logits, tok[:, None], -1).sum()
            _, rel = input_relevance(tgt, x)
            return rel
        return f

    methods = {
        "attnlrp": lrp_rel(lxt_tpu.attnlrp),
        "cp_lrp": lrp_rel(lxt_tpu.cp_lrp),
        "gradient_x_input": lambda x: gradient_x_input(target, x),
        "integrated_gradients_32":
            lambda x: integrated_gradients(target, x, steps=32),
        "smoothgrad_16":
            lambda x: smoothgrad(target, x, jax.random.PRNGKey(3),
                                 samples=16),
    }

    results = {"config": {
        "geometry": {"hidden_size": cfg.hidden_size,
                     "intermediate_size": cfg.intermediate_size,
                     "num_layers": cfg.num_layers, "num_heads": cfg.num_heads,
                     "num_kv_heads": cfg.num_kv_heads,
                     "vocab_size": cfg.vocab_size},
        "weights": weights, "batch": BATCH, "seq": SEQ,
        "curve_steps": STEPS, "dtype": "bfloat16",
        "device": str(jax.devices()[0]),
        "seeds": {"params": 0, "ids": 1, "curves": 2, "smoothgrad": 3},
        "protocol": "MoRF/LeRF/random token-flip curves on the PLAIN "
                    "forward; ABPC = auc_lerf - auc_morf; explained token "
                    "pinned to the unperturbed argmax"},
        "methods": {}}

    for name, rel_fn in methods.items():
        t1 = time.time()

        @jax.jit
        def run(x, rel_fn=rel_fn):
            rel = rel_fn(x)
            rep = faithfulness_report(target, x, rel, steps=STEPS,
                                      key=jax.random.PRNGKey(2))
            return {k: rep[k] for k in ("auc_morf", "auc_lerf",
                                        "auc_random", "abpc")}

        rep = jax.device_get(run(embeds))
        entry = {k: round(float(v.mean()), 5) for k, v in rep.items()}
        entry["abpc_per_example"] = [round(float(v), 5)
                                     for v in rep["abpc"].ravel()]
        entry["wall_s"] = round(time.time() - t1, 1)
        results["methods"][name] = entry
        print(json.dumps({name: entry}), flush=True)

    ordering = sorted(results["methods"],
                      key=lambda m: -results["methods"][m]["abpc"])
    results["abpc_ordering_best_first"] = ordering
    out = os.path.join(ROOT, "FAITHFULNESS.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out, "in", round(time.time() - t0, 1), "s")


if __name__ == "__main__":
    main()
