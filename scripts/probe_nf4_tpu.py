"""Isolate the nf4 TPU fault stage-by-stage (fresh process per stage —
a TPU device error poisons the process).

Usage: python scripts/probe_nf4_tpu.py <stage>
  quantize   - nf4-quantize one 8B-shaped matrix on device
  dequant    - Pallas dequant kernel on one 8B-shaped matrix
  shapes     - dequant kernel on EVERY 8B weight shape
  matmul     - _nf4_matmul forward on [B*T, K] x [K, N]
  grad       - _nf4_matmul forward+backward
  scanremat  - 4-layer scan of nf4 matmuls under jax.checkpoint, fwd+bwd
  model512   - full 8B-geometry attribution step, seq 512
  coexist    - flash + nf4 dequant kernels in one scanned program
  modeleinsum512 - full model, einsum attention (no flash kernel)
  model2048  - full 8B-geometry attribution step, seq 2048
(set LXT_NF4_NO_PALLAS=1 to force the XLA dequant fallback)
"""

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

stage = sys.argv[1]
K, N = 4096, 14336
print("device:", jax.devices()[0], "stage:", stage, flush=True)

from lxt_tpu.ops.quant import (QuantizedTensor, _nf4_matmul, dequantize,
                               nf4_dequant, quantize)

t0 = time.time()
if stage == "quantize":
    w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32)
    qt = quantize(w, "nf4")
    print("q", qt.q.shape, qt.q.dtype, "scale", qt.scale.shape,
          float(jnp.sum(qt.scale)), flush=True)
elif stage == "dequant":
    q = jax.random.randint(jax.random.PRNGKey(0), (K // 2, N), 0, 255,
                           jnp.int32).astype(jnp.uint8)
    s = jax.random.uniform(jax.random.PRNGKey(1), (K // 64, N), jnp.float32)
    w = nf4_dequant(q, s, 64, jnp.bfloat16)
    assert w is not None, "kernel path refused the aligned shape"
    print("dequant ok, checksum", float(jnp.sum(w.astype(jnp.float32))),
          flush=True)
    # exactness vs the XLA fallback on a slice (full f32 compare is 235M elts)
    ref = dequantize(QuantizedTensor(q, s, "nf4", 64), jnp.bfloat16)
    diff = jnp.abs(w[:256].astype(jnp.float32) - ref[:256].astype(jnp.float32))
    print("max diff vs XLA path (first 256 rows):", float(diff.max()),
          flush=True)
elif stage == "shapes":
    # every distinct [in, out] weight shape in the 8B geometry
    for (Ki, Ni) in [(4096, 4096), (4096, 1024), (4096, 14336),
                     (14336, 4096)]:
        w = jax.random.normal(jax.random.PRNGKey(0), (Ki, Ni), jnp.float32)
        qt = quantize(w, "nf4")
        got = nf4_dequant(qt.q, qt.scale, qt.block, jnp.bfloat16)
        assert got is not None, (Ki, Ni)
        ref = dequantize(qt, jnp.bfloat16)
        diff = jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))
        print((Ki, Ni), "max diff", float(diff.max()), flush=True)
elif stage == "scanremat":
    L, D, F = 4, 4096, 14336
    wu = quantize(jax.random.normal(jax.random.PRNGKey(0), (L, D, F),
                                    jnp.float32) * 0.02, "nf4")
    wd = quantize(jax.random.normal(jax.random.PRNGKey(1), (L, F, D),
                                    jnp.float32) * 0.02, "nf4")
    x = jax.random.normal(jax.random.PRNGKey(2), (512, D), jnp.bfloat16)

    def layer(x, qs):
        qu, su, qd, sd = qs
        h = _nf4_matmul(x, qu, su, wu.block)
        h = jax.nn.silu(h)
        return x + _nf4_matmul(h, qd, sd, wd.block).astype(x.dtype)

    def step(x):
        def body(c, qs):
            return jax.checkpoint(layer)(c, qs), None
        out, _ = jax.lax.scan(body, x, (wu.q, wu.scale, wd.q, wd.scale))
        return out.astype(jnp.float32).sum()

    jnp.sum(wu.scale).block_until_ready()
    print("quantized at", round(time.time() - t0, 1), "s", flush=True)
    f = jax.jit(jax.grad(step))
    lowered = f.lower(x)
    print("lowered at", round(time.time() - t0, 1), "s", flush=True)
    compiled = lowered.compile()
    print("compiled at", round(time.time() - t0, 1), "s", flush=True)
    g = compiled(x)
    print("scanremat ok,", float(jnp.sum(g.astype(jnp.float32))), flush=True)
elif stage == "coexist":
    # flash attention kernel + nf4 Pallas dequant kernel in ONE scanned
    # program — the pairing untested by scanremat (no flash) and by the
    # int4 model runs (no dequant kernel).
    from lxt_tpu.ops.attention import attention
    L, D, F, H, hd, T = 4, 4096, 14336, 32, 128, 512
    wq = quantize(jax.random.normal(jax.random.PRNGKey(0), (L, D, D),
                                    jnp.float32) * 0.02, "nf4")
    wu = quantize(jax.random.normal(jax.random.PRNGKey(1), (L, D, F),
                                    jnp.float32) * 0.02, "nf4")
    wd = quantize(jax.random.normal(jax.random.PRNGKey(2), (L, F, D),
                                    jnp.float32) * 0.02, "nf4")
    x = jax.random.normal(jax.random.PRNGKey(3), (1, T, D), jnp.bfloat16)

    def layer(x, qs):
        qq, sq, qu, su, qd, sd = qs
        h = _nf4_matmul(x, qq, sq, wq.block)
        qh = h.reshape(1, T, H, hd).swapaxes(1, 2)
        o = attention(qh, qh, qh, causal=True, impl="flash")
        o = o.swapaxes(1, 2).reshape(1, T, D).astype(x.dtype)
        m = jax.nn.silu(_nf4_matmul(o, qu, su, wu.block))
        return x + _nf4_matmul(m, qd, sd, wd.block).astype(x.dtype)

    def step(x):
        def body(c, qs):
            return jax.checkpoint(layer)(c, qs), None
        out, _ = jax.lax.scan(body, x, (wq.q, wq.scale, wu.q, wu.scale,
                                        wd.q, wd.scale))
        return out.astype(jnp.float32).sum()

    jnp.sum(wq.scale).block_until_ready()
    print("quantized at", round(time.time() - t0, 1), "s", flush=True)
    g = jax.jit(jax.grad(step))(x)
    print("coexist ok,", float(jnp.sum(g.astype(jnp.float32))), flush=True)
elif stage in ("matmul", "grad"):
    w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32)
    qt = quantize(w, "nf4")
    x = jax.random.normal(jax.random.PRNGKey(1), (4096, K), jnp.bfloat16)
    if stage == "matmul":
        f = jax.jit(lambda x: _nf4_matmul(x, qt.q, qt.scale, qt.block).sum())
    else:
        f = jax.jit(jax.grad(
            lambda x: _nf4_matmul(x, qt.q, qt.scale, qt.block)
            .astype(jnp.float32).sum()))
    y = f(x)
    y = f(x)  # compiled-path run
    t1 = time.time()
    for _ in range(5):
        y = f(x * 1.000001)
    print(stage, "ok, 5 iters in", round(time.time() - t1, 3), "s; out",
          float(jnp.sum(y.astype(jnp.float32))), flush=True)
else:
    # model512 / model2048: the exact bench step (attnlrp composite).
    # modelplain512: same program with the vanilla_gradient composite — no
    # LRP custom_vjp rules, isolating "LRP machinery x nf4" from "nf4 in the
    # full model".  Combine with LXT_NF4_NO_PALLAS=1 to swap the Pallas
    # dequant for the XLA fallback and isolate the kernel itself.
    plain = stage.startswith("modelplain")
    einsum = stage.startswith("modeleinsum")
    seq = int(stage.replace(
        "modelplain" if plain else ("modeleinsum" if einsum else "model"),
        ""))
    import lxt_tpu
    from bench import llama3_8b_config
    from lxt_tpu.attribution import input_relevance, select_logit
    from lxt_tpu.models import llama as jllama

    comp = lxt_tpu.vanilla_gradient if plain else lxt_tpu.attnlrp
    cfg = llama3_8b_config(jllama)
    nlayers = int(os.environ.get("LXT_PROBE_LAYERS", "0"))
    if nlayers:                     # scale-bisect: 4/8/16-layer variants
        cfg = dataclasses.replace(cfg, num_layers=nlayers)
    qmode = os.environ.get("LXT_PROBE_QUANT", "nf4")  # int4 = speed control
    qbits = {"nf4": "nf4", "int4": 4, "int8": 8}[qmode]
    params = jllama.init_params(cfg, jax.random.PRNGKey(0),
                                quantize_bits=qbits)
    print("params ready", round(time.time() - t0, 1), "s", flush=True)

    def step(params, embeds):
        def target(e):
            return select_logit(jllama.forward(
                params, cfg, e, comp, remat=True,
                attn_impl="einsum" if einsum else "auto",
                logits_at=-1).logits)
        return input_relevance(target, embeds)

    ids = jax.random.randint(jax.random.PRNGKey(1), (1, seq), 0,
                             cfg.vocab_size)
    embeds = jllama.embed(params, ids)
    if os.environ.get("LXT_PROBE_DISPATCH"):   # the faulting fused path
        jstep = jax.jit(step)
    else:
        # explicit lower -> compile -> execute: the split that passes on
        # cache-cold nf4 programs where dispatch-path compile faults
        jstep = jax.jit(step).lower(params, embeds).compile()
        print("compiled at", round(time.time() - t0, 1), "s", flush=True)
    t_launch = time.time()
    try:
        val, rel = jstep(params, embeds)
        val.block_until_ready()
    except BaseException:
        print("FAULT after", round(time.time() - t_launch, 1),
              "s from launch (", round(time.time() - t0, 1),
              "s total)", flush=True)
        raise
    print("first call done in", round(time.time() - t_launch, 1), "s",
          flush=True)
    print("step ok, val", float(val), flush=True)
    t1 = time.time()
    val, rel = jstep(params, embeds + 1e-6)
    print("compiled step:", round(time.time() - t1, 3), "s", flush=True)
print("TOTAL", round(time.time() - t0, 1), "s")
