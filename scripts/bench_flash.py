"""Flash-attention kernel microbenchmark on the real TPU.

Sweeps sequence length / head_dim / block sizes and reports achieved
TFLOP/s + MFU for forward and forward+backward, against the einsum path and
(when available) jax's stock Pallas flash kernel as a speed-of-light
reference. FLOPs counted are USEFUL causal FLOPs (visible q,k pairs only),
so masked work, padding waste and recomputation all depress MFU — which is
the point.

Timing: block_until_ready is unreliable over the axon tunnel, so iterations
are CHAINED through a data dependence and drained with one scalar fetch
(same scheme as bench.py).

Usage: python scripts/bench_flash.py [fwd|bwd|both] [--quick]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lxt_tpu.utils.profiling import PEAK_BF16, chained_timeit


def causal_pair_count(T, window=None):
    if window is None or window >= T:
        return T * (T + 1) / 2
    w = min(window, T)
    full = (T - w) * w          # rows past the ramp see `window` keys
    ramp = w * (w + 1) / 2
    return full + ramp


def useful_flops(B, H, T, D, window=None, bwd=False):
    """2 matmuls fwd; implemented backward does 6 matmul-passes over the
    visible pairs (dq: recompute s + ds@k; dkv: s, p@do, do@v, ds@q)."""
    pairs = causal_pair_count(T, window)
    per_pair = 2 * 2 * D  # 2 matmuls x 2 FLOP/MAC
    if bwd:
        per_pair += 6 * 2 * D
    return B * H * pairs * per_pair


def bench_config(B, H, Hkv, T, D, block_q, block_k, mode, dtype=jnp.bfloat16,
                 tuned=False):
    """tuned=True measures the full production option set the model layer
    uses (bench.py defaults): projection-native layout='bthd' (pair-packed
    lane tiling for hd=64), split_fwd and inline_delta."""
    from lxt_tpu.ops.flash_attention import flash_attention, bthd_supported

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, T, D), dtype)
    k = jax.random.normal(ks[1], (B, Hkv, T, D), dtype)
    v = jax.random.normal(ks[2], (B, Hkv, T, D), dtype)
    kw = dict(block_q=block_q, block_k=block_k)
    if tuned:
        kw.update(split_fwd=True, inline_delta=True)
        if bthd_supported(H, Hkv, D):
            kw["layout"] = "bthd"
            q, k, v = (x.swapaxes(1, 2) for x in (q, k, v))

    if mode == "fwd":
        @jax.jit
        def step(q):
            return flash_attention(q, k, v, None, causal=True,
                                   **kw).astype(q.dtype)
        flops = useful_flops(B, H, T, D)
    else:
        @jax.jit
        def step(q):
            def loss(q):
                o = flash_attention(q, k, v, None, causal=True, **kw)
                return (o.astype(jnp.float32) ** 2).sum()
            g = jax.grad(loss)(q)
            return q + g.astype(q.dtype) * 1e-6
        flops = useful_flops(B, H, T, D, bwd=True)

    dt = chained_timeit(step, q)
    return flops / dt / 1e12, dt


def bench_stock(B, H, Hkv, T, D, mode, dtype=jnp.bfloat16):
    """JAX's stock Pallas flash kernel (512 blocks — its defaults reject
    some shapes; no GQA support, so kv is repeated to full H)."""
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention as stock)
    except ImportError as e:
        return None, str(e)[:60]
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, T, D), dtype)
    k = jax.random.normal(ks[1], (B, H, T, D), dtype)
    v = jax.random.normal(ks[2], (B, H, T, D), dtype)
    b = min(512, T)
    bs = BlockSizes(block_q=b, block_k_major=b, block_k=b, block_b=1,
                    block_q_major_dkv=b, block_k_major_dkv=b, block_k_dkv=b,
                    block_q_dkv=b, block_k_major_dq=b, block_k_dq=b,
                    block_q_dq=b)
    if mode == "fwd":
        @jax.jit
        def step(q):
            return stock(q, k, v, causal=True, block_sizes=bs).astype(q.dtype)
        flops = useful_flops(B, H, T, D)
    else:
        @jax.jit
        def step(q):
            def loss(q):
                o = stock(q, k, v, causal=True, block_sizes=bs)
                return (o.astype(jnp.float32) ** 2).sum()
            return q + jax.grad(loss)(q).astype(q.dtype) * 1e-6
        flops = useful_flops(B, H, T, D, bwd=True)
    try:
        dt = chained_timeit(step, q)
    except Exception as e:  # remote-compile limits on some shapes
        return None, str(e)[:60]
    return flops / dt / 1e12, dt


def bench_einsum(B, H, Hkv, T, D, mode, dtype=jnp.bfloat16):
    import lxt_tpu
    from lxt_tpu.ops.attention import attention

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, T, D), dtype)
    k = jax.random.normal(ks[1], (B, Hkv, T, D), dtype)
    v = jax.random.normal(ks[2], (B, Hkv, T, D), dtype)

    if mode == "fwd":
        @jax.jit
        def step(q):
            return attention(q, k, v, causal=True, impl="einsum",
                             composite=lxt_tpu.vanilla_gradient).astype(q.dtype)
        flops = useful_flops(B, H, T, D)
    else:
        @jax.jit
        def step(q):
            def loss(q):
                o = attention(q, k, v, causal=True, impl="einsum",
                              composite=lxt_tpu.vanilla_gradient)
                return (o.astype(jnp.float32) ** 2).sum()
            g = jax.grad(loss)(q)
            return q + g.astype(q.dtype) * 1e-6
        flops = useful_flops(B, H, T, D, bwd=True)
    try:
        dt = chained_timeit(step, q)
    except Exception as e:  # OOM at long T
        return None, str(e)[:60]
    return flops / dt / 1e12, dt


def main():
    mode_arg = sys.argv[1] if len(sys.argv) > 1 else "both"
    quick = "--quick" in sys.argv
    tuned = "--tuned" in sys.argv
    modes = ["fwd", "bwd"] if mode_arg == "both" else [mode_arg]

    # (B, H, Hkv, T, D) — TinyLlama-ish (hd=64, GQA 8) and 8B-ish (hd=128)
    configs = [
        (8, 32, 4, 1024, 64),
        (8, 32, 4, 4096, 64),
        (4, 32, 8, 4096, 128),
        (2, 32, 8, 8192, 128),
    ]
    if quick:
        configs = configs[1:3]
    blocks = [(512, 512), (1024, 1024), (1024, 2048), (2048, 1024),
              (2048, 2048)]
    if quick:
        blocks = [(1024, 1024), (1024, 2048), (2048, 1024), (2048, 2048)]
    if tuned:
        blocks = [(1024, 1024)]  # the blocks the model layer uses

    results = []
    for mode in modes:
        for (B, H, Hkv, T, D) in configs:
            tf_e, dt_e = (None, None) if tuned else \
                bench_einsum(B, H, Hkv, T, D, mode)
            base = {"mode": mode, "B": B, "H": H, "Hkv": Hkv, "T": T, "D": D}
            if tf_e is not None:
                r = dict(base, impl="einsum", tflops=round(tf_e, 1),
                         mfu=round(tf_e * 1e12 / PEAK_BF16, 3),
                         ms=round(dt_e * 1e3, 2))
                print(json.dumps(r)); results.append(r)
            tf_s, dt_s = (None, "skipped (--tuned)") if tuned else \
                bench_stock(B, H, Hkv, T, D, mode)
            if tf_s is not None:
                r = dict(base, impl="jax-stock-flash", tflops=round(tf_s, 1),
                         mfu=round(tf_s * 1e12 / PEAK_BF16, 3),
                         ms=round(dt_s * 1e3, 2))
                print(json.dumps(r)); results.append(r)
            elif not tuned:
                print(json.dumps(dict(base, impl="jax-stock-flash",
                                      error=str(dt_s))))
            for (bq, bk) in blocks:
                if bq > T or bk > T:
                    continue
                impl = f"flash{bq}/{bk}" + ("+tuned" if tuned else "")
                try:
                    tf, dt = bench_config(B, H, Hkv, T, D, bq, bk, mode,
                                          tuned=tuned)
                except Exception as e:
                    print(json.dumps(dict(base, impl=impl,
                                          error=str(e)[:80])))
                    continue
                r = dict(base, impl=impl, tflops=round(tf, 1),
                         mfu=round(tf * 1e12 / PEAK_BF16, 3),
                         ms=round(dt * 1e3, 2))
                print(json.dumps(r)); results.append(r)
    return results


if __name__ == "__main__":
    main()
