"""On-TPU (Mosaic-compiled) flash-kernel parity record.

The test suite validates the Pallas kernels in interpreter mode on CPU
(tests/test_flash_attention.py); Mosaic compilation is a different code
path, so this script asserts flash-vs-einsum agreement — forward AND
relevance backward — on the REAL chip at bf16 tolerances, across the mask
regimes the models use (plain causal, sliding window, GQA, kv padding,
bidirectional), including the static perf options the bench enables
(split_fwd, inline_delta). Results (max abs diff per case) are written to
TPU_KERNEL_PARITY.json at the repo root — the committed evidence that the
bench throughput numbers compute the right thing (VERDICT r2 weak #2).

Run on the TPU host:  python scripts/tpu_kernel_parity.py
"""

import json
import zlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import lxt_tpu
from lxt_tpu.ops.attention import attention
from lxt_tpu.ops.flash_attention import flash_attention

# bf16 inputs, f32 einsum reference. One bf16 ulp at |x|~1 is 2^-8; the
# kernel rounds p to bf16 for the p@v / p^T@do MXU matmuls while the einsum
# reference keeps p in f32, so per-element ~2^-9 relative rounding
# accumulates over n_rep*T terms in dk/dv (measured: dv diff grows from
# 1.5e-2 at n_rep=4/T=512 to 3.0e-2 at n_rep=8/T=1024 with IDENTICAL diffs
# for the pair-packed and plain layouts — accumulation noise, not kernel
# error). With rope, the reference itself rotates q/k in bf16 (HF
# apply_rotary_pos_emb semantics) while the kernel rotates in f32, roughly
# doubling the dq/dk diff from the REFERENCE side. The criterion is
# therefore scale-aware: diff <= ATOL + RTOL * absmax(reference tensor).
# RTOL = 3 bf16 ulps (3 * 2^-8): measured worst relative diff is 1.16e-2
# (dq under rope, where the bf16-rotating reference contributes most of
# it); a real masking/indexing/rope bug produces O(1)-relative error, two
# orders of magnitude above this bound.
ATOL = 1e-2
RTOL = 3 * 2.0 ** -8


def _mk(B, H, Hkv, T, D, seed):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (B, H, T, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, Hkv, T, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, Hkv, T, D), jnp.bfloat16)
    do = jax.random.normal(ks[3], (B, H, T, D), jnp.bfloat16)
    return q, k, v, do


CASES = [
    # name, (B, H, Hkv, T, D), kwargs for the flash path
    ("causal_hd64", (2, 4, 4, 1024, 64), {}),
    ("causal_hd128", (2, 4, 4, 1024, 128), {}),
    ("causal_gqa", (2, 8, 2, 512, 64), {}),
    ("window", (2, 4, 4, 1024, 64), {"window": 256}),
    ("window_gqa", (1, 8, 2, 1024, 128), {"window": 128}),
    ("kv_begin", (2, 4, 4, 512, 64), {"kv_begin": np.array([0, 128])}),
    ("kv_end_bidir", (2, 4, 4, 512, 64),
     {"kv_end": np.array([512, 384]), "causal": False}),
    ("bidirectional", (2, 4, 4, 512, 64), {"causal": False}),
    ("split_fwd", (2, 4, 4, 1024, 64), {"split_fwd": True}),
    ("split_fwd_hd128", (2, 4, 4, 512, 128), {"split_fwd": True}),
    ("inline_delta", (2, 4, 4, 1024, 64), {"inline_delta": True}),
    ("split_and_delta", (2, 4, 4, 1024, 64),
     {"split_fwd": True, "inline_delta": True}),
    # layout='bthd': projection-native packed tiling ([B,T,H*D] lane
    # blocks) — interpreter mode cannot validate the Mosaic block-mapping
    # legality of these specs, so the on-chip record is the load-bearing
    # evidence for the layout
    ("bthd_hd128", (2, 4, 4, 1024, 128), {"layout": "bthd"}),
    ("bthd_gqa_window", (1, 8, 2, 1024, 128),
     {"layout": "bthd", "window": 128}),
    ("bthd_split_delta", (2, 4, 4, 1024, 128),
     {"layout": "bthd", "split_fwd": True, "inline_delta": True}),
    ("bthd_multiblock", (1, 4, 4, 2048, 128), {"layout": "bthd"}),
    ("bthd_hd256", (1, 2, 2, 512, 256), {"layout": "bthd"}),
    # hd=64 pair-packed tiling (two heads per 128-lane block): the static
    # 64-lane half slicing, runtime kv-half select and (2, blk, .) scratch
    # indexing are exactly the constructs interpreter mode can't vouch for
    ("bthd_pair_byhalf", (2, 4, 4, 1024, 64), {"layout": "bthd"}),
    ("bthd_pair_gqa", (1, 8, 2, 1024, 64), {"layout": "bthd"}),
    ("bthd_pair_gqa_window", (1, 8, 2, 1024, 64),
     {"layout": "bthd", "window": 128}),
    # the flagship bench geometry (TinyLlama: H=32, Hkv=4, n_rep=8) with
    # the exact static options bench.py enables, incl. in-kernel rope
    ("bthd_pair_flagship", (2, 32, 4, 1024, 64),
     {"layout": "bthd", "split_fwd": True, "inline_delta": True,
      "rope": True}),
    ("bthd_pair_multiblock", (1, 4, 2, 2048, 64), {"layout": "bthd"}),
    ("bthd_pair_kv_begin", (2, 4, 4, 512, 64),
     {"layout": "bthd", "kv_begin": np.array([0, 128])}),
]


def run_case(name, shape, kw):
    B, H, Hkv, T, D = shape
    # crc32, not hash(): PYTHONHASHSEED randomizes str hashes per process,
    # which made the record non-reproducible (borderline GQA dv diffs
    # flapped across runs on fresh data)
    q, k, v, do = _mk(B, H, Hkv, T, D,
                      seed=zlib.crc32(name.encode()) % (2 ** 31))
    causal = kw.pop("causal", True)
    window = kw.pop("window", None)
    kv_begin = kw.pop("kv_begin", None)
    kv_end = kw.pop("kv_end", None)
    kvb = None if kv_begin is None else jnp.asarray(kv_begin)
    kve = None if kv_end is None else jnp.asarray(kv_end)

    # fully-masked query rows (causal q < kv_begin) are DEFINED only on the
    # flash path (zeros, zero grads); the einsum reference softmaxes a row
    # of -1e30 into uniform garbage there. Exclude them: zero the cotangent
    # and compare outputs on valid rows only.
    if kv_begin is not None and causal:
        valid = (np.arange(T)[None, :] >= np.asarray(kv_begin)[:, None])
        row_mask = jnp.asarray(valid)[:, None, :, None]   # [B,1,T,1]
        do = (do * row_mask).astype(do.dtype)
    else:
        row_mask = None

    bthd = kw.pop("layout", None) == "bthd"
    rope = None
    if kw.pop("rope", False):
        from lxt_tpu.models import common as mcommon
        rope = mcommon.rope_tables(jnp.arange(T), D)  # ([T, D], [T, D])

    @jax.jit
    def flash_val_grads(q, k, v):
        def f(q, k, v):
            if bthd:   # canonical-layout inputs, bthd kernels: transpose at
                # the test boundary only (models never pay this transpose)
                out = flash_attention(
                    q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2),
                    window, causal=causal, kv_begin=kvb, kv_end=kve,
                    rope=rope, layout="bthd", **kw).swapaxes(1, 2)
            else:
                out = flash_attention(q, k, v, window, causal=causal,
                                      kv_begin=kvb, kv_end=kve, rope=rope,
                                      **kw)
            return (out.astype(jnp.float32) * do.astype(jnp.float32)).sum(), out
        (_, out), grads = jax.value_and_grad(f, argnums=(0, 1, 2),
                                             has_aux=True)(q, k, v)
        return out, grads

    @jax.jit
    def ref_val_grads(q, k, v):
        # f32 einsum reference under the same structural masks; the
        # dispatcher folds kv_begin/kv_end into an additive bias
        q, k, v = (t.astype(jnp.float32) for t in (q, k, v))

        def f(q, k, v):
            out = attention(q, k, v, causal=causal, window=window,
                            composite=lxt_tpu.vanilla_gradient,
                            impl="einsum", kv_begin=kvb, kv_end=kve,
                            rope=rope)
            return (out * do.astype(jnp.float32)).sum(), out
        (_, out), grads = jax.value_and_grad(f, argnums=(0, 1, 2),
                                             has_aux=True)(q, k, v)
        return out, grads

    out_f, g_f = jax.block_until_ready(flash_val_grads(q, k, v))
    out_r, g_r = jax.block_until_ready(ref_val_grads(q, k, v))

    if row_mask is not None:
        m = np.asarray(row_mask, np.float32)
        out_f, out_r = np.asarray(out_f, np.float32) * m, np.asarray(out_r) * m
    diffs, ok = {}, True
    pairs = [("out", out_f, out_r)] + list(zip(("dq", "dk", "dv"), g_f, g_r))
    for nm, a, b in pairs:
        b = np.asarray(b, np.float32)
        d = float(np.abs(np.asarray(a, np.float32) - b).max())
        bound = ATOL + RTOL * float(np.abs(b).max())
        diffs[nm] = d
        diffs[nm + "_bound"] = round(bound, 5)
        ok &= d <= bound
    return diffs, ok


def main():
    backend = jax.default_backend()
    device = str(jax.devices()[0])
    results = {}
    all_ok = True
    for name, shape, kw in CASES:
        diffs, ok = run_case(name, shape, dict(kw))
        results[name] = {**diffs, "ok": ok, "shape": list(shape)}
        all_ok &= ok
        print(f"{name:18s} ok={ok}  " +
              "  ".join(f"{k}={v:.2e}" for k, v in diffs.items()),
              flush=True)
    record = {
        "backend": backend,
        "device": device,
        "criterion": f"maxdiff <= {ATOL} + {RTOL} * absmax(reference)",
        "all_ok": all_ok,
        "cases": results,
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "TPU_KERNEL_PARITY.json")
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(("PASS" if all_ok else "FAIL"), "->", out_path)
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
