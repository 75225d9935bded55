"""Pallas flash attention vs the einsum reference path: forward AND the
relevance backward (vjp) must agree, including sliding windows and GQA."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lxt_tpu
from lxt_tpu.ops.attention import attention
from lxt_tpu.ops.flash_attention import flash_attention

pytestmark = pytest.mark.kernels


def _qkv(key, B=2, H=4, T=256, D=64):
    k1, k2, k3 = jax.random.split(key, 3)
    return (jax.random.normal(k1, (B, H, T, D)),
            jax.random.normal(k2, (B, H, T, D)),
            jax.random.normal(k3, (B, H, T, D)))


@pytest.mark.parametrize("window", [None, 64])
def test_flash_matches_einsum_fwd_bwd(window):
    q, k, v = _qkv(jax.random.PRNGKey(0))

    def f_flash(q, k, v):
        return flash_attention(q, k, v, window).sum()

    def f_ref(q, k, v):
        return attention(q, k, v, causal=True, window=window,
                         composite=lxt_tpu.vanilla_gradient,
                         impl="einsum").sum()

    out_f = flash_attention(q, k, v, window)
    out_r = attention(q, k, v, causal=True, window=window,
                      composite=lxt_tpu.vanilla_gradient, impl="einsum")
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=0, atol=2e-5)

    g_f = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_f, g_r, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-5, err_msg=f"d{name}")


def test_flash_via_attention_dispatch_with_rules():
    """attention(impl='flash') under the attnlrp composite == einsum path,
    including head-dim padding (D=64 -> padded to 128) and GQA repeat."""
    B, H, Hkv, T, D = 1, 4, 2, 256, 64
    key = jax.random.PRNGKey(1)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    q = jax.random.normal(k1, (B, H, T, D))
    k = jax.random.normal(k2, (B, Hkv, T, D))
    v = jax.random.normal(k3, (B, Hkv, T, D))
    rel = jax.random.normal(k4, (B, H, T, D))

    def run(impl):
        def f(q, k, v):
            out = attention(q, k, v, causal=True, composite=lxt_tpu.attnlrp,
                            impl=impl)
            return (out * rel).sum()
        val, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(q, k, v)
        return val, grads

    v_f, g_f = run("flash")
    v_r, g_r = run("einsum")
    np.testing.assert_allclose(float(v_f), float(v_r), rtol=1e-5)
    for a, b, name in zip(g_f, g_r, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-5, err_msg=f"d{name}")


def test_flash_traced_window():
    """window as a traced scalar (Gemma local/global alternation) works and
    window >= T equals plain causal."""
    q, k, v = _qkv(jax.random.PRNGKey(2), T=128)

    def f(w):
        return flash_attention(q, k, v, w)

    out_full = f(jnp.int32(128))
    out_none = flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_none),
                               rtol=0, atol=1e-6)

    out_win = jax.jit(f)(jnp.int32(32))
    ref = attention(q, k, v, causal=True, window=32,
                    composite=lxt_tpu.vanilla_gradient, impl="einsum")
    np.testing.assert_allclose(np.asarray(out_win), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_flash_kv_begin_padding():
    """Per-example kv_begin (left-padding) in the kernel: valid rows match
    the einsum path with an equivalent additive bias; padded query rows
    return exactly zero with zero gradients (einsum's uniform-softmax
    garbage in those rows never reaches real tokens, but the kernel's zeros
    are the cleaner contract)."""
    import lxt_tpu
    from lxt_tpu.ops.attention import attention

    B, H, T, D = 2, 2, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    q = jax.random.normal(ks[0], (B, H, T, D))
    k = jax.random.normal(ks[1], (B, H, T, D))
    v = jax.random.normal(ks[2], (B, H, T, D))
    rel = jax.random.normal(ks[3], (B, H, T, D))
    kv_begin = jnp.asarray([64, 0], jnp.int32)

    def tgt_flash(q, k, v):
        out = flash_attention(q, k, v, block_q=128, block_k=128,
                              kv_begin=kv_begin)
        return (out.astype(jnp.float32) * rel).sum(), out

    def tgt_einsum(q, k, v):
        out = attention(q, k, v, causal=True, impl="einsum",
                        composite=lxt_tpu.vanilla_gradient, kv_begin=kv_begin)
        return (out.astype(jnp.float32) * rel).sum(), out

    (_, out_f), gf = jax.value_and_grad(tgt_flash, argnums=(0, 1, 2),
                                        has_aux=True)(q, k, v)
    (_, out_e), ge = jax.value_and_grad(tgt_einsum, argnums=(0, 1, 2),
                                        has_aux=True)(q, k, v)

    # example 0: rows < 64 are padding; example 1: fully valid
    np.testing.assert_allclose(np.asarray(out_f[0, :, 64:]),
                               np.asarray(out_e[0, :, 64:]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_f[1]), np.asarray(out_e[1]),
                               atol=2e-5)
    assert np.all(np.asarray(out_f[0, :, :64]) == 0.0)

    for a, b, name in zip(gf, ge, "qkv"):
        np.testing.assert_allclose(np.asarray(a[0, :, 64:]),
                                   np.asarray(b[0, :, 64:]),
                                   rtol=0, atol=5e-5, err_msg=f"d{name}[0]")
        np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                                   rtol=0, atol=5e-5, err_msg=f"d{name}[1]")
    # padded q rows and padded k/v positions carry exactly zero gradient
    assert np.all(np.asarray(gf[0][0, :, :64]) == 0.0)
    assert np.all(np.asarray(gf[1][0, :, :64]) == 0.0)
    assert np.all(np.asarray(gf[2][0, :, :64]) == 0.0)


def test_llama_padding_invariance_flash_path():
    """Model-level: left-padded attribution on the FLASH path (kv_begin)
    equals the unpadded einsum attribution on the real tokens."""
    import lxt_tpu
    from lxt_tpu.attribution import input_relevance, select_logit
    from lxt_tpu.models import llama as jllama

    cfg = jllama.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=2, num_kv_heads=2)
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    L = 200
    ids = np.random.RandomState(0).randint(1, 64, (1, L))

    e = jllama.embed(params, jnp.asarray(ids))
    def t(x):
        return select_logit(jllama.forward(params, cfg, x, lxt_tpu.attnlrp,
                                           attn_impl="einsum").logits)
    _, rel_ref = input_relevance(t, e)

    T = 256
    ids_p = np.zeros((1, T), np.int32); ids_p[0, T - L:] = ids[0]
    kv_begin = jnp.asarray([T - L], jnp.int32)
    ep = jllama.embed(params, jnp.asarray(ids_p))
    def tp(x):
        return select_logit(jllama.forward(params, cfg, x, lxt_tpu.attnlrp,
                                           kv_begin=kv_begin,
                                           attn_impl="flash").logits)
    _, rel_p = input_relevance(tp, ep)
    np.testing.assert_allclose(np.asarray(rel_p[0, T - L:]),
                               np.asarray(rel_ref[0]), rtol=0, atol=3e-5)
    # padded positions receive exactly zero relevance
    assert np.all(np.asarray(rel_p[0, :T - L]) == 0.0)


def test_flash_non_causal_matches_einsum():
    """Bidirectional (BERT/ViT-style) attention on the flash path."""
    import lxt_tpu
    from lxt_tpu.ops.attention import attention

    B, H, T, D = 2, 2, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(9), 4)
    q = jax.random.normal(ks[0], (B, H, T, D))
    k = jax.random.normal(ks[1], (B, H, T, D))
    v = jax.random.normal(ks[2], (B, H, T, D))
    rel = jax.random.normal(ks[3], (B, H, T, D))

    def tgt(impl):
        def f(q, k, v):
            out = attention(q, k, v, causal=False, impl=impl,
                            composite=lxt_tpu.vanilla_gradient)
            return (out.astype(jnp.float32) * rel).sum(), out
        return f

    (_, out_f), gf = jax.value_and_grad(tgt("flash"), argnums=(0, 1, 2),
                                        has_aux=True)(q, k, v)
    (_, out_e), ge = jax.value_and_grad(tgt("einsum"), argnums=(0, 1, 2),
                                        has_aux=True)(q, k, v)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_e), atol=2e-5)
    for a, b, name in zip(gf, ge, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-5, err_msg=f"d{name}")


def test_flash_kv_end_right_padding():
    """kv_end (right padding, the BERT convention) on the flash path: valid
    keys match einsum-with-bias; relevance into padded k/v positions is 0."""
    import lxt_tpu
    from lxt_tpu.ops.attention import attention

    B, H, T, D = 2, 2, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    q = jax.random.normal(ks[0], (B, H, T, D))
    k = jax.random.normal(ks[1], (B, H, T, D))
    v = jax.random.normal(ks[2], (B, H, T, D))
    rel = jax.random.normal(ks[3], (B, H, T, D))
    kv_end = jnp.asarray([200, 256], jnp.int32)

    def tgt(impl):
        def f(q, k, v):
            out = attention(q, k, v, causal=False, impl=impl,
                            composite=lxt_tpu.vanilla_gradient, kv_end=kv_end)
            return (out.astype(jnp.float32) * rel).sum(), out
        return f

    (_, out_f), gf = jax.value_and_grad(tgt("flash"), argnums=(0, 1, 2),
                                        has_aux=True)(q, k, v)
    (_, out_e), ge = jax.value_and_grad(tgt("einsum"), argnums=(0, 1, 2),
                                        has_aux=True)(q, k, v)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_e), atol=2e-5)
    for a, b, name in zip(gf, ge, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-5, err_msg=f"d{name}")
    assert np.all(np.asarray(gf[1][0, :, 200:]) == 0.0)  # dk in padding
    assert np.all(np.asarray(gf[2][0, :, 200:]) == 0.0)  # dv in padding


def test_bert_right_padding_invariance_flash():
    """BERT batched classification: right-padded kv_end attribution on the
    flash path equals the unpadded einsum attribution."""
    import lxt_tpu
    from lxt_tpu.attribution import input_relevance
    from lxt_tpu.models import bert as jbert

    cfg = jbert.BertConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                           num_layers=2, num_heads=2, max_positions=512,
                           num_labels=3)
    params = jbert.init_params(cfg, jax.random.PRNGKey(0))
    L = 200
    ids = np.random.RandomState(0).randint(1, 64, (1, L))

    def t_plain(x):
        logits = jbert.forward(params, cfg, x, lxt_tpu.attnlrp,
                               attn_impl="einsum").logits
        return logits.max(axis=-1).sum()

    e = jbert.embed(params, jnp.asarray(ids))
    _, rel_ref = input_relevance(t_plain, e)

    T = 256
    ids_p = np.zeros((1, T), np.int32); ids_p[0, :L] = ids[0]
    kv_end = jnp.asarray([L], jnp.int32)
    ep = jbert.embed(params, jnp.asarray(ids_p))

    def t_pad(x):
        logits = jbert.forward(params, cfg, x, lxt_tpu.attnlrp,
                               kv_end=kv_end, attn_impl="flash").logits
        return logits.max(axis=-1).sum()

    _, rel_p = input_relevance(t_pad, ep)
    np.testing.assert_allclose(np.asarray(rel_p[0, :L]),
                               np.asarray(rel_ref[0]), rtol=0, atol=3e-5)
    assert np.all(np.asarray(rel_p[0, L:]) == 0.0)


@pytest.mark.parametrize("config", [
    # (causal, window, kv_begin, kv_end, block_k) — block_k sets nk:
    # nk<=FUSED_BWD_MAX_NK runs the fused backward, the last one the split
    (True, None, None, None, 128),
    (True, 64, None, None, 128),
    (False, None, [64, 0], [256, 130], 128),
    (True, None, None, None, 32),
])
def test_fused_bwd_matches_split(config):
    """The fused one-pass backward (dq partials + dk/dv) and the split
    dq/dkv kernels compute identical gradients for every mask regime."""
    from lxt_tpu.ops import flash_attention as fa

    causal, window, kvb, kve, bk = config
    q, k, v = _qkv(jax.random.PRNGKey(3), H=4, T=256, D=32)
    k = k[:, ::2]  # GQA: Hkv=2
    v = v[:, ::2]
    do = jax.random.normal(jax.random.PRNGKey(4), q.shape)
    kvb = None if kvb is None else jnp.asarray(kvb, jnp.int32)
    kve = None if kve is None else jnp.asarray(kve, jnp.int32)

    def run(q, k, v):
        return (fa.flash_attention(q, k, v, window, causal=causal, block_q=128,
                                   block_k=bk, kv_begin=kvb, kv_end=kve) * do).sum()

    old = fa.FUSED_BWD_MAX_NK
    try:
        fa.FUSED_BWD_MAX_NK = 8  # force fused even at nk>1
        g_fused = jax.grad(run, argnums=(0, 1, 2))(q, k, v)
        fa.FUSED_BWD_MAX_NK = 0  # force split
        g_split = jax.grad(run, argnums=(0, 1, 2))(q, k, v)
    finally:
        fa.FUSED_BWD_MAX_NK = old
    for a, b, name in zip(g_fused, g_split, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5, err_msg=f"d{name}")


def test_split_fwd_matches_default():
    """The diagonal-split forward kernel (split_fwd=True, eligible: plain
    causal, nq==nk==1, T % 256 == 0) computes the same out/lse and the same
    VJP as the online-softmax kernel."""
    q, k, v = _qkv(jax.random.PRNGKey(5), B=2, H=3, T=256, D=64)
    do = jax.random.normal(jax.random.PRNGKey(6), q.shape)

    def run(split):
        def f(q, k, v):
            return (flash_attention(q, k, v, causal=True,
                                    split_fwd=split) * do).sum()
        val, g = jax.value_and_grad(f, argnums=(0, 1, 2))(q, k, v)
        return val, g

    v_s, g_s = run(True)
    v_d, g_d = run(False)
    np.testing.assert_allclose(float(v_s), float(v_d), rtol=1e-5)
    for a, b, name in zip(g_s, g_d, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5, err_msg=f"d{name}")


def test_split_fwd_lse_matches():
    """split_fwd through flash_attention_lse: lse agrees with the default
    kernel (the ring merge consumes it bit-for-bit)."""
    from lxt_tpu.ops.flash_attention import flash_attention_lse

    q, k, v = _qkv(jax.random.PRNGKey(8), B=1, H=2, T=256, D=64)
    out_s, lse_s = flash_attention_lse(q, k, v, causal=True, split_fwd=True)
    out_d, lse_d = flash_attention_lse(q, k, v, causal=True, split_fwd=False)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(lse_s), np.asarray(lse_d), atol=1e-5)


def test_split_fwd_ineligible_falls_back():
    """split_fwd on an ineligible call (window present) silently uses the
    default kernel and stays correct."""
    q, k, v = _qkv(jax.random.PRNGKey(10), T=256)
    out = flash_attention(q, k, v, 64, split_fwd=True)
    ref = attention(q, k, v, causal=True, window=64,
                    composite=lxt_tpu.vanilla_gradient, impl="einsum")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_inline_delta_static_arg():
    """inline_delta as a static per-call argument (VERDICT r2 #7: the old
    INLINE_DELTA module global was not part of any jit cache key): gradients
    with the in-kernel delta match the external-delta path, including under
    jit where the option is baked into the traced program."""
    q, k, v = _qkv(jax.random.PRNGKey(12), B=1, H=2, T=256, D=64)
    do = jax.random.normal(jax.random.PRNGKey(13), q.shape)

    @functools.partial(jax.jit, static_argnums=3)
    def g(q, k, v, inline):
        def f(q, k, v):
            return (flash_attention(q, k, v, causal=True,
                                    inline_delta=inline) * do).sum()
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    g_in = g(q, k, v, True)
    g_ex = g(q, k, v, False)
    for a, b, name in zip(g_in, g_ex, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5, err_msg=f"d{name}")


def test_attention_impl_suffix_options():
    """impl='flash+split+delta' on the dispatcher parses the static options
    and matches the einsum path under the attnlrp composite."""
    q, k, v = _qkv(jax.random.PRNGKey(14), B=1, H=2, T=256, D=64)
    rel = jax.random.normal(jax.random.PRNGKey(15), q.shape)

    def run(impl):
        def f(q, k, v):
            out = attention(q, k, v, causal=True, composite=lxt_tpu.attnlrp,
                            impl=impl)
            return (out * rel).sum()
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    g_f = run("flash+split+delta")
    g_r = run("einsum")
    for a, b, name in zip(g_f, g_r, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-5, err_msg=f"d{name}")


def test_window_offsets_fully_masked_rows_backward_finite():
    """Ring regime regression: with window + global offsets, a q row whose
    window excludes the ENTIRE k slice gets out=0/lse=-1e30 from the
    forward; the backward must zero those rows' probabilities instead of
    computing exp2(s - lse) = inf -> NaN (the guard_empty condition must
    cover window/offset regimes, not just kv padding)."""
    from lxt_tpu.ops.flash_attention import NEG_INF, flash_attention_lse

    B, H, T, D = 1, 2, 128, 64
    q, k, v = _qkv(jax.random.PRNGKey(20), B=B, H=H, T=T, D=D)
    do = jax.random.normal(jax.random.PRNGKey(21), q.shape)
    # q slice at global [128, 256), k slice at [0, 128), window 96:
    # q rows >= 224 see no key in [0, 128) at all
    window, q_start, k_start = 96, 128, 0

    def f(q, k, v):
        out, lse = flash_attention_lse(q, k, v, window,
                                       q_start=q_start, k_start=k_start,
                                       causal=True)
        return (out * do).sum() + (jnp.maximum(lse, NEG_INF) * 0.0).sum(), (out, lse)

    (_, (out, lse)), grads = jax.value_and_grad(
        f, argnums=(0, 1, 2), has_aux=True)(q, k, v)

    masked = np.arange(T) + q_start - window >= k_start + T  # fully masked rows
    assert masked.any() and not masked.all()
    np.testing.assert_array_equal(
        np.asarray(out)[:, :, masked, :], 0.0)
    assert (np.asarray(lse)[:, :, masked] <= NEG_INF / 2).all()
    for g, name in zip(grads, "qkv"):
        assert np.isfinite(np.asarray(g)).all(), f"NaN/inf in d{name}"
    # masked q rows contribute nothing
    np.testing.assert_array_equal(np.asarray(grads[0])[:, :, masked, :], 0.0)


def _rope_tables(T, D, key=30):
    import lxt_tpu.models.common as mcommon
    return mcommon.rope_tables(jnp.arange(T), D)


@pytest.mark.parametrize("config", [
    dict(B=2, H=4, Hkv=4, T=256, D=64),
    dict(B=1, H=8, Hkv=2, T=256, D=64),     # GQA
    dict(B=1, H=2, Hkv=2, T=256, D=128),
])
def test_in_kernel_rope_matches_outside(config):
    """flash(rope=(cos,sin)) == flash(apply_rope(q,k)) — forward AND vjp
    (the backward recomputes roped scores and back-rotates dq/dk with the
    transpose rotation)."""
    from lxt_tpu.models.common import apply_rope

    B, H, Hkv, T, D = (config[x] for x in ("B", "H", "Hkv", "T", "D"))
    ks = jax.random.split(jax.random.PRNGKey(31), 3)
    q = jax.random.normal(ks[0], (B, H, T, D))
    k = jax.random.normal(ks[1], (B, Hkv, T, D))
    v = jax.random.normal(ks[2], (B, Hkv, T, D))
    cos, sin = _rope_tables(T, D)
    do = jax.random.normal(jax.random.PRNGKey(32), q.shape)

    def f_inside(q, k, v):
        return (flash_attention(q, k, v, causal=True,
                                rope=(cos, sin)) * do).sum()

    def f_outside(q, k, v):
        qr, kr = apply_rope(q, k, cos, sin)
        return (flash_attention(qr, kr, v, causal=True) * do).sum()

    v_in, g_in = jax.value_and_grad(f_inside, argnums=(0, 1, 2))(q, k, v)
    v_out, g_out = jax.value_and_grad(f_outside, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(v_in), float(v_out), rtol=1e-5)
    for a, b, name in zip(g_in, g_out, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-5, err_msg=f"d{name}")


def test_in_kernel_rope_with_split_and_delta():
    """rope composes with the static split_fwd/inline_delta perf options."""
    from lxt_tpu.models.common import apply_rope

    q, k, v = _qkv(jax.random.PRNGKey(33), B=1, H=2, T=256, D=64)
    cos, sin = _rope_tables(256, 64)
    do = jax.random.normal(jax.random.PRNGKey(34), q.shape)

    def f_opt(q, k, v):
        return (flash_attention(q, k, v, causal=True, rope=(cos, sin),
                                split_fwd=True, inline_delta=True)
                * do).sum()

    def f_ref(q, k, v):
        qr, kr = apply_rope(q, k, cos, sin)
        return (flash_attention(qr, kr, v, causal=True) * do).sum()

    v_o, g_o = jax.value_and_grad(f_opt, argnums=(0, 1, 2))(q, k, v)
    v_r, g_r = jax.value_and_grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(v_o), float(v_r), rtol=1e-5)
    for a, b, name in zip(g_o, g_r, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-5, err_msg=f"d{name}")


def test_in_kernel_rope_multiblock_and_window():
    """rope through the ONLINE kernel (nk > 1, forced small blocks) and the
    split backward, with a sliding window."""
    from lxt_tpu.models.common import apply_rope
    import lxt_tpu.ops.flash_attention as fa

    q, k, v = _qkv(jax.random.PRNGKey(35), B=1, H=2, T=512, D=64)
    cos, sin = _rope_tables(512, 64)
    do = jax.random.normal(jax.random.PRNGKey(36), q.shape)

    def f_inside(q, k, v):
        return (flash_attention(q, k, v, 192, causal=True, rope=(cos, sin),
                                block_q=128, block_k=128) * do).sum()

    def f_outside(q, k, v):
        qr, kr = apply_rope(q, k, cos, sin)
        return (flash_attention(qr, kr, v, 192, causal=True,
                                block_q=128, block_k=128) * do).sum()

    v_in, g_in = jax.value_and_grad(f_inside, argnums=(0, 1, 2))(q, k, v)
    v_out, g_out = jax.value_and_grad(f_outside, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(v_in), float(v_out), rtol=1e-5)
    for a, b, name in zip(g_in, g_out, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-5, err_msg=f"d{name}")


def test_dispatcher_rope_flash_vs_einsum():
    """attention(rope=...) relevance equality between the flash path (forced,
    in-kernel rope) and the einsum path (dispatcher-applied rope), under the
    attnlrp composite."""
    q, k, v = _qkv(jax.random.PRNGKey(37), B=1, H=2, T=256, D=64)
    cos, sin = _rope_tables(256, 64)
    rel = jax.random.normal(jax.random.PRNGKey(38), q.shape)

    def run(impl):
        def f(q, k, v):
            out = attention(q, k, v, causal=True, composite=lxt_tpu.attnlrp,
                            rope=(cos, sin), impl=impl)
            return (out * rel).sum()
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    g_f = run("flash")
    g_e = run("einsum")
    for a, b, name in zip(g_f, g_e, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-5, err_msg=f"d{name}")


def test_rope_rejects_offsets():
    from lxt_tpu.ops.flash_attention import flash_attention_lse

    q, k, v = _qkv(jax.random.PRNGKey(39), T=128)
    cos, sin = _rope_tables(128, 64)
    with pytest.raises(ValueError, match="offsets"):
        flash_attention_lse(q, k, v, q_start=128, rope=(cos, sin))


# ---------------------------------------------------------------------------
# layout="bthd": projection-native [B, T, H, D] activations, no transposes
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("config", [
    # fused single-block backward (nk == 1)
    dict(B=2, H=4, Hkv=4, T=256, D=128, kw=dict()),
    # multiblock: _fwd_kernel scan + _split_bwd (nk=2 > FUSED_BWD_MAX_NK)
    dict(B=1, H=4, Hkv=4, T=256, D=128, kw=dict(block_q=128, block_k=128)),
    # GQA: lane-strided kv head gather in the packed view
    dict(B=1, H=8, Hkv=2, T=256, D=128, kw=dict()),
    # window + GQA, multiblock
    dict(B=1, H=4, Hkv=2, T=256, D=128,
         kw=dict(window=96, block_q=128, block_k=128)),
    # diagonal-split forward + in-kernel delta
    dict(B=1, H=2, Hkv=2, T=256, D=128,
         kw=dict(split_fwd=True, inline_delta=True)),
    # hd=256 (Gemma-2/3 width): double-lane blocks
    dict(B=1, H=2, Hkv=2, T=256, D=256, kw=dict()),
    # kv_begin left padding
    dict(B=2, H=2, Hkv=2, T=256, D=128, kw=dict(), kv_begin=True),
    # --- hd=64 pair-packed tiling (two heads per 128-lane block) ---
    # "byhalf" (n_rep=1): fused single-block backward
    dict(B=2, H=4, Hkv=4, T=256, D=64, kw=dict()),
    # "byhalf" multiblock: _fwd_kernel online scan + _split_bwd
    dict(B=1, H=4, Hkv=4, T=256, D=64, kw=dict(block_q=128, block_k=128)),
    # "bysel" (GQA n_rep=4): runtime kv-half parity, fused backward
    dict(B=1, H=8, Hkv=2, T=256, D=64, kw=dict()),
    # "bysel" (n_rep=2) + window, multiblock (_dq bysel_p / _dkv bysel_r)
    dict(B=1, H=4, Hkv=2, T=256, D=64,
         kw=dict(window=96, block_q=128, block_k=128)),
    # pair diagonal-split forward + split fused backward + in-kernel delta
    dict(B=1, H=4, Hkv=4, T=256, D=64,
         kw=dict(split_fwd=True, inline_delta=True)),
    # pair split kernels under GQA bysel routing
    dict(B=1, H=4, Hkv=2, T=256, D=64,
         kw=dict(split_fwd=True, inline_delta=True)),
    # pair mode + kv_begin left padding (guard_empty in the half loop)
    dict(B=2, H=2, Hkv=2, T=256, D=64, kw=dict(), kv_begin=True),
])
def test_layout_bthd_matches_bhtd(config):
    """flash_attention(layout='bthd') on [B, T, H, D] activations ==
    transposed flash_attention on the [B, H, T, D] layout, forward and vjp
    (same kernels, only the BlockSpec tiling maps differ)."""
    B, H, Hkv, T, D = (config[x] for x in ("B", "H", "Hkv", "T", "D"))
    kw = dict(config["kw"])
    ks = jax.random.split(jax.random.PRNGKey(50), 4)
    q = jax.random.normal(ks[0], (B, H, T, D))
    k = jax.random.normal(ks[1], (B, Hkv, T, D))
    v = jax.random.normal(ks[2], (B, Hkv, T, D))
    if config.get("kv_begin"):
        kw["kv_begin"] = jnp.array([37, 0], dtype=jnp.int32)[:B]
    do = jax.random.normal(ks[3], (B, H, T, D))

    def f_ref(q, k, v):
        return (flash_attention(q, k, v, causal=True, **kw) * do).sum()

    def f_bthd(q, k, v):
        t = lambda x: x.swapaxes(1, 2)  # noqa: E731
        out = flash_attention(t(q), t(k), t(v), causal=True,
                              layout="bthd", **kw)
        return (t(out) * do).sum()

    out_r = flash_attention(q, k, v, causal=True, **kw)
    out_b = flash_attention(q.swapaxes(1, 2), k.swapaxes(1, 2),
                            v.swapaxes(1, 2), causal=True,
                            layout="bthd", **kw).swapaxes(1, 2)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_r),
                               rtol=0, atol=2e-5)
    g_r = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    g_b = jax.grad(f_bthd, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_b, g_r, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-5, err_msg=f"d{name}")


@pytest.mark.parametrize("H,Hkv,D", [
    (4, 4, 128),  # native packed lane block per head
    (4, 4, 64),   # hd=64 pair mode, "byhalf"
    (8, 2, 64),   # hd=64 pair mode, "bysel" GQA routing
])
def test_layout_bthd_lse_and_rope(H, Hkv, D):
    """flash_attention_lse(layout='bthd') with in-kernel rope: out AND lse
    (and the lse cotangent) match the bhtd layout."""
    from lxt_tpu.ops.flash_attention import flash_attention_lse

    B, T = 1, 256
    ks = jax.random.split(jax.random.PRNGKey(51), 5)
    q = jax.random.normal(ks[0], (B, H, T, D))
    k = jax.random.normal(ks[1], (B, Hkv, T, D))
    v = jax.random.normal(ks[2], (B, Hkv, T, D))
    do = jax.random.normal(ks[3], (B, H, T, D))
    dl = jax.random.normal(ks[4], (B, H, T))
    cos, sin = _rope_tables(T, D)
    t = lambda x: x.swapaxes(1, 2)  # noqa: E731

    def f_ref(q, k, v):
        out, lse = flash_attention_lse(q, k, v, causal=True, rope=(cos, sin))
        return (out * do).sum() + (lse * dl).sum()

    def f_bthd(q, k, v):
        out, lse = flash_attention_lse(t(q), t(k), t(v), causal=True,
                                       rope=(cos, sin), layout="bthd")
        return (t(out) * do).sum() + (lse.swapaxes(1, 2) * dl).sum()

    (out_r, lse_r) = flash_attention_lse(q, k, v, causal=True,
                                         rope=(cos, sin))
    (out_b, lse_b) = flash_attention_lse(t(q), t(k), t(v), causal=True,
                                         rope=(cos, sin), layout="bthd")
    np.testing.assert_allclose(np.asarray(t(out_b)), np.asarray(out_r),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lse_b.swapaxes(1, 2)),
                               np.asarray(lse_r), rtol=0, atol=2e-5)
    g_r = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    g_b = jax.grad(f_bthd, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_b, g_r, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-5, err_msg=f"d{name}")


def test_layout_rejects_unknown():
    q, k, v = _qkv(jax.random.PRNGKey(52), T=128)
    with pytest.raises(ValueError, match="layout"):
        flash_attention(q, k, v, layout="tbhd")
    # hd=96 cannot lane-tile the packed [B, T, H*D] view (Mosaic 128-lane
    # rule; not pair-eligible either) — flash_attention must refuse rather
    # than emit an unlowerable kernel (the dispatcher pads/transposes)
    q96, k96, v96 = _qkv(jax.random.PRNGKey(52), T=128, D=96)
    with pytest.raises(ValueError, match="head_dim"):
        flash_attention(q96.swapaxes(1, 2), k96.swapaxes(1, 2),
                        v96.swapaxes(1, 2), layout="bthd")
    # hd=64 with an ODD GQA ratio > 1: a q pair would straddle two kv pair
    # blocks — not representable in pair-packed tiling, must refuse
    qo, _, _ = _qkv(jax.random.PRNGKey(53), H=6, T=128)
    _, ko, vo = _qkv(jax.random.PRNGKey(53), H=2, T=128)
    with pytest.raises(ValueError, match="head_dim"):
        flash_attention(qo.swapaxes(1, 2), ko.swapaxes(1, 2),
                        vo.swapaxes(1, 2), layout="bthd")


@pytest.mark.parametrize("hidden,heads,kv_heads", [
    (192, 2, 1),   # hd=96 > 64: bthd engaged, rope not in-kernel ->
                   # dispatcher transposes to canonical inside attention()
    (256, 2, 1),   # hd=128: rope fused in-kernel, native packed bthd tiling
    (256, 4, 2),   # hd=64: pair-packed tiling, "bysel" GQA (n_rep=2)
    (256, 4, 4),   # hd=64: pair-packed tiling, "byhalf" (n_rep=1)
])
def test_llama_bthd_matches_canonical(hidden, heads, kv_heads):
    """Model-level: the '+bthd' static option (projection-native layout, no
    head split/merge transposes) changes NOTHING numerically — relevance on
    the flash path equals the canonical-layout flash path, and the einsum
    fallback transposes internally."""
    import lxt_tpu
    from lxt_tpu.attribution import input_relevance, select_logit
    from lxt_tpu.models import llama as jllama

    cfg = jllama.LlamaConfig(
        vocab_size=64, hidden_size=hidden, intermediate_size=96, num_layers=2,
        num_heads=heads, num_kv_heads=kv_heads)  # GQA: strided bthd kv gather
    params = jllama.init_params(cfg, jax.random.PRNGKey(2))
    ids = np.random.RandomState(2).randint(1, 64, (1, 128))
    e = jllama.embed(params, jnp.asarray(ids))

    def run(impl):
        def t(x):
            return select_logit(jllama.forward(
                params, cfg, x, lxt_tpu.attnlrp, attn_impl=impl).logits)
        return input_relevance(t, e)

    _, rel_flash = run("flash")
    _, rel_bthd = run("flash+bthd")
    np.testing.assert_allclose(np.asarray(rel_bthd), np.asarray(rel_flash),
                               rtol=0, atol=3e-5)
    _, rel_e = run("einsum")
    _, rel_eb = run("einsum+bthd")
    np.testing.assert_allclose(np.asarray(rel_eb), np.asarray(rel_e),
                               rtol=0, atol=1e-6)


def test_llama_bench_impl_combo_matches_einsum():
    """Model-level guard on the production bench path: the full static
    option set bench.py runs ('+split+delta+bthd', unrolled driver) computes
    the same logits AND relevance as the plain einsum path."""
    import lxt_tpu
    from lxt_tpu.attribution import input_relevance, select_logit
    from lxt_tpu.models import common as jcommon
    from lxt_tpu.models import llama as jllama

    # hd=64 with even head/kv-group counts: pair-packed bthd eligible
    cfg = jllama.LlamaConfig(
        vocab_size=64, hidden_size=256, intermediate_size=96, num_layers=2,
        num_heads=4, num_kv_heads=2)
    assert cfg.hd == 64
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    ids = np.random.RandomState(1).randint(1, 64, (1, 128))
    e = jllama.embed(params, jnp.asarray(ids))

    def t_ref(x):
        return select_logit(jllama.forward(params, cfg, x, lxt_tpu.attnlrp,
                                           attn_impl="einsum").logits)

    def t_bench(x):
        return select_logit(jllama.forward(
            params, cfg, x, lxt_tpu.attnlrp, remat=False,
            attn_impl="flash+split+delta+bthd",
            layer_driver=jcommon.unrolled).logits)

    v_ref, rel_ref = input_relevance(t_ref, e)
    v_b, rel_b = input_relevance(t_bench, e)
    np.testing.assert_allclose(np.asarray(v_b), np.asarray(v_ref),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(rel_b), np.asarray(rel_ref),
                               rtol=0, atol=3e-5)
