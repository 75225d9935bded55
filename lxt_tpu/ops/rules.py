"""Gradient*Input LRP rule primitives (the "efficient" path), TPU-native.

These are the JAX equivalents of the reference's three autograd tricks
(``lxt/efficient/rules.py:19-127`` in rachtibat/LRP-eXplains-Transformers):
every AttnLRP rule is expressed as the *gradient of a slightly modified
function*, so a single ``jax.vjp``/``jax.grad`` over the patched model yields
relevance as ``input * grad`` — one backward pass, fully jittable, fused by
XLA, and compatible with ``jax.checkpoint`` (custom_vjp residuals are
recomputed under remat just like activations).

Rules
-----
identity_rule(fn, x)
    Identity rule (Eq. 9 of the AttnLRP paper) for elementwise nonlinearities:
    the backward multiplies the incoming relevance-gradient by ``fn(x)/(x+eps)``
    so that ``x * grad == fn(x) * grad_out`` (relevance passes through
    unchanged). Reference: ``lxt/efficient/rules.py:69-100``.
divide_gradient(x, factor)
    Uniform rule (Eq. 7): forward identity, backward divides the gradient.
    Placed after bilinear ops (matmul gets 2 inputs -> each operand's chain
    carries 1/2; attention q,k sit behind two matmuls -> 1/4).
    Reference: ``lxt/efficient/rules.py:103-127``.
stop_gradient(x)
    CP-LRP / norm-variance path: relevance terminated.
    Reference: ``lxt/efficient/rules.py:59-66``.
gamma_linear / gamma_conv2d
    Native gamma-rule (zennit replacement) for ViT denoising, expressed in the
    Gradient*Input framing exactly like the reference's zennit interop
    (``lxt/efficient/zennit_patches.py:26-78``): backward converts grad to
    relevance (g*out), applies the gamma redistribution, then divides by the
    input so that ``x * grad`` equals the gamma relevance.

All primitives are dtype-preserving; numerically sensitive ratios are computed
in float32 and cast back, matching the reference's bf16 semantics.
"""

from functools import partial

import jax
import jax.numpy as jnp

from lxt_tpu.ops.check import maybe_redistribute

_IDENTITY_EPS = 1e-10  # reference: lxt/efficient/rules.py:88


def stop_gradient(x):
    """Stop relevance flow (CP-LRP rule)."""
    return jax.lax.stop_gradient(x)


# ---------------------------------------------------------------------------
# identity rule
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0,))
def identity_rule(fn, x):
    """Apply ``fn`` elementwise under the identity LRP rule (Eq. 9)."""
    return fn(x)


def _identity_rule_fwd(fn, x):
    out = fn(x)
    # residual is the ratio out/(x+eps); computed in f32 for bf16 activations
    ratio = (out.astype(jnp.float32) / (x.astype(jnp.float32) + _IDENTITY_EPS))
    return out, ratio.astype(x.dtype)


def _identity_rule_bwd(fn, ratio, g):
    return (maybe_redistribute((ratio * g,), (g,))[0],)


identity_rule.defvjp(_identity_rule_fwd, _identity_rule_bwd)


# ---------------------------------------------------------------------------
# uniform rule
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(1,))
def divide_gradient(x, factor=2):
    """Identity forward; backward divides the relevance-gradient by ``factor``."""
    return x


def _divide_gradient_fwd(x, factor):
    return x, None


def _divide_gradient_bwd(factor, _, g):
    return (maybe_redistribute((g / factor,), (g,))[0],)


divide_gradient.defvjp(_divide_gradient_fwd, _divide_gradient_bwd)


# ---------------------------------------------------------------------------
# gamma rule (native zennit replacement for ViT denoising)
# ---------------------------------------------------------------------------

def _stabilize(x, eps=1e-6):
    return x + jnp.where(x >= 0, eps, -eps)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def gamma_linear(x, w, b, gamma=0.25):
    """Linear layer y = x @ w + b with gamma-LRP backward in G*I framing.

    ``w`` has shape ``[in, out]`` (JAX convention). The gamma rule
    (LRP-gamma, Montavon et al.) redistributes with weights ``w + gamma*w^+``:

        R_in = x*(w+g*w^+) @ (R_out / z_gamma),   z_gamma = x @ (w+g*w^+) + ...

    In the Gradient*Input framing (reference zennit_patches.py:32-62) the
    incoming cotangent g relates to relevance via R_out = g * out, and the
    returned cotangent must satisfy R_in = x * grad_x.
    """
    return jnp.matmul(x, w) + (b if b is not None else 0.0)


def _gamma_linear_fwd(x, w, b, gamma):
    out = jnp.matmul(x, w) + (b if b is not None else 0.0)
    return out, (x, w, b, out)


def _gamma_linear_bwd(gamma, res, g):
    x, w, b, out = res
    f32 = jnp.float32
    x32, w32, g32, out32 = (t.astype(f32) for t in (x, w, g, out))
    rel_out = g32 * out32
    w_mod = w32 + gamma * jnp.clip(w32, 0, None)
    b_mod = None if b is None else (b.astype(f32) + gamma * jnp.clip(b.astype(f32), 0, None))
    z = jnp.matmul(x32, w_mod) + (b_mod if b_mod is not None else 0.0)
    rel_norm = rel_out / _stabilize(z)
    rel_in = jnp.matmul(rel_norm, w_mod.T) * x32
    grad_x = rel_in / _stabilize(x32)
    zeros_w = jnp.zeros_like(w)
    zeros_b = None if b is None else jnp.zeros_like(b)
    (grad_x,) = maybe_redistribute((grad_x,), (g,))
    return grad_x.astype(x.dtype), zeros_w, zeros_b


gamma_linear.defvjp(_gamma_linear_fwd, _gamma_linear_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def gamma_conv2d(x, w, b, strides, padding, gamma=0.25):
    """NHWC conv2d with gamma-LRP backward in the G*I framing.

    ``w`` has shape ``[kh, kw, cin, cout]``.
    """
    return _conv2d(x, w, b, strides, padding)


def _conv2d(x, w, b, strides, padding):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        out = out + b
    return out


def _gamma_conv2d_fwd(x, w, b, strides, padding, gamma):
    return _conv2d(x, w, b, strides, padding), (x, w, b)


def _gamma_conv2d_bwd(strides, padding, gamma, res, g):
    x, w, b = res
    f32 = jnp.float32
    x32, w32, g32 = x.astype(f32), w.astype(f32), g.astype(f32)
    w_mod = w32 + gamma * jnp.clip(w32, 0, None)
    b_mod = None if b is None else (b.astype(f32) + gamma * jnp.clip(b.astype(f32), 0, None))

    def fwd_mod(xx):
        return _conv2d(xx, w_mod, b_mod, strides, padding)

    out = _conv2d(x32, w32, b.astype(f32) if b is not None else None, strides, padding)
    rel_out = g32 * out
    z = fwd_mod(x32)
    rel_norm = rel_out / _stabilize(z)
    _, vjp_fn = jax.vjp(fwd_mod, x32)
    (rel_in,) = vjp_fn(rel_norm)
    rel_in = rel_in * x32
    grad_x = rel_in / _stabilize(x32)
    (grad_x,) = maybe_redistribute((grad_x,), (g,))
    return grad_x.astype(x.dtype), jnp.zeros_like(w), (None if b is None else jnp.zeros_like(b))


gamma_conv2d.defvjp(_gamma_conv2d_fwd, _gamma_conv2d_bwd)


# ---------------------------------------------------------------------------
# alpha-beta rule (zennit rule-zoo parity: AlphaBeta / ZPlus)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def alphabeta_linear(x, w, b, alpha=2.0, beta=1.0):
    """Linear layer with the alpha-beta LRP backward in the G*I framing.

    R_j = sum_k (alpha * z+_jk / z+_k  -  beta * z-_jk / z-_k) R_k, where
    z+ collects the positive contributions (x+w+ and x-w-, plus b+) and z-
    the negative ones (x+w- and x-w+, plus b-); alpha - beta = 1 conserves.
    ``("zplus",)`` == alpha=1, beta=0 (Montavon's z+ rule). Replaces the
    zennit AlphaBeta/ZPlus hooks the reference reaches through
    ``monkey_patch_zennit`` (lxt/efficient/zennit_patches.py:26-78), in the
    same grad->relevance->grad sandwich as :func:`gamma_linear`.
    """
    return jnp.matmul(x, w) + (b if b is not None else 0.0)


def _alphabeta_linear_fwd(x, w, b, alpha, beta):
    out = jnp.matmul(x, w) + (b if b is not None else 0.0)
    return out, (x, w, b, out)


def _alphabeta_linear_bwd(alpha, beta, res, g):
    x, w, b, out = res
    f32 = jnp.float32
    x32, w32, g32, out32 = (t.astype(f32) for t in (x, w, g, out))
    xp, xn = jnp.clip(x32, 0, None), jnp.clip(x32, None, 0)
    wp, wn = jnp.clip(w32, 0, None), jnp.clip(w32, None, 0)
    zp = jnp.matmul(xp, wp) + jnp.matmul(xn, wn)
    zn = jnp.matmul(xp, wn) + jnp.matmul(xn, wp)
    if b is not None:
        b32 = b.astype(f32)
        zp = zp + jnp.clip(b32, 0, None)
        zn = zn + jnp.clip(b32, None, 0)
    rel_out = g32 * out32
    rp = rel_out / _stabilize(zp)
    rel_in = alpha * (xp * jnp.matmul(rp, wp.T) + xn * jnp.matmul(rp, wn.T))
    if beta != 0.0:
        rn = rel_out / _stabilize(zn)
        rel_in = rel_in - beta * (xp * jnp.matmul(rn, wn.T)
                                  + xn * jnp.matmul(rn, wp.T))
    grad_x = rel_in / _stabilize(x32)
    (grad_x,) = maybe_redistribute((grad_x,), (g,))
    return (grad_x.astype(x.dtype), jnp.zeros_like(w),
            None if b is None else jnp.zeros_like(b))


alphabeta_linear.defvjp(_alphabeta_linear_fwd, _alphabeta_linear_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def alphabeta_conv2d(x, w, b, strides, padding, alpha=2.0, beta=1.0):
    """NHWC conv2d with the alpha-beta LRP backward (see
    :func:`alphabeta_linear`). ``w``: [kh, kw, cin, cout]."""
    return _conv2d(x, w, b, strides, padding)


def _alphabeta_conv2d_fwd(x, w, b, strides, padding, alpha, beta):
    return _conv2d(x, w, b, strides, padding), (x, w, b)


def _alphabeta_conv2d_bwd(strides, padding, alpha, beta, res, g):
    x, w, b = res
    f32 = jnp.float32
    x32, w32, g32 = x.astype(f32), w.astype(f32), g.astype(f32)
    xp, xn = jnp.clip(x32, 0, None), jnp.clip(x32, None, 0)
    wp, wn = jnp.clip(w32, 0, None), jnp.clip(w32, None, 0)

    def conv(xx, ww):
        return _conv2d(xx, ww, None, strides, padding)

    out = _conv2d(x32, w32, b.astype(f32) if b is not None else None,
                  strides, padding)
    rel_out = g32 * out
    zp = conv(xp, wp) + conv(xn, wn)
    zn = conv(xp, wn) + conv(xn, wp)
    if b is not None:
        b32 = b.astype(f32)
        zp = zp + jnp.clip(b32, 0, None)
        zn = zn + jnp.clip(b32, None, 0)

    def conv_t(gg, ww):
        _, vjp_fn = jax.vjp(lambda xx: conv(xx, ww), x32)
        return vjp_fn(gg)[0]

    rp = rel_out / _stabilize(zp)
    rel_in = alpha * (xp * conv_t(rp, wp) + xn * conv_t(rp, wn))
    if beta != 0.0:
        rn = rel_out / _stabilize(zn)
        rel_in = rel_in - beta * (xp * conv_t(rn, wn) + xn * conv_t(rn, wp))
    grad_x = rel_in / _stabilize(x32)
    (grad_x,) = maybe_redistribute((grad_x,), (g,))
    return (grad_x.astype(x.dtype), jnp.zeros_like(w),
            None if b is None else jnp.zeros_like(b))


alphabeta_conv2d.defvjp(_alphabeta_conv2d_fwd, _alphabeta_conv2d_bwd)


# ---------------------------------------------------------------------------
# flat / w-square / z-box rules (remaining zennit rule-zoo breadth)
# ---------------------------------------------------------------------------
#
# All three share the modified-z sandwich the gamma rule uses (grad ->
# relevance -> grad, reference lxt/efficient/zennit_patches.py:26-78), but
# with input- and weight-modifiers instead of a weight offset:
#
#   flat    : x -> 1, w -> 1          R_j = sum_k R_k / N        (zennit Flat)
#   wsquare : x -> 1, w -> w^2        R_j = sum_k w2_jk/z_k R_k  (zennit WSquare)
#   zbox    : input-layer bounds rule R_j = sum_k (x w - l w+ - h w-)_jk/z_k R_k
#             (zennit ZBox; low/high are the pixel bounds, scalars or arrays
#             broadcastable to x)
#
# flat and wsquare ignore the input sign entirely (useful on the very first
# layer to spread relevance by connectivity / weight magnitude); zbox is the
# canonical first-conv rule for image models with bounded pixel intensities.
#
# Zero-input caveat (inherent to the G*I framing, shared with the
# reference's zennit interop which divides by stabilize(input) the same
# way, zennit_patches.py:56-62): these rules' true R_in is nonzero even
# where x == 0, but relevance is read as x * grad, so positions with
# exactly-zero input read zero relevance and conservation holds only over
# the |x| >> eps positions. Gamma/alpha-beta are unaffected (their R_in is
# proportional to x). For bounded-pixel zbox use, normalize inputs so that
# informative pixels are bounded away from 0 (standard image preprocessing
# already does this).


def _modz_rel_in(kind, extra, x32, w32, b32, rel_out, mm, mm_t):
    """Shared backward math; ``mm(x, w)``/``mm_t(g, w)`` abstract over
    matmul vs conv (+ its transpose via vjp)."""
    if kind == "flat":
        ones_x, ones_w = jnp.ones_like(x32), jnp.ones_like(w32)
        z = mm(ones_x, ones_w)
        return ones_x * mm_t(rel_out / _stabilize(z), ones_w)
    if kind == "wsquare":
        ones_x, w_sq = jnp.ones_like(x32), w32 * w32
        z = mm(ones_x, w_sq)
        if b32 is not None:
            z = z + b32 * b32  # bias absorbs its (squared) share, zennit-style
        return ones_x * mm_t(rel_out / _stabilize(z), w_sq)
    # zbox
    low = jnp.broadcast_to(jnp.asarray(extra[0], x32.dtype), x32.shape)
    high = jnp.broadcast_to(jnp.asarray(extra[1], x32.dtype), x32.shape)
    wp, wn = jnp.clip(w32, 0, None), jnp.clip(w32, None, 0)
    # bias cancels exactly in z: (f(x)+b) - (f+(l)+b+) - (f-(h)+b-) and
    # b = b+ + b-, so z carries no bias term (matches zennit's three-subgraph
    # construction)
    z = mm(x32, w32) - mm(low, wp) - mm(high, wn)
    s = rel_out / _stabilize(z)
    return x32 * mm_t(s, w32) - low * mm_t(s, wp) - high * mm_t(s, wn)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def modz_linear(x, w, b, spec):
    """Linear layer with a zennit-zoo modified-z LRP backward in the G*I
    framing. ``spec``: ``('flat',)``, ``('wsquare',)`` or
    ``('zbox', low, high)``. ``w``: [in, out]."""
    return jnp.matmul(x, w) + (b if b is not None else 0.0)


def _modz_linear_fwd(x, w, b, spec):
    out = jnp.matmul(x, w) + (b if b is not None else 0.0)
    return out, (x, w, b, out)


def _modz_linear_bwd(spec, res, g):
    x, w, b, out = res
    f32 = jnp.float32
    x32, w32, g32, out32 = (t.astype(f32) for t in (x, w, g, out))
    b32 = None if b is None else b.astype(f32)
    rel_in = _modz_rel_in(
        spec[0], spec[1:], x32, w32, b32, g32 * out32,
        jnp.matmul, lambda gg, ww: jnp.matmul(gg, ww.T))
    grad_x = rel_in / _stabilize(x32)
    (grad_x,) = maybe_redistribute((grad_x,), (g,))
    return (grad_x.astype(x.dtype), jnp.zeros_like(w),
            None if b is None else jnp.zeros_like(b))


modz_linear.defvjp(_modz_linear_fwd, _modz_linear_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def modz_conv2d(x, w, b, strides, padding, spec):
    """NHWC conv2d with a zennit-zoo modified-z LRP backward (see
    :func:`modz_linear`). ``w``: [kh, kw, cin, cout]."""
    return _conv2d(x, w, b, strides, padding)


def _modz_conv2d_fwd(x, w, b, strides, padding, spec):
    return _conv2d(x, w, b, strides, padding), (x, w, b)


def _modz_conv2d_bwd(strides, padding, spec, res, g):
    x, w, b = res
    f32 = jnp.float32
    x32, w32, g32 = x.astype(f32), w.astype(f32), g.astype(f32)
    b32 = None if b is None else b.astype(f32)
    out = _conv2d(x32, w32, b32, strides, padding)

    def mm(xx, ww):
        return _conv2d(xx, ww, None, strides, padding)

    def mm_t(gg, ww):
        _, vjp_fn = jax.vjp(lambda xx: mm(xx, ww), x32)
        return vjp_fn(gg)[0]

    rel_in = _modz_rel_in(spec[0], spec[1:], x32, w32, b32, g32 * out,
                          mm, mm_t)
    grad_x = rel_in / _stabilize(x32)
    (grad_x,) = maybe_redistribute((grad_x,), (g,))
    return (grad_x.astype(x.dtype), jnp.zeros_like(w),
            None if b is None else jnp.zeros_like(b))


modz_conv2d.defvjp(_modz_conv2d_fwd, _modz_conv2d_bwd)
