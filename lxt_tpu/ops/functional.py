"""Explicit LRP functional primitives (relevance-propagating ops).

TPU-native counterpart of the reference's ten custom autograd Functions in
``lxt/explicit/functional.py`` (rachtibat/LRP-eXplains-Transformers). Each op
here is a ``jax.custom_vjp`` whose *cotangent is relevance itself* — seeding
``jax.vjp(model)(relevance_at_output)`` propagates LRP relevance in a single
backward pass. Unlike the efficient Gradient*Input path (``ops/rules.py``),
the value arriving at the input IS the relevance (no final ``x * grad``).

Op -> reference mapping (file:lines in the reference repo):

==================  ==========================================================
softmax             softmax_fn, functional.py:276-322 (Deep-Taylor Prop 3.1)
linear_epsilon      linear_epsilon_fn, functional.py:325-364 (Eq. 8)
matmul              matmul_fn, functional.py:367-408 (Prop 3.3, 2x stabilize)
add2                add2_tensors_fn, functional.py:412-459 (Eq. 8)
mul2                mul2_fn, functional.py:498-536 (Prop 3.2 uniform)
mean                mean_fn, functional.py:539-583
layer_norm          layer_norm_grad_fn, functional.py:586-635 (std-detach)
rms_norm_identity   rms_norm_identity_fn, functional.py:463-495 (Prop 3.4)
normalize           normalize_identity_fn, functional.py:638-665 (Prop 3.4)
baddbmm             batched bias + a@b (fills the reference's missing
                    ``lf.baddbmm`` used by its GPT-2 at gpt2.py:288,292)
==================  ==========================================================

There are no ``inplace=`` variants: XLA performs buffer donation and fusion
automatically, which is the TPU-native replacement for torch in-place tricks.
"""

from functools import partial

import jax
import jax.numpy as jnp

from lxt_tpu.ops.check import maybe_redistribute


def stabilize(x, epsilon=1e-6):
    """Add a small epsilon. Reference: _stabilize, functional.py:266-273.

    Matches the reference exactly (a plain ``+ epsilon``, not sign-aware).
    """
    return x + epsilon


def _unbroadcast(r, shape):
    """Reduce relevance ``r`` down to ``shape`` by summing broadcast axes."""
    if r.shape == tuple(shape):
        return r
    ndiff = r.ndim - len(shape)
    r = r.sum(axis=tuple(range(ndiff)))
    axes = tuple(i for i, s in enumerate(shape) if s == 1 and r.shape[i] != 1)
    if axes:
        r = r.sum(axis=axes, keepdims=True)
    return r


# ---------------------------------------------------------------------------
# softmax — Deep Taylor decomposition (Prop. 3.1)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def softmax(x, axis=-1, temperature=1.0):
    """Softmax with Deep-Taylor LRP backward: R_in = x*(R - p*sum(R))."""
    x32 = x.astype(jnp.float32) / temperature
    return jax.nn.softmax(x32, axis=axis)


def _softmax_fwd(x, axis, temperature):
    x32 = x.astype(jnp.float32) / temperature
    p = jax.nn.softmax(x32, axis=axis)
    return p, (x32, p)


def _softmax_bwd(axis, temperature, res, rel_out):
    x32, p = res
    # -inf mask positions contribute 0 relevance (reference functional.py:315)
    x32 = jnp.where(jnp.isneginf(x32), 0.0, x32)
    rel = x32 * (rel_out - p * rel_out.sum(axis=axis, keepdims=True))
    return (maybe_redistribute((rel,), (rel_out,))[0],)


softmax.defvjp(_softmax_fwd, _softmax_bwd)


# ---------------------------------------------------------------------------
# linear — epsilon rule (Eq. 8)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(3,))
def linear_epsilon(x, w, b=None, epsilon=1e-6):
    """y = x @ w (+ b) with epsilon-LRP backward. ``w`` is ``[in, out]``.

    Relevance goes 100% to ``x``; weights/bias receive zero relevance
    (the reference returns None for them, linear_epsilon_fn:360-364).
    """
    out = jnp.matmul(x, w)
    return out if b is None else out + b


def _linear_epsilon_fwd(x, w, b, epsilon):
    out = jnp.matmul(x, w)
    if b is not None:
        out = out + b
    return out, (x, w, b, out)


def _linear_epsilon_bwd(epsilon, res, rel_out):
    x, w, b, out = res
    rel_norm = rel_out / stabilize(out, epsilon)
    rel_x = jnp.matmul(rel_norm, w.swapaxes(-1, -2)) * x
    (rel_x,) = maybe_redistribute((rel_x,), (rel_out,))
    return rel_x, jnp.zeros_like(w), (None if b is None else jnp.zeros_like(b))


linear_epsilon.defvjp(_linear_epsilon_fwd, _linear_epsilon_bwd)


# ---------------------------------------------------------------------------
# matmul — sequential epsilon+uniform rule (Prop. 3.3)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(2,))
def matmul(a, b, epsilon=1e-8):
    """a @ b with AttnLRP Prop-3.3 backward (relevance split halved per input)."""
    return jnp.matmul(a, b)


def _matmul_fwd(a, b, epsilon):
    out = jnp.matmul(a, b)
    return out, (a, b, out)


def _matmul_bwd(epsilon, res, rel_out):
    a, b, out = res
    rel_norm = rel_out / stabilize(2 * out, epsilon)
    rel_a = jnp.matmul(rel_norm, b.swapaxes(-1, -2)) * a
    rel_b = jnp.matmul(a.swapaxes(-1, -2), rel_norm) * b
    rel_a, rel_b = maybe_redistribute((rel_a, rel_b), (rel_out,))
    return rel_a, rel_b


matmul.defvjp(_matmul_fwd, _matmul_bwd)


def baddbmm(bias, a, b, epsilon=1e-8):
    """bias + a @ b, relevance split between the bias-add (epsilon rule) and
    the matmul (Prop 3.3). Completes the op set the reference's GPT-2
    ``_upcast_and_reordered_attn`` needs but never defined (its
    ``lf.baddbmm`` at explicit/models/gpt2.py:288,292 is a latent bug)."""
    return add2(bias, matmul(a, b, epsilon), epsilon)


# ---------------------------------------------------------------------------
# add2 — epsilon rule on elementwise addition
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(2,))
def add2(a, b, epsilon=1e-8):
    """a + b with epsilon-LRP backward: R_i = inp_i * R / (a + b + eps)."""
    return a + b


def _add2_fwd(a, b, epsilon):
    return a + b, (a, b)


def _add2_bwd(epsilon, res, rel_out):
    a, b = res
    rel_norm = rel_out / stabilize(a + b, epsilon)
    rel_a = _unbroadcast(rel_norm * a, a.shape)
    rel_b = _unbroadcast(rel_norm * b, b.shape)
    rel_a, rel_b = maybe_redistribute((rel_a, rel_b), (rel_out,))
    return rel_a, rel_b


add2.defvjp(_add2_fwd, _add2_bwd)


# ---------------------------------------------------------------------------
# mul2 — uniform rule on elementwise multiplication (Prop. 3.2)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(2,))
def mul2(a, b, n_inputs=2):
    """a * b with uniform-LRP backward: each input receives R / n_inputs.

    The reference counts requires_grad inputs at runtime (mul2_fn:521); JAX
    has no runtime requires_grad, so the caller states it: use
    ``n_inputs=1`` when one operand is a constant (then wrap the constant in
    ``jax.lax.stop_gradient``), the default 2 otherwise.
    """
    return a * b


def _mul2_fwd(a, b, n_inputs):
    return a * b, (jnp.shape(a), jnp.shape(b))


def _mul2_bwd(n_inputs, res, rel_out):
    a_shape, b_shape = res
    rel = rel_out / n_inputs
    rel_a = _unbroadcast(rel, a_shape)
    rel_b = _unbroadcast(rel, b_shape)
    rel_a, rel_b = maybe_redistribute((rel_a, rel_b), (rel_out,))
    return rel_a, rel_b


mul2.defvjp(_mul2_fwd, _mul2_bwd)


# ---------------------------------------------------------------------------
# mean — epsilon rule
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def mean(x, axis=-1, keepdims=False, epsilon=1e-6):
    """Mean with epsilon-LRP backward: R_i = x_i * R / (sum(x) + eps)."""
    return x.mean(axis=axis, keepdims=keepdims)


def _mean_fwd(x, axis, keepdims, epsilon):
    return x.mean(axis=axis, keepdims=keepdims), (x,)


def _mean_bwd(axis, keepdims, epsilon, res, rel_out):
    (x,) = res
    x_sum = x.sum(axis=axis, keepdims=True)
    if not keepdims:
        rel_out_e = jnp.expand_dims(rel_out, axis)
    else:
        rel_out_e = rel_out
    rel = x * rel_out_e / stabilize(x_sum, epsilon)
    return (maybe_redistribute((rel,), (rel_out,))[0],)


mean.defvjp(_mean_fwd, _mean_bwd)


# ---------------------------------------------------------------------------
# layer_norm — identity rule on 1/std + epsilon rule on (x - mean)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def layer_norm(x, weight, bias, variance_epsilon=1e-5, epsilon=1e-6):
    """LayerNorm whose backward is the reference's std-detach trick
    (layer_norm_grad_fn, functional.py:586-635): differentiate the layer with
    the std detached, normalize relevance by the output, multiply by input."""
    return _ln_detached_std(x, weight, bias, variance_epsilon)


def _ln_detached_std(x, weight, bias, variance_epsilon):
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    std = jax.lax.stop_gradient(jnp.sqrt(var + variance_epsilon))
    y = (x - mu) / std
    if weight is not None:
        y = y * weight
    if bias is not None:
        y = y + bias
    return y


def _layer_norm_fwd(x, weight, bias, variance_epsilon, epsilon):
    y = _ln_detached_std(x, weight, bias, variance_epsilon)
    return y, (x, weight, bias, y)


def _layer_norm_bwd(variance_epsilon, epsilon, res, rel_out):
    x, weight, bias, y = res
    rel_norm = rel_out / stabilize(y, epsilon)
    _, vjp_fn = jax.vjp(lambda xx: _ln_detached_std(xx, weight, bias, variance_epsilon), x)
    (grads,) = vjp_fn(rel_norm)
    rel = grads * x
    (rel,) = maybe_redistribute((rel,), (rel_out,))
    return (rel,
            None if weight is None else jnp.zeros_like(weight),
            None if bias is None else jnp.zeros_like(bias))


layer_norm.defvjp(_layer_norm_fwd, _layer_norm_bwd)


# ---------------------------------------------------------------------------
# rms_norm — identity rule (Prop. 3.4)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(2,))
def rms_norm_identity(x, weight, variance_epsilon=1e-6):
    """RMSNorm forward (f32 internals, like Llama); identity-rule backward:
    relevance passes 100% to the input unchanged."""
    return _rms_norm(x, weight, variance_epsilon)


def _rms_norm(x, weight, variance_epsilon):
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    var = (x32 * x32).mean(axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + variance_epsilon)
    return weight * y.astype(dt)


def _rms_norm_identity_fwd(x, weight, variance_epsilon):
    return _rms_norm(x, weight, variance_epsilon), (weight,)


def _rms_norm_identity_bwd(variance_epsilon, res, rel_out):
    (weight,) = res
    (rel,) = maybe_redistribute((rel_out,), (rel_out,))
    return rel, jnp.zeros_like(weight)


rms_norm_identity.defvjp(_rms_norm_identity_fwd, _rms_norm_identity_bwd)


# ---------------------------------------------------------------------------
# normalize — identity rule (Prop. 3.4)
# ---------------------------------------------------------------------------

def _normalize_impl(x, p, axis, eps):
    norm = jnp.linalg.norm(x, ord=p, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def normalize(x, p=2.0, axis=1, eps=1e-12):
    """F.normalize equivalent (x / max(||x||_p, eps)) with identity backward."""
    return _normalize_impl(x, p, axis, eps)


def _normalize_fwd(x, p, axis, eps):
    return _normalize_impl(x, p, axis, eps), None


def _normalize_bwd(p, axis, eps, _, rel_out):
    return (maybe_redistribute((rel_out,), (rel_out,))[0],)


normalize.defvjp(_normalize_fwd, _normalize_bwd)
