"""Explicit LRP rule wrappers — generic rules over arbitrary functions.

Parity surface for the reference's explicit path (``lxt/explicit/rules.py``):
where the reference wraps ``nn.Module``s (WrapModule subclasses attached by a
Composite), JAX rules wrap *functions* — ``epsilon_rule(fn)`` returns a new
function with the rule's custom VJP. There is no registration machinery to
port: the reference's ``Composite.register`` + torch.fx graph surgery
(``lxt/explicit/core.py:109-250``) exists only because torch models are
mutable object graphs; a JAX model is already a composition of functions, so
"attaching a rule" is literally function application. The audit/verbose
machinery is replaced by :mod:`lxt_tpu.ops.check` (conservation mode).

Rule -> reference mapping:

====================  ======================================================
identity_rule_fn      IdentityRule / identity_fn      (rules.py:19-78)
stop_relevance_rule   StopRelevanceRule               (rules.py:81-122)
epsilon_rule          EpsilonRule / epsilon_lrp_fn    (rules.py:125-222)
uniform_epsilon_rule  UniformEpsilonRule              (rules.py:227-282)
uniform_rule          UniformRule                     (rules.py:375-418)
taylor_decomposition  TaylorDecompositionRule         (rules.py:286-372)
softmax_dt            SoftmaxDT module                (modules.py:13-24)
multi_head_attention_cp  multi_head_attention_cp      (special.py:8-141)
====================  ======================================================

All cotangents here ARE relevance (explicit convention): seed ``jax.vjp``
with the output relevance and the input cotangent is the input relevance.
"""

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from lxt_tpu.ops.check import maybe_redistribute
from lxt_tpu.ops.functional import stabilize


def identity_rule_fn(fn: Callable) -> Callable:
    """Relevance passes through unchanged (single-input elementwise fn)."""

    @jax.custom_vjp
    def wrapped(x):
        return fn(x)

    def _identity_fn_fwd(x):
        return fn(x), None

    def _identity_fn_bwd(_, rel_out):
        return (maybe_redistribute((rel_out,), (rel_out,))[0],)

    wrapped.defvjp(_identity_fn_fwd, _identity_fn_bwd)
    return wrapped


def stop_relevance_rule(fn: Callable) -> Callable:
    """No relevance flows into any input of ``fn`` (CP-LRP building block)."""

    def wrapped(*inputs):
        return fn(*(jax.lax.stop_gradient(x) for x in inputs))

    return wrapped


def _generic_epsilon(fn, n_divide, epsilon):
    """Shared body for epsilon_rule / uniform_epsilon_rule: backward is the
    vjp of fn evaluated at R/(n*out + eps), multiplied by each input
    (reference epsilon_lrp_fn, rules.py:188-222)."""

    @jax.custom_vjp
    def wrapped(*inputs):
        return fn(*inputs)

    def _epsilon_fwd(*inputs):
        out = fn(*inputs)
        return out, (inputs, out)

    def _epsilon_bwd(res, rel_out):
        inputs, out = res
        rel_norm = rel_out / stabilize(n_divide * out, epsilon)
        _, vjp_fn = jax.vjp(fn, *inputs)
        grads = vjp_fn(rel_norm)
        rels = tuple(g * x for g, x in zip(grads, inputs))
        return maybe_redistribute(rels, (rel_out,))

    wrapped.defvjp(_epsilon_fwd, _epsilon_bwd)
    return wrapped


def epsilon_rule(fn: Callable, epsilon: float = 1e-6) -> Callable:
    """Generic epsilon-LRP for any differentiable fn (Eq. 8)."""
    return _generic_epsilon(fn, 1, epsilon)


def uniform_epsilon_rule(fn: Callable, n_inputs: int, epsilon: float = 1e-6) -> Callable:
    """Epsilon rule with uniform split across ``n_inputs`` (Prop. 3.3 as a
    sequential epsilon+uniform application, reference rules.py:227-282)."""
    return _generic_epsilon(fn, n_inputs, epsilon)


def uniform_rule(fn: Callable, n_inputs: Optional[int] = None) -> Callable:
    """Distribute output relevance uniformly to the inputs (Eq. 7): each
    input receives R/n summed over the broadcast (reference rules.py:375-418
    gives each input the full R/n tensor at its own shape)."""

    @jax.custom_vjp
    def wrapped(*inputs):
        return fn(*inputs)

    def _uniform_fwd(*inputs):
        return fn(*inputs), tuple(jnp.shape(x) for x in inputs)

    def _uniform_bwd(shapes, rel_out):
        n = n_inputs if n_inputs is not None else len(shapes)
        rel = rel_out / n
        rels = tuple(jnp.broadcast_to(rel, s) if rel.shape == s
                     else _reduce_to(rel, s) for s in shapes)
        return maybe_redistribute(rels, (rel_out,))

    wrapped.defvjp(_uniform_fwd, _uniform_bwd)
    return wrapped


def _reduce_to(r, shape):
    ndiff = r.ndim - len(shape)
    if ndiff > 0:
        r = r.sum(axis=tuple(range(ndiff)))
    axes = tuple(i for i, s in enumerate(shape) if s == 1 and r.shape[i] != 1)
    if axes:
        r = r.sum(axis=axes, keepdims=True)
    return jnp.broadcast_to(r, shape)


def taylor_decomposition(fn: Callable, ref: Sequence, bias: bool = False,
                         distribute_bias: Optional[Callable] = None) -> Callable:
    """Generalized Taylor decomposition at a reference point (Eq. 4-5;
    reference taylor_decomposition_fn, rules.py:318-372).

    Without bias: normalize relevance by the directional derivative
    J(ref) @ inputs (jvp at ref), backpropagate through the Jacobian at ref
    (vjp at ref), multiply by the inputs. All inputs receive relevance.
    """

    ref = tuple(ref)

    @jax.custom_vjp
    def wrapped(*inputs):
        return fn(*inputs)

    def _taylor_fwd(*inputs):
        return fn(*inputs), inputs

    def _taylor_bwd(inputs, rel_out):
        if bias:
            denom = fn(*inputs)
        else:
            _, denom = jax.jvp(fn, ref, inputs)
        rel_norm = rel_out / stabilize(denom)
        _, vjp_fn = jax.vjp(fn, *ref)
        grads = vjp_fn(rel_norm)
        rels = tuple(g * x for g, x in zip(grads, inputs))
        if bias and callable(distribute_bias):
            rels = distribute_bias(inputs, rels)
        return maybe_redistribute(rels, (rel_out,))

    wrapped.defvjp(_taylor_fwd, _taylor_bwd)
    return wrapped


def softmax_dt(temperature: float = 1.0, axis: int = -1) -> Callable:
    """Softmax with Deep-Taylor relevance backward and a temperature knob
    (reference SoftmaxDT, modules.py:13-24)."""
    from lxt_tpu.ops import functional as lf

    def apply(x):
        return lf.softmax(x, axis, temperature)

    return apply


def multi_head_attention_cp(q, k, v, num_heads: int, w_qkv, b_qkv, w_out, b_out,
                            mask_bias=None, epsilon: float = 1e-6):
    """Functional CP-LRP fused multi-head attention (torch.nn.MHA layout):
    q/k projections and softmax under stop-gradient, relevance flows only
    through the value path under the epsilon rule (reference
    multi_head_attention_cp, special.py:8-141).

    q, k, v: [B, T, D]; w_qkv: [D, 3D] fused in-projection; w_out: [D, D].
    """
    import math

    from lxt_tpu.models import common

    D = q.shape[-1]
    hd = D // num_heads
    wq, wk, wv = jnp.split(w_qkv, 3, axis=-1)
    bq, bk, bv = (None, None, None) if b_qkv is None else jnp.split(b_qkv, 3)

    def proj(x, w, b):
        y = jnp.matmul(x, w)
        return y if b is None else y + b

    # q/k path carries no relevance (CP)
    qh = common.split_heads(
        jax.lax.stop_gradient(proj(q, wq, bq)), num_heads, hd)
    kh = common.split_heads(
        jax.lax.stop_gradient(proj(k, wk, bk)), num_heads, hd)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    if mask_bias is not None:
        scores = scores + mask_bias
    probs = jax.lax.stop_gradient(jax.nn.softmax(scores, axis=-1))

    # value path under the epsilon rule
    def value_path(v_in):
        vh = common.split_heads(proj(v_in, wv, bv), num_heads, hd)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(vh.dtype), vh)
        return proj(common.merge_heads(out), w_out, b_out)

    return epsilon_rule(value_path, epsilon)(v)
