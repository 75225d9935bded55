"""Gradient-method baselines: Integrated Gradients and SmoothGrad.

The AttnLRP paper's central claim is that LRP beats gradient-based
attribution (plain Gradient*Input, Integrated Gradients, SmoothGrad) on
faithfulness while costing one backward pass instead of dozens. The torch
reference cites those comparisons but ships neither the baselines nor the
evaluation; here both live in-framework so the claim is runnable:

    rep_lrp = faithfulness_report(logit_fn, e, lrp_relevance)
    rep_ig  = faithfulness_report(logit_fn, e, integrated_gradients(...))

TPU-first shape: each method is a single jitted program — IG's path
integral is a ``lax.map`` over interpolation points (each point a full
batched forward+backward on the MXU), SmoothGrad a ``lax.map`` over noise
samples. Cost scales with ``steps``/``samples`` — exactly the many-backward
overhead the single-pass LRP methods avoid.

``target_fn(embeds [B, T, D]) -> [B]`` per-example explained logits, the
same contract as :mod:`lxt_tpu.utils.faithfulness` (use the plain model
forward — these methods define their own relevance; LRP composites are not
involved).
"""

from typing import Callable, Union

import jax
import jax.numpy as jnp


def _sum_grad(target_fn):
    """Per-example grads via one vjp on the summed target (per-example
    targets have disjoint gradients, so the sum seeds every row with 1)."""
    return jax.grad(lambda e: target_fn(e).sum())


def gradient_x_input(target_fn: Callable, inputs_embeds, *,
                     sum_features: bool = True):
    """Plain Gradient*Input — the weakest baseline (== the
    ``vanilla_gradient`` composite through the attribution API; provided
    here for symmetry with the other baselines)."""
    grad = _sum_grad(target_fn)(inputs_embeds)
    rel = inputs_embeds.astype(jnp.float32) * grad.astype(jnp.float32)
    return rel.sum(-1) if sum_features else rel


def integrated_gradients(target_fn: Callable, inputs_embeds, *,
                         steps: int = 32,
                         baseline: Union[str, jax.Array] = "zero",
                         sum_features: bool = True):
    """Integrated Gradients (Sundararajan et al. 2017) over the embedding
    path ``x0 + a*(x - x0)``, midpoint rule with ``steps`` points.

    ``baseline``: ``'zero'``, ``'mean'`` (per-example mean embedding) or an
    array broadcastable to ``[B, T, D]``. Returns ``[B, T]`` relevance
    (or ``[B, T, D]``). Satisfies completeness up to quadrature error:
    ``rel.sum(1) ~= target(x) - target(x0)`` — exact for linear targets at
    any ``steps`` (tested), so conservation is checkable the same way as
    for the LRP rules.
    """
    if isinstance(baseline, str):
        if baseline == "zero":
            x0 = jnp.zeros_like(inputs_embeds)
        elif baseline == "mean":
            x0 = jnp.broadcast_to(
                inputs_embeds.mean(-2, keepdims=True).astype(
                    inputs_embeds.dtype), inputs_embeds.shape)
        else:
            raise ValueError(f"baseline must be 'zero', 'mean' or an "
                             f"array, got {baseline!r}")
    else:
        x0 = jnp.broadcast_to(jnp.asarray(baseline, inputs_embeds.dtype),
                              inputs_embeds.shape)
    delta = inputs_embeds - x0
    grad_fn = _sum_grad(target_fn)
    # midpoint quadrature: alphas at (i + 1/2)/steps, weights 1/steps
    alphas = (jnp.arange(steps, dtype=jnp.float32) + 0.5) / steps

    def at_alpha(a):
        return grad_fn(x0 + a.astype(inputs_embeds.dtype) * delta)

    grads = jax.lax.map(at_alpha, alphas)              # [steps, B, T, D]
    avg = grads.astype(jnp.float32).mean(0)
    rel = delta.astype(jnp.float32) * avg
    return rel.sum(-1) if sum_features else rel


def smoothgrad(target_fn: Callable, inputs_embeds, key, *,
               samples: int = 16, sigma: float = 0.1,
               sum_features: bool = True, times_input: bool = True):
    """SmoothGrad (Smilkov et al. 2017): gradients averaged over Gaussian
    input noise, scale ``sigma`` relative to the per-example embedding std.

    ``times_input=True`` returns the Gradient*Input form (comparable to the
    LRP relevances); ``False`` returns the raw smoothed gradient summed
    over features.
    """
    noise_scale = sigma * inputs_embeds.astype(jnp.float32).std(
        axis=(-1, -2), keepdims=True)
    grad_fn = _sum_grad(target_fn)
    keys = jax.random.split(key, samples)

    def at_key(k):
        noise = (jax.random.normal(k, inputs_embeds.shape)
                 * noise_scale).astype(inputs_embeds.dtype)
        return grad_fn(inputs_embeds + noise)

    grads = jax.lax.map(at_key, keys)                  # [samples, B, T, D]
    avg = grads.astype(jnp.float32).mean(0)
    rel = (inputs_embeds.astype(jnp.float32) * avg if times_input else avg)
    return rel.sum(-1) if sum_features else rel
