"""Faithfulness evaluation: input-perturbation curves and AOPC.

The AttnLRP paper validates attributions by perturbation analysis (flip the
most-relevant tokens first and watch the explained logit collapse; flipping
least-relevant tokens first should barely move it). The reference cites
those results (README.md:54) but ships no evaluation code — this module
provides it, TPU-first: ALL perturbation steps evaluate in ONE jitted
program (a vmap over masking fractions), so a full curve costs one
compile + one batched forward sweep.

Conventions (Samek et al., Blücher et al.):

- MoRF ("most relevant first"): ablate tokens in DESCENDING relevance
  order. A faithful explanation makes the target drop fast — larger AOPC.
- LeRF ("least relevant first"): ablate ASCENDING; faithful => flat curve.
- AOPC = mean over steps of (f(x) - f(x_perturbed)).

Usage::

    def logit_fn(e):   # [B, T, D] -> [B] explained logit values
        out = jllama.forward(params, cfg, e, lxt_tpu.attnlrp, logits_at=-1)
        return out.logits[:, -1, :].max(-1)

    curve = perturbation_curve(logit_fn, embeds, relevance, order="morf")
    curve.aopc, curve.fractions, curve.values  # [S+1], [S+1, B]
"""

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class PerturbationCurve:
    fractions: jnp.ndarray   # [S+1] fraction of tokens ablated per step
    values: jnp.ndarray      # [S+1, B] explained logit after ablation
    aopc: jnp.ndarray        # [B] area over the perturbation curve


# pytree: curves (and report dicts of them) can cross jit boundaries
jax.tree_util.register_dataclass(
    PerturbationCurve, data_fields=["fractions", "values", "aopc"],
    meta_fields=[])


def _rank_order(relevance, descending):
    r = relevance if descending else -relevance
    # rank[i] = position of token i in the ablation order (0 = first out)
    order = jnp.argsort(-r, axis=-1)
    ranks = jnp.argsort(order, axis=-1)
    return ranks


def perturbation_curve(
    logit_fn: Callable,
    inputs_embeds,
    relevance,
    *,
    steps: int = 10,
    order: str = "morf",
    baseline=None,
    valid_mask=None,
    key=None,
):
    """Batched perturbation curve in one jitted program.

    ``logit_fn(embeds [B,T,D]) -> [B]`` explained logits;
    ``relevance``: [B, T] token scores; ``baseline``: replacement embedding
    (scalar/[D]/[B,T,D], or ``'mean'`` for the per-example mean embedding;
    default 0 — embedding-space token deletion);
    ``valid_mask``: optional [B, T] bool marking real (non-padding) tokens —
    padded positions are never counted nor ablated. ``key``: PRNG key for
    ``order='random'`` (a fixed default key keeps the control reproducible).
    """
    if order not in ("morf", "lerf", "random"):
        raise ValueError(order)
    B, T, D = inputs_embeds.shape
    if valid_mask is None:
        valid_mask = jnp.ones((B, T), bool)
    n_valid = valid_mask.sum(-1)
    if baseline is None:
        baseline = jnp.zeros((), inputs_embeds.dtype)
    elif isinstance(baseline, str):
        if baseline == "zero":
            baseline = jnp.zeros((), inputs_embeds.dtype)
        elif baseline == "mean":
            # mean over VALID positions only — padding must not drag the
            # replacement embedding (the same never-counted contract the
            # fractions follow)
            m = valid_mask[..., None]
            baseline = ((inputs_embeds * m).sum(-2, keepdims=True)
                        / jnp.maximum(n_valid, 1)[:, None, None]).astype(
                            inputs_embeds.dtype)
        else:
            raise ValueError(f"baseline must be 'zero', 'mean' or an "
                             f"array, got {baseline!r}")
    baseline = jnp.broadcast_to(jnp.asarray(baseline, inputs_embeds.dtype),
                                inputs_embeds.shape)

    rel = jnp.asarray(relevance, jnp.float32)
    if order == "random":
        rel = jax.random.uniform(key if key is not None
                                 else jax.random.PRNGKey(0), rel.shape)
    # padded tokens sort to the very end in every order
    rel = jnp.where(valid_mask, rel, -jnp.inf if order != "lerf" else jnp.inf)
    ranks = _rank_order(rel, descending=(order != "lerf"))

    fractions = jnp.linspace(0.0, 1.0, steps + 1)

    def at_fraction(frac):
        # round, not ceil: f32 frac*n lands epsilon above integers
        k = jnp.round(frac * n_valid).astype(jnp.int32)      # [B]
        ablate = ranks < k[:, None]                           # [B, T]
        e = jnp.where(ablate[..., None], baseline, inputs_embeds)
        return logit_fn(e)

    values = jax.vmap(at_fraction)(fractions)                 # [S+1, B]
    aopc = (values[0][None] - values[1:]).mean(0)
    return PerturbationCurve(fractions=fractions, values=values, aopc=aopc)


def aopc_scores(logit_fn, inputs_embeds, relevance, *, steps: int = 10,
                baseline=None, valid_mask=None):
    """(aopc_morf, aopc_lerf, aopc_random) per example — faithful relevance
    satisfies morf > random > lerf."""
    out = []
    for order in ("morf", "lerf", "random"):
        out.append(perturbation_curve(
            logit_fn, inputs_embeds, relevance, steps=steps, order=order,
            baseline=baseline, valid_mask=valid_mask).aopc)
    return tuple(out)


def auc(values):
    """Trapezoidal area under a ``[S+1, B]`` (or ``[S+1]``) curve over the
    ablated fraction in [0, 1]. Lower is better for MoRF, higher for LeRF."""
    values = jnp.asarray(values, jnp.float32)
    steps = values.shape[0] - 1
    return (0.5 * (values[0] + values[-1]) + values[1:-1].sum(0)) / steps


def faithfulness_report(logit_fn, inputs_embeds, relevance, *,
                        steps: int = 10, baseline=None, valid_mask=None,
                        key=None) -> dict:
    """MoRF + LeRF + random curves and the summary scores, one dict.

    Keys: ``morf``/``lerf``/``random`` (:class:`PerturbationCurve`),
    ``auc_morf``/``auc_lerf``/``auc_random`` and ``aopc_*`` (``[B]``), and
    ``abpc [B]`` — the area between the LeRF and MoRF curves, the single
    faithfulness score of the AttnLRP paper's evaluation (higher = the
    attribution separates important from unimportant tokens better; 0 = no
    better than its own reverse ordering).

    The sweeps share one program shape — call under ``jax.jit`` for
    repeated evaluation, e.g. a rule grid search paired with
    ``Composite.with_rules``/``override_layers`` to *measure* which rule
    variant is most faithful instead of eyeballing heatmaps.
    """
    kw = dict(steps=steps, baseline=baseline, valid_mask=valid_mask)
    out = {}
    for order in ("morf", "lerf", "random"):
        curve = perturbation_curve(logit_fn, inputs_embeds, relevance,
                                   order=order, key=key, **kw)
        out[order] = curve
        out[f"auc_{order}"] = auc(curve.values)
        out[f"aopc_{order}"] = curve.aopc
    out["abpc"] = out["auc_lerf"] - out["auc_morf"]
    return out
