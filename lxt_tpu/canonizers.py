"""Canonizers — pre-transform (params, cfg) before rules attach.

Parity surface for the reference's ``Composite(canonizers=...)`` hook
(lxt/explicit/core.py:25-37,63-72, zennit's canonizer protocol): a torch
canonizer mutates the module graph in place before rule registration and
undoes itself afterwards. A JAX model is ``(params, cfg, pure forward)``,
so a canonizer here is a pure function

    canonizer(params, cfg, family) -> params      (or (params, cfg))

applied once at conversion time (``from_hf(..., canonizers=[...])`` /
``from_pretrained``) or later via ``AttributionModel.canonize(...)`` —
no registration/teardown protocol is needed because nothing is mutated.

Ships the transform the reference ecosystem actually uses on transformer
stacks (zennit's merge-norm family): :func:`fold_norm_scales` folds every
RMSNorm elementwise scale into the linear projections it feeds. Exact in
forward AND under every composite's backward — the norm's gamma multiply
and the folded matmul are the same linear map of the normalized input, so
relevance is unchanged (tested to f32 tolerance in
tests/test_canonizers.py).
"""

import dataclasses

import jax.numpy as jnp

__all__ = ["apply_canonizers", "fold_norm_scales"]


def apply_canonizers(params, cfg, family, canonizers):
    """Run ``canonizers`` in order; each may return ``params`` or
    ``(params, cfg)`` (cfg must stay hashable/static — it is jit config)."""
    for canonizer in canonizers:
        out = canonizer(params, cfg, family)
        if isinstance(out, tuple):
            params, cfg = out
        else:
            params = out
    return params, cfg


def _require_fp(w, name):
    if not hasattr(w, "dtype"):        # QuantizedTensor & friends
        raise ValueError(
            f"fold_norm_scales needs full-precision weights, but {name!r} "
            f"is {type(w).__name__}; canonize BEFORE quantize_params")
    return w


def fold_norm_scales(params, cfg, family):
    """Fold RMSNorm scales into the projections they feed (llama family:
    llama/mistral/qwen2/qwen3/phi3 layouts sharing the llama param tree).

    ln1 -> wq/wk/wv, ln2 -> wg/wu, final_norm -> lm_head; the norm scales
    are reset to ones. Tied embeddings keep final_norm (folding would
    corrupt the shared embedding matrix); Gemma-3's (1+w) sandwich norms
    and per-head q/k norms are left untouched (not the plain
    ``normalize(x)*w`` form this folding assumes).
    """
    if family not in ("llama", "qwen2", "qwen3", "phi3", "mistral"):
        raise ValueError(
            f"fold_norm_scales supports the llama param family, got "
            f"{family!r}")
    layers = dict(params["layers"])
    ln1 = _require_fp(layers["ln1"], "ln1")   # [L, D]
    ln2 = _require_fp(layers["ln2"], "ln2")
    for w_name, g in (("wq", ln1), ("wk", ln1), ("wv", ln1),
                      ("wg", ln2), ("wu", ln2)):
        w = _require_fp(layers[w_name], w_name)       # [L, D, out]
        layers[w_name] = (w * g[:, :, None].astype(w.dtype)).astype(w.dtype)
    layers["ln1"] = jnp.ones_like(ln1)
    layers["ln2"] = jnp.ones_like(ln2)
    out = dict(params, layers=layers)
    if "lm_head" in params:
        head = _require_fp(params["lm_head"], "lm_head")  # [D, V]
        g = _require_fp(params["final_norm"], "final_norm")
        out["lm_head"] = (head * g[:, None].astype(head.dtype)).astype(
            head.dtype)
        out["final_norm"] = jnp.ones_like(g)
    return out
