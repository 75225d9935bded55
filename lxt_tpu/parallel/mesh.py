"""Mesh construction and sharding rules for attribution at scale.

Design (the scaling-book recipe): pick a mesh, annotate shardings on the
arguments, let XLA insert the collectives.

- ``data`` axis: independent prompts/images — batch-parallel heatmaps, the
  BASELINE.json north-star workload. Zero communication in the whole
  attribution step except the final per-example relevance (kept sharded).
- ``model`` axis: tensor parallelism for models larger than one chip's HBM
  (Llama-3-8B bf16 on v5e needs >16 GB): attention heads and MLP hidden are
  split column-wise on the up-projections and row-wise on the
  down-projections, so each layer needs one all-reduce (psum) per block in
  forward — and, because ``jax.vjp`` transposes the program, one in the
  relevance backward. All of that is emitted by GSPMD from the annotations
  below; there is no hand-written collective here.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1, devices=None) -> Mesh:
    """Create a ``(data, model)`` mesh. Defaults to all devices on data."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def llama_param_shardings(mesh: Mesh):
    """PartitionSpecs for the Llama-family pytree (models/llama.py layout).

    Column-parallel: wq/wk/wv/wg/wu (split the output features = heads or
    MLP hidden); row-parallel: wo/wd (split the input features); norms and
    biases replicated; embedding and lm_head split on the vocab axis.
    Layer-stacked leaves keep axis 0 (layers) unsharded.
    """
    m = "model"
    specs = {
        "embed": P(m, None),
        "final_norm": P(None),
        "lm_head": P(None, m),
        "layers": {
            "ln1": P(None, None), "ln2": P(None, None),
            "wq": P(None, None, m), "wk": P(None, None, m), "wv": P(None, None, m),
            "wo": P(None, m, None),
            "wg": P(None, None, m), "wu": P(None, None, m),
            "wd": P(None, m, None),
            "bq": P(None, m), "bk": P(None, m), "bv": P(None, m),
            "q_norm": P(None, None), "k_norm": P(None, None),
        },
    }

    def to_sharding(tree, params=None):
        return jax.tree.map(lambda s: NamedSharding(mesh, s), tree,
                            is_leaf=lambda x: isinstance(x, P))

    return to_sharding(specs)


def _prune_to(params, shardings):
    """Keep only sharding entries whose key exists in params (configs differ
    in optional leaves like biases/q_norm/lm_head)."""
    if isinstance(params, dict):
        return {k: _prune_to(params[k], shardings[k]) for k in params}
    return shardings


def shard_params(params, shardings):
    """device_put the param pytree onto the mesh with the given shardings."""
    shardings = _prune_to(params, shardings)
    return jax.device_put(params, shardings), shardings


def attribute_sharded(target_fn, mesh: Mesh, *, donate: bool = False):
    """Build a jitted batched-attribution step with the batch split over the
    ``data`` axis. ``target_fn(embeds) -> scalar`` must consume embeds
    ``[B, T, D]``; per-example relevance comes back sharded over data.

    Note the scalar target sums per-example logits; per-example gradients are
    disjoint so the sum changes nothing (attribution.py:select_logit).
    """
    from lxt_tpu.attribution import input_relevance

    in_shard = NamedSharding(mesh, P("data", None, None))
    out_shard = (NamedSharding(mesh, P()), NamedSharding(mesh, P("data", None)))

    def step(embeds):
        return input_relevance(target_fn, embeds)

    jitted = jax.jit(step, in_shardings=(in_shard,), out_shardings=out_shard,
                     donate_argnums=(0,) if donate else ())

    def wrapped(embeds):
        # reshard if the caller's embeds carry a different layout (e.g. they
        # came out of an embedding lookup on replicated params)
        embeds = jax.device_put(embeds, in_shard)
        return jitted(embeds)

    return wrapped


def _tp(*spec):
    return P(*spec)


#: Per-family tensor-parallel PartitionSpec tables (leaf name -> spec over
#: the ``model`` axis). Column-parallel layers split output features,
#: row-parallel layers split input features (one psum per block, emitted by
#: GSPMD in forward AND in the transposed relevance backward). Norms, small
#: biases and non-matmul leaves stay replicated. Missing leaves default to
#: replicated via ``_prune_to``/``dict.get``.
_FAMILY_TP_LAYERS = {
    "llama": {
        "wq": _tp(None, None, "model"), "wk": _tp(None, None, "model"),
        "wv": _tp(None, None, "model"), "wo": _tp(None, "model", None),
        "wg": _tp(None, None, "model"), "wu": _tp(None, None, "model"),
        "wd": _tp(None, "model", None),
        "bq": _tp(None, "model"), "bk": _tp(None, "model"),
        "bv": _tp(None, "model"),
    },
    "gemma3": {
        "wq": _tp(None, None, "model"), "wk": _tp(None, None, "model"),
        "wv": _tp(None, None, "model"), "wo": _tp(None, "model", None),
        "wg": _tp(None, None, "model"), "wu": _tp(None, None, "model"),
        "wd": _tp(None, "model", None),
    },
    "gpt2": {
        "w_attn": _tp(None, None, "model"), "b_attn": _tp(None, "model"),
        "w_proj": _tp(None, "model", None),
        "w_fc": _tp(None, None, "model"), "b_fc": _tp(None, "model"),
        "w_out": _tp(None, "model", None),
    },
    "bert": {
        "wq": _tp(None, None, "model"), "bq": _tp(None, "model"),
        "wk": _tp(None, None, "model"), "bk": _tp(None, "model"),
        "wv": _tp(None, None, "model"), "bv": _tp(None, "model"),
        "wo": _tp(None, "model", None),
        "wi": _tp(None, None, "model"), "bi": _tp(None, "model"),
        "wout": _tp(None, "model", None),
    },
    "siglip": {
        "wq": _tp(None, None, "model"), "bq": _tp(None, "model"),
        "wk": _tp(None, None, "model"), "bk": _tp(None, "model"),
        "wv": _tp(None, None, "model"), "bv": _tp(None, "model"),
        "wo": _tp(None, "model", None),
        "w_fc": _tp(None, None, "model"), "b_fc": _tp(None, "model"),
        "w_out": _tp(None, "model", None),
    },
    "vit": {
        "w_qkv": _tp(None, None, "model"), "b_qkv": _tp(None, "model"),
        "w_proj": _tp(None, "model", None),
        "w_fc": _tp(None, None, "model"), "b_fc": _tp(None, "model"),
        "w_out": _tp(None, "model", None),
    },
}

_FAMILY_TP_TOP = {
    "llama": {"embed": _tp("model", None), "lm_head": _tp(None, "model")},
    "gemma3": {"embed": _tp("model", None), "lm_head": _tp(None, "model")},
    "gpt2": {"wte": _tp("model", None)},
    "bert": {},
    "siglip": {},
    "vit": {"head_w": _tp(None, "model")},
}


def family_param_specs(family: str, params):
    """PartitionSpec pytree (tensor parallelism over ``model``) for any
    registered family's param layout — leaves not in the family table are
    replicated. Use with ``shard_params``/``NamedSharding``."""
    layer_tbl = _FAMILY_TP_LAYERS[family]
    top_tbl = _FAMILY_TP_TOP.get(family, {})

    def map_tree(tree, tbl):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = map_tree(v, layer_tbl if k == "layers" else tbl)
            else:
                out[k] = tbl.get(k, P())
        return out

    return map_tree(params, top_tbl)


def family_param_shardings(family: str, params, mesh: Mesh):
    """NamedSharding pytree for a family's params on ``mesh`` (see
    :func:`family_param_specs`).

    Quantization-aware: a :class:`~lxt_tpu.ops.quant.QuantizedTensor` leaf
    gets its codes sharded by the family spec while any spec axis that is
    size-1 on the SCALE (per-output-channel scales have a singleton input
    dim, so row-parallel splits don't apply) falls back to replicated."""
    from lxt_tpu.ops.quant import QuantizedTensor

    specs = family_param_specs(family, params)

    def one(p, s):
        if isinstance(p, QuantizedTensor):
            entries = tuple(s) + (None,) * (p.scale.ndim - len(tuple(s)))
            scale_spec = P(*(None if p.scale.shape[i] == 1 else ax
                             for i, ax in enumerate(entries)))
            return QuantizedTensor(NamedSharding(mesh, s),
                                   NamedSharding(mesh, scale_spec),
                                   p.bits, p.block)
        return NamedSharding(mesh, s)

    return jax.tree.map(one, params, specs,
                        is_leaf=lambda x: isinstance(x, QuantizedTensor))


def mixtral_param_shardings(mesh: Mesh):
    """PartitionSpecs for the Mixtral pytree (models/mixtral.py layout):
    EXPERT parallelism — the expert axis (axis 1 of the stacked [L, E, in,
    out] weights) is split over ``model``, so each device holds a subset of
    experts and the dense one-hot combine reduces over them with one psum
    (emitted by GSPMD). Attention projections shard like Llama.
    """
    m = "model"
    specs = {
        "embed": P(m, None),
        "final_norm": P(None),
        "lm_head": P(None, m),
        "layers": {
            "ln1": P(None, None), "ln2": P(None, None),
            "wq": P(None, None, m), "wk": P(None, None, m), "wv": P(None, None, m),
            "wo": P(None, m, None),
            "w_router": P(None, None, None),
            "wg": P(None, m, None, None),   # experts split over the mesh
            "wu": P(None, m, None, None),
            "wd": P(None, m, None, None),
        },
    }
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))
