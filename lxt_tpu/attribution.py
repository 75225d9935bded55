"""High-level attribution API: one jitted vjp = one heatmap.

The reference's usage pattern (examples/quantized_llama.py:35-47) is

    logits = model(inputs_embeds=x.requires_grad_()).logits
    logits[0, -1, :].max().backward()
    relevance = (x * x.grad).float().sum(-1)

Here that whole flow is ONE pure function — forward, backward and the
Gradient*Input contraction fuse into a single XLA program, jittable,
batchable, and shardable over a device mesh (see ``lxt_tpu.parallel``).
"""

from typing import Callable

import jax
import jax.numpy as jnp


def select_logit(logits, position=-1, token=None):
    """Scalar explanation target from ``[B, T, V]`` logits.

    ``token=None`` explains the argmax logit at ``position`` (the reference's
    default); an int array ``[B]`` explains those token ids; summing over the
    batch is safe because per-example targets have disjoint gradients.
    """
    row = logits[:, position, :]
    if token is None:
        return row.max(axis=-1).sum()
    token = jnp.asarray(token).reshape(-1, 1)
    return jnp.take_along_axis(row, token, axis=-1).sum()


def input_relevance(target_fn: Callable, inputs_embeds, *, sum_features: bool = True):
    """Per-token input relevance via Gradient*Input.

    ``target_fn(embeds) -> scalar``. Returns ``(target_value, relevance)``
    with relevance ``[B, T]`` (f32 accumulation, reference
    examples/quantized_llama.py:47) or ``[B, T, D]`` if ``sum_features=False``.
    """
    value, grad = jax.value_and_grad(target_fn)(inputs_embeds)
    rel = inputs_embeds.astype(jnp.float32) * grad.astype(jnp.float32)
    if sum_features:
        rel = rel.sum(-1)
    return value, rel


def segmented_input_relevance(segment_fn: Callable, head_fn: Callable,
                              seg_params, inputs_embeds, *,
                              sum_features: bool = True):
    """:func:`input_relevance` as a CHAIN of bounded device programs.

    The monolithic jitted step (one vjp over the full depth) is the fastest
    path — but a single device execution whose wall time can exceed what the
    runtime allows (remote-attached TPUs enforce per-execute deadlines; a
    serving tier may cap per-call latency). This driver runs the layer stack
    as ``S`` forward programs, one head program, and ``S`` backward (vjp)
    programs, chaining the relevance cotangent between them; no host
    round-trip happens between calls (dispatch stays async), so the overhead
    is one extra boundary activation per segment.

    - ``segment_fn(seg_params_i, h) -> h``: one stack slice (e.g.
      :func:`lxt_tpu.models.llama.forward_layers`). All segments should have
      EQUAL layer counts so one compiled program serves every segment.
    - ``head_fn(h) -> scalar``: the explanation target (final norm + lm_head
      + :func:`select_logit`).
    - ``seg_params``: per-segment parameter pytrees, e.g.
      ``[jax.tree.map(lambda a: a[i:i+k], params['layers']) for i in ...]``.

    Values are identical to the monolithic path: the same ops run in the
    same order, only program boundaries differ. Returns ``(value,
    relevance)`` with the :func:`input_relevance` contract.

    One-shot convenience over :func:`segmented_attribution` — build the
    driver once with that factory when calling repeatedly (the jitted
    segment programs are created per driver, not per call).
    """
    run = segmented_attribution(segment_fn, head_fn,
                                sum_features=sum_features)
    return run(seg_params, inputs_embeds)


def segmented_attribution(segment_fn: Callable, head_fn: Callable, *,
                          sum_features: bool = True):
    """Factory for the segmented driver: returns ``run(seg_params,
    inputs_embeds) -> (value, relevance)`` with the three jitted programs
    (segment forward, head, segment vjp) built ONCE and reused across calls
    and across segments (equal-shaped segments share one executable)."""
    fwd = jax.jit(segment_fn)
    head = jax.jit(jax.value_and_grad(head_fn))

    def _bwd(p, h, ct):
        _, vjp_fn = jax.vjp(lambda hh: segment_fn(p, hh), h)
        return vjp_fn(ct)[0]

    bwd = jax.jit(_bwd)

    def run(seg_params, inputs_embeds):
        hs = [inputs_embeds]
        for p in seg_params:
            hs.append(fwd(p, hs[-1]))
        value, ct = head(hs[-1])
        for p, h in zip(reversed(list(seg_params)), reversed(hs[:-1])):
            ct = bwd(p, h, ct)
        rel = inputs_embeds.astype(jnp.float32) * ct.astype(jnp.float32)
        if sum_features:
            rel = rel.sum(-1)
        return value, rel

    return run


def latent_relevance(forward_fn: Callable, inputs_embeds, probe_shape,
                     *, sum_features: bool = False):
    """Per-neuron relevance at every layer plus input relevance, one backward.

    ``forward_fn(embeds, probes) -> (scalar_target, hidden_states)`` where
    ``probes`` (zeros, shape ``probe_shape = [L, B, T, D]``) are added to each
    layer's output inside the model and ``hidden_states`` is ``[L+1, B, T, D]``.
    The gradient w.r.t. the probes is the gradient *at* each layer output, so
    ``hidden * grad`` is the latent relevance — the functional replacement for
    the reference's torch ``register_hook`` recipe
    (docs/source/latent-feature-attribution-efficient.rst).

    Returns ``(value, input_rel [B,T], latent_rel [L,B,T(,D)])``.
    """
    probes = jnp.zeros(probe_shape, inputs_embeds.dtype)
    (value, hiddens), vjp_fn = jax.vjp(forward_fn, inputs_embeds, probes)
    g_embeds, g_probes = vjp_fn((jnp.ones_like(value), jnp.zeros_like(hiddens)))
    in_rel = (inputs_embeds.astype(jnp.float32) * g_embeds.astype(jnp.float32)).sum(-1)
    latent = hiddens[1:].astype(jnp.float32) * g_probes.astype(jnp.float32)
    if sum_features:
        latent = latent.sum(-1)
    return value, in_rel, latent


def _row_fn(logits_fn, position):
    """Wrap ``logits_fn`` to return the ``[B, V]`` row at ``position``
    (passthrough when the model already returns 2-D logits — a
    classification head, or a forward with ``logits_at=``)."""
    def row(inputs_embeds):
        logits = logits_fn(inputs_embeds)
        return logits if logits.ndim == 2 else logits[:, position, :]
    return row


def _token_pulls(row, vjp_fn, inputs_embeds, tokens, sum_features, via):
    """Shared pullback driver for the multi-target APIs: one ``(value,
    relevance)`` per ``[B]`` token row in ``tokens [K, B]``, reusing the
    single forward's residuals held by ``vjp_fn``."""
    def pull(tok_b):
        ct = jax.nn.one_hot(tok_b, row.shape[-1], dtype=row.dtype)
        (grad,) = vjp_fn(ct)
        rel = inputs_embeds.astype(jnp.float32) * grad.astype(jnp.float32)
        if sum_features:
            rel = rel.sum(-1)
        value = jnp.take_along_axis(row, tok_b[:, None], -1)[:, 0]
        return value, rel
    if via == "vmap":
        # batches the K backwards into single batched matmuls; NOTE under
        # the Pallas flash path the batching rule broadcasts the unbatched
        # q/k/v residuals K-fold per layer — prefer 'scan' for long
        # sequences, 'vmap' when the MXU win matters and K*T is modest
        return jax.vmap(pull)(tokens)
    if via != "scan":
        raise ValueError(f"via must be 'scan' or 'vmap', got {via!r}")
    return jax.lax.map(pull, tokens)


def multi_token_relevance(logits_fn, inputs_embeds, tokens, *, position=-1,
                          sum_features: bool = True, via: str = "scan"):
    """K relevance maps sharing ONE forward pass.

    ``logits_fn(embeds) -> [B, T, V]`` (or ``[B, V]``); ``tokens`` is
    ``[K]`` (same candidates for every batch row) or ``[K, B]`` int ids.
    Returns ``(values [K, B], relevance [K, B, T])``.

    The reference's flow re-runs the whole model per explained token
    (one ``backward()`` per target, each needing its own forward,
    examples/quantized_llama.py:39-47). Here ``jax.vjp`` runs the forward
    once and the K pullbacks reuse its residuals — ~``fwd + K*bwd`` FLOPs
    and one compiled program instead of ``K*(fwd+bwd)`` and K programs.
    ``via='vmap'`` additionally batches the K backwards into batched
    matmuls (see :func:`_token_pulls` for the flash-path memory caveat).
    """
    row_of = _row_fn(logits_fn, position)
    row, vjp_fn = jax.vjp(row_of, inputs_embeds)
    tokens = jnp.asarray(tokens)
    if tokens.ndim == 1:
        tokens = jnp.broadcast_to(tokens[:, None],
                                  (tokens.shape[0], row.shape[0]))
    return _token_pulls(row, vjp_fn, inputs_embeds, tokens, sum_features, via)


def topk_relevance(logits_fn, inputs_embeds, k: int = 5, *, position=-1,
                   sum_features: bool = True, via: str = "scan"):
    """Explain the model's top-k candidates at ``position`` in one pass.

    Returns ``(tokens [K, B], values [K, B], relevance [K, B, T])`` with
    ``tokens[0]`` the argmax — "why each of the k most likely next tokens",
    the contrastive-analysis loop of the reference's quickstart
    (docs/source/quickstart.rst GPT-2 example) without k re-runs.
    """
    row_of = _row_fn(logits_fn, position)
    row, vjp_fn = jax.vjp(row_of, inputs_embeds)
    _, toks = jax.lax.top_k(row, k)            # [B, K]
    toks = toks.T                              # [K, B]
    values, rel = _token_pulls(row, vjp_fn, inputs_embeds, toks,
                               sum_features, via)
    return toks, values, rel


def multi_site_relevance(logits_fn, inputs_embeds, positions, tokens, *,
                         aux_input=None, sum_features: bool = True,
                         contrastive: bool = False, via: str = "scan"):
    """K relevance maps for K (position, token) sites, ONE forward pass.

    ``logits_fn(embeds) -> [B, T, V]``; ``positions [K]`` int positions,
    ``tokens`` ``[K]`` or ``[K, B]`` int ids. Site k's target is the logit
    of ``tokens[k]`` at ``positions[k]``. Returns ``(values [K, B],
    relevance [K, B, T])``. This is the general form behind
    :func:`multi_token_relevance` (which fixes one position); use it to
    explain every token of a generated continuation — site k =
    (p_k - 1, response[p_k]) — without re-running the model per token.

    ``aux_input``: a second differentiable input (e.g. pixels). Then
    ``logits_fn(embeds, aux)`` and the return gains a third element: the
    per-site aux relevance (G*I over ``aux``, last axis summed under
    ``sum_features`` — channels, for NHWC pixels).

    ``contrastive``: each site's target becomes ``logit(token) -
    logit(rival)`` where the rival is the strongest OTHER token at that
    position — "why this token instead of the runner-up" (the reference's
    contrastive-explanation recipe, docs/source/quickstart.rst, lifted to
    every site of a response). ``values`` are then the logit margins.
    """
    if aux_input is None:
        logits, vjp_fn = jax.vjp(logits_fn, inputs_embeds)
    else:
        logits, vjp_fn = jax.vjp(logits_fn, inputs_embeds, aux_input)
    if logits.ndim != 3:
        raise ValueError(
            f"multi_site_relevance needs [B, T, V] logits, got "
            f"{logits.shape} — for one fixed position use "
            f"multi_token_relevance")
    positions = jnp.asarray(positions)
    tokens = jnp.asarray(tokens)
    if tokens.ndim == 1:
        tokens = jnp.broadcast_to(tokens[:, None],
                                  (tokens.shape[0], logits.shape[0]))

    def _gxi(x, g):
        rel = x.astype(jnp.float32) * g.astype(jnp.float32)
        return rel.sum(-1) if sum_features else rel

    def pull(site):
        pos, tok_b = site
        V = logits.shape[-1]
        row = jnp.take(logits, pos, axis=1)              # [B, V]
        seed = jax.nn.one_hot(tok_b, V, dtype=logits.dtype)
        value = jnp.take_along_axis(row, tok_b[:, None], -1)[:, 0]
        if contrastive:
            # rival = strongest token at the site EXCLUDING the target
            masked = jnp.where(seed > 0, -jnp.inf, row.astype(jnp.float32))
            rival = jnp.argmax(masked, axis=-1)
            seed = seed - jax.nn.one_hot(rival, V, dtype=logits.dtype)
            value = value - jnp.take_along_axis(row, rival[:, None], -1)[:, 0]
        ct = jnp.zeros_like(logits).at[:, pos, :].set(seed)
        if aux_input is None:
            (grad,) = vjp_fn(ct)
            return value, _gxi(inputs_embeds, grad)
        grad, grad_aux = vjp_fn(ct)
        return (value, _gxi(inputs_embeds, grad),
                _gxi(aux_input, grad_aux))

    if via == "vmap":
        return jax.vmap(pull)((positions, tokens))
    if via != "scan":
        raise ValueError(f"via must be 'scan' or 'vmap', got {via!r}")
    return jax.lax.map(pull, (positions, tokens))


def multi_site_latent_relevance(forward_fn, inputs_embeds, positions,
                                tokens, probe_shape, *, via: str = "scan"):
    """Input AND per-layer relevance for K (position, token) sites, one
    forward.

    ``forward_fn(embeds, probes) -> (logits [B, T, V], hidden_states
    [L+1, B, T, D])`` with ``probes`` zeros of ``probe_shape =
    [L, B, T, D]`` added to each layer output (the latent-relevance hook
    contract of :func:`latent_relevance`, lifted to many sites). Site k
    targets the logit of ``tokens[k]`` at ``positions[k]``; its probe
    gradient times the (shared) hidden states is the relevance trace of
    that site through the layers. Returns ``(values [K, B], input_rel
    [K, B, T], latent_rel [K, L, B, T])`` — e.g. "which layer moved
    relevance onto which prompt token, for each generated token".
    """
    probes = jnp.zeros(probe_shape, inputs_embeds.dtype)
    (logits, hiddens), vjp_fn = jax.vjp(forward_fn, inputs_embeds, probes)
    positions = jnp.asarray(positions)
    tokens = jnp.asarray(tokens)
    if tokens.ndim == 1:
        tokens = jnp.broadcast_to(tokens[:, None],
                                  (tokens.shape[0], logits.shape[0]))
    h32 = hiddens[1:].astype(jnp.float32)

    def pull(site):
        pos, tok_b = site
        row = jnp.take(logits, pos, axis=1)
        ct = jnp.zeros_like(logits).at[:, pos, :].set(
            jax.nn.one_hot(tok_b, logits.shape[-1], dtype=logits.dtype))
        g_e, g_pr = vjp_fn((ct, jnp.zeros_like(hiddens)))
        rel = (inputs_embeds.astype(jnp.float32)
               * g_e.astype(jnp.float32)).sum(-1)
        latent = (h32 * g_pr.astype(jnp.float32)).sum(-1)     # [L, B, T]
        value = jnp.take_along_axis(row, tok_b[:, None], -1)[:, 0]
        return value, rel, latent

    if via == "vmap":
        return jax.vmap(pull)((positions, tokens))
    if via != "scan":
        raise ValueError(f"via must be 'scan' or 'vmap', got {via!r}")
    return jax.lax.map(pull, (positions, tokens))


def contrastive_target(logits, token_a, token_b, position=-1):
    """Contrastive explanation target: logit(a) - logit(b) at ``position``
    (reference docs/source/quickstart.rst GPT-2 contrastive example)."""
    row = logits[:, position, :]
    a = jnp.take_along_axis(row, jnp.asarray(token_a).reshape(-1, 1), -1)
    b = jnp.take_along_axis(row, jnp.asarray(token_b).reshape(-1, 1), -1)
    return (a - b).sum()


def normalize_relevance(rel, axis=None):
    """Scale relevance to [-1, 1] by the max |R| (the reference normalizes
    before pdf_heatmap, examples/quantized_llama.py:50)."""
    denom = jnp.abs(rel).max(axis=axis, keepdims=axis is not None)
    return rel / (denom + 1e-12)
