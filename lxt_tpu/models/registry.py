"""One-call user surface: HF model -> TPU attribution model.

Parity with the reference's ``lxt.efficient.monkey_patch(modeling_module)``
(``lxt/efficient/core.py:20-43`` + the DEFAULT_MAP registry at
``lxt/efficient/models/__init__.py:10-26``): one call makes a supported
model attribution-ready, and an unsupported model raises a ValueError that
lists the supported families. Instead of mutating torch classes, this
converts the weights once into a JAX pytree and returns an
:class:`AttributionModel` whose methods are jitted pure functions.

    import lxt_tpu
    model = lxt_tpu.from_hf(hf_model)               # any supported family
    value, relevance = model.attribute(input_ids)   # one fused TPU program
"""

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from lxt_tpu import composites
from lxt_tpu.attribution import input_relevance, latent_relevance, select_logit
from lxt_tpu.utils.cache import JitCache


def _llama_like(mod):
    from lxt_tpu.models import decode

    return {
        "config": mod.LlamaConfig,
        "from_hf": mod.params_from_hf,
        "forward": mod.forward,
        "embed": lambda params, ids, cfg: mod.embed(params, ids),
        # KV-cached incremental decoding (generate's fast path)
        "prefill": decode.prefill,
        "decode_step": decode.decode_step,
    }


def _family_table():
    from lxt_tpu.models import bert, decode, gemma3, gpt2, llama, mixtral

    return {
        "llama": _llama_like(llama),
        "qwen2": _llama_like(llama),
        "qwen3": _llama_like(llama),
        "mistral": _llama_like(llama),
        "phi3": _llama_like(llama),
        "gemma3": {
            "config": gemma3.Gemma3Config,
            "from_hf": gemma3.params_from_hf,
            "forward": gemma3.forward,
            "embed": gemma3.embed,
            "prefill": decode.gemma3_prefill,
            "decode_step": decode.gemma3_decode_step,
        },
        "gemma3_text": {
            "config": gemma3.Gemma3Config,
            "from_hf": gemma3.params_from_hf,
            "forward": gemma3.forward,
            "embed": gemma3.embed,
            "prefill": decode.gemma3_prefill,
            "decode_step": decode.gemma3_decode_step,
        },
        "gpt2": {
            "config": gpt2.GPT2Config,
            "from_hf": gpt2.params_from_hf,
            "forward": gpt2.forward,
            "embed": lambda params, ids, cfg: gpt2.embed(params, ids)[0],
            "prefill": decode.gpt2_prefill,
            "decode_step": decode.gpt2_decode_step,
        },
        "bert": {
            "config": bert.BertConfig,
            "from_hf": bert.params_from_hf,
            "forward": bert.forward,
            "embed": lambda params, ids, cfg: bert.embed(params, ids),
        },
        "mixtral": {
            "config": mixtral.MixtralConfig,
            "from_hf": mixtral.params_from_hf,
            "forward": mixtral.forward,
            "embed": lambda params, ids, cfg: mixtral.embed(params, ids),
            "prefill": decode.mixtral_prefill,
            "decode_step": decode.mixtral_decode_step,
        },
    }


SUPPORTED_FAMILIES = (
    "llama", "qwen2", "qwen3", "mistral", "phi3", "gemma3", "gemma3_text",
    "gpt2", "bert", "mixtral",
)


def _run_decode_loop(N, k0, state, body, eos_token_id):
    """Decode-loop driver shared by every generate: ``state = (buf, done,
    ...)``, ``body(k, state) -> state``. A ``while_loop`` instead of a
    ``fori_loop`` so the program exits as soon as EVERY row has emitted
    ``eos_token_id`` — a generous ``max_new_tokens`` cap then costs only
    as many steps as the longest answer actually needs."""
    def cond(ks):
        k, state = ks
        more = k < N
        if eos_token_id is not None:
            more &= ~jnp.all(state[1])
        return more

    def wrapped(ks):
        k, state = ks
        return k + 1, body(k, state)

    _, state = jax.lax.while_loop(cond, wrapped, (jnp.int32(k0), state))
    return state


def _fill_after_eos(buf, T0, eos_token_id):
    """Positions after each row's first eos become eos (the loop writes
    them that way too — this covers the slots an early exit never
    reached)."""
    if eos_token_id is None:
        return buf
    gen = buf[:, T0:]
    is_eos = (gen == eos_token_id).astype(jnp.int32)
    after = (jnp.cumsum(is_eos, axis=1) - is_eos) > 0
    gen = jnp.where(after, jnp.asarray(eos_token_id, gen.dtype), gen)
    return jnp.concatenate([buf[:, :T0], gen], axis=1)


def _padding_args(family, kv_begin, attention_mask, kv_end=None):
    """Validated padding spec for batched variable-length prompts.

    Causal families are LEFT-padded (serving layout): ``kv_begin [B]`` is
    each row's first real-token index (structural — stays flash-eligible)
    or an arbitrary ``attention_mask [B, T]`` (lowers to an additive bias).
    BERT is RIGHT-padded (HF convention): ``kv_end [B]`` is each row's
    number of real tokens, or ``attention_mask``. The reference handles
    this implicitly through the HF attention_mask
    (examples/quantized_llama.py:35-44); here the one-call attribution
    surface takes it explicitly.

    Returns ``(names, values)`` — the arrays ride as jit ARGUMENTS while
    the tuple of names keys the jit cache.
    """
    kw = {}
    if family == "bert":
        if kv_begin is not None:
            raise ValueError(
                "BERT batches are right-padded (HF convention): pass "
                "kv_end=[#real tokens per row] or attention_mask, "
                "not kv_begin")
        if kv_end is not None:
            kw["kv_end"] = jnp.asarray(kv_end, jnp.int32)
    else:
        if kv_end is not None:
            raise ValueError(
                "kv_end is the BERT (right-padded) convention; causal "
                "families take kv_begin=[first real index per row] "
                "or attention_mask")
        if kv_begin is not None:
            kw["kv_begin"] = jnp.asarray(kv_begin, jnp.int32)
    if attention_mask is not None:
        if kw:
            raise ValueError(
                "pass attention_mask OR kv_begin/kv_end, not both")
        kw["attention_mask"] = jnp.asarray(attention_mask)
    names = tuple(sorted(kw))
    return names, tuple(kw[n] for n in names)


def _finalize(run, check, jit):
    """Compile ``run`` with the requested sanitizer baked into its trace.

    ``check`` is part of every jit cache key, so the trace-time flags in
    :mod:`lxt_tpu.ops.check` become an internal detail: a program compiled
    with ``check='nan'`` asserts finite relevance at every rule backward
    (discharged via checkify after the program returns), and
    ``check='conservation'`` (optionally ``'conservation+nan'``) traces
    with uniform-redistribution mode on — feed the result to
    :func:`lxt_tpu.ops.check.conservation_error`. The
    jitted-before-context footgun (check.py module docstring) cannot occur
    through this API: the context is entered INSIDE the traced function.
    """
    if check is None:
        return jax.jit(run) if jit else run
    from lxt_tpu.ops import check as ck
    modes = ("nan", "conservation", "conservation+nan")
    if check not in modes:
        raise ValueError(
            f"check must be one of {modes} or None, got {check!r}")

    def traced(*args):
        ctx = (ck.nan_check() if check == "nan"
               else ck.conservation_check(raise_on_nan="nan" in check))
        with ctx:
            return run(*args)

    if "nan" not in check:
        return jax.jit(traced) if jit else traced
    from jax.experimental import checkify
    cfn = checkify.checkify(traced, errors=checkify.user_checks)
    jfn = jax.jit(cfn) if jit else cfn

    def wrapped(*args):
        err, out = jfn(*args)
        checkify.check_error(err)
        return out

    return wrapped


def _greedy_update(buf, done, logits, pos, eos_token_id, rng=None,
                   temperature: float = 0.0, top_k=None):
    """One decode bookkeeping step, shared by every generate loop
    (text/multimodal x cached/uncached): pick the next token from the
    frontier logits — argmax, or (``rng`` given) a temperature/top-k
    sample — latch rows that already emitted eos, write it at ``pos``."""
    row = logits[:, 0, :]
    if rng is None:
        nxt = jnp.argmax(row, -1)
    else:
        logt = row.astype(jnp.float32) / temperature
        if top_k is not None:
            kth = jax.lax.top_k(logt, int(top_k))[0][:, -1:]
            logt = jnp.where(logt < kth, -jnp.inf, logt)
        nxt = jax.random.categorical(rng, logt, axis=-1)
    nxt = nxt.astype(buf.dtype)
    if eos_token_id is not None:
        nxt = jnp.where(done, eos_token_id, nxt)
        done = done | (nxt == eos_token_id)
    buf = jax.lax.dynamic_update_slice_in_dim(buf, nxt[:, None], pos, axis=1)
    return buf, done


@dataclasses.dataclass
class AttributionModel:
    """A converted model plus its attribution entry points.

    Every entry point passes ``params`` as a jit ARGUMENT (a closure
    constant bakes the weight tree into the serialized program, which the
    remote-TPU compile service rejects for real model sizes) and caches
    compiled programs per (shape, composite, target) in ``_jit``."""

    family: str
    cfg: Any
    params: Any
    composite: composites.Composite
    _fns: dict
    #: bounded LRU of compiled entry points (ad-hoc lambda targets /
    #: shape churn must not leak programs; pass a STABLE callable as
    #: ``target`` to get cache hits across calls)
    _jit: Any = dataclasses.field(default_factory=JitCache, repr=False)

    def embed(self, input_ids):
        return self._fns["embed"](self.params, jnp.asarray(input_ids), self.cfg)

    def canonize(self, *canonizers):
        """Return a copy with ``canonizers`` applied to (params, cfg) —
        the reference's ``Composite(canonizers=...)`` hook
        (lxt/explicit/core.py:25-37,63-72) as a pure pre-transform; see
        :mod:`lxt_tpu.canonizers`. Compiled-program cache starts fresh
        (the transformed tree may change shapes/dtypes)."""
        from lxt_tpu.canonizers import apply_canonizers

        params, cfg = apply_canonizers(self.params, self.cfg, self.family,
                                       canonizers)
        return dataclasses.replace(self, params=params, cfg=cfg,
                                   _jit=JitCache())

    def logits(self, input_ids, composite=None):
        composite = composites.resolve(composite or self.composite)
        fwd, cfg = self._fns["forward"], self.cfg
        embeds = self.embed(input_ids)
        key = ("logits", embeds.shape, embeds.dtype.name, composite)
        fn = self._jit.get(key)
        if fn is None:
            fn = self._jit[key] = jax.jit(
                lambda params, e: fwd(params, cfg, e, composite).logits)
        return fn(self.params, embeds)

    def attribute(self, input_ids, *, target: Optional[Callable] = None,
                  position: int = -1, token=None, composite=None,
                  kv_begin=None, attention_mask=None, kv_end=None,
                  check=None, jit=True):
        """Per-token input relevance, one fused forward+backward.

        Default target: the argmax logit at ``position`` (the reference's
        canonical flow, examples/quantized_llama.py:39-47). Returns
        ``(target_value, relevance [B, T])``.

        ``kv_begin [B]`` / ``attention_mask [B, T]`` mark per-example left
        padding (``kv_end [B]`` for right-padded BERT) — see
        :func:`_padding_args`; with left padding, ``position=-1`` still
        names the last (real) column. ``check='nan'`` asserts finite
        relevance at every rule backward; ``'conservation'`` traces in
        uniform-redistribution mode (explicit-path semantics — under these
        Gradient*Input composites use it only via
        :func:`lxt_tpu.ops.check.conservation_error`'s caveats).
        """
        composite = composites.resolve(composite or self.composite)
        fwd, cfg = self._fns["forward"], self.cfg
        embeds = self.embed(input_ids)
        tok = None if token is None else jnp.asarray(token)
        mnames, mvals = _padding_args(self.family, kv_begin, attention_mask,
                                      kv_end)
        key = ("attribute", embeds.shape, embeds.dtype.name, composite,
               position, target, tok is not None, mnames, check, jit)
        fn = self._jit.get(key)
        if fn is None:
            def run(params, e, tok, mvals):
                kw = dict(zip(mnames, mvals))
                def tgt(ee):
                    logits = fwd(params, cfg, ee, composite, **kw).logits
                    if target is not None:
                        return target(logits)
                    if logits.ndim == 2:  # classification head (BERT)
                        return logits.max(axis=-1).sum()
                    return select_logit(logits, position=position, token=tok)
                return input_relevance(tgt, e)
            fn = self._jit[key] = _finalize(run, check, jit)
        return fn(self.params, embeds, tok, mvals)

    def faithfulness(self, input_ids, *, steps: int = 10, position: int = -1,
                     token=None, composite=None, kv_begin=None,
                     attention_mask=None, kv_end=None,
                     baseline="zero", key=None, jit=True):
        """One-call faithfulness report for this model's own attribution.

        Computes the relevance map (as :meth:`attribute` would, pinning the
        explained token to the UNPERTURBED argmax so every perturbation
        step scores the same target) and evaluates it with
        MoRF/LeRF/random perturbation curves — returns the
        :func:`lxt_tpu.utils.faithfulness.faithfulness_report` dict
        (curves, AUCs, AOPCs, ABPC per example). ``attention_mask`` doubles
        as the curve's ``valid_mask`` so padding is never ablated. The
        whole protocol — attribution + 3*(steps+1) forwards — is one jitted
        program.
        """
        from lxt_tpu.utils.faithfulness import faithfulness_report

        composite = composites.resolve(composite or self.composite)
        fwd, cfg = self._fns["forward"], self.cfg
        embeds = self.embed(input_ids)
        tok = None if token is None else jnp.asarray(token).reshape(-1)
        mnames, mvals = _padding_args(self.family, kv_begin, attention_mask,
                                      kv_end)
        valid = (None if attention_mask is None
                 else jnp.asarray(attention_mask, bool))
        # string baselines are static config; array baselines are TRACED
        # arguments (keying on shape alone would silently reuse a program
        # compiled around a different baked-in baseline array)
        if baseline is None or isinstance(baseline, str):
            bl_static, bl_arr = baseline, None
        else:
            bl_static, bl_arr = None, jnp.asarray(baseline)
        fkey = ("faithfulness", embeds.shape, embeds.dtype.name, composite,
                position, steps, mnames, tok is None,
                bl_static if bl_arr is None
                else ("array", bl_arr.shape, bl_arr.dtype.name),
                key is not None, jit)
        fn = self._jit.get(fkey)
        if fn is None:
            def run(params, e, tok, mvals, valid, rkey, bl_arr):
                kw = dict(zip(mnames, mvals))

                def rows(ee):                 # [B, vocab] at the position
                    logits = fwd(params, cfg, ee, composite, **kw).logits
                    return (logits if logits.ndim == 2
                            else logits[:, position, :])

                # pin the explained token to the UNPERTURBED argmax under
                # the SAME padding kwargs the evaluated forwards use (a
                # pad-attending argmax can name the wrong token)
                tk = jnp.argmax(rows(e), axis=-1) if tok is None else tok

                def per_example(ee):          # [B] same-token targets
                    return jnp.take_along_axis(rows(ee), tk[:, None], -1)[:, 0]

                _, rel = input_relevance(lambda ee: per_example(ee).sum(), e)
                return faithfulness_report(
                    per_example, e, rel, steps=steps,
                    baseline=bl_static if bl_arr is None else bl_arr,
                    valid_mask=valid, key=rkey)
            fn = self._jit[fkey] = jax.jit(run) if jit else run
        rkey = key if key is not None else jax.random.PRNGKey(0)
        return fn(self.params, embeds, tok, mvals, valid, rkey, bl_arr)

    def attribute_multi(self, input_ids, tokens, *, position: int = -1,
                        composite=None, kv_begin=None, attention_mask=None,
                        kv_end=None, check=None, via: str = "scan",
                        jit=True):
        """K relevance maps for K candidate tokens sharing ONE forward.

        ``tokens``: ``[K]`` (same candidates every batch row) or ``[K, B]``
        int ids. Returns ``(values [K, B], relevance [K, B, T])`` — e.g. a
        contrastive set, computed as one fused program instead of K
        ``attribute`` calls (see :func:`lxt_tpu.multi_token_relevance`).
        Padding/``check`` semantics as in :meth:`attribute`.
        """
        from lxt_tpu.attribution import multi_token_relevance

        composite = composites.resolve(composite or self.composite)
        fwd, cfg = self._fns["forward"], self.cfg
        embeds = self.embed(input_ids)
        toks = jnp.asarray(tokens)
        mnames, mvals = _padding_args(self.family, kv_begin, attention_mask,
                                      kv_end)
        key = ("multi", embeds.shape, embeds.dtype.name, composite,
               position, toks.shape, mnames, check, via, jit)
        fn = self._jit.get(key)
        if fn is None:
            def run(params, e, toks, mvals):
                kw = dict(zip(mnames, mvals))
                return multi_token_relevance(
                    lambda ee: fwd(params, cfg, ee, composite, **kw).logits,
                    e, toks, position=position, via=via)
            fn = self._jit[key] = _finalize(run, check, jit)
        return fn(self.params, embeds, toks, mvals)

    def attribute_topk(self, input_ids, k: int = 5, *, position: int = -1,
                       composite=None, kv_begin=None, attention_mask=None,
                       kv_end=None, check=None, via: str = "scan",
                       jit=True):
        """Explain the model's own top-k candidates at ``position`` in one
        pass: ``(tokens [K, B], values [K, B], relevance [K, B, T])``.
        Padding/``check`` semantics as in :meth:`attribute`."""
        from lxt_tpu.attribution import topk_relevance

        composite = composites.resolve(composite or self.composite)
        fwd, cfg = self._fns["forward"], self.cfg
        embeds = self.embed(input_ids)
        mnames, mvals = _padding_args(self.family, kv_begin, attention_mask,
                                      kv_end)
        key = ("topk", embeds.shape, embeds.dtype.name, composite,
               position, k, mnames, check, via, jit)
        fn = self._jit.get(key)
        if fn is None:
            def run(params, e, mvals):
                kw = dict(zip(mnames, mvals))
                return topk_relevance(
                    lambda ee: fwd(params, cfg, ee, composite, **kw).logits,
                    e, k, position=position, via=via)
            fn = self._jit[key] = _finalize(run, check, jit)
        return fn(self.params, embeds, mvals)

    def generate(self, input_ids, max_new_tokens: int, *,
                 eos_token_id: Optional[int] = None, kv_begin=None,
                 temperature: float = 0.0, top_k: Optional[int] = None,
                 key=None, use_cache: bool = True, jit=True):
        """Decode a continuation, so a checkpoint alone (torch-free
        ``from_pretrained``) can produce the response it then explains
        (``attribute_response(out, ids.shape[1])``). Greedy by default;
        pass ``key`` (a ``jax.random.PRNGKey``) with ``temperature > 0``
        (optionally ``top_k``) to sample — the realistic serving flow is
        explaining what the model *actually* said. One compiled program:
        Llama-family models run KV-cached incremental decoding (prefill +
        per-token steps, ``models/decode.py`` — O(T + N·T·D) instead of N
        full-prefix forwards); other families (``use_cache=False`` forces
        this everywhere) re-run the full-prefix forward per step inside a
        ``fori_loop``, exact by causal masking. Returns ids
        ``[B, T0 + max_new_tokens]``; rows that hit ``eos_token_id`` keep
        emitting it. ``kv_begin [B]`` marks per-example left padding (the
        serving pipeline's batch layout): positions before it are masked
        and rope positions shift with it.
        """
        if self.family == "bert":
            raise ValueError("generate needs a causal LM head; "
                             "BERT is an encoder")
        if key is not None and not temperature > 0:
            raise ValueError("sampling (key=) needs temperature > 0")
        fwd, cfg = self._fns["forward"], self.cfg
        embed = self._fns["embed"]
        composite = self.composite   # forward VALUES are composite-invariant
        ids0 = jnp.asarray(input_ids)
        T0 = ids0.shape[1]
        N = int(max_new_tokens)
        if N < 1:
            raise ValueError(f"max_new_tokens must be >= 1, got {N}")
        cached = use_cache and "prefill" in self._fns
        sampled = key is not None
        temperature = float(temperature)
        # normalize typed (jax.random.key) or legacy (PRNGKey uint32[2])
        # keys to raw data so the compiled fn takes one argument form
        if sampled and jnp.issubdtype(jnp.asarray(key).dtype, jnp.integer):
            skey = jnp.asarray(key, jnp.uint32)
        elif sampled:
            skey = jax.random.key_data(key)
        else:
            skey = jnp.zeros((2,), jnp.uint32)

        def pick(buf, done, logits, pos, skey, k):
            rng = (jax.random.fold_in(jax.random.wrap_key_data(skey), k)
                   if sampled else None)
            return _greedy_update(buf, done, logits, pos, eos_token_id,
                                  rng=rng, temperature=temperature,
                                  top_k=top_k)

        jkey = ("generate", ids0.shape, N, eos_token_id,
                kv_begin is not None, sampled, temperature, top_k, cached,
                jit)
        fn = self._jit.get(jkey)
        if fn is None and cached:
            pre, step = self._fns["prefill"], self._fns["decode_step"]

            def run(params, ids0, kv_begin, skey):
                B = ids0.shape[0]
                e0 = embed(params, ids0, cfg)
                logits0, caches = pre(params, cfg, e0, T0 + N,
                                      kv_begin=kv_begin, composite=composite)
                buf = jnp.concatenate(
                    [ids0, jnp.zeros((B, N), ids0.dtype)], axis=1)
                buf, done = pick(buf, jnp.zeros((B,), bool), logits0, T0,
                                 skey, 0)

                def body(k, state):
                    buf, done, caches = state
                    tok = jax.lax.dynamic_slice_in_dim(buf, T0 + k - 1, 1,
                                                       axis=1)
                    e = embed(params, tok, cfg)
                    logits, caches = step(params, cfg, e, caches,
                                          T0 + k - 1, kv_begin=kv_begin,
                                          composite=composite)
                    buf, done = pick(buf, done, logits, T0 + k, skey, k)
                    return buf, done, caches

                buf, _, _ = _run_decode_loop(N, 1, (buf, done, caches),
                                             body, eos_token_id)
                return _fill_after_eos(buf, T0, eos_token_id)
            fn = self._jit[jkey] = jax.jit(run) if jit else run
        elif fn is None:
            def run(params, ids0, kv_begin, skey):
                B = ids0.shape[0]
                buf = jnp.concatenate(
                    [ids0, jnp.zeros((B, N), ids0.dtype)], axis=1)

                def body(k, state):
                    buf, done = state
                    e = embed(params, buf, cfg)
                    # causal masking: the zero-filled tail cannot influence
                    # the frontier logits, so one static-shape forward per
                    # step is exact
                    logits = fwd(params, cfg, e, composite, kv_begin=kv_begin,
                                 logits_at=T0 + k - 1).logits
                    return pick(buf, done, logits, T0 + k, skey, k)

                buf, _ = _run_decode_loop(N, 0, (buf, jnp.zeros((B,), bool)),
                                          body, eos_token_id)
                return _fill_after_eos(buf, T0, eos_token_id)
            fn = self._jit[jkey] = jax.jit(run) if jit else run
        kb = None if kv_begin is None else jnp.asarray(kv_begin)
        return fn(self.params, ids0, kb, skey)

    def attribute_response(self, input_ids, response_start: int, *,
                           composite=None, kv_begin=None,
                           contrastive: bool = False, check=None,
                           via: str = "scan", jit=True):
        """One relevance map PER RESPONSE TOKEN, all sharing one forward.

        ``input_ids [B, T]`` is prompt + generated continuation;
        ``response_start`` is the first continuation position. Map k
        explains the logit of ``input_ids[:, response_start + k]`` at the
        position that predicted it (``response_start + k - 1``) — "why did
        the model generate each token of this response" in a single fused
        program instead of one re-run per generated token. ``kv_begin [B]``
        marks per-example left padding (serving batch layout).
        ``contrastive``: each map explains the MARGIN over the strongest
        rival token instead ("why this token and not the runner-up");
        ``values`` become the margins. ``check`` semantics as in
        :meth:`attribute`. Returns ``(values [K, B],
        relevance [K, B, T])``, ``K = T - response_start``.
        """
        from lxt_tpu.attribution import multi_site_relevance

        composite = composites.resolve(composite or self.composite)
        fwd, cfg = self._fns["forward"], self.cfg
        ids = jnp.asarray(input_ids)
        response_start = int(response_start)
        if not 1 <= response_start < ids.shape[1]:
            raise ValueError(
                f"response_start must be in [1, T), got {response_start} "
                f"for T={ids.shape[1]}")
        embeds = self.embed(ids)
        key = ("response", embeds.shape, embeds.dtype.name, composite,
               response_start, kv_begin is not None, contrastive, check,
               via, jit)
        fn = self._jit.get(key)
        if fn is None:
            def run(params, e, ids, kv_begin):
                positions = jnp.arange(response_start - 1, ids.shape[1] - 1)
                tokens = ids[:, response_start:].T          # [K, B]
                return multi_site_relevance(
                    lambda ee: fwd(params, cfg, ee, composite,
                                   kv_begin=kv_begin).logits,
                    e, positions, tokens, contrastive=contrastive, via=via)
            fn = self._jit[key] = _finalize(run, check, jit)
        kb = None if kv_begin is None else jnp.asarray(kv_begin)
        return fn(self.params, embeds, ids, kb)

    def attribute_response_latent(self, input_ids, response_start: int, *,
                                  composite=None, via: str = "scan",
                                  jit=True):
        """Per-layer relevance traces for EVERY response token, one
        forward: map k's probe gradients times the shared hidden states
        show which layers moved relevance onto which positions while
        generating token k (the reference's layer x token latent trace,
        docs/latent-feature-attribution, lifted to a whole response).
        Returns ``(values [K, B], input_rel [K, B, T], latent_rel
        [K, L, B, T])``."""
        from lxt_tpu.attribution import multi_site_latent_relevance

        composite = composites.resolve(composite or self.composite)
        fwd, cfg = self._fns["forward"], self.cfg
        ids = jnp.asarray(input_ids)
        response_start = int(response_start)
        if not 1 <= response_start < ids.shape[1]:
            raise ValueError(
                f"response_start must be in [1, T), got {response_start} "
                f"for T={ids.shape[1]}")
        embeds = self.embed(ids)
        B, T, D = embeds.shape
        L = cfg.num_layers
        key = ("response_latent", embeds.shape, embeds.dtype.name, composite,
               response_start, via, jit)
        fn = self._jit.get(key)
        if fn is None:
            def run(params, e, ids):
                positions = jnp.arange(response_start - 1, ids.shape[1] - 1)
                tokens = ids[:, response_start:].T          # [K, B]

                def f(ee, probes):
                    out = fwd(params, cfg, ee, composite, probes=probes,
                              output_hidden_states=True)
                    return out.logits, out.hidden_states
                return multi_site_latent_relevance(
                    f, e, positions, tokens, (L, B, T, D), via=via)
            fn = self._jit[key] = jax.jit(run) if jit else run
        return fn(self.params, embeds, ids)

    def attribute_latent(self, input_ids, *, target: Optional[Callable] = None,
                         position: int = -1, composite=None):
        """Input relevance + per-layer latent relevance in ONE backward
        (reference docs/latent-feature-attribution-efficient.rst)."""
        composite = composites.resolve(composite or self.composite)
        fwd, cfg = self._fns["forward"], self.cfg
        embeds = self.embed(input_ids)
        L = cfg.num_layers
        B, T, D = embeds.shape
        key = ("latent", embeds.shape, embeds.dtype.name, composite,
               position, target)
        fn = self._jit.get(key)
        if fn is None:
            def run(params, e):
                def forward_with_probes(ee, probes):
                    out = fwd(params, cfg, ee, composite, probes=probes,
                              output_hidden_states=True)
                    logits = out.logits
                    if target is not None:
                        val = target(logits)
                    elif logits.ndim == 2:
                        val = logits.max(axis=-1).sum()
                    else:
                        val = select_logit(logits, position=position)
                    return val, out.hidden_states
                return latent_relevance(forward_with_probes, e, (L, B, T, D))
            fn = self._jit[key] = jax.jit(run)
        return fn(self.params, embeds)


def _llama_structural_match(hf_config, state_dict) -> bool:
    """True when an out-of-registry architecture is COMPUTATIONALLY Llama:
    the config carries the Llama attribute set with a SiLU gated MLP and
    RMSNorm, and the weights use the exact Llama parameter naming (so the
    converter's key lookups and the forward's math both apply verbatim).
    Many HF model_types are Llama re-registrations (SmolLM-era clones);
    structurally different lookalikes (OLMo's non-parametric norm, StableLM's
    partial rotary + LayerNorm, Cohere's fused-residual block) fail the key
    check and stay unsupported."""
    needed_cfg = ("vocab_size", "hidden_size", "intermediate_size",
                  "num_hidden_layers", "num_attention_heads", "rms_norm_eps")
    if not all(hasattr(hf_config, a) for a in needed_cfg):
        return False
    act = getattr(hf_config, "hidden_act",
                  getattr(hf_config, "hidden_activation", None))
    if act not in ("silu", "swish"):
        return False
    if state_dict is None:
        return False
    needed_keys = ("model.layers.0.self_attn.q_proj.weight",
                   "model.layers.0.self_attn.o_proj.weight",
                   "model.layers.0.mlp.gate_proj.weight",
                   "model.layers.0.mlp.up_proj.weight",
                   "model.layers.0.mlp.down_proj.weight",
                   "model.layers.0.input_layernorm.weight",
                   "model.layers.0.post_attention_layernorm.weight",
                   "model.embed_tokens.weight", "model.norm.weight")
    if not all(k in state_dict for k in needed_keys):
        return False
    # reject clones carrying EXTRA layer-0 computation weights the Llama
    # converter would silently DROP (q/k norms, qkv biases, gate norms) —
    # those need the explicit family= override, not a lossy auto-convert
    allowed = {"self_attn.q_proj.weight", "self_attn.k_proj.weight",
               "self_attn.v_proj.weight", "self_attn.o_proj.weight",
               "mlp.gate_proj.weight", "mlp.up_proj.weight",
               "mlp.down_proj.weight",
               # non-computation buffer older HF versions serialize
               "self_attn.rotary_emb.inv_freq"}
    prefix = "model.layers.0."
    return all(k[len(prefix):] in allowed for k in state_dict
               if k.startswith(prefix + "self_attn.")
               or k.startswith(prefix + "mlp."))


def detect_family(hf_config, state_dict=None) -> str:
    mt = getattr(hf_config, "model_type", None)
    if mt in SUPPORTED_FAMILIES:
        return mt
    # out-of-registry model_type whose config AND parameter naming are
    # exactly Llama's: run it through the llama family with a warning (the
    # reference's monkey-patching would likewise only work on such clones
    # if their modeling module reused Llama's function structure)
    if _llama_structural_match(hf_config, state_dict):
        import warnings

        warnings.warn(
            f"model_type {mt!r} is not registered, but its config and "
            f"parameter naming match the Llama family exactly — converting "
            f"as 'llama'. Pass family='llama' to silence this, or a "
            f"different family to override.")
        return "llama"
    supported = ", ".join(SUPPORTED_FAMILIES)
    raise ValueError(
        f"{mt!r} not yet supported. Supported models are: {supported}. "
        f"If the architecture matches one of these computationally, pass "
        f"family='<name>' to from_hf/from_pretrained to force it. "
        f"Contributions welcome — add a family module under "
        f"lxt_tpu/models/ and register it here.")


def _convert(state_dict, hf_config, composite, dtype, text_only=False,
             family=None):
    """Shared state_dict -> AttributionModel conversion (torch tensors or
    numpy arrays — the family converters accept either)."""
    import numpy as np

    # multimodal wrappers (Gemma3ForConditionalGeneration): when the vision
    # tower's weights are present, return the joint image+text model —
    # ``attribute(input_ids, pixel_values)`` in one vjp. ``text_only=True``
    # (or a text-only checkpoint) extracts the language model instead.
    if hasattr(hf_config, "text_config") and hf_config.model_type in (
            "gemma3",):
        has_vision = any(k.startswith("model.vision_tower.")
                         for k in state_dict)
        if has_vision and not text_only:
            return _convert_multimodal(state_dict, hf_config, composite,
                                       dtype)
        hf_config = hf_config.text_config
        if any(k.startswith("model.language_model.") for k in state_dict):
            sd = {k.replace("model.language_model.", "model."): v
                  for k, v in state_dict.items()
                  if k.startswith("model.language_model.")}
            if "lm_head.weight" in state_dict:
                sd["lm_head.weight"] = state_dict["lm_head.weight"]
            state_dict = sd
    if family is not None:
        if family not in SUPPORTED_FAMILIES:
            supported = ", ".join(SUPPORTED_FAMILIES)
            raise ValueError(f"family={family!r} is not one of: {supported}")
    else:
        family = detect_family(hf_config, state_dict)
    table = _family_table()[family]

    cfg = table["config"].from_hf(hf_config)
    params = table["from_hf"](state_dict, cfg, dtype=dtype or np.float32)
    if composite is None:
        composite = composites.cp_lrp if family == "gpt2" else composites.attnlrp
    composite = composites.resolve(composite)
    return AttributionModel(family=family, cfg=cfg, params=params,
                            composite=composite, _fns=table)


def from_hf(hf_model, composite: composites.Composite = None,
            dtype=None, text_only: bool = False, family: str = None,
            canonizers=None):
    """Convert a loaded HF torch model into an AttributionModel.

    ``composite`` defaults to AttnLRP except GPT-2, where the reference
    recommends CP-LRP (models/gpt2.py:24-26), and vision towers, which ship
    CP-LRP only (models/vit_torch.py:7-11).

    ``family`` forces a registry family for out-of-registry ``model_type``s
    that are computationally identical to a supported one (Llama-clone
    re-registrations are common on the Hub); exact Llama clones — matching
    config attributes AND parameter naming — are detected automatically.

    ``canonizers``: optional list of (params, cfg, family) pre-transforms
    applied to the converted model before use — the reference's
    ``Composite(canonizers=...)`` hook (see :mod:`lxt_tpu.canonizers`).

    Also accepts config-less vision modules the way the reference's
    DEFAULT_MAP covers torchvision (lxt/efficient/models/__init__.py:10-18):
    a torchvision-``VisionTransformer``-shaped model (or an OpenCLIP visual
    tower) returns a :class:`VisionAttributionModel`; a
    ``Gemma3ForConditionalGeneration`` with its vision tower returns a
    :class:`MultimodalAttributionModel` (``text_only=True`` extracts the
    language model instead).
    """
    if not hasattr(hf_model, "config"):   # torchvision / open_clip modules
        sd = (hf_model if isinstance(hf_model, dict)
              else hf_model.state_dict())
        if "conv_proj.weight" in sd:
            return from_torchvision(hf_model, composite=composite,
                                    dtype=dtype)
        if "conv1.weight" in sd and any(
                k.startswith("transformer.resblocks.") for k in sd):
            return from_openclip(hf_model, composite=composite, dtype=dtype)
        raise ValueError(
            "model has no .config and is not a recognized vision layout "
            "(torchvision VisionTransformer / OpenCLIP visual tower)")
    if getattr(hf_model.config, "model_type", None) in (
            "siglip", "siglip_vision_model"):
        return from_siglip(hf_model, composite=composite, dtype=dtype)
    model = _convert(hf_model.state_dict(), hf_model.config, composite,
                     dtype, text_only=text_only, family=family)
    return model.canonize(*canonizers) if canonizers else model


def from_pretrained(model_dir, composite: composites.Composite = None,
                    dtype=None, quantize_bits=None,
                    text_only: bool = False, family: str = None,
                    canonizers=None):
    """Load an AttributionModel straight from an HF checkpoint DIRECTORY —
    no torch model is ever instantiated: the config comes from
    ``transformers.AutoConfig`` and the weights stream through the native
    mmap safetensors loader (:mod:`lxt_tpu.io`), so an 8B checkpoint never
    holds a second full-precision torch copy in host RAM.

    ``quantize_bits`` (4, 8, or "nf4") applies the per-family weight-only
    quantization spec after conversion (the bitsandbytes role in the
    reference's quantized examples, examples/quantized_llama.py:13-19);
    "nf4" is the blockwise normal-float codebook matching bitsandbytes'
    ``load_in_4bit`` numerics class.

    bitsandbytes-SERIALIZED checkpoints (saved from the reference's
    quantized flow) are detected by their ``*.quant_state.bitsandbytes__*``
    (4-bit) or ``*.SCB`` (8-bit Linear8bitLt) keys, dequantized on the host
    (:func:`lxt_tpu.ops.quant.ingest_bnb_state_dict`), and — unless
    ``quantize_bits`` says otherwise — re-quantized in kind ("nf4" / 8),
    which is representationally EXACT for bnb-dequantized values (every
    4-bit value is a codebook point of its block; every 8-bit row maps its
    absmax to +-127 — absmax and codes reconstruct bit-identically).
    """
    from transformers import AutoConfig

    from lxt_tpu.io import load_checkpoint_state_dict

    import numpy as np

    hf_config = AutoConfig.from_pretrained(model_dir)
    # thread dtype into the loader: widening a bf16 checkpoint to a host
    # f32 dict only to cast back down would double peak host memory
    state = load_checkpoint_state_dict(model_dir, dtype=dtype or np.float32)
    from lxt_tpu.ops.quant import ingest_bnb_state_dict
    had_8bit = any(k.endswith(".SCB") for k in state)
    if ingest_bnb_state_dict(state) and quantize_bits is None:
        quantize_bits = 8 if had_8bit else "nf4"
    model = _convert(state, hf_config, composite, dtype, text_only=text_only,
                     family=family)
    if canonizers:
        # before quantization: canonizers transform full-precision weights
        model = model.canonize(*canonizers)
    if quantize_bits:
        if not isinstance(model, AttributionModel):
            raise ValueError("quantize_bits applies to text models only")
        from lxt_tpu.ops.quant import quantize_params
        model.params = quantize_params(model.params, bits=quantize_bits,
                                       family=model.family)
    return model


# ---------------------------------------------------------------------------
# Vision (one-call surface for the reference's torchvision/OpenCLIP coverage,
# lxt/efficient/models/__init__.py:10-18 + examples/vit_torch.py)
# ---------------------------------------------------------------------------

def _canon_images(images):
    """Accept NHWC or NCHW (torch convention) RGB float images; return NHWC."""
    images = jnp.asarray(images)
    if images.ndim != 4:
        raise ValueError(f"expected [B, H, W, 3] images, got {images.shape}")
    if images.shape[-1] == 3:
        return images
    if images.shape[1] == 3:
        return images.transpose(0, 2, 3, 1)
    # neither axis is RGB: fail here with a clear message instead of an
    # opaque conv shape error downstream (e.g. RGBA or grayscale input)
    raise ValueError(
        f"expected RGB images as [B, H, W, 3] or [B, 3, H, W], got "
        f"{images.shape}")


@dataclasses.dataclass
class VisionAttributionModel:
    """A converted vision tower plus its attribution entry points.

    ``kind``: 'vit' (classification head), 'openclip' (L2-normalized CLIP
    embedding) or 'siglip' (headless patch-embedding tower — pass an
    explicit ``target``)."""

    kind: str
    cfg: Any
    params: Any
    composite: composites.Composite
    #: bounded LRU of compiled entry points (ad-hoc lambda targets /
    #: shape churn must not leak programs; pass a STABLE callable as
    #: ``target`` to get cache hits across calls)
    _jit: Any = dataclasses.field(default_factory=JitCache, repr=False)

    def _forward(self):
        """Uniform (params, cfg, images, composite) -> output array:
        siglip.forward returns the patch-embedding array directly, vit
        wraps in ModelOutputs."""
        if self.kind == "siglip":
            from lxt_tpu.models import siglip
            return siglip.forward
        from lxt_tpu.models import vit
        return lambda params, cfg, x, comp: vit.forward(
            params, cfg, x, comp).logits

    def logits(self, images, composite=None):
        """Class logits ('vit'), CLIP embedding ('openclip') or patch
        embeddings ('siglip')."""
        composite = composites.resolve(composite or self.composite)
        images = _canon_images(images)
        fwd, cfg = self._forward(), self.cfg
        key = ("logits", images.shape, images.dtype.name, composite)
        fn = self._jit.get(key)
        if fn is None:
            fn = self._jit[key] = jax.jit(
                lambda params, x: fwd(params, cfg, x, composite))
        return fn(self.params, images)

    def attribute_image(self, images, *, label=None,
                        target: Optional[Callable] = None, composite=None,
                        jit=True):
        """Pixel relevance heatmap, one fused forward+backward.

        Default target: the argmax class logit ('vit'; pass ``label`` [B]
        int to explain specific classes) or, for 'openclip', the embedding
        dotted with ``target`` (a [proj_dim] direction, e.g. a text
        embedding). 'siglip' has no head — ``target`` (callable on the
        [B, P, D] patch embeddings) is required. Returns
        ``(value, heatmap [B, H, W])`` — relevance summed over channels
        (reference examples/vit_torch.py:84).
        """
        from lxt_tpu.models.vit import patch_relevance

        composite = composites.resolve(composite or self.composite)
        images = _canon_images(images)
        fwd, cfg, kind = self._forward(), self.cfg, self.kind
        if kind == "siglip" and target is None:
            raise ValueError(
                "siglip towers are headless: pass target=<callable on the "
                "[B, P, D] patch embeddings> (e.g. a pooled-probe dot)")
        if target is not None and not callable(target) and kind != "openclip":
            raise ValueError("non-callable target (an embedding direction) "
                             "is only meaningful for openclip towers")
        lab = None if label is None else jnp.asarray(label)
        tgt_dir = (jnp.asarray(target)
                   if (kind == "openclip" and target is not None
                       and not callable(target)) else None)
        key = ("attr_img", images.shape, images.dtype.name, composite,
               callable(target) and target, lab is not None,
               tgt_dir is not None, jit)
        fn = self._jit.get(key)
        if fn is None:
            def run(params, x, lab, tgt_dir):
                def tgt(xx):
                    out = fwd(params, cfg, xx, composite)
                    if callable(target):
                        return target(out)
                    if tgt_dir is not None:
                        return (out * tgt_dir).sum()
                    if lab is not None:
                        return jnp.take_along_axis(
                            out, lab.reshape(-1, 1), axis=-1).sum()
                    return out.max(axis=-1).sum()
                value, grad = jax.value_and_grad(tgt)(x)
                return value, patch_relevance(x, grad)
            fn = self._jit[key] = jax.jit(run) if jit else run
        return fn(self.params, images, lab, tgt_dir)

    def attribute_topk(self, images, k: int = 5, *, composite=None,
                       jit=True):
        """Top-k class heatmaps from ONE forward pass ('vit' classification
        towers only): ``(labels [K, B], values [K, B], heatmaps
        [K, B, H, W])`` — compare the pixel evidence for the k most likely
        classes (the classic contrastive ViT demo) without k re-runs."""
        from lxt_tpu.attribution import topk_relevance

        if self.kind != "vit":
            raise ValueError(
                "attribute_topk needs a classification head (kind='vit'); "
                f"this tower is {self.kind!r} — use "
                "attribute_image(target=...)")
        composite = composites.resolve(composite or self.composite)
        images = _canon_images(images)
        fwd, cfg = self._forward(), self.cfg
        key = ("topk", images.shape, images.dtype.name, composite, k, jit)
        fn = self._jit.get(key)
        if fn is None:
            def run(params, x):
                # [B, C] class logits are 2-D: topk_relevance's row
                # passthrough; sum_features sums channels, which on NHWC
                # pixels IS vit.patch_relevance
                return topk_relevance(
                    lambda xx: fwd(params, cfg, xx, composite), x, k)
            fn = self._jit[key] = jax.jit(run) if jit else run
        return fn(self.params, images)


def _to_numpy_sd(model_or_sd):
    if isinstance(model_or_sd, dict):
        return model_or_sd, model_or_sd
    return model_or_sd.state_dict(), model_or_sd


def _shape(sd, key):
    return tuple(sd[key].shape)


def from_torchvision(model_or_state_dict, *, num_heads: int = None,
                     composite: composites.Composite = None,
                     dtype=None) -> VisionAttributionModel:
    """One-call conversion of a torchvision ``VisionTransformer`` (the
    reference's ``monkey_patch(vision_transformer_module)`` equivalent,
    lxt/efficient/models/vit_torch.py). Geometry is inferred from the state
    dict; ``num_heads`` comes from the module's ``nn.MultiheadAttention``
    when a model object is passed (a bare state dict needs it explicitly).
    Default composite is CP-LRP — the only map the reference exports for
    ViTs; compose with ``.with_gamma(...)`` for denoised heatmaps."""
    import numpy as np

    from lxt_tpu.models import vit

    sd, model = _to_numpy_sd(model_or_state_dict)
    if num_heads is None:
        try:
            num_heads = int(
                model.encoder.layers[0].self_attention.num_heads)
        except AttributeError:
            raise ValueError(
                "num_heads is not recoverable from a bare state dict — "
                "pass num_heads=... or the model object") from None
    D, _, P, _ = _shape(sd, "conv_proj.weight")
    n_tokens = _shape(sd, "encoder.pos_embedding")[1]
    side = int(round((n_tokens - 1) ** 0.5))
    L = sum(1 for k in sd
            if k.startswith("encoder.layers.encoder_layer_")
            and k.endswith(".ln_1.weight"))
    cfg = vit.ViTConfig(
        image_size=side * P, patch_size=P, hidden_size=D,
        intermediate_size=_shape(sd, "encoder.layers.encoder_layer_0."
                                     "mlp.0.weight")[0],
        num_layers=L, num_heads=num_heads,
        num_classes=_shape(sd, "heads.head.weight")[0],
        act="gelu_exact")
    params = vit.params_from_torchvision(sd, cfg, dtype=dtype or np.float32)
    return VisionAttributionModel(kind="vit", cfg=cfg, params=params,
                                  composite=composites.resolve(composite or composites.cp_lrp))


def from_openclip(model_or_state_dict, *, num_heads: int = None,
                  composite: composites.Composite = None,
                  act: str = "quick_gelu", ln_eps: float = 1e-5,
                  dtype=None) -> VisionAttributionModel:
    """One-call conversion of an OpenCLIP ``VisualTransformer`` (the
    ``visual.`` subtree of a CLIP checkpoint). OpenCLIP's stock activation
    is QuickGELU; pass ``act='gelu_exact'`` for nn.GELU variants."""
    import numpy as np

    from lxt_tpu.models import vit

    sd, model = _to_numpy_sd(model_or_state_dict)
    if num_heads is None:
        try:
            num_heads = int(model.transformer.resblocks[0].attn.num_heads)
        except AttributeError:
            raise ValueError(
                "num_heads is not recoverable from a bare state dict — "
                "pass num_heads=... or the model object") from None
    D, _, P, _ = _shape(sd, "conv1.weight")
    n_tokens = _shape(sd, "positional_embedding")[0]
    side = int(round((n_tokens - 1) ** 0.5))
    L = sum(1 for k in sd if k.startswith("transformer.resblocks.")
            and k.endswith(".ln_1.weight"))
    cfg = vit.ViTConfig(
        image_size=side * P, patch_size=P, hidden_size=D,
        intermediate_size=_shape(
            sd, "transformer.resblocks.0.mlp.c_fc.weight")[0],
        num_layers=L, num_heads=num_heads, ln_eps=ln_eps, act=act,
        openclip=True, proj_dim=_shape(sd, "proj")[1])
    params = vit.params_from_openclip(sd, cfg, dtype=dtype or np.float32)
    return VisionAttributionModel(kind="openclip", cfg=cfg, params=params,
                                  composite=composites.resolve(composite or composites.cp_lrp))


def from_siglip(hf_model, composite: composites.Composite = None,
                dtype=None) -> VisionAttributionModel:
    """Convert an HF SigLIP vision tower (SiglipVisionModel, or the
    ``vision_model`` of a full SiglipModel)."""
    import numpy as np

    from lxt_tpu.models import siglip

    hf_config = hf_model.config
    if hasattr(hf_config, "vision_config"):
        hf_config = hf_config.vision_config
    cfg = siglip.SiglipConfig.from_hf(hf_config)
    sd = hf_model.state_dict()
    prefix = ("vision_model." if any(
        k.startswith("vision_model.") for k in sd) else "")
    params = siglip.params_from_hf(sd, cfg, dtype=dtype or np.float32,
                                   prefix=prefix)
    return VisionAttributionModel(kind="siglip", cfg=cfg, params=params,
                                  composite=composites.resolve(composite or composites.cp_lrp))


# ---------------------------------------------------------------------------
# Multimodal (Gemma3ForConditionalGeneration — joint pixel+token relevance)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class MultimodalAttributionModel:
    """Gemma 3 image+text model: ``attribute(input_ids, pixel_values)``
    returns joint relevance over prompt tokens AND pixels from ONE vjp
    (beyond the reference, which attributes Gemma 3 text only)."""

    cfg: Any          # gemma3.Gemma3MultimodalConfig
    params: Any
    composite: composites.Composite
    #: bounded LRU of compiled entry points (ad-hoc lambda targets /
    #: shape churn must not leak programs; pass a STABLE callable as
    #: ``target`` to get cache hits across calls)
    _jit: Any = dataclasses.field(default_factory=JitCache, repr=False)

    family: str = "gemma3_multimodal"

    def logits(self, input_ids, pixel_values, composite=None):
        from lxt_tpu.models import gemma3
        composite = composites.resolve(composite or self.composite)
        ids = jnp.asarray(input_ids)
        pix = _canon_images(pixel_values)
        mask = ids == self.cfg.image_token_id
        embeds = gemma3.embed(self.params["text"], ids, self.cfg.text)
        key = ("logits", embeds.shape, pix.shape, embeds.dtype.name,
               composite)
        fn = self._jit.get(key)
        if fn is None:
            cfg = self.cfg
            fn = self._jit[key] = jax.jit(
                lambda params, e, p, m: gemma3.multimodal_forward(
                    params, cfg, e, p, m, composite).logits)
        return fn(self.params, embeds, pix, mask)

    def attribute(self, input_ids, pixel_values, *,
                  target: Optional[Callable] = None, position: int = -1,
                  token=None, composite=None, jit=True):
        """Joint attribution: returns ``(value, token_relevance [B, T],
        image_heatmap [B, H, W])`` — token relevance at image-placeholder
        positions is complementary to the pixel heatmap (relevance entering
        through the projected image tokens lands on the pixels)."""
        from lxt_tpu.models import gemma3

        composite = composites.resolve(composite or self.composite)
        ids = jnp.asarray(input_ids)
        pix = _canon_images(pixel_values)
        mask = ids == self.cfg.image_token_id
        embeds = gemma3.embed(self.params["text"], ids, self.cfg.text)
        tok = None if token is None else jnp.asarray(token)
        key = ("attribute", embeds.shape, pix.shape, embeds.dtype.name,
               composite, position, target, tok is not None, jit)
        fn = self._jit.get(key)
        if fn is None:
            cfg = self.cfg

            def run(params, e, p, m, tok):
                def tgt(ee, pp):
                    logits = gemma3.multimodal_forward(
                        params, cfg, ee, pp, m, composite).logits
                    if target is not None:
                        return target(logits)
                    return select_logit(logits, position=position, token=tok)
                value, (ge, gp) = jax.value_and_grad(
                    tgt, argnums=(0, 1))(e, p)
                rel_tok = (e.astype(jnp.float32)
                           * ge.astype(jnp.float32)).sum(-1)
                rel_pix = (p.astype(jnp.float32)
                           * gp.astype(jnp.float32)).sum(-1)
                return value, rel_tok, rel_pix
            fn = self._jit[key] = jax.jit(run) if jit else run
        return fn(self.params, embeds, pix, mask, tok)

    def _merged_prefix(self, params, ids, pix, mask, composite):
        """Prompt embeds with the projected image tokens scattered in —
        the image is encoded ONCE here; decode steps are text-only."""
        from lxt_tpu.models import gemma3

        e = gemma3.embed(params["text"], ids, self.cfg.text)
        return gemma3.merge_image_embeds(params, self.cfg, e, pix, mask,
                                         composite)

    def generate(self, input_ids, pixel_values, max_new_tokens: int, *,
                 eos_token_id: Optional[int] = None, use_cache: bool = True,
                 jit=True):
        """Greedy decode conditioned on the image (one compiled program;
        SigLIP runs once on the prompt). With ``use_cache`` (default) the
        merged image+text prefix is prefilled into a KV cache and each
        step decodes one token (``models/decode.py``); otherwise every
        step re-runs the text forward over the full prefix. Returns ids
        ``[B, T0 + max_new_tokens]`` — feed them to
        :meth:`attribute_response` to explain the caption it produced.
        Generated positions are never image placeholders, so scattering
        only into the prompt prefix is exact.
        """
        from lxt_tpu.models import decode, gemma3

        ids0 = jnp.asarray(input_ids)
        pix = _canon_images(pixel_values)
        mask = ids0 == self.cfg.image_token_id
        composite, cfg = self.composite, self.cfg
        T0 = ids0.shape[1]
        N = int(max_new_tokens)
        if N < 1:
            raise ValueError(f"max_new_tokens must be >= 1, got {N}")
        key = ("generate", ids0.shape, pix.shape, N, eos_token_id,
               use_cache, jit)
        fn = self._jit.get(key)
        if fn is None and use_cache:
            def run(params, ids0, pix, mask):
                merged0 = self._merged_prefix(params, ids0, pix, mask,
                                              composite)
                B = ids0.shape[0]
                logits0, caches = decode.gemma3_prefill(
                    params["text"], cfg.text, merged0, T0 + N,
                    composite=composite)
                buf = jnp.concatenate(
                    [ids0, jnp.zeros((B, N), ids0.dtype)], axis=1)
                buf, done = _greedy_update(buf, jnp.zeros((B,), bool),
                                           logits0, T0, eos_token_id)

                def body(k, state):
                    buf, done, caches = state
                    tok = jax.lax.dynamic_slice_in_dim(buf, T0 + k - 1, 1,
                                                       axis=1)
                    e = gemma3.embed(params["text"], tok, cfg.text)
                    logits, caches = decode.gemma3_decode_step(
                        params["text"], cfg.text, e, caches, T0 + k - 1,
                        composite=composite)
                    buf, done = _greedy_update(buf, done, logits, T0 + k,
                                               eos_token_id)
                    return buf, done, caches

                buf, _, _ = _run_decode_loop(N, 1, (buf, done, caches),
                                             body, eos_token_id)
                return _fill_after_eos(buf, T0, eos_token_id)
            fn = self._jit[key] = jax.jit(run) if jit else run
        elif fn is None:
            def run(params, ids0, pix, mask):
                merged0 = self._merged_prefix(params, ids0, pix, mask,
                                              composite)
                B = ids0.shape[0]
                buf = jnp.concatenate(
                    [ids0, jnp.zeros((B, N), ids0.dtype)], axis=1)

                def body(k, state):
                    buf, done = state
                    e = gemma3.embed(params["text"], buf, cfg.text)
                    e = jnp.concatenate([merged0, e[:, T0:]], axis=1)
                    logits = gemma3.forward(
                        params["text"], cfg.text, e, composite,
                        logits_at=T0 + k - 1).logits
                    return _greedy_update(buf, done, logits, T0 + k,
                                          eos_token_id)

                buf, _ = _run_decode_loop(N, 0, (buf, jnp.zeros((B,), bool)),
                                          body, eos_token_id)
                return _fill_after_eos(buf, T0, eos_token_id)
            fn = self._jit[key] = jax.jit(run) if jit else run
        return fn(self.params, ids0, pix, mask)

    def attribute_response(self, input_ids, pixel_values,
                           response_start: int, *, composite=None,
                           contrastive: bool = False, via: str = "scan",
                           jit=True):
        """One joint token+pixel relevance map PER RESPONSE TOKEN, all
        sharing one forward ("why did the model generate each token of
        its caption, and which pixels drove it"). ``contrastive``:
        margins over the strongest rival token instead. Returns ``(values
        [K, B], token_relevance [K, B, T], image_heatmap [K, B, H, W])``,
        ``K = T - response_start``."""
        from lxt_tpu.attribution import multi_site_relevance
        from lxt_tpu.models import gemma3

        composite = composites.resolve(composite or self.composite)
        ids = jnp.asarray(input_ids)
        pix = _canon_images(pixel_values)
        mask = ids == self.cfg.image_token_id
        response_start = int(response_start)
        if not 1 <= response_start < ids.shape[1]:
            raise ValueError(
                f"response_start must be in [1, T), got {response_start} "
                f"for T={ids.shape[1]}")
        embeds = gemma3.embed(self.params["text"], ids, self.cfg.text)
        key = ("response", embeds.shape, pix.shape, embeds.dtype.name,
               composite, response_start, contrastive, via, jit)
        fn = self._jit.get(key)
        if fn is None:
            cfg = self.cfg

            def run(params, e, p, m, ids):
                positions = jnp.arange(response_start - 1, ids.shape[1] - 1)
                tokens = ids[:, response_start:].T          # [K, B]
                return multi_site_relevance(
                    lambda ee, pp: gemma3.multimodal_forward(
                        params, cfg, ee, pp, m, composite).logits,
                    e, positions, tokens, aux_input=p,
                    contrastive=contrastive, via=via)
            fn = self._jit[key] = jax.jit(run) if jit else run
        return fn(self.params, embeds, pix, mask, ids)


def _convert_multimodal(state_dict, hf_config, composite,
                        dtype) -> MultimodalAttributionModel:
    import numpy as np

    from lxt_tpu.models import gemma3

    mmcfg = gemma3.Gemma3MultimodalConfig.from_hf(hf_config)
    params = gemma3.multimodal_params_from_hf(state_dict, mmcfg,
                                              dtype=dtype or np.float32)
    return MultimodalAttributionModel(
        cfg=mmcfg, params=params,
        composite=composites.resolve(composite or composites.attnlrp))
