"""Conservation sanity check for LRP rules.

TPU-native counterpart of the reference's ``CONSERVATION_CHECK_FLAG`` +
``conservation_check_wrap`` (``lxt/explicit/functional.py:10-37`` and
``lxt/explicit/check.py:6-15`` in rachtibat/LRP-eXplains-Transformers).

Under the check, every rule backward discards its computed relevance and
instead redistributes the *incoming* relevance uniformly over the input
elements. If the conservation property holds for every op in a model, the
total relevance arriving at the input equals the seeded output relevance;
any leak (a non-LRP-compatible op, a bias sink, a NaN) shows up as a
mismatch in :func:`conservation_error`.

JAX nuance: the flag is read at *trace time* and is NOT part of any jit cache
key — a function jitted (and called) before entering the context keeps its
cached program and silently runs WITHOUT the check. Call un-jitted or
freshly-wrapped functions under the context (see :func:`conservation_check`).

Scope: the redistribution semantics assume the cotangent IS relevance, i.e.
the explicit path (``lxt_tpu.ops.functional`` / ``lxt_tpu.explicit``). Under
the efficient Gradient*Input path (``lxt_tpu.ops.rules``, composites) the
cotangent is a gradient — relevance is ``x * grad`` — so uniform
redistribution of the cotangent does not preserve total relevance and
:func:`conservation_error` is not meaningful there.
"""

import contextlib

import jax.numpy as jnp

CONSERVATION_CHECK_FLAG = [False]
NAN_CHECK_FLAG = [False]


@contextlib.contextmanager
def conservation_check(raise_on_nan: bool = False):
    """Context manager enabling uniform-redistribution mode for all rules.

    Mirrors ``lxt.explicit.check.conservation_check`` (check.py:6-15).
    With ``raise_on_nan=True`` every rule backward additionally embeds a
    ``checkify`` NaN assertion (the reference's wrapper raises on NaN,
    functional.py:29-30) — run the attribution through :func:`checked` so
    the error is discharged and raised on the host.

    Note: functions jitted *inside* the context trace with the check enabled;
    pre-existing jit caches are not affected. Prefer calling un-jitted or
    freshly-wrapped functions under this context.
    """
    prev_conservation = CONSERVATION_CHECK_FLAG[0]
    prev_nan = NAN_CHECK_FLAG[0]
    CONSERVATION_CHECK_FLAG[0] = True
    NAN_CHECK_FLAG[0] = raise_on_nan or prev_nan
    try:
        yield
    finally:
        CONSERVATION_CHECK_FLAG[0] = prev_conservation
        NAN_CHECK_FLAG[0] = prev_nan


@contextlib.contextmanager
def nan_check():
    """Enable only the in-program NaN assertions (no redistribution): every
    rule backward checks its outgoing relevance for NaN/Inf. Wrap the
    attribution with :func:`checked` to discharge the assertions."""
    prev = NAN_CHECK_FLAG[0]
    NAN_CHECK_FLAG[0] = True
    try:
        yield
    finally:
        NAN_CHECK_FLAG[0] = prev


def checked(fn):
    """Wrap ``fn`` so in-program ``checkify`` assertions (NaN relevance under
    :func:`nan_check` / ``conservation_check(raise_on_nan=True)``) raise a
    ``JaxRuntimeError`` on the host after the jitted program returns —
    the TPU-native counterpart of the reference raising inside the autograd
    backward (``lxt/explicit/functional.py:29-30``)."""
    from jax.experimental import checkify
    import functools

    cfn = checkify.checkify(fn, errors=checkify.user_checks)

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapped


def _maybe_assert_finite(relevances, where):
    if not NAN_CHECK_FLAG[0]:
        return
    from jax.experimental import checkify
    for r in relevances:
        if r is not None:
            checkify.check(jnp.isfinite(r.astype(jnp.float32)).all(),
                           f"NaN/Inf relevance at rule backward: {where}")


def maybe_redistribute(in_relevances, out_relevances, where="rule"):
    """If the conservation check is active (at trace time), replace each input
    relevance with the uniform mean of the total output relevance; under the
    NaN check, additionally assert the outgoing relevance is finite.

    ``in_relevances``/``out_relevances`` are tuples of arrays (or None).
    Returns a tuple matching ``in_relevances``.
    """
    _maybe_assert_finite(in_relevances, where)
    if not CONSERVATION_CHECK_FLAG[0]:
        return in_relevances

    out_sum = sum(r.astype(jnp.float32).sum() for r in out_relevances if r is not None)
    n_elements = sum(r.size for r in in_relevances if r is not None)
    mean = out_sum / n_elements
    return tuple(
        None if r is None else jnp.full(r.shape, mean, dtype=r.dtype)
        for r in in_relevances
    )


def assert_finite_relevance(relevance, where="relevance"):
    """Host-side NaN/Inf check (the reference's conservation wrapper raises
    on NaN, functional.py:29-30; in JAX the check happens after the jitted
    program returns)."""
    import numpy as np

    arr = np.asarray(relevance)
    if not np.isfinite(arr).all():
        bad = int((~np.isfinite(arr)).sum())
        raise ValueError(f"NaN/Inf in {where}: {bad}/{arr.size} elements")
    return relevance


def conservation_error(input_relevance, seeded_value):
    """Relative conservation error |sum(R_in) - seed| / (|seed| + 1e-9).

    Run an attribution under :func:`conservation_check` and pass the resulting
    input relevance plus the seeded output relevance (e.g. the explained
    logit value); values near 0 mean every op in the model conserved.

    Only meaningful for the explicit path, where cotangents are relevance;
    under the Gradient*Input path (composites / ``ops/rules.py``) the
    redistributed quantity is a gradient and this metric reports a mismatch
    even when every rule conserves (see module docstring).
    """
    total = jnp.asarray(input_relevance, jnp.float32).sum()
    seed = jnp.asarray(seeded_value, jnp.float32).sum()
    return jnp.abs(total - seed) / (jnp.abs(seed) + 1e-9)
