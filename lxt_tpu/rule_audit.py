"""Traced-model rule audit: which LRP rule governs every op that matters.

Parity surface for the reference's verbose ``Composite.register`` table and
its WHITELIST/BLACKLIST op vetting (``lxt/explicit/core.py:305-336``,
``lxt/explicit/check.py:23-66`` in rachtibat/LRP-eXplains-Transformers).
The reference walks a torch.fx graph and rates each call as
replaced/compatible/problematic by *name*; a static table like
``Composite.summary()`` cannot tell a user that an op in their CUSTOM
forward silently carries no rule. This audit traces the actual function
(``jax.make_jaxpr``) and walks the jaxpr, so it sees exactly what will run:

- every recognized rule ``custom_vjp`` (efficient path ``ops/rules.py``,
  explicit path ``lxt_tpu.explicit``, ``ops/functional.py`` primitives,
  Pallas flash-attention kernels) is tagged with its rule;
- ``dot_general``/``conv`` with ONE activation-derived operand is the
  implicit epsilon rule under Gradient*Input (the weight side carries no
  relevance) — compatible by construction;
- bilinear ops (``mul``/``dot_general`` with BOTH operands activation-
  derived) are compatible only when governed: every activation operand has
  passed through a rule (``divide_gradient``/``stop_gradient``/...), or the
  product itself feeds a rule (the gated-MLP ``divide_gradient(g*up, 2)``
  shape), or no relevance flows through the result at all (a value whose
  every consumer path ends in ``stop_gradient`` — e.g. the ``x*x`` variance
  product inside a norm whose rsqrt is stop-gradient'd). Anything else is
  an UNRULED bilinear — the exact silent-relevance-leak class the
  reference's BLACKLIST exists to catch — and is flagged (or raised with
  ``on_unruled='raise'``).

Usage::

    entries = lxt_tpu.audit(lambda e: forward(params, cfg, e, comp).logits,
                            embeds)

Close parameters over (don't pass them as arguments): the audit treats the
traced function's ARGUMENTS as the relevance-carrying activations and
closed-over values as constants/weights.
"""

import dataclasses
from typing import Callable, List, Optional

import jax
import jax.extend.core

_Literal = jax.extend.core.Literal

__all__ = ["audit", "AuditEntry", "UnruledOpError"]


class UnruledOpError(ValueError):
    """A bilinear op with activation-derived operands carries no LRP rule."""


@dataclasses.dataclass(frozen=True)
class AuditEntry:
    """One audited op site."""

    site: str        #: jaxpr path, e.g. "scan/body"
    op: str          #: primitive or region name, e.g. "dot_general", "silu"
    shape: str       #: output aval, e.g. "f32[2,8,16]"
    kind: str        #: rule | linear | bilinear | nonlinearity | blocked | attention
    rule: str        #: human-readable rule (or "NONE")
    ok: bool         #: False = unruled (the reference's red cross)

    def row(self):
        mark = "ok " if self.ok else "!! "
        return f"  {mark}{self.site:<28} {self.op:<22} {self.shape:<18} {self.rule}"


#: custom_vjp bwd-function name -> human-readable rule. These are the
#: package's own rule primitives; a custom_vjp whose bwd is not listed is
#: treated as an ordinary opaque call (descended for propagation only).
RULE_BWD = {
    # efficient path (ops/rules.py)
    "_identity_rule_bwd": ("rule", "identity rule (Eq. 9)"),
    "_divide_gradient_bwd": ("rule", "uniform rule /k (Eq. 7)"),
    "_gamma_linear_bwd": ("rule", "gamma rule (linear)"),
    "_gamma_conv2d_bwd": ("rule", "gamma rule (conv2d)"),
    "_alphabeta_linear_bwd": ("rule", "alpha-beta rule (linear)"),
    "_alphabeta_conv2d_bwd": ("rule", "alpha-beta rule (conv2d)"),
    "_modz_linear_bwd": ("rule", "flat/w^2/z-box rule (linear)"),
    "_modz_conv2d_bwd": ("rule", "flat/w^2/z-box rule (conv2d)"),
    # explicit generic rules (lxt_tpu/explicit.py)
    "_identity_fn_bwd": ("rule", "identity rule (explicit)"),
    "_epsilon_bwd": ("rule", "epsilon rule (explicit)"),
    "_uniform_bwd": ("rule", "uniform rule (explicit)"),
    "_taylor_bwd": ("rule", "Taylor decomposition (explicit)"),
    # explicit functional primitives (ops/functional.py)
    "_softmax_bwd": ("rule", "softmax Deep-Taylor (Prop 3.1)"),
    "_linear_epsilon_bwd": ("rule", "linear epsilon (Eq. 8)"),
    "_matmul_bwd": ("rule", "matmul uniform-epsilon (Prop 3.3)"),
    "_add2_bwd": ("rule", "add2 epsilon (Eq. 8)"),
    "_mul2_bwd": ("rule", "mul2 uniform (Prop 3.2)"),
    "_mean_bwd": ("rule", "mean epsilon"),
    "_layer_norm_bwd": ("rule", "layer_norm epsilon"),
    "_rms_norm_identity_bwd": ("rule", "rms_norm identity (Prop 3.4)"),
    "_normalize_bwd": ("rule", "normalize identity"),
    # Pallas flash attention: the AttnLRP corrections wrap AROUND the kernel
    # (q,k /4 and v /2 upstream), so the kernel itself is rule-neutral
    "_flash_bwd": ("attention", "flash attention (rules wrap q/k/v)"),
    "_flash_lse_bwd": ("attention", "flash attention (rules wrap q/k/v)"),
}

#: pjit region names classified as elementwise nonlinearities: under the
#: identity rule they live INSIDE an identity_rule custom_vjp; seen naked
#: they get an entry (ok — G*I through a nonlinearity is defined, it's just
#: not the identity rule; the reference rates these "unknown"). Names are a
#: fast path only — regions under ANY other name are recognized by CONTENT
#: (:func:`_elementwise_nonlin_content`), the way the reference's WHITELIST
#: rates unknown fns explicitly (lxt/explicit/check.py:23-66) rather than
#: silently descending a user's custom activation as opaque plumbing.
_NONLIN_NAMES = {"silu", "gelu", "relu", "tanh", "sigmoid", "logistic",
                 "quick_gelu", "softmax", "log_softmax", "squareplus"}

_BILINEAR = {"mul", "dot_general", "conv_general_dilated"}

#: primitives an elementwise-nonlinearity region may contain. Deliberately
#: absent: reductions, dot/conv, gather/scatter, control flow, and
#: stop_gradient (a region containing one must be DESCENDED so its
#: 'blocked' entry is recorded and flags propagate correctly).
_ELEMENTWISE_OK = {
    "add", "sub", "mul", "div", "rem", "max", "min", "neg", "abs", "sign",
    "floor", "ceil", "round", "clamp", "select_n", "pow", "integer_pow",
    "exp", "exp2", "expm1", "log", "log1p", "tanh", "logistic", "erf",
    "erfc", "erf_inv", "rsqrt", "sqrt", "cbrt", "square", "sin", "cos",
    "tan", "asin", "acos", "atan", "atan2", "sinh", "cosh", "asinh",
    "acosh", "atanh", "ge", "gt", "le", "lt", "eq", "ne", "and", "or",
    "not", "xor", "is_finite", "nextafter", "convert_element_type", "copy",
    "broadcast_in_dim", "reshape",
}

#: the subset that makes a region NONLINEAR (pure add/mul-by-constant
#: regions are affine plumbing — descending them is fine and cheaper)
_NONLIN_MARKERS = {
    "max", "min", "clamp", "select_n", "pow", "integer_pow", "exp", "exp2",
    "expm1", "log", "log1p", "tanh", "logistic", "erf", "erfc", "erf_inv",
    "rsqrt", "sqrt", "cbrt", "sin", "cos", "tan", "asin", "acos", "atan",
    "atan2", "sinh", "cosh", "asinh", "acosh", "atanh",
}

#: "jit" is the pjit primitive's name in current JAX; keep "pjit" for older
_REGION_PRIMS = ("jit", "pjit", "closed_call", "custom_jvp_call", "remat2",
                 "checkpoint")


def _elementwise_nonlin_content(jaxpr, depth=0):
    """``(is_elementwise, has_nonlinear_marker)`` for a region body: True
    when every primitive (recursing through nested call regions) is
    elementwise — so a SINGLE-activation-input region is a pointwise
    nonlinearity of that input, whatever its name. Early-exits at the first
    structural primitive, so scanning big opaque regions is cheap."""
    if depth > 6:
        return False, False
    has_marker = False
    for eqn in jaxpr.eqns:
        p = eqn.primitive.name
        subs = _sub_jaxprs(eqn)
        if subs:
            if p not in _REGION_PRIMS:
                return False, False       # scan/while/cond: structural
            ok, m = _elementwise_nonlin_content(subs[0][1], depth + 1)
            if not ok:
                return False, False
            has_marker = has_marker or m
            continue
        if p not in _ELEMENTWISE_OK:
            return False, False
        has_marker = has_marker or p in _NONLIN_MARKERS
    return True, has_marker


def _bwd_name(eqn):
    bwd = eqn.params.get("bwd")
    core = getattr(bwd, "f", bwd)
    return getattr(core, "__name__", str(bwd))


def _sub_jaxprs(eqn):
    """(name, jaxpr) pairs of an eqn's nested jaxprs."""
    out = []
    for key in ("jaxpr", "call_jaxpr", "cond_jaxpr", "body_jaxpr"):
        if key in eqn.params:
            j = eqn.params[key]
            out.append((key, getattr(j, "jaxpr", j)))
    for b in eqn.params.get("branches", ()):  # lax.cond / lax.switch
        out.append(("branch", getattr(b, "jaxpr", b)))
    return out


def _softmax_div(eqn, producer, eqns):
    """True when a ``div`` is the softmax normalization: numerator produced
    by ``exp`` and denominator a (broadcast/reshaped/converted) ``reduce_sum``
    of that same exp output."""
    num, den = eqn.invars[0], eqn.invars[1]
    pe = producer.get(id(num))
    if pe is None or eqns[pe].primitive.name != "exp":
        return False
    v = den
    for _ in range(6):
        de = producer.get(id(v))
        if de is None:
            return False
        p = eqns[de].primitive.name
        if p == "reduce_sum":
            return id(eqns[de].invars[0]) == id(num)
        if p in ("broadcast_in_dim", "reshape", "convert_element_type",
                 "slice", "add"):
            v = eqns[de].invars[0]
            continue
        return False
    return False


class _Auditor:
    def __init__(self):
        self.entries: List[AuditEntry] = []

    # -- flag propagation ---------------------------------------------------
    # act: value derives from the traced function's inputs (carries
    #      relevance); touched: every relevance path into it has passed
    #      through a rule primitive.

    def walk(self, jaxpr, act_in, touched_in, path, silent=False):
        """Walk one jaxpr body; returns (act, touched) flags of its outputs.

        ``silent=True`` propagates flags without recording entries (used
        inside recognized rule regions and repeat passes of loop bodies).
        """
        act = {id(v): a for v, a in zip(jaxpr.invars, act_in)}
        touched = {id(v): t for v, t in zip(jaxpr.invars, touched_in)}
        for v in jaxpr.constvars:
            act[id(v)] = touched[id(v)] = False

        def get(v, table, default=False):
            return default if isinstance(v, _Literal) \
                else table.get(id(v), False)

        # deferred bilinear verdicts: (entry-index, outvar ids) — resolved
        # after the body walk once consumer info exists
        pending = []
        consumers = {}  # var id -> list of eqn indices
        eqns = list(jaxpr.eqns)
        for i, eqn in enumerate(eqns):
            for v in eqn.invars:
                if not isinstance(v, _Literal):
                    consumers.setdefault(id(v), []).append(i)

        producer = {}  # var id -> producing eqn index
        for i, eqn in enumerate(eqns):
            for v in eqn.outvars:
                producer[id(v)] = i

        eqn_kind = {}  # eqn index -> 'rule' | 'stop' | other
        for i, eqn in enumerate(eqns):
            prim = eqn.primitive.name
            in_act = [get(v, act) for v in eqn.invars]
            in_touch = [get(v, touched) for v in eqn.invars]
            any_act = any(in_act)
            # touched-ness of the combination: every activation input
            # already corrected
            all_touch = any_act and all(
                t or not a for a, t in zip(in_act, in_touch))

            out_act, out_touch = any_act, all_touch

            if prim == "stop_gradient":
                # relevance terminated
                out_act, out_touch = False, False
                eqn_kind[i] = "stop"
                if any_act and not silent:
                    self._add(path, "stop_gradient", eqn, "blocked",
                              "relevance blocked (CP / norm path)", True)
            elif prim == "custom_vjp_call":
                name = _bwd_name(eqn)
                if name in RULE_BWD:
                    kind, rule = RULE_BWD[name]
                    eqn_kind[i] = "rule"
                    out_touch = any_act
                    if not silent:
                        self._add(path, name.strip("_").replace("_bwd", ""),
                                  eqn, kind, rule, True)
                else:
                    out_act, out_touch = self._descend(
                        eqn, in_act, in_touch, path, prim, silent=True)
            elif prim in _REGION_PRIMS:
                name = eqn.params.get("name", prim)
                is_nonlin = name in _NONLIN_NAMES
                if not is_nonlin and any_act and sum(in_act) == 1:
                    # content-based recognition: a single-activation-input
                    # region of purely elementwise primitives IS a pointwise
                    # nonlinearity, whatever the user named it
                    subs = _sub_jaxprs(eqn)
                    if subs:
                        ew, marker = _elementwise_nonlin_content(subs[0][1])
                        is_nonlin = ew and marker
                if is_nonlin and any_act:
                    # classify the region as one site; treat as elementwise
                    if not silent:
                        ok = True
                        rule = ("governed upstream (G*I through "
                                f"{name})" if all_touch else
                                f"plain autodiff through {name} (no "
                                "identity rule)")
                        self._add(path, name, eqn, "nonlinearity", rule, ok)
                    out_act, out_touch = any_act, all_touch
                else:
                    out_act, out_touch = self._descend(
                        eqn, in_act, in_touch, path if name == prim
                        else f"{path}/{name}", prim, silent=silent)
            elif prim == "scan":
                out_act, out_touch = self._scan(eqn, in_act, in_touch,
                                                path, silent)
            elif prim == "while":
                out_act, out_touch = self._while(eqn, in_act, in_touch,
                                                 path, silent)
            elif prim in ("cond",):
                outs = [self.walk(j, in_act[1:], in_touch[1:],
                                  f"{path}/cond", silent=silent)
                        for _, j in _sub_jaxprs(eqn)]
                out_act = any(a for o in outs for a in o[0])
                out_touch = all(t for o in outs for t in o[1])
                for v in eqn.outvars:
                    act[id(v)], touched[id(v)] = out_act, out_touch
                continue
            elif prim == "dot_general" or prim == "conv_general_dilated":
                n_act = sum(in_act[:2])
                if n_act == 1 and not silent:
                    self._add(path, prim, eqn, "linear",
                              "epsilon rule (implicit via G*I)", True)
                elif n_act >= 2 and not silent:
                    self._bilinear(path, prim, eqn, i, all_touch, pending)
            elif prim in ("mul", "div"):
                if sum(in_act) >= 2 and not silent:
                    if prim == "div" and _softmax_div(eqn, producer, eqns):
                        # exp(x)/sum(exp(x)): the softmax normalization —
                        # Deep-Taylor Prop 3.1 holds implicitly under G*I
                        # (the reference leaves softmax untouched for the
                        # same reason, patches.py:196-206)
                        self._add(path, "softmax", eqn, "nonlinearity",
                                  "softmax Deep-Taylor (Prop 3.1, implicit "
                                  "via G*I)", True)
                    else:
                        self._bilinear(path, prim, eqn, i, all_touch,
                                       pending)

            for v in eqn.outvars:
                act[id(v)] = out_act
                touched[id(v)] = out_touch

        if pending and not silent:
            self._resolve_pending(jaxpr, eqns, consumers, eqn_kind, pending)

        return ([get(v, act) for v in jaxpr.outvars],
                [get(v, touched) for v in jaxpr.outvars])

    def _bilinear(self, path, prim, eqn, eqn_idx, all_touch, pending):
        idx = len(self.entries)
        rule = ("operands rule-corrected upstream (uniform/CP)"
                if all_touch else "UNRULED bilinear op")
        self._add(path, prim, eqn, "bilinear", rule, all_touch)
        if not all_touch:
            pending.append((idx, eqn_idx, [id(v) for v in eqn.outvars]))

    # -- sub-structures -----------------------------------------------------

    def _descend(self, eqn, in_act, in_touch, path, prim, silent):
        subs = _sub_jaxprs(eqn)
        if not subs:
            any_act = any(in_act)
            return any_act, any_act and all(
                t or not a for a, t in zip(in_act, in_touch))
        _, j = subs[0]
        n = len(j.invars)
        # custom_jvp_call passes num_consts leading consts in invars already
        a = (in_act + [False] * n)[:n]
        t = (in_touch + [False] * n)[:n]
        oa, ot = self.walk(j, a, t, path, silent=silent)
        return any(oa), all(ot) if ot else False

    def _scan(self, eqn, in_act, in_touch, path, silent):
        j = eqn.params["jaxpr"].jaxpr
        nc, ncar = eqn.params["num_consts"], eqn.params["num_carry"]
        car_a = list(in_act[nc:nc + ncar])
        car_t = list(in_touch[nc:nc + ncar])
        base_a, base_t = in_act[:nc], in_touch[:nc]
        xs_a, xs_t = in_act[nc + ncar:], in_touch[nc + ncar:]
        # fixpoint over carried flags (monotone, converges in <= len+1 steps)
        for it in range(8):
            oa, ot = self.walk(j, base_a + car_a + xs_a,
                               base_t + car_t + xs_t,
                               f"{path}/scan", silent=True)
            new_a, new_t = oa[:ncar], ot[:ncar]
            if new_a == car_a and new_t == car_t:
                break
            car_a = [a or b for a, b in zip(car_a, new_a)]
            car_t = [x and y for x, y in zip(car_t, new_t)]
        if not silent:  # one recorded pass at the fixpoint
            oa, ot = self.walk(j, base_a + car_a + xs_a,
                               base_t + car_t + xs_t, f"{path}/scan")
        return any(oa), all(ot) if ot else False

    def _while(self, eqn, in_act, in_touch, path, silent):
        j = eqn.params["body_jaxpr"].jaxpr
        cn = eqn.params["cond_nconsts"]
        bn = eqn.params["body_nconsts"]
        consts_a = in_act[cn:cn + bn]
        consts_t = in_touch[cn:cn + bn]
        car_a = list(in_act[cn + bn:])
        car_t = list(in_touch[cn + bn:])
        for it in range(8):
            oa, ot = self.walk(j, consts_a + car_a, consts_t + car_t,
                               f"{path}/while", silent=True)
            if oa == car_a and ot == car_t:
                break
            car_a = [a or b for a, b in zip(car_a, oa)]
            car_t = [x and y for x, y in zip(car_t, ot)]
        if not silent:
            oa, ot = self.walk(j, consts_a + car_a, consts_t + car_t,
                               f"{path}/while")
        return any(oa), all(ot) if ot else False

    # -- bilinear verdicts --------------------------------------------------

    def _resolve_pending(self, jaxpr, eqns, consumers, eqn_kind, pending):
        """Upgrade flagged bilinears whose product is corrected or blocked
        DOWNSTREAM, within this jaxpr body:

        - 'corrected': the product feeds a rule custom_vjp (possibly through
          shape/convert ops) before reaching anything else — the gated-MLP
          ``divide_gradient(g*up, 2)`` pattern;
        - 'dead': every consumer path ends in stop_gradient — e.g. the
          ``x*x`` variance product of a norm with a stop-gradient'd rsqrt.
        """
        out_ids = {id(v) for v in jaxpr.outvars}
        # ops a 'corrected' verdict may pass through: pure shape/dtype
        # plumbing. Passing through anything else (another mul, an add, a
        # reduction...) means a downstream rule corrects THAT op's output,
        # not this product — e.g. a chained a*b*c with one /2 must keep the
        # inner product flagged ('dead' may still traverse anything: if
        # every path ends in stop_gradient, no relevance flows, period).
        PASS = {"reshape", "transpose", "broadcast_in_dim", "squeeze",
                "expand_dims", "convert_element_type", "copy", "slice",
                "rev", "bitcast_convert_type"}

        def classify(var_ids, pure=True, depth=0):
            # returns 'corrected' | 'dead' | 'live'
            states = []
            for vid in var_ids:
                if vid in out_ids:
                    return "live"
                for ci in consumers.get(vid, []):
                    k = eqn_kind.get(ci)
                    if k == "rule":
                        states.append("corrected" if pure else "live")
                    elif k == "stop":
                        states.append("dead")
                    elif depth >= 12:
                        return "live"
                    else:
                        p = pure and eqns[ci].primitive.name in PASS
                        sub = classify([id(v) for v in eqns[ci].outvars],
                                       p, depth + 1)
                        states.append(sub)
                if not consumers.get(vid) and vid not in out_ids:
                    states.append("dead")
            if "live" in states:
                return "live"
            if not states:
                return "dead"
            return "corrected" if "corrected" in states else "dead"

        for entry_idx, eqn_idx, out_vids in pending:
            verdict = classify(out_vids)
            if verdict == "live":
                continue
            e = self.entries[entry_idx]
            rule = ("uniform/CP rule applied to the product downstream"
                    if verdict == "corrected" else
                    "no relevance flows (all paths stop-gradient'd)")
            self.entries[entry_idx] = dataclasses.replace(
                e, ok=True, rule=rule,
                kind="bilinear" if verdict == "corrected" else "blocked")

    def _add(self, path, op, eqn, kind, rule, ok):
        aval = eqn.outvars[0].aval
        shape = f"{aval.dtype.name}{list(aval.shape)}" \
            if hasattr(aval, "dtype") else str(aval)
        self.entries.append(AuditEntry(site=path or "root", op=op,
                                       shape=shape, kind=kind, rule=rule,
                                       ok=ok))


def audit(fn: Callable, *example_args, on_unruled: str = "warn",
          verbose: bool = True) -> List[AuditEntry]:
    """Trace ``fn`` on ``example_args`` and report the LRP rule governing
    every relevance-relevant op in its jaxpr.

    ``fn``'s ARGUMENTS are treated as relevance-carrying activations; close
    parameters/weights over instead of passing them (a ``dot_general`` with
    one closed-over operand is the implicit epsilon rule; with two
    activation operands it must be governed by a rule).

    ``on_unruled``: 'warn' (default) emits a ``UserWarning`` per unruled
    bilinear, 'raise' raises :class:`UnruledOpError`, 'ignore' just returns
    the entries.

    Returns the machine-readable entry list; with ``verbose`` also prints
    the table (the reference's verbose register table,
    lxt/explicit/core.py:305-336).
    """
    if on_unruled not in ("warn", "raise", "ignore"):
        raise ValueError("on_unruled must be 'warn', 'raise' or 'ignore'")
    closed = jax.make_jaxpr(fn)(*example_args)
    auditor = _Auditor()
    n = len(closed.jaxpr.invars)
    auditor.walk(closed.jaxpr, [True] * n, [False] * n, "")

    entries = auditor.entries
    bad = [e for e in entries if not e.ok]
    if verbose:
        print(f"rule audit: {len(entries)} sites, "
              f"{len(bad)} unruled")
        for e in entries:
            print(e.row())
    if bad:
        msg = (f"{len(bad)} bilinear op(s) with activation-derived operands "
               f"carry no LRP rule: "
               + "; ".join(f"{e.op} at {e.site} {e.shape}" for e in bad[:8]))
        if on_unruled == "raise":
            raise UnruledOpError(msg)
        if on_unruled == "warn":
            import warnings
            warnings.warn(msg)
    return entries
