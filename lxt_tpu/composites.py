"""Composites: declarative rule assignments for model forward passes.

The reference configures LRP by monkey-patching torch classes with per-model
patch maps (``lxt/efficient/models/*.py``) or by registering a ``Composite``
of rules onto module trees (``lxt/explicit/core.py``). JAX models are pure
functions, so here a :class:`Composite` is a frozen config object passed into
the model forward; model code calls its methods (``act``, ``qkv``,
``gated_mul``, ``rms_norm``, ``layer_norm``, ``linear``, ``conv2d``) at each
rule site. Because the composite is static at trace time, each composite
compiles to its own fused XLA program — zero runtime dispatch cost.

Predefined composites mirror the reference's exports:

- :data:`attnlrp` — AttnLRP rules (ICML 2024): identity on nonlinearities and
  norms, uniform on bilinear ops (matmul/gating), Deep-Taylor softmax
  (implicit via Gradient*Input through standard softmax).
- :data:`cp_lrp`  — CP-LRP: relevance blocked through softmax (stop-grad q,k)
  and through the MLP gate branch. Recommended by the reference for GPT-2
  (negative logits, models/gpt2.py:24-26) and ViTs.
- :data:`vanilla_gradient` — plain Gradient*Input (no LRP rules), a baseline.

Gamma variants for ViT denoising replace the reference's zennit dependency
(``lxt/efficient/zennit_patches.py``): ``attnlrp.with_gamma(conv_gamma=...,
linear_gamma=...)`` applies the native gamma rule to convs/linears.
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from lxt_tpu.ops.rules import (
    alphabeta_conv2d,
    alphabeta_linear,
    divide_gradient,
    gamma_conv2d,
    gamma_linear,
    identity_rule,
    modz_conv2d,
    modz_linear,
    stop_gradient,
)


def _norm_rule_spec(rule):
    """Canonicalize a linear/conv rule spec: None, ("gamma", g),
    ("alphabeta", a, b) with a - b = 1, ("zplus",) -> ("alphabeta", 1, 0),
    ("flat",), ("wsquare",), ("zbox", low, high) (scalar input bounds),
    ("epsilon",)/("pass",) -> None (epsilon is already the implicit G*I
    behavior; zennit's Pass keeps plain gradient)."""
    if rule is None:
        return None
    if isinstance(rule, str):
        rule = (rule,)
    kind = rule[0]
    if kind in ("epsilon", "pass"):
        return None
    if kind == "gamma":
        return ("gamma", float(rule[1]))
    if kind == "zplus":
        return ("alphabeta", 1.0, 0.0)
    if kind == "alphabeta":
        a, b = float(rule[1]), float(rule[2])
        if abs(a - b - 1.0) > 1e-6:
            raise ValueError(
                f"alphabeta needs alpha - beta = 1 (conservation), got "
                f"alpha={a}, beta={b}")
        return ("alphabeta", a, b)
    if kind in ("flat", "wsquare"):
        return (kind,)
    if kind == "zbox":
        low, high = float(rule[1]), float(rule[2])
        if not low < high:
            raise ValueError(f"zbox needs low < high, got {low}, {high}")
        return ("zbox", low, high)
    raise ValueError(
        f"unknown rule spec {rule!r}; use None, 'epsilon', 'pass', "
        f"('gamma', g), ('alphabeta', a, b), 'zplus', 'flat', 'wsquare' "
        f"or ('zbox', low, high)")


def _rule_text(rule):
    if rule is None:
        return "epsilon rule (implicit via G*I)"
    if rule[0] == "gamma":
        return f"gamma rule (gamma={rule[1]})"
    if rule[0] == "flat":
        return "flat rule (uniform over fan-in)"
    if rule[0] == "wsquare":
        return "w^2 rule (weight-magnitude redistribution)"
    if rule[0] == "zbox":
        return f"z-box rule (input bounds [{rule[1]}, {rule[2]}])"
    if rule[1:] == (1.0, 0.0):
        return "z+ rule (alphabeta 1,0)"
    return f"alpha-beta rule (alpha={rule[1]}, beta={rule[2]})"


@dataclasses.dataclass(frozen=True)
class Composite:
    """Static assignment of LRP rules to model rule-sites.

    Fields select the rule at each site; model code consults the composite via
    the methods below. All fields are hashable, so a Composite can be a static
    argument to ``jax.jit``.
    """

    name: str = "attnlrp"
    #: 'identity' -> identity rule on elementwise nonlinearities (Eq. 9);
    #: 'vanilla' -> ordinary autodiff.
    activation: str = "identity"
    #: 'uniform' -> gate*up gets the uniform rule (divide by 2);
    #: 'cp' -> stop-grad through the gate branch; 'vanilla' -> autodiff.
    gate: str = "uniform"
    #: 'attnlrp' -> q,k grads /4 and v grads /2 around any attention kernel
    #: (reference patches.py:196-206); 'cp' -> stop-grad q,k; 'vanilla'.
    attention: str = "attnlrp"
    #: 'identity' -> stop-grad through std/rsqrt in norms (Prop. 3.4);
    #: 'vanilla' -> ordinary autodiff.
    norm: str = "identity"
    #: gamma-rule strength for conv layers (ViT), None = plain autodiff.
    conv_gamma: Optional[float] = None
    #: gamma-rule strength for linear layers (ViT), None = plain autodiff.
    linear_gamma: Optional[float] = None
    #: explicit LRP rule for linear layers, superseding ``linear_gamma``:
    #: None (epsilon implicit via G*I), ("gamma", g), ("alphabeta", a, b)
    #: (a - b = 1), or ("zplus",) == ("alphabeta", 1, 0). The zennit rule
    #: zoo the reference composes through zennit LayerMapComposites
    #: (examples/vit_torch.py:59-65), implemented natively.
    linear_rule: Optional[tuple] = None
    #: explicit LRP rule for conv layers (same forms as ``linear_rule``).
    conv_rule: Optional[tuple] = None
    #: per-SITE rule overrides: sorted tuple of ``(site_name, rule_spec)``
    #: pairs (see :meth:`override_sites`). Sites are the model's parameter
    #: leaf names (the same names :data:`lxt_tpu.ops.quant.
    #: FAMILY_QUANTIZABLE` uses): llama ``wq wk wv wo wg wu wd``, ViT
    #: ``conv_w w_qkv w_proj w_fc w_out head_w`` ... A site entry wins
    #: over ``linear_rule``/``conv_rule``; an entry whose spec is None pins
    #: that site back to implicit epsilon. Restores the reference's
    #: type/name-keyed rule maps (explicit/core.py:10-41, zennit
    #: LayerMapComposite in examples/vit_torch.py:59-65) — the JAX model
    #: names each call site instead of keying on module types.
    site_rules: tuple = ()
    #: per-layer-depth overrides: tuple of ``(selector, changes)`` where
    #: ``selector`` is an int layer index or a half-open ``(start, stop)``
    #: range (``stop=None`` = to the end) and ``changes`` is a tuple of
    #: ``(field, value)`` pairs. Later entries win. Rules are trace-time
    #: static, so models run their layer stack UNROLLED (one compiled body
    #: per distinct per-layer composite) when overrides are present —
    #: :meth:`for_layer` resolves the composite at each static depth.
    #: Replaces the reference's per-layer zennit rule maps
    #: (vit_torch.py:59-65) and {type: rule} dicts (explicit/core.py:10-41).
    layer_overrides: tuple = ()

    # -- rule sites ---------------------------------------------------------

    def act(self, fn, x):
        """Elementwise nonlinearity (SiLU/GELU/tanh...)."""
        if self.activation == "identity":
            return identity_rule(fn, x)
        return fn(x)

    def qkv(self, q, k, v):
        """Correct relevance flow at the attention inputs; wraps ANY attention
        implementation (einsum or Pallas flash) — reference patches.py:171-206."""
        if self.attention == "attnlrp":
            return divide_gradient(q, 4), divide_gradient(k, 4), divide_gradient(v, 2)
        if self.attention == "cp":
            return stop_gradient(q), stop_gradient(k), v
        return q, k, v

    def gated_mul(self, act_fn, gate_out, up_out):
        """Gated-MLP joint: act(gate) * up — reference patches.py:145-157 and
        cp variant patches.py:275-283."""
        if self.gate == "uniform":
            g = self.act(act_fn, gate_out)
            return divide_gradient(g * up_out, 2)
        if self.gate == "cp":
            return act_fn(stop_gradient(gate_out)) * up_out
        return act_fn(gate_out) * up_out

    def mul_uniform(self, a, b):
        """Generic bilinear elementwise product (e.g. MoE routing weights)."""
        if self.gate == "cp":
            return stop_gradient(a) * b
        if self.gate == "uniform":
            return divide_gradient(a * b, 2)
        return a * b

    def rms_norm(self, x, weight, eps, offset=0.0):
        """RMSNorm with the identity rule via stop-grad through rsqrt(var)
        (reference patches.py:111-123). ``offset=1.0`` gives the Gemma (1+w)
        convention. Computed in float32, cast back (torch parity)."""
        dt = x.dtype
        x32 = x.astype(jnp.float32)
        var = (x32 * x32).mean(axis=-1, keepdims=True)
        rs = jax.lax.rsqrt(var + eps)
        if self.norm == "identity":
            rs = stop_gradient(rs)
        y = (x32 * rs).astype(dt)
        return (offset + weight) * y

    def layer_norm(self, x, weight, bias, eps):
        """LayerNorm with stop-grad through std (reference patches.py:126-142).
        Statistics in float32, cast back (torch computes bf16 LayerNorm with
        float accumulation — same parity rationale as :meth:`rms_norm`)."""
        dt = x.dtype
        x32 = x.astype(jnp.float32)
        mu = x32.mean(axis=-1, keepdims=True)
        var = ((x32 - mu) ** 2).mean(axis=-1, keepdims=True)
        std = jnp.sqrt(var + eps)
        if self.norm == "identity":
            std = stop_gradient(std)
        y = ((x32 - mu) / std).astype(dt)
        if weight is not None:
            y = y * weight
        if bias is not None:
            y = y + bias
        return y

    def _linear_rule(self):
        if self.linear_rule is not None:
            return _norm_rule_spec(self.linear_rule)
        if self.linear_gamma is not None:
            return ("gamma", self.linear_gamma)
        return None

    def _conv_rule(self):
        if self.conv_rule is not None:
            return _norm_rule_spec(self.conv_rule)
        if self.conv_gamma is not None:
            return ("gamma", self.conv_gamma)
        return None

    def _site_rule(self, site, default):
        """Site-keyed rule lookup: an override_sites entry wins over the
        layer-wide default; a site explicitly set to None pins epsilon."""
        if site is not None:
            for s, spec in self.site_rules:
                if s == site:
                    return spec
        return default

    def linear(self, x, w, b=None, site=None):
        """Dense layer, ``w: [in, out]``. Under Gradient*Input, a plain linear
        already implements the epsilon rule; gamma/alpha-beta/z+ composites
        redistribute explicitly (``linear_rule``).
        Accepts int8/int4/nf4 :class:`~lxt_tpu.ops.quant.QuantizedTensor`
        weights — the dequantization fuses into the matmul (int4 runs as two
        half-contraction matmuls over the nibble planes, see
        :func:`~lxt_tpu.ops.quant.quant_matmul`); weights carry no relevance
        under LRP, so rules are untouched. ``site``: the model's name for
        this call site (its parameter leaf name) — consulted against
        :attr:`site_rules` before the layer-wide default."""
        from lxt_tpu.ops.quant import QuantizedTensor, dequantize, quant_matmul
        rule = self._site_rule(site, self._linear_rule())
        if isinstance(w, QuantizedTensor):
            if rule is None:
                return quant_matmul(x, w, b)
            w = dequantize(w, x.dtype)
        if rule is None:
            y = jnp.matmul(x, w)
            return y if b is None else y + b
        if rule[0] == "gamma":
            return gamma_linear(x, w, b, rule[1])
        if rule[0] in ("flat", "wsquare", "zbox"):
            return modz_linear(x, w, b, rule)
        return alphabeta_linear(x, w, b, rule[1], rule[2])

    def conv2d(self, x, w, b=None, strides=(1, 1), padding="VALID",
               site=None):
        """NHWC conv; gamma/alpha-beta rule if configured (ViT patch
        embedding). ``site`` as in :meth:`linear`."""
        rule = self._site_rule(site, self._conv_rule())
        if rule is not None:
            if rule[0] == "gamma":
                return gamma_conv2d(x, w, b, strides, padding, rule[1])
            if rule[0] in ("flat", "wsquare", "zbox"):
                return modz_conv2d(x, w, b, strides, padding, rule)
            return alphabeta_conv2d(x, w, b, strides, padding,
                                    rule[1], rule[2])
        out = jax.lax.conv_general_dilated(
            x, w, window_strides=strides, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out if b is None else out + b

    def with_gamma(self, conv_gamma=None, linear_gamma=None):
        """Derive a gamma-rule variant (ViT denoising, replaces zennit).
        An omitted (None) argument keeps the current value for that site."""
        return dataclasses.replace(
            self,
            conv_gamma=self.conv_gamma if conv_gamma is None else conv_gamma,
            linear_gamma=(self.linear_gamma if linear_gamma is None
                          else linear_gamma),
            name=self.name if self.name.endswith("+gamma")
            else f"{self.name}+gamma")

    def with_rules(self, linear="keep", conv="keep"):
        """Derive a variant with explicit linear/conv LRP rules — the zennit
        rule-zoo surface (reference vit_torch.py:59-65 composes zennit
        LayerMapComposites of Gamma rules; AlphaBeta/ZPlus/Flat/WSquare/
        ZBox/Pass come from the same zoo). Specs: None/'epsilon'/'pass'
        (implicit epsilon via G*I), ('gamma', g), ('alphabeta', a, b),
        'zplus', 'flat', 'wsquare', ('zbox', low, high). 'keep' leaves the
        current value. ZBox is the canonical first-layer rule for bounded
        pixel inputs — combine with :meth:`override_layers` or apply it to
        ``conv`` (the only conv in a ViT is the patch embedding)."""
        lr = self.linear_rule if linear == "keep" else _norm_rule_spec(linear)
        cr = self.conv_rule if conv == "keep" else _norm_rule_spec(conv)
        return dataclasses.replace(
            self, linear_rule=lr, conv_rule=cr,
            name=f"{self.name}+rules" if not self.name.endswith("+rules")
            else self.name)

    def override_sites(self, **site_specs):
        """Derive a variant with per-SITE linear/conv rules — "z-box on the
        patch-embed conv, gamma on the MLP linears only". Keys are the
        model's parameter leaf names (ViT: ``conv_w``, ``w_qkv``,
        ``w_proj``, ``w_fc``, ``w_out``, ``head_w``; llama: ``wq wk wv wo
        wg wu wd``; see :data:`lxt_tpu.ops.quant.FAMILY_QUANTIZABLE`),
        values any :meth:`with_rules` spec (None pins implicit epsilon for
        that site even when a layer-wide rule is set). Later calls win per
        site; composes with :meth:`override_layers` (a depth override of
        ``linear_rule`` still loses to a site entry at that site).

        Example — the reference's zennit LayerMapComposite shape
        (examples/vit_torch.py:59-65), natively::

            comp = cp_lrp.override_sites(
                conv_w=("zbox", 0.0, 1.0),
                w_fc=("gamma", 0.25), w_out=("gamma", 0.25))
        """
        merged = dict(self.site_rules)
        for k, v in site_specs.items():
            merged[k] = _norm_rule_spec(v)
        return dataclasses.replace(
            self, site_rules=tuple(sorted(merged.items())),
            name=self.name if self.name.endswith("+sites")
            else f"{self.name}+sites")

    # -- per-layer-depth rule maps -------------------------------------------

    def override_layers(self, layers, **changes):
        """Return a variant whose rule fields change on the selected layer
        DEPTHS — the per-layer rule maps the reference builds with zennit
        LayerMapComposites and {type: rule} dicts (vit_torch.py:59-65,
        explicit/core.py:10-41). ``layers``: an int depth or a half-open
        ``(start, stop)`` range (``stop=None`` = through the last layer;
        negative indices count from the end). Later overrides win.

        Example — gamma on the first 4 blocks only::

            comp = cp_lrp.override_layers((0, 4), linear_rule=("gamma", 0.25))

        Models consult :meth:`for_layer` at each STATIC depth; with
        overrides present the layer stack runs unrolled (rules are
        trace-time static), trading compile time for per-depth rules.
        """
        valid = {f.name for f in dataclasses.fields(self)} - {
            "name", "layer_overrides"}
        for k in changes:
            if k not in valid:
                raise ValueError(f"unknown Composite field {k!r}; "
                                 f"overridable: {sorted(valid)}")
        if isinstance(layers, int):
            i = int(layers)
            # int -1 means "the last layer": (-1, 0) would resolve stop=0
            # as an absolute index and match nothing, so use open-ended
            sel = (i, None) if i == -1 else (i, i + 1)
        else:
            sel = (int(layers[0]),
                   None if layers[1] is None else int(layers[1]))
        norm = {}
        for k, v in changes.items():
            if k in ("linear_rule", "conv_rule"):
                v = _norm_rule_spec(v)
            norm[k] = v
        entry = (sel, tuple(sorted(norm.items())))
        return dataclasses.replace(
            self, layer_overrides=self.layer_overrides + (entry,),
            name=f"{self.name}+L{sel[0]}:{sel[1]}")

    def for_layer(self, i: int, num_layers: Optional[int] = None):
        """Resolve the composite governing STATIC layer depth ``i``
        (0-based). Models with a stacked-layer driver call this per depth
        when :attr:`layer_overrides` is non-empty; the result carries no
        further overrides."""
        if not self.layer_overrides:
            return self
        fields = {}
        for (start, stop), changes in self.layer_overrides:
            lo = start if start >= 0 else (
                None if num_layers is None else start + num_layers)
            hi = (num_layers if stop is None else
                  (stop if stop >= 0 else
                   (None if num_layers is None else stop + num_layers)))
            if lo is None or (hi is None and stop is not None and stop < 0):
                raise ValueError(
                    "negative layer_overrides indices need num_layers")
            if lo <= i and (hi is None or i < hi):
                fields.update(dict(changes))
        return dataclasses.replace(self, layer_overrides=(), **fields)

    def summary(self, verbose: bool = True) -> str:
        """Human-readable audit of the rule assigned at every site — parity
        with the reference Composite's verbose table (explicit/core.py:
        305-336 + check.py WHITELIST). Rules are static per composite, so
        the table is exact for every model run under it."""
        rows = [
            ("elementwise nonlinearities", {
                "identity": "identity rule (Eq. 9)",
                "vanilla": "plain autodiff"}[self.activation]),
            ("gated-MLP product", {
                "uniform": "uniform rule, /2 (Eq. 7)",
                "cp": "stop-gradient through gate branch (CP-LRP)",
                "vanilla": "plain autodiff"}[self.gate]),
            ("attention q/k/v", {
                "attnlrp": "uniform rule: q,k /4 and v /2 (AttnLRP)",
                "cp": "stop-gradient on q,k (CP-LRP)",
                "vanilla": "plain autodiff"}[self.attention]),
            ("softmax", "Deep-Taylor Prop 3.1 (implicit via G*I)"
             if self.attention == "attnlrp" else
             ("relevance blocked (CP)" if self.attention == "cp"
              else "plain autodiff")),
            ("norm denominators", {
                "identity": "identity rule via stop-grad std (Prop 3.4)",
                "vanilla": "plain autodiff"}[self.norm]),
            ("linear layers", _rule_text(self._linear_rule())),
            ("conv layers", _rule_text(self._conv_rule())),
            ("biases", "relevance sink (absorbed, as in the reference)"),
        ]
        for site, spec in self.site_rules:
            rows.append((f"site '{site}'", _rule_text(spec)))
        for (start, stop), changes in self.layer_overrides:
            span = f"layers [{start}, {'end' if stop is None else stop})"
            rows.append((span, ", ".join(f"{k}={v!r}" for k, v in changes)))
        width = max(len(site) for site, _ in rows)
        lines = [f"Composite '{self.name}'"]
        lines += [f"  {site.ljust(width)}  ->  {rule}" for site, rule in rows]
        text = "\n".join(lines)
        if verbose:
            print(text)
        return text


attnlrp = Composite(name="attnlrp")
cp_lrp = Composite(name="cp_lrp", attention="cp", gate="cp")
vanilla_gradient = Composite(
    name="vanilla_gradient", activation="vanilla", gate="vanilla",
    attention="vanilla", norm="vanilla")


def resolve(composite) -> Composite:
    """Accept a :class:`Composite` or one of the predefined names
    ('attnlrp', 'cp_lrp', 'vanilla_gradient'); reject anything else with a
    clear error instead of a deep trace-time AttributeError."""
    if isinstance(composite, Composite):
        return composite
    by_name = {"attnlrp": attnlrp, "cp_lrp": cp_lrp,
               "vanilla_gradient": vanilla_gradient}
    if isinstance(composite, str):
        if composite in by_name:
            return by_name[composite]
        raise ValueError(
            f"unknown composite name {composite!r}; predefined names are "
            f"{sorted(by_name)} (or pass a lxt_tpu.Composite instance)")
    raise TypeError(
        f"composite must be a lxt_tpu.Composite or one of {sorted(by_name)}, "
        f"got {type(composite).__name__}")
