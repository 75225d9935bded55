"""Traced-model rule audit (lxt_tpu.rule_audit): the jaxpr walk must tag
every rule site, accept the implicit-epsilon linears, and flag bilinear ops
that carry no rule — the dynamic counterpart of the reference's verbose
register table + WHITELIST/BLACKLIST vetting (lxt/explicit/core.py:305-336,
check.py:23-66)."""

import warnings

import jax
import jax.numpy as jnp
import pytest

import lxt_tpu
from lxt_tpu.ops.rules import divide_gradient, identity_rule
from lxt_tpu.rule_audit import UnruledOpError, audit


def _run(fn, *args):
    return audit(fn, *args, on_unruled="ignore", verbose=False)


def _unruled(entries):
    return [e for e in entries if not e.ok]


# ---------------------------------------------------------------------------
# model-level tables
# ---------------------------------------------------------------------------

def test_llama_attnlrp_clean_and_tagged():
    from lxt_tpu.models import llama as jllama

    cfg = jllama.LlamaConfig(vocab_size=64, hidden_size=32,
                             intermediate_size=64, num_layers=2,
                             num_heads=2, num_kv_heads=2)
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    e = jnp.zeros((1, 8, 32))

    entries = _run(
        lambda x: jllama.forward(params, cfg, x, lxt_tpu.attnlrp).logits, e)
    assert not _unruled(entries)
    kinds = {e.kind for e in entries}
    assert {"rule", "linear", "bilinear", "blocked"} <= kinds
    # the q/k/v uniform rules and the gated-MLP identity rule are present
    rules = [e.rule for e in entries]
    assert any("uniform rule /k" in r for r in rules)
    assert any("identity rule" in r for r in rules)
    # attention products are recognized as operand-corrected
    assert any("operands rule-corrected" in r for r in rules)
    # the gated product is recognized as corrected downstream
    assert any("product downstream" in r for r in rules)


@pytest.mark.parametrize("family", ["gpt2", "bert", "mixtral", "vit"])
def test_family_default_composites_clean(family):
    if family == "gpt2":
        from lxt_tpu.models import gpt2 as m
        cfg = m.GPT2Config(vocab_size=64, hidden_size=32, num_layers=2,
                           num_heads=2, max_positions=16)
        x = jnp.zeros((1, 8, 32))
        comp = lxt_tpu.cp_lrp  # the reference's recommendation for GPT-2
    elif family == "bert":
        from lxt_tpu.models import bert as m
        cfg = m.BertConfig(vocab_size=64, hidden_size=32,
                           intermediate_size=64, num_layers=2, num_heads=2)
        x = jnp.zeros((1, 8, 32))
        comp = lxt_tpu.attnlrp
    elif family == "mixtral":
        from lxt_tpu.models import mixtral as m
        cfg = m.MixtralConfig(vocab_size=64, hidden_size=32,
                              intermediate_size=64, num_layers=2,
                              num_heads=2, num_kv_heads=2, num_experts=4,
                              experts_per_token=2)
        x = jnp.zeros((1, 8, 32))
        comp = lxt_tpu.attnlrp
    else:
        from lxt_tpu.models import vit as m
        cfg = m.ViTConfig(image_size=32, patch_size=8, hidden_size=32,
                          intermediate_size=64, num_layers=2, num_heads=2,
                          num_classes=10)
        x = jnp.zeros((1, 32, 32, 3))
        comp = lxt_tpu.cp_lrp
    params = m.init_params(cfg, jax.random.PRNGKey(0))
    entries = _run(lambda a: m.forward(params, cfg, a, comp).logits, x)
    assert entries and not _unruled(entries)


def test_flash_attention_path_clean():
    from lxt_tpu.models import llama as jllama

    cfg = jllama.LlamaConfig(vocab_size=64, hidden_size=32,
                             intermediate_size=64, num_layers=2,
                             num_heads=2, num_kv_heads=2)
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    e = jnp.zeros((1, 8, 32))
    entries = _run(lambda x: jllama.forward(
        params, cfg, x, lxt_tpu.attnlrp, attn_impl="flash").logits, e)
    assert not _unruled(entries)


def test_explicit_path_rules_recognized():
    from lxt_tpu.models import llama as jllama
    from lxt_tpu.models import llama_explicit as jle

    cfg = jllama.LlamaConfig(vocab_size=64, hidden_size=32,
                             intermediate_size=64, num_layers=2,
                             num_heads=2, num_kv_heads=2)
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    e = jnp.zeros((1, 8, 32))
    entries = _run(lambda x: jle.forward(params, cfg, x).logits, e)
    assert not _unruled(entries)
    rules = " | ".join(e.rule for e in entries)
    assert "Prop 3.3" in rules or "matmul" in rules   # lf.matmul
    assert "Prop 3.1" in rules                         # lf.softmax
    assert "Prop 3.4" in rules or "rms_norm" in rules  # lf.rms_norm_identity


def test_vanilla_gradient_is_flagged():
    from lxt_tpu.models import llama as jllama

    cfg = jllama.LlamaConfig(vocab_size=64, hidden_size=32,
                             intermediate_size=64, num_layers=2,
                             num_heads=2, num_kv_heads=2)
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    e = jnp.zeros((1, 8, 32))
    entries = _run(lambda x: jllama.forward(
        params, cfg, x, lxt_tpu.vanilla_gradient).logits, e)
    bad = _unruled(entries)
    # attention q@k and probs@v, the norm muls, the gated product...
    assert len(bad) >= 5
    assert any(e.op == "dot_general" for e in bad)


# ---------------------------------------------------------------------------
# primitive-level verdicts (hand-built forwards)
# ---------------------------------------------------------------------------

def test_raw_bilinear_flagged_and_raises():
    """The verdict's acceptance case: a custom forward with a raw a*b of two
    activation-derived operands gets flagged."""
    w = jnp.ones((8, 8))

    def f(x):
        a = x @ w
        b = jnp.tanh(x @ w)
        return (a * b).sum()

    x = jnp.ones((4, 8))
    entries = _run(f, x)
    bad = _unruled(entries)
    assert len(bad) == 1 and bad[0].op == "mul"

    with pytest.raises(UnruledOpError, match="mul"):
        audit(f, x, on_unruled="raise", verbose=False)

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        audit(f, x, on_unruled="warn", verbose=False)
    assert any("no LRP rule" in str(r.message) for r in rec)


def test_bilinear_corrected_by_operands():
    def f(x):
        a = divide_gradient(x, 2)
        b = divide_gradient(jnp.tanh(x), 2)
        return (a * b).sum()

    entries = _run(f, jnp.ones((4, 8)))
    assert not _unruled(entries)
    assert any("operands rule-corrected" in e.rule for e in entries)


def test_bilinear_corrected_downstream():
    """The gated-MLP shape: rule applied to the PRODUCT, not the operands."""
    def f(x):
        g = identity_rule(jax.nn.silu, x)
        return divide_gradient(g * x, 2).sum()

    entries = _run(f, jnp.ones((4, 8)))
    assert not _unruled(entries)
    assert any("product downstream" in e.rule for e in entries)


def test_bilinear_dead_to_relevance():
    """x*x feeding only a stop-gradient path carries no relevance (the norm
    variance pattern) — must NOT be flagged."""
    def f(x):
        var = jax.lax.stop_gradient((x * x).mean(-1, keepdims=True))
        return (x * jax.lax.rsqrt(var + 1e-6)).sum()

    entries = _run(f, jnp.ones((4, 8)))
    assert not _unruled(entries)
    assert any("no relevance flows" in e.rule for e in entries)


def test_linear_with_weight_is_implicit_epsilon():
    w = jnp.ones((8, 4))
    entries = _run(lambda x: (x @ w).sum(), jnp.ones((2, 8)))
    assert [e.kind for e in entries] == ["linear"]
    assert entries[0].ok


def test_machine_readable_and_top_level_export():
    entries = lxt_tpu.audit(lambda x: (x @ jnp.ones((8, 4))).sum(),
                            jnp.ones((2, 8)), verbose=False)
    e = entries[0]
    assert {"site", "op", "shape", "kind", "rule", "ok"} <= set(
        f.name for f in e.__dataclass_fields__.values())
    assert isinstance(e.row(), str)


def test_modz_rules_recognized():
    """flat / w^2 / z-box rules (modz_linear/modz_conv2d) are tagged as
    rules, not flagged as opaque bilinears."""
    from lxt_tpu.composites import Composite

    w = jnp.ones((8, 4))
    for spec in ("flat", "wsquare", ("zbox", 0.0, 1.0)):
        c = Composite(name="t").with_rules(linear=spec)
        entries = _run(lambda x, c=c: c.linear(x, w).sum(), jnp.ones((2, 8)))
        assert any(e.kind == "rule" and "flat/w^2/z-box" in e.rule
                   for e in entries), (spec, entries)
        assert all(e.ok for e in entries), spec


def test_chained_bilinear_not_upgraded_by_single_correction():
    """Regression: a*b*c with ONE /2 correction must keep the inner
    product flagged — the downstream upgrade may only traverse pure
    shape/dtype ops, not other bilinears."""
    from lxt_tpu.ops.rules import divide_gradient
    from lxt_tpu.rule_audit import UnruledOpError

    def f(x):
        return divide_gradient(jnp.tanh(x) * jnp.sin(x) * jnp.cos(x), 2).sum()

    entries = lxt_tpu.audit(f, jnp.ones((4,)), verbose=False)
    flagged = [e for e in entries if not e.ok]
    assert flagged, entries
    with pytest.raises(UnruledOpError):
        lxt_tpu.audit(f, jnp.ones((4,)), on_unruled="raise", verbose=False)

    # the direct pattern stays clean: (a*b) -> /2
    def g(x):
        return divide_gradient(jnp.tanh(x) * jnp.sin(x), 2).sum()

    entries = lxt_tpu.audit(g, jnp.ones((4,)), on_unruled="raise",
                            verbose=False)
    assert all(e.ok for e in entries)


def test_custom_activation_recognized_by_content():
    """A custom activation under a NAME the allowlist has never seen must
    still produce a nonlinearity entry (content-based recognition) — not be
    silently descended as opaque plumbing."""
    w = jnp.ones((8, 8)) * 0.1

    @jax.jit
    def totally_custom_act_v2(x):   # mish-like, not in _NONLIN_NAMES
        return x * jnp.tanh(jax.nn.softplus(x) + 0.3)

    def fwd(x):
        return totally_custom_act_v2(x @ w).sum()

    entries = _run(fwd, jnp.ones((2, 8)))
    nonlin = [e for e in entries if e.kind == "nonlinearity"]
    assert any("totally_custom_act_v2" in e.op for e in nonlin), entries
    assert not _unruled(entries)


def test_structural_region_not_misclassified_as_nonlinearity():
    """A single-input region containing a reduction/matmul must NOT be
    classified as an elementwise nonlinearity — it is descended, and its
    internal unruled bilinear is still caught."""
    @jax.jit
    def sneaky_region(x):
        return x * x.sum()          # bilinear in x, not elementwise

    entries = _run(lambda x: sneaky_region(x).sum(), jnp.ones((4, 4)))
    assert not any(e.kind == "nonlinearity" for e in entries)
    assert _unruled(entries), "internal bilinear must stay flagged"
