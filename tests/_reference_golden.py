"""Helper: compute golden relevances with the torch reference in a fresh
process (the reference's monkey-patching is global and irreversible, so each
composite needs its own interpreter). Invoked by tests/test_parity_llama.py,
test_parity_gemma3.py, test_parity_bert.py, test_parity_explicit.py and
test_parity_vit.py.

Usage: python tests/_reference_golden.py <composite> <out.npz> [families...]

``composite`` may be 'attnlrp'/'cp_lrp' (efficient monkey-patch path) or
'explicit' — the reference's EXPLICIT path (vendored modeling files +
``Composite.register``, seeded ``backward(max_logit)``), which is the only
reference path supporting Mixtral and Phi-3.
"""

import sys
import warnings

import numpy as np


def _stub_bitsandbytes():
    """The reference's explicit models import bitsandbytes (absent here) only
    to map its Linear4bit/Linear8bitLt onto the EpsilonRule; distinct dummy
    classes keep the composite dicts valid."""
    import importlib.machinery as im
    import types

    if "bitsandbytes" in sys.modules:
        return
    import torch.nn as nn

    class Linear4bit(nn.Linear):
        pass

    class Linear8bitLt(nn.Linear):
        pass

    def mkmod(name):
        m = types.ModuleType(name)
        m.__spec__ = im.ModuleSpec(name, loader=None)
        return m

    bnb = mkmod("bitsandbytes")
    bnb_nn = mkmod("bitsandbytes.nn")
    bnb_nn.Linear4bit = Linear4bit
    bnb_nn.Linear8bitLt = Linear8bitLt
    bnb.nn = bnb_nn
    sys.modules.update({"bitsandbytes": bnb, "bitsandbytes.nn": bnb_nn})


def build_tiny_explicit(family):
    """Instantiate the reference's vendored explicit model (tiny, seed 0) and
    return ``(model, attnlrp_composite)``. The vendored classes share HF's
    state_dict naming, so the same converters work on their weights."""
    import torch

    _stub_bitsandbytes()
    torch.manual_seed(0)
    if family == "mixtral":
        from transformers.models.mixtral.configuration_mixtral import MixtralConfig
        import lxt.explicit.models.mixtral as vm
        cfg = MixtralConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
            num_local_experts=4, num_experts_per_tok=2,
            max_position_embeddings=128, tie_word_embeddings=False,
            pad_token_id=0, attn_implementation="eager")
        return vm.MixtralForCausalLM(cfg).eval(), vm.attnlrp
    if family == "phi3":
        from transformers.models.phi3.configuration_phi3 import Phi3Config
        import lxt.explicit.models.phi3 as vm
        cfg = Phi3Config(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
            max_position_embeddings=128, tie_word_embeddings=False,
            pad_token_id=0, attn_implementation="eager")
        return vm.Phi3ForCausalLM(cfg).eval(), vm.attnlrp
    if family == "llama":
        from transformers.models.llama.configuration_llama import LlamaConfig
        import lxt.explicit.models.llama as vm
        cfg = LlamaConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
            max_position_embeddings=128, tie_word_embeddings=False,
            pad_token_id=0, attn_implementation="eager")
        return vm.LlamaForCausalLM(cfg).eval(), vm.attnlrp
    if family == "bert":
        from transformers.models.bert.configuration_bert import BertConfig
        import lxt.explicit.models.bert as vm
        cfg = BertConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, vocab_size=256,
            max_position_embeddings=128, type_vocab_size=2, num_labels=3,
            attn_implementation="eager")
        return vm.BertForSequenceClassification(cfg).eval(), vm.attnlrp
    if family == "gpt2":
        # newer transformers dropped SequenceSummary; the vendored file only
        # uses it in the (untested) DoubleHeads model — stub it for import
        import transformers.modeling_utils as mu
        if not hasattr(mu, "SequenceSummary"):
            mu.SequenceSummary = type("SequenceSummary", (), {})
        from transformers.models.gpt2.configuration_gpt2 import GPT2Config
        import lxt.explicit.models.gpt2 as vm
        cfg = GPT2Config(
            n_embd=64, n_layer=2, n_head=4, vocab_size=256, n_positions=128,
            pad_token_id=0, attn_implementation="eager")
        return vm.GPT2LMHeadModel(cfg).eval(), vm.attnlrp
    raise ValueError(family)


def golden_explicit(family):
    """Run the reference explicit path end-to-end: Composite.register, then
    ``max_logit.backward(max_logit)`` — the input embedding's grad IS the
    relevance (reference examples/paper/llama.py:20-46)."""
    import torch

    model, composite = build_tiny_explicit(family)
    composite.register(model)
    ids = torch.randint(0, 256, (1, 12),
                        generator=torch.Generator().manual_seed(1))
    emb = model.get_input_embeddings()(ids).detach().requires_grad_()
    if family == "bert":   # encoder classification head: logits [B, labels]
        logits = model(inputs_embeds=emb).logits
        max_logit = logits[0, :].max()
    else:
        logits = model(inputs_embeds=emb, use_cache=False).logits
        max_logit = logits[0, -1, :].max()
    max_logit.backward(max_logit)
    rel = emb.grad.float().sum(-1)
    return ids, logits, rel


class _TorchViT:
    """Builder for a torchvision-``VisionTransformer``-shaped torch model
    (state_dict-key compatible) without the torchvision dependency: the
    reference's ViT patch map targets plain ``torch.nn`` classes
    (lxt/efficient/models/vit_torch.py:7-11), so patching these is running
    the reference's actual rule code."""

    @staticmethod
    def build(image_size=32, patch_size=8, hidden=64, mlp=128, heads=4,
              layers=2, classes=10):
        import collections

        import torch
        import torch.nn as nn

        torch.manual_seed(0)
        seq_len = (image_size // patch_size) ** 2 + 1

        class EncoderBlock(nn.Module):
            def __init__(self):
                super().__init__()
                self.ln_1 = nn.LayerNorm(hidden, eps=1e-6)
                self.self_attention = nn.MultiheadAttention(
                    hidden, heads, batch_first=True)
                self.dropout = nn.Dropout(0.0)
                self.ln_2 = nn.LayerNorm(hidden, eps=1e-6)
                self.mlp = nn.Sequential(
                    nn.Linear(hidden, mlp), nn.GELU(), nn.Dropout(0.0),
                    nn.Linear(mlp, hidden), nn.Dropout(0.0))

            def forward(self, input):
                x = self.ln_1(input)
                x, _ = self.self_attention(x, x, x, need_weights=False)
                x = self.dropout(x)
                x = x + input
                y = self.mlp(self.ln_2(x))
                return x + y

        class Encoder(nn.Module):
            def __init__(self):
                super().__init__()
                self.pos_embedding = nn.Parameter(
                    torch.empty(1, seq_len, hidden).normal_(std=0.02))
                self.dropout = nn.Dropout(0.0)
                self.layers = nn.Sequential(collections.OrderedDict(
                    (f"encoder_layer_{i}", EncoderBlock())
                    for i in range(layers)))
                self.ln = nn.LayerNorm(hidden, eps=1e-6)

            def forward(self, x):
                return self.ln(self.layers(self.dropout(x + self.pos_embedding)))

        class ViT(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv_proj = nn.Conv2d(3, hidden, kernel_size=patch_size,
                                           stride=patch_size)
                self.class_token = nn.Parameter(torch.zeros(1, 1, hidden))
                self.encoder = Encoder()
                self.heads = nn.Sequential(collections.OrderedDict(
                    head=nn.Linear(hidden, classes)))

            def forward(self, x):
                n = x.shape[0]
                x = self.conv_proj(x).reshape(n, hidden, -1).permute(0, 2, 1)
                x = torch.cat([self.class_token.expand(n, -1, -1), x], dim=1)
                x = self.encoder(x)
                return self.heads(x[:, 0])

        return ViT().eval()


class _TorchOpenCLIP:
    """Builder for an OpenCLIP-``VisualTransformer``-shaped torch model
    (state_dict keys ``conv1/class_embedding/positional_embedding/ln_pre/
    transformer.resblocks.N.{ln_1,attn,ln_2,mlp.c_fc,mlp.c_proj}/ln_post/
    proj``) without the open_clip dependency. The reference's OpenCLIP
    composite targets plain ``torch.nn`` classes plus ``operator.add``/
    ``operator.matmul``/``F.normalize`` function rewrites
    (lxt/explicit/models/openclip.py:20-31); the fx trace would replace the
    functions with ``lf.add2``/``lf.matmul``/``lf.normalize``, so the golden
    build calls those directly via the ``_ADD``/``_MATMUL``/``_NORM`` hooks
    (plain torch ops by default, for state_dict-only in-process builds)."""

    _ADD = staticmethod(lambda a, b: a + b)
    _MATMUL = staticmethod(lambda a, b: a @ b)
    _NORM = None  # default: F.normalize

    @staticmethod
    def build(image_size=32, patch_size=8, hidden=64, mlp=128, heads=4,
              layers=2, proj_dim=32, ln_eps=1e-5):
        import collections

        import torch
        import torch.nn as nn
        import torch.nn.functional as F

        torch.manual_seed(0)
        seq_len = (image_size // patch_size) ** 2 + 1
        cls = _TorchOpenCLIP

        class ResidualAttentionBlock(nn.Module):
            def __init__(self):
                super().__init__()
                self.ln_1 = nn.LayerNorm(hidden, eps=ln_eps)
                self.attn = nn.MultiheadAttention(hidden, heads,
                                                  batch_first=True)
                self.ln_2 = nn.LayerNorm(hidden, eps=ln_eps)
                self.mlp = nn.Sequential(collections.OrderedDict(
                    c_fc=nn.Linear(hidden, mlp), gelu=nn.GELU(),
                    c_proj=nn.Linear(mlp, hidden)))

            def forward(self, x):
                y, _ = self.attn(self.ln_1(x), self.ln_1(x), self.ln_1(x),
                                 need_weights=False)
                x = cls._ADD(x, y)
                return cls._ADD(x, self.mlp(self.ln_2(x)))

        class Transformer(nn.Module):
            def __init__(self):
                super().__init__()
                self.resblocks = nn.Sequential(
                    *[ResidualAttentionBlock() for _ in range(layers)])

            def forward(self, x):
                return self.resblocks(x)

        class VisualTower(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Conv2d(3, hidden, kernel_size=patch_size,
                                       stride=patch_size, bias=False)
                self.class_embedding = nn.Parameter(
                    torch.randn(hidden) * 0.02)
                self.positional_embedding = nn.Parameter(
                    torch.randn(seq_len, hidden) * 0.02)
                self.ln_pre = nn.LayerNorm(hidden, eps=ln_eps)
                self.transformer = Transformer()
                self.ln_post = nn.LayerNorm(hidden, eps=ln_eps)
                self.proj = nn.Parameter(torch.randn(hidden, proj_dim) * 0.1)

            def forward(self, x):
                n = x.shape[0]
                x = self.conv1(x).reshape(n, hidden, -1).permute(0, 2, 1)
                x = torch.cat(
                    [self.class_embedding.view(1, 1, -1).expand(n, 1, -1), x],
                    dim=1)
                x = cls._ADD(x, self.positional_embedding[None])
                x = self.ln_pre(x)
                x = self.transformer(x)
                x = self.ln_post(x)
                emb = cls._MATMUL(x[:, 0], self.proj)
                norm = cls._NORM or (lambda e, p, d: F.normalize(e, p, d))
                return norm(emb, 2.0, -1)

        return VisualTower().eval()


def golden_openclip():
    """Reference explicit OpenCLIP flow (lxt/explicit/models/openclip.py:
    20-31): MHA -> MultiheadAttention_CP with EpsilonRule in/out
    projections, LayerNormEpsilon, GELU identity rule, add/matmul/normalize
    as lf.*; seeded ``backward(logit)`` so the image grad IS the relevance.
    The example's zennit gamma overlay on Conv2d/Linear (openclip.py:70-78)
    is taken at its gamma->0 end-member, i.e. the EpsilonRule (zennit
    ``Gamma(0)`` = LRP-0), keeping the golden zennit-free."""
    import torch
    import torch.nn as nn
    from lxt.explicit.core import Composite
    import lxt.explicit.functional as lf
    import lxt.explicit.modules as lm
    import lxt.explicit.rules as rules

    _TorchOpenCLIP._ADD = staticmethod(lf.add2)
    _TorchOpenCLIP._MATMUL = staticmethod(lf.matmul)
    _TorchOpenCLIP._NORM = staticmethod(
        lambda e, p, d: lf.normalize(e, p, d))
    model = _TorchOpenCLIP.build()

    composite = Composite({
        nn.MultiheadAttention: lm.MultiheadAttention_CP,
        # order matters: these live inside MultiheadAttention_CP and must
        # match before the generic nn.Linear entry (reference comment,
        # openclip.py:22)
        lm.LinearInProjection: rules.EpsilonRule,
        lm.LinearOutProjection: rules.EpsilonRule,
        nn.LayerNorm: lm.LayerNormEpsilon,
        nn.GELU: rules.IdentityRule,
        nn.Linear: rules.EpsilonRule,
        nn.Conv2d: rules.EpsilonRule,
    })
    composite.register(model)

    x = torch.randn(1, 3, 32, 32,
                    generator=torch.Generator().manual_seed(1))
    x = x.requires_grad_()
    out = model(x)
    top = int(out[0].argmax())
    val = out[0, top]
    val.backward(val)
    heatmap = x.grad[0].sum(0, keepdim=True)  # grad IS relevance here
    return x.detach(), out, heatmap, top


def golden_vit():
    """Reference efficient cp_LRP ViT flow (examples/vit_torch.py:59-97,
    sans the zennit gamma overlay): patch, forward, backward on the top
    logit, channel-summed Gradient*Input heatmap."""
    import torch
    from lxt.efficient.core import monkey_patch
    import lxt.efficient.models.vit_torch as maps

    model = _TorchViT.build()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        monkey_patch(sys.modules[__name__], maps.cp_LRP)

    x = torch.randn(1, 3, 32, 32,
                    generator=torch.Generator().manual_seed(1))
    x = x.requires_grad_()
    y = model(x)
    top = y[0].argmax()
    y[0, top].backward()
    heatmap = (x * x.grad).sum(1)
    return x.detach(), y, heatmap, int(top)


def build_tiny(family, patch_composite=None):
    """Build the tiny random HF model for ``family``. For BERT the reference
    patch REPLACES module-level classes (replace_module), so when
    ``patch_composite`` is given the patch is applied BEFORE construction;
    other families patch forwards on existing classes (order-irrelevant)."""
    import torch

    common_kw = dict(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    if family == "bert":
        import warnings as _w
        from transformers.models.bert import modeling_bert as mod
        maps = None
        if patch_composite is not None:
            import lxt.efficient.models.bert as maps
            from lxt.efficient.core import monkey_patch
            with _w.catch_warnings():
                _w.simplefilter("ignore")
                monkey_patch(mod, maps.attnLRP)
        torch.manual_seed(0)
        bcfg = mod.BertConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, vocab_size=256,
            max_position_embeddings=128, type_vocab_size=2, num_labels=3)
        model = mod.BertForSequenceClassification(bcfg).eval()
        return mod, maps, model
    torch.manual_seed(0)
    if family == "llama":
        from transformers.models.llama import modeling_llama as mod
        from transformers.models.llama.modeling_llama import LlamaConfig, LlamaForCausalLM
        import lxt.efficient.models.llama as maps
        return mod, maps, LlamaForCausalLM(LlamaConfig(**common_kw)).eval()
    if family == "qwen2":
        from transformers.models.qwen2 import modeling_qwen2 as mod
        from transformers.models.qwen2.modeling_qwen2 import Qwen2Config, Qwen2ForCausalLM
        import lxt.efficient.models.qwen2 as maps
        return mod, maps, Qwen2ForCausalLM(Qwen2Config(**common_kw)).eval()
    if family == "qwen3":
        from transformers.models.qwen3 import modeling_qwen3 as mod
        from transformers.models.qwen3.modeling_qwen3 import Qwen3Config, Qwen3ForCausalLM
        import lxt.efficient.models.qwen3 as maps
        return mod, maps, Qwen3ForCausalLM(Qwen3Config(**common_kw, head_dim=16)).eval()
    if family == "gemma3":
        from transformers.models.gemma3 import modeling_gemma3 as mod
        from transformers.models.gemma3.modeling_gemma3 import (
            Gemma3TextConfig, Gemma3ForCausalLM)
        import lxt.efficient.models.gemma3 as maps
        gcfg = Gemma3TextConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, sliding_window=8, query_pre_attn_scalar=16,
            max_position_embeddings=128, rope_theta=1_000_000.0,
            rope_local_base_freq=10_000.0, tie_word_embeddings=True)
        return mod, maps, Gemma3ForCausalLM(gcfg).eval()
    if family == "mistral":
        # the reference's efficient map does not ship a mistral entry; its
        # documented route is a custom patch_map (lxt/efficient/models/
        # __init__.py:24-26) — build one with the generic patches, the exact
        # shape of the llama map (lxt/efficient/models/llama.py:9-21), so the
        # golden exercises the reference's own rules on a windowed model
        from functools import partial
        from types import SimpleNamespace

        from torch.nn import Dropout
        from transformers.models.mistral import modeling_mistral as mod
        from transformers.models.mistral.modeling_mistral import (
            MistralConfig, MistralForCausalLM, MistralMLP, MistralRMSNorm)
        from lxt.efficient.patches import (
            patch_method, patch_attention, patch_cp_attention,
            rms_norm_forward, gated_mlp_forward, cp_gated_mlp_forward,
            dropout_forward)
        maps = SimpleNamespace(
            attnLRP={
                MistralMLP: partial(patch_method, gated_mlp_forward),
                MistralRMSNorm: partial(patch_method, rms_norm_forward),
                Dropout: partial(patch_method, dropout_forward),
                mod: patch_attention,
            },
            cp_LRP={
                MistralMLP: partial(patch_method, cp_gated_mlp_forward),
                MistralRMSNorm: partial(patch_method, rms_norm_forward),
                Dropout: partial(patch_method, dropout_forward),
                mod: patch_cp_attention,
            })
        mcfg = MistralConfig(**common_kw, sliding_window=8,
                             attn_implementation="eager")
        return mod, maps, MistralForCausalLM(mcfg).eval()
    if family == "gpt2":
        from transformers.models.gpt2 import modeling_gpt2 as mod
        from transformers.models.gpt2.modeling_gpt2 import GPT2Config, GPT2LMHeadModel
        import lxt.efficient.models.gpt2 as maps
        gcfg = GPT2Config(n_embd=64, n_layer=2, n_head=4, vocab_size=256,
                          n_positions=128)
        return mod, maps, GPT2LMHeadModel(gcfg).eval()
    raise ValueError(family)


def main():
    composite, out_path, families = sys.argv[1], sys.argv[2], sys.argv[3:]

    sys.path.insert(0, "/root/repo")
    from tests.conftest import _install_reference
    assert _install_reference()

    import torch
    from lxt.efficient.core import monkey_patch

    result = {}
    if composite == "explicit":
        for family in families:
            ids, logits, rel = golden_explicit(family)
            result[f"{family}.ids"] = ids.numpy()
            result[f"{family}.logits"] = logits.detach().float().numpy()
            result[f"{family}.rel"] = rel.detach().float().numpy()
        np.savez(out_path, **result)
        print("golden written:", out_path)
        return
    if composite == "response":
        # per-site golden for the respond surface: the reference explains
        # one (position, token) per FULL forward+backward; site k targets
        # the logit of ids[0, start+k] at the position that predicted it.
        # The repo's attribute_response must reproduce every map from ONE
        # shared forward.
        mod, maps, model = build_tiny("llama", patch_composite="attnlrp")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            monkey_patch(mod, maps.attnLRP)
        ids = torch.randint(0, 256, (1, 12),
                            generator=torch.Generator().manual_seed(1))
        start = 8
        rels, vals = [], []
        for k in range(ids.shape[1] - start):
            emb = model.get_input_embeddings()(ids).detach().requires_grad_()
            logits = model(inputs_embeds=emb, use_cache=False).logits
            val = logits[0, start + k - 1, ids[0, start + k]]
            val.backward()
            rels.append((emb * emb.grad).detach().float().sum(-1)[0])
            vals.append(val.detach().float())
        result["response.ids"] = ids.numpy()
        result["response.start"] = np.asarray(start)
        result["response.rel"] = torch.stack(rels).numpy()
        result["response.values"] = torch.stack(vals).numpy()
        np.savez(out_path, **result)
        print("golden written:", out_path)
        return
    if composite == "openclip":
        x, y, heatmap, top = golden_openclip()
        result["openclip.x"] = x.numpy()
        result["openclip.emb"] = y.detach().float().numpy()
        result["openclip.heatmap"] = heatmap.detach().float().numpy()
        result["openclip.top"] = np.asarray(top)
        np.savez(out_path, **result)
        print("golden written:", out_path)
        return
    if composite == "vit":
        x, y, heatmap, top = golden_vit()
        result["vit.x"] = x.numpy()
        result["vit.logits"] = y.detach().float().numpy()
        result["vit.heatmap"] = heatmap.detach().float().numpy()
        result["vit.top"] = np.asarray(top)
        np.savez(out_path, **result)
        print("golden written:", out_path)
        return
    for family in families:
        bf16 = family.endswith("_bf16")
        base = family[:-5] if bf16 else family
        mod, maps, model = build_tiny(base, patch_composite=composite)
        if bf16:
            import torch as _t
            model = model.to(_t.bfloat16)
        if maps is not None and base != "bert":
            patch_map = getattr(maps, {"attnlrp": "attnLRP", "cp_lrp": "cp_LRP"}[composite])
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                monkey_patch(mod, patch_map)

        ids = torch.randint(0, 256, (1, 12), generator=torch.Generator().manual_seed(1))
        emb = model.get_input_embeddings()(ids).detach().requires_grad_()
        if base == "bert":
            mask = torch.ones(1, 12, dtype=torch.long)
            logits = model(inputs_embeds=emb, attention_mask=mask).logits
            logits[0, :].max().backward()
        else:
            logits = model(inputs_embeds=emb, use_cache=False).logits
            logits[0, -1, :].max().backward()
        rel = (emb * emb.grad).float().sum(-1)

        result[f"{family}.ids"] = ids.numpy()
        result[f"{family}.logits"] = logits.detach().float().numpy()
        result[f"{family}.rel"] = rel.detach().float().numpy()

    np.savez(out_path, **result)
    print("golden written:", out_path)


if __name__ == "__main__":
    main()
