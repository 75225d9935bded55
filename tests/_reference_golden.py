"""Helper: compute golden relevances with the torch reference in a fresh
process (the reference's monkey-patching is global and irreversible, so each
composite needs its own interpreter). Invoked by tests/test_parity_llama.py.

Usage: python tests/_reference_golden.py <composite> <out.npz> [families...]
"""

import sys
import warnings

import numpy as np


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
