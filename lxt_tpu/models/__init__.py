"""Model zoo: LRP-aware functional transformers + HF weight conversion.

Families mirror the reference's supported set (README.md:92-100): Llama 2/3
/ TinyLlama, Qwen 2/3, Mistral, Gemma 3, GPT-2, BERT, Mixtral, ViT.
"""

from lxt_tpu.models import bert, common, gemma3, gpt2, llama, mixtral, vit
from lxt_tpu.models.registry import (
    SUPPORTED_FAMILIES,
    AttributionModel,
    detect_family,
    from_hf,
)

__all__ = [
    "bert", "common", "gemma3", "gpt2", "llama", "mixtral", "vit",
    "SUPPORTED_FAMILIES", "AttributionModel", "detect_family", "from_hf",
]
