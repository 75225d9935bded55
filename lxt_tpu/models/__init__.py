"""Model zoo: LRP-aware functional transformers + HF weight conversion.

Families mirror the reference's supported set (README.md:92-100):
Llama 2/3 / TinyLlama, Qwen 2/3, Gemma 3, GPT-2, BERT, Mixtral, ViT.
"""

from lxt_tpu.models import common, llama

__all__ = ["common", "llama"]
