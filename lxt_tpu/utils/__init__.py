"""Utilities: heatmap rendering, token cleanup, profiling."""

from lxt_tpu.utils.viz import clean_tokens, html_heatmap, pdf_heatmap

__all__ = ["clean_tokens", "html_heatmap", "pdf_heatmap"]
