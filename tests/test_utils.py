"""Viz/token utilities (reference lxt/utils.py behavior)."""

import numpy as np
import pytest

from lxt_tpu.utils import clean_tokens, html_heatmap, pdf_heatmap


def test_clean_tokens_sentencepiece():
    assert clean_tokens(["▁Hello", "▁world", "!"]) == [" Hello", " world", "!"]


def test_clean_tokens_bpe():
    assert clean_tokens(["Hello", "Ġworld", "Ġ!"]) == ["Hello", " world", " !"]


def test_clean_tokens_wordpiece():
    assert clean_tokens(["hel", "##lo", "world"]) == ["hel", "lo", " world"]


def test_clean_tokens_escapes_latex():
    out = clean_tokens(["▁100%", "▁a_b"])
    assert out == [" 100\\%", " a\\_b"]


def test_clean_tokens_unknown_scheme():
    with pytest.raises(ValueError):
        clean_tokens(["plain", "words"])


def test_html_heatmap(tmp_path):
    p = html_heatmap(["a", "b", "c"], [-1.0, 0.0, 1.0],
                     path=tmp_path / "h.html")
    text = p.read_text()
    assert "rgb(0,0,255)" in text      # -1 -> blue
    assert "rgb(255,255,255)" in text  # 0 -> white
    assert "rgb(255,0,0)" in text      # +1 -> red


def test_pdf_heatmap_falls_back_without_latex(tmp_path):
    p = pdf_heatmap(["a", "b"], np.asarray([0.5, -0.5]),
                    path=tmp_path / "h.pdf")
    assert p.exists()


def test_pdf_heatmap_rejects_unnormalized(tmp_path):
    with pytest.raises(AssertionError):
        pdf_heatmap(["a"], np.asarray([2.0]), path=tmp_path / "x.pdf")


def test_html_response_heatmap(tmp_path):
    from lxt_tpu.utils import html_response_heatmap

    tokens = ["why", "is", "the", "sky", "blue", "Ray", "leigh"]
    resp = ["Ray", "leigh"]
    rel = [[0.1, -0.2, 0.0, 0.9, 0.5, 0.0, 0.0],
           [0.0, 0.1, 0.0, 0.3, 0.2, 0.8, 0.0]]
    p = html_response_heatmap(tokens, resp, rel,
                              path=tmp_path / "resp.html")
    doc = p.read_text()
    assert doc.count("<tr>") == 2
    assert "Ray" in doc and "sky" in doc
    assert "+0.9000" in doc            # raw value tooltip survives

    import pytest
    with pytest.raises(ValueError, match="entries"):
        html_response_heatmap(tokens, resp, [[0.0]], path=tmp_path / "x.html")
