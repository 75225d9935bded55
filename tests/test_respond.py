"""Generate-and-explain serving flow: ``AttributionPipeline.respond`` and
the ``/v1/respond`` HTTP route (beyond-reference; composes the greedy
decode loop with multi-site response attribution)."""

import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

import lxt_tpu
from lxt_tpu.pipeline import AttributionPipeline, ResponseAttribution
from lxt_tpu.serve import AttributionServer, http_server

from test_pipeline import ToyTokenizer, _model

pytestmark = pytest.mark.slow


def test_respond_matches_unbatched():
    """Batched left-padded respond == per-prompt unpadded generate +
    attribute_response (the kv_begin plumbing must be exact)."""
    model, cfg, params = _model()
    tok = ToyTokenizer()
    pipe = AttributionPipeline(model, tok)
    prompts = ["alpha beta gamma", "one two three four five"]
    N = 3

    results = pipe.respond(prompts, N, eos_token_id=None)
    assert len(results) == 2

    for prompt, res in zip(prompts, results):
        ids = np.asarray([tok(prompt)["input_ids"]])
        out = np.asarray(model.generate(ids, N))
        gen = [int(t) for t in out[0, ids.shape[1]:]]
        assert [h.target_token_id for h in res.heatmaps] == gen

        values, rel = model.attribute_response(out, ids.shape[1])
        values, rel = np.asarray(values), np.asarray(rel)
        for k, hm in enumerate(res.heatmaps):
            np.testing.assert_allclose(hm.value, values[k, 0], rtol=1e-4)
            np.testing.assert_allclose(hm.raw_relevance, rel[k, 0],
                                       rtol=0, atol=2e-4)


def test_respond_eos_trimming():
    model, cfg, params = _model()
    tok = ToyTokenizer()
    pipe = AttributionPipeline(model, tok)
    prompt = "alpha beta gamma"

    # whatever greedy emits first becomes the eos: the response must then
    # be trimmed to that single token (which keeps its heatmap)
    first = pipe.respond([prompt], 1, eos_token_id=None)[0]
    eos = first.heatmaps[0].target_token_id
    res = pipe.respond([prompt], 5, eos_token_id=eos)[0]
    assert len(res.response_tokens) == 1
    assert len(res.heatmaps) == 1
    assert res.heatmaps[0].target_token_id == eos
    # tokens span prompt + trimmed response; relevance aligns with it
    assert len(res.heatmaps[0].tokens) == len(res.prompt_tokens) + 1
    assert res.heatmaps[0].raw_relevance.shape == (
        len(res.heatmaps[0].tokens),)


def test_respond_mesh_matches_single_device():
    """respond under a dp x tp mesh: same continuations, same maps."""
    from lxt_tpu.parallel import make_mesh

    model, cfg, params = _model()
    tok = ToyTokenizer()
    prompts = ["alpha beta gamma", "one two three four five",
               "x y", "p q r s"]
    plain = AttributionPipeline(model, tok).respond(prompts, 2,
                                                    eos_token_id=None)
    sharded = AttributionPipeline(
        model, tok, mesh=make_mesh(data=4, model=2)).respond(
            prompts, 2, eos_token_id=None)
    for a, b in zip(plain, sharded):
        assert a.response_tokens == b.response_tokens
        for ha, hb in zip(a.heatmaps, b.heatmaps):
            np.testing.assert_allclose(hb.raw_relevance, ha.raw_relevance,
                                       rtol=0, atol=2e-4)


def test_respond_rejects_bad_args():
    model, _, _ = _model()
    pipe = AttributionPipeline(model, ToyTokenizer())
    with pytest.raises(ValueError, match="max_new_tokens"):
        pipe.respond(["alpha"], 0)


def test_server_respond_and_http_route():
    model, _, _ = _model()
    pipe = AttributionPipeline(model, ToyTokenizer())
    server = AttributionServer(pipe, max_batch=4, max_wait_ms=50.0,
                               max_respond_tokens=8)
    httpd = http_server(server)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        # direct submit: Future resolves to a ResponseAttribution
        res = server.attribute("alpha beta gamma", respond_tokens=2)
        assert isinstance(res, ResponseAttribution)
        assert len(res.heatmaps) == len(res.response_tokens) == 2

        body = json.dumps({"prompt": "alpha beta gamma",
                           "max_new_tokens": 2}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/respond", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            payload = json.loads(r.read())
        (resp,) = payload["responses"]
        assert resp["response_tokens"] == res.response_tokens
        assert len(resp["heatmaps"]) == 2
        np.testing.assert_allclose(
            resp["heatmaps"][0]["relevance"],
            res.heatmaps[0].relevance, atol=1e-6)

        # guards: missing max_new_tokens, over the cap, topk conflict
        for bad in ({"prompt": "x"},
                    {"prompt": "x", "max_new_tokens": 99},
                    {"prompt": "x", "max_new_tokens": 2, "topk": 3}):
            breq = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/respond",
                data=json.dumps(bad).encode(),
                headers={"Content-Type": "application/json"})
            try:
                urllib.request.urlopen(breq, timeout=60)
                raise AssertionError(f"expected 400 for {bad}")
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        httpd.shutdown()
        httpd.server_close()
        server.close()


def test_respond_sampled():
    """Sampled respond explains the sampled continuation: the maps'
    target ids ARE the sampled tokens, deterministic per seed."""
    model, _, _ = _model()
    pipe = AttributionPipeline(model, ToyTokenizer())
    prompts = ["alpha beta gamma", "x y"]

    r1 = pipe.respond(prompts, 4, eos_token_id=None, temperature=1.0, seed=3)
    r2 = pipe.respond(prompts, 4, eos_token_id=None, temperature=1.0, seed=3)
    for a, b in zip(r1, r2):
        assert a.response_tokens == b.response_tokens
    greedy = pipe.respond(prompts, 4, eos_token_id=None)
    assert any(a.response_tokens != g.response_tokens
               for a, g in zip(r1, greedy))

    # maps explain the sampled ids (not the greedy ones): re-derive the
    # continuation at the model level with the same seed and padding
    tok = ToyTokenizer()
    ids, kv_begin, _ = pipe._encode(prompts)
    out = np.asarray(model.generate(ids, 4, kv_begin=np.asarray(kv_begin),
                                    temperature=1.0,
                                    key=jax.random.PRNGKey(3)))
    for i, res in enumerate(r1):
        gen = [int(t) for t in out[i, ids.shape[1]:]]
        assert [h.target_token_id for h in res.heatmaps] == gen


def test_server_respond_sampling_groups():
    model, _, _ = _model()
    pipe = AttributionPipeline(model, ToyTokenizer())
    server = AttributionServer(pipe, max_batch=4, max_wait_ms=100.0,
                               max_respond_tokens=8)
    try:
        f1 = server.submit("alpha beta", respond_tokens=3,
                           temperature=1.0, seed=5)
        f2 = server.submit("alpha beta", respond_tokens=3)
        s, g = f1.result(timeout=300), f2.result(timeout=300)
        assert isinstance(s, ResponseAttribution)
        assert isinstance(g, ResponseAttribution)
        # temperature without respond_tokens is rejected at submit
        import pytest
        with pytest.raises(ValueError, match="temperature"):
            server.submit("alpha", temperature=1.0)
    finally:
        server.close()


def test_build_server_from_checkpoint_dir(tmp_path):
    """The CLI assembly path (checkpoint dir -> torch-free from_pretrained
    -> pipeline -> server) serves attribute AND respond end-to-end."""
    import argparse

    import torch
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast
    from transformers.models.llama.modeling_llama import (LlamaConfig,
                                                          LlamaForCausalLM)

    from lxt_tpu.serve import build_server

    torch.manual_seed(2)
    hf = LlamaForCausalLM(LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=128)).eval()
    hf.save_pretrained(tmp_path)
    tok = Tokenizer(models.WordLevel({f"w{i}": i for i in range(256)},
                                     unk_token="w0"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    PreTrainedTokenizerFast(tokenizer_object=tok, eos_token="w1",
                            pad_token="w0").save_pretrained(tmp_path)

    args = argparse.Namespace(
        model=str(tmp_path), composite=None, dtype="float32", bits=None,
        max_batch=2, max_wait_ms=10.0, max_queue=8, max_prompt_tokens=64,
        max_respond_tokens=8, data_parallel=1)
    server = build_server(args)
    try:
        hm = server.attribute("w3 w4 w5")
        assert np.isfinite(hm.raw_relevance).all()
        res = server.attribute("w3 w4 w5", respond_tokens=2)
        assert isinstance(res, ResponseAttribution)
        assert 1 <= len(res.heatmaps) <= 2      # may trim at eos
    finally:
        server.close()
