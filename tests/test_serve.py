"""Serving layer: micro-batch coalescing, correctness vs the bare pipeline,
and the stdlib HTTP frontend (beyond-reference production surface)."""

import concurrent.futures
import json
import threading
import urllib.request

import jax
import numpy as np

import lxt_tpu
from lxt_tpu.models import llama as jllama
from lxt_tpu.pipeline import AttributionPipeline
from lxt_tpu.serve import AttributionServer, http_server

from test_pipeline import ToyTokenizer, _model


def _pipeline():
    model, _, _ = _model()
    return AttributionPipeline(model, ToyTokenizer())


def test_server_coalesces_and_matches_pipeline():
    pipe = _pipeline()
    prompts = ["alpha beta gamma", "one two three four", "x y", "p q r s t"]
    direct = pipe(prompts)

    server = AttributionServer(pipe, max_batch=4, max_wait_ms=200.0)
    try:
        futures = [server.submit(p) for p in prompts]
        results = [f.result(timeout=120) for f in futures]
    finally:
        server.close()

    for d, r in zip(direct, results):
        assert d.tokens == r.tokens
        np.testing.assert_allclose(r.raw_relevance, d.raw_relevance,
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(r.value, d.value, rtol=1e-6)

    # all four arrived within the wait window -> coalesced into ONE batch
    assert server.requests_served == 4
    assert max(server.batch_sizes) > 1


def test_server_groups_by_composite():
    pipe = _pipeline()
    server = AttributionServer(pipe, max_batch=4, max_wait_ms=200.0)
    try:
        f1 = server.submit("alpha beta", composite=lxt_tpu.attnlrp)
        f2 = server.submit("alpha beta", composite=lxt_tpu.cp_lrp)
        r1, r2 = f1.result(timeout=120), f2.result(timeout=120)
    finally:
        server.close()
    # same prompt, same forward value, different rules -> different relevance
    np.testing.assert_allclose(r1.value, r2.value, rtol=1e-6)
    assert not np.allclose(r1.raw_relevance, r2.raw_relevance)


def test_server_propagates_errors():
    pipe = _pipeline()

    class Boom(Exception):
        pass

    def broken(prompts, composite=None):
        raise Boom("kaput")

    server = AttributionServer(broken, max_batch=2, max_wait_ms=10.0)
    try:
        fut = server.submit("alpha")
        try:
            fut.result(timeout=60)
            raise AssertionError("expected Boom")
        except Boom:
            pass
    finally:
        server.close()


def test_http_roundtrip():
    pipe = _pipeline()
    server = AttributionServer(pipe, max_batch=4, max_wait_ms=50.0)
    httpd = http_server(server)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        body = json.dumps({"prompts": ["alpha beta gamma", "x y"]}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/attribute", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = json.loads(resp.read())
        assert len(out["heatmaps"]) == 2
        direct = pipe(["alpha beta gamma", "x y"])
        for hm_json, hm in zip(out["heatmaps"], direct):
            assert hm_json["tokens"] == hm.tokens
            np.testing.assert_allclose(hm_json["relevance"], hm.relevance,
                                       rtol=0, atol=1e-5)
            np.testing.assert_allclose(hm_json["value"], hm.value, rtol=1e-6)

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as resp:
            health = json.loads(resp.read())
        assert health["ok"] and health["served"] == 2
    finally:
        httpd.shutdown()
        server.close()
