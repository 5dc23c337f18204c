"""HTTP serving layer: dynamic batching, correctness vs direct engine calls.

The reference serves through a Qdrant server; here the socket surface is
visual_rag_tpu.serving.SearchServer — results over HTTP must be identical to
direct RetrievalEngine calls, and concurrent requests must coalesce into
fused batches.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

from visual_rag_tpu.index import CollectionSchema, IndexBuilder
from visual_rag_tpu.ops import global_mean_pooling, tile_level_mean_pooling
from visual_rag_tpu.retrieval import RetrievalEngine
from visual_rag_tpu.serving import SearchServer


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def served():
    rng = np.random.default_rng(0)
    b = IndexBuilder(CollectionSchema.standard(storage_dtype="float32"))
    for i in range(40):
        t = rng.standard_normal((rng.integers(2, 6) * 64, 128)).astype(np.float32)
        mp = np.asarray(tile_level_mean_pooling(t, t.shape[0] // 64))
        b.add(f"p{i}", {"initial": t, "mean_pooling": mp,
                        "experimental_pooling": mp,
                        "global_pooling": np.asarray(global_mean_pooling(mp))},
              {"page": i})
    engine = RetrievalEngine(b.seal(), compute_dtype="float32")
    server = SearchServer(engine, max_batch=64, max_wait_ms=30.0).start()
    yield server, engine, rng
    server.stop()


class TestEndpoints:
    def test_healthz(self, served):
        server, _, _ = served
        code, body = _get(f"http://{server.host}:{server.port}/healthz")
        assert code == 200 and body["num_docs"] == 40

    def test_search_matches_direct_engine(self, served):
        server, engine, rng = served
        q = rng.standard_normal((12, 128)).astype(np.float32)
        code, body = _post(
            f"http://{server.host}:{server.port}/search",
            {"embedding": q.tolist(), "mode": "two_stage", "top_k": 5,
             "prefetch_k": 20})
        assert code == 200
        direct = engine.search_embedded_batch(
            [q], mode="two_stage", top_k=5, prefetch_k=20)[0]
        assert [r["id"] for r in body["results"]] == [r["id"] for r in direct]
        got = [round(r["score_final"], 4) for r in body["results"]]
        want = [round(r["score_final"], 4) for r in direct]
        assert got == want

    def test_concurrent_requests_coalesce(self, served):
        server, engine, rng = served
        url = f"http://{server.host}:{server.port}/search"
        queries = [rng.standard_normal((8, 128)).astype(np.float32)
                   for _ in range(16)]
        results = [None] * 16

        def hit(i):
            code, body = _post(url, {"embedding": queries[i].tolist(),
                                     "mode": "single_pooled", "top_k": 3})
            results[i] = (code, body)

        batches_before = server.batcher.stats["batches"]
        threads = [threading.Thread(target=hit, args=(i,)) for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(code == 200 for code, _ in results)
        # correctness under batching: each response matches its direct call
        for i in (0, 7, 15):
            direct = engine.search_embedded_batch(
                [queries[i]], mode="single_pooled", top_k=3)[0]
            assert ([r["id"] for r in results[i][1]["results"]]
                    == [r["id"] for r in direct])
        batches = server.batcher.stats["batches"] - batches_before
        assert batches < 16, f"no batching happened ({batches} batches for 16)"
        _, stats = _get(f"http://{server.host}:{server.port}/stats")
        assert stats["max_batch_seen"] >= 2

    def test_bad_requests(self, served):
        server, _, _ = served
        url = f"http://{server.host}:{server.port}/search"
        code, body = _post(url, {"top_k": 3})
        assert code == 400 and "embedding" in body["error"]
        code, body = _post(url, {"embedding": [1.0, 2.0]})
        assert code == 400 and "shape" in body["error"]
        code, body = _post(url, {"query": "no embedder configured"})
        assert code == 400 and "embedder" in body["error"]
        code, body = _get(f"http://{server.host}:{server.port}/healthz")
        assert code == 200  # server alive after bad requests

    def test_unknown_path_404(self, served):
        server, _, _ = served
        code, body = _post(
            f"http://{server.host}:{server.port}/other", {})
        assert code == 404


class TestQueryTextPath:
    def test_text_query_through_embedder(self):
        from visual_rag_tpu.models.colvlm import ColVLMConfig
        from visual_rag_tpu.models.embedder import VisualEmbedder

        emb = VisualEmbedder("vidore/colSmol-500M", config=ColVLMConfig.tiny())
        rng = np.random.default_rng(1)
        b = IndexBuilder(CollectionSchema.standard(
            dim=emb.cfg.embed_dim, storage_dtype="float32"))
        imgs = [rng.random((150, 120, 3)).astype(np.float32) for _ in range(3)]
        embs, infos = emb.embed_images(imgs, return_token_info=True)
        for i, (e, info) in enumerate(zip(embs, infos)):
            v = emb.extract_visual_embedding(e, info)
            mp = emb.mean_pool_visual_embedding(v, info)
            b.add(f"d{i}", {"initial": v, "mean_pooling": mp,
                            "experimental_pooling": mp,
                            "global_pooling": emb.global_pool_from_mean_pool(mp)},
                  {})
        engine = RetrievalEngine(b.seal(), compute_dtype="float32")
        server = SearchServer(engine, embedder=emb).start()
        try:
            code, body = _post(
                f"http://{server.host}:{server.port}/search",
                {"query": "find the figure", "mode": "two_stage", "top_k": 2,
                 "prefetch_k": 3})
            assert code == 200 and len(body["results"]) == 2
        finally:
            server.stop()


class TestBinaryWireFormat:
    def test_b64_embedding_matches_json(self, served):
        import base64

        server, engine, rng = served
        q = rng.standard_normal((10, 128)).astype(np.float32)
        url = f"http://{server.host}:{server.port}/search"
        code_a, a = _post(url, {"embedding": q.tolist(), "mode": "single_pooled",
                                "top_k": 4})
        code_b, b = _post(url, {
            "embedding_b64": base64.b64encode(q.tobytes()).decode(),
            "shape": [10, 128], "dtype": "float32",
            "mode": "single_pooled", "top_k": 4})
        assert code_a == code_b == 200
        assert a["results"] == b["results"]
        # fp16 wire dtype also accepted (cast to f32 server-side)
        code_c, c = _post(url, {
            "embedding_b64": base64.b64encode(
                q.astype(np.float16).tobytes()).decode(),
            "shape": [10, 128], "dtype": "float16",
            "mode": "single_pooled", "top_k": 4})
        assert code_c == 200
        assert [r["id"] for r in c["results"]] == [r["id"] for r in a["results"]]

    def test_b64_size_mismatch_400(self, served):
        import base64

        server, _, _ = served
        url = f"http://{server.host}:{server.port}/search"
        code, body = _post(url, {
            "embedding_b64": base64.b64encode(b"\x00" * 64).decode(),
            "shape": [10, 128], "dtype": "float32"})
        assert code == 400 and "bytes" in body["error"]
        code, body = _post(url, {
            "embedding_b64": "xx", "shape": "bad"})
        assert code == 400 and "shape" in body["error"]

    def test_bogus_dtype_400(self, served):
        """ADVICE r1: an invalid 'dtype' used to kill the connection with no
        response (TypeError escaped do_POST); must be a clean 400 now."""
        import base64

        server, _, _ = served
        url = f"http://{server.host}:{server.port}/search"
        for bad in ([1, 2], "int64", "object"):
            code, body = _post(url, {
                "embedding_b64": base64.b64encode(b"\x00" * 64).decode(),
                "shape": [2, 8], "dtype": bad})
            assert code == 400 and "dtype" in body["error"], bad


@pytest.fixture(scope="module")
def aserved(served):
    """Async server over the same engine as the threaded fixture."""
    from visual_rag_tpu.serving import AsyncSearchServer

    _, engine, rng = served
    server = AsyncSearchServer(engine, max_batch=64, max_wait_ms=10.0).start()
    yield server, engine, rng
    server.stop()


class TestAsyncServer:
    def test_healthz_and_stats(self, aserved):
        server, _, _ = aserved
        code, body = _get(f"http://{server.host}:{server.port}/healthz")
        assert code == 200 and body["num_docs"] == 40
        code, body = _get(f"http://{server.host}:{server.port}/stats")
        assert code == 200 and "batches" in body

    def test_search_matches_direct_engine(self, aserved):
        server, engine, rng = aserved
        q = rng.standard_normal((12, 128)).astype(np.float32)
        code, body = _post(f"http://{server.host}:{server.port}/search", {
            "embedding": q.tolist(), "mode": "two_stage",
            "top_k": 5, "prefetch_k": 20})
        assert code == 200
        direct = engine.search_embedded_batch(
            [q], mode="two_stage", top_k=5, prefetch_k=20)[0]
        assert [r["id"] for r in body["results"]] == [r["id"] for r in direct]

    def test_concurrent_coalesce(self, aserved):
        server, engine, rng = aserved
        qs = [rng.standard_normal((8, 128)).astype(np.float32)
              for _ in range(12)]
        url = f"http://{server.host}:{server.port}/search"
        results = [None] * len(qs)

        def hit(i):
            _, body = _post(url, {"embedding": qs[i].tolist(), "top_k": 3})
            results[i] = body["results"]

        before = server.batcher.stats["batches"]
        threads = [threading.Thread(target=hit, args=(i,)) for i in range(len(qs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # 12 concurrent requests coalesced into far fewer engine batches
        assert server.batcher.stats["batches"] - before < 12
        for i, q in enumerate(qs):
            direct = engine.search_embedded_batch([q], top_k=3)[0]
            assert [r["id"] for r in results[i]] == [r["id"] for r in direct]

    def test_bad_requests(self, aserved):
        server, _, _ = aserved
        url = f"http://{server.host}:{server.port}/search"
        code, body = _post(url, {"embedding": [1, 2, 3]})
        assert code == 400
        code, body = _post(url, {})
        assert code == 400
        code, body = _post(f"http://{server.host}:{server.port}/nope", {})
        assert code == 404

    def test_keepalive_sequential_requests(self, aserved):
        """One persistent connection serves many request/response cycles."""
        import http.client

        server, engine, rng = aserved
        conn = http.client.HTTPConnection(server.host, server.port)
        q = rng.standard_normal((6, 128)).astype(np.float32)
        payload = json.dumps({"embedding": q.tolist(), "top_k": 2}).encode()
        ids = []
        for _ in range(5):
            conn.request("POST", "/search", body=payload,
                         headers={"Content-Type": "application/json"})
            r = conn.getresponse()
            assert r.status == 200
            ids.append([x["id"] for x in json.loads(r.read())["results"]])
        conn.close()
        assert all(i == ids[0] for i in ids)


@pytest.fixture(scope="module")
def mwserved(served):
    from visual_rag_tpu.serving import MultiWorkerServer

    _, engine, rng = served
    server = MultiWorkerServer(engine, workers=2, max_batch=64,
                               max_wait_ms=20.0).start()
    yield server, engine, rng
    server.stop()


class TestMultiWorkerServer:
    """VERDICT r2 #9: SO_REUSEPORT front-end processes + one engine backend.

    The engine (and TPU) stay in the parent; workers only parse HTTP/JSON.
    """

    def test_healthz_from_workers(self, mwserved):
        server, engine, _ = mwserved
        code, body = _get(f"http://{server.host}:{server.port}/healthz")
        assert code == 200 and body["num_docs"] == engine.index.num_docs

    def test_search_matches_direct_engine(self, mwserved):
        server, engine, rng = mwserved
        q = rng.standard_normal((9, 128)).astype(np.float32)
        code, body = _post(
            f"http://{server.host}:{server.port}/search",
            {"embedding": q.tolist(), "mode": "two_stage", "top_k": 5,
             "prefetch_k": 20})
        assert code == 200
        direct = engine.search_embedded(q, mode="two_stage", top_k=5,
                                        prefetch_k=20, with_payload=False)
        assert [r["id"] for r in body["results"]] == [r["id"] for r in direct]

    def test_concurrent_load_across_workers(self, mwserved):
        server, engine, rng = mwserved
        queries = [rng.standard_normal((7, 128)).astype(np.float32)
                   for _ in range(24)]
        results = [None] * len(queries)

        def hit(i):
            _, body = _post(
                f"http://{server.host}:{server.port}/search",
                {"embedding": queries[i].tolist(), "mode": "two_stage",
                 "top_k": 3, "prefetch_k": 16})
            results[i] = [r["id"] for r in body["results"]]

        threads = [threading.Thread(target=hit, args=(i,))
                   for i in range(len(queries))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        for i, q in enumerate(queries):
            direct = engine.search_embedded(q, mode="two_stage", top_k=3,
                                            prefetch_k=16, with_payload=False)
            assert results[i] == [r["id"] for r in direct]
        # the shared backend batcher actually coalesced requests
        code, stats = _get(f"http://{server.host}:{server.port}/stats")
        assert code == 200 and stats["requests"] >= 25
        assert stats["batches"] < stats["requests"]

    def test_bad_requests_rejected_in_worker(self, mwserved):
        server, _, _ = mwserved
        url = f"http://{server.host}:{server.port}/search"
        code, body = _post(url, {"embedding": [1.0, 2.0]})
        assert code == 400 and "embedding" in body["error"]
        code, body = _post(url, {"query": "text but no embedder"})
        assert code == 400 and "embedder" in body["error"]
        code, body = _get(f"http://{server.host}:{server.port}/healthz")
        assert code == 200  # workers survive bad requests
