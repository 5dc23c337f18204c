"""Metrics, deterministic IDs, atomic IO, config system."""

import json

import numpy as np
import pytest

from visual_rag_tpu.utils.ids import generate_point_id, stable_doc_uuid, union_point_id
from visual_rag_tpu.utils.io import append_jsonl, dedupe_jsonl, read_jsonl, write_json_atomic
from visual_rag_tpu.utils.metrics import mrr_at_k, ndcg_at_k, recall_at_k


class TestMetrics:
    def test_perfect_ranking(self):
        qrels = {"a": 1, "b": 1}
        assert ndcg_at_k(["a", "b", "c"], qrels, 10) == pytest.approx(1.0)
        assert mrr_at_k(["a", "b"], qrels, 10) == pytest.approx(1.0)
        assert recall_at_k(["a", "b"], qrels, 10) == pytest.approx(1.0)

    def test_graded_ndcg(self):
        qrels = {"a": 2, "b": 1}
        # ideal = [2,1]; ranking [b,a]
        dcg = (2**1 - 1) / np.log2(2) + (2**2 - 1) / np.log2(3)
        idcg = (2**2 - 1) / np.log2(2) + (2**1 - 1) / np.log2(3)
        assert ndcg_at_k(["b", "a"], qrels, 10) == pytest.approx(dcg / idcg)

    def test_mrr_position(self):
        assert mrr_at_k(["x", "y", "a"], {"a": 1}, 10) == pytest.approx(1 / 3)
        assert mrr_at_k(["x", "y"], {"a": 1}, 10) == 0.0

    def test_recall_fraction(self):
        assert recall_at_k(["a", "x"], {"a": 1, "b": 1}, 2) == pytest.approx(0.5)
        assert recall_at_k(["a"], {}, 5) == 0.0

    def test_cutoff_respected(self):
        assert mrr_at_k(["x", "a"], {"a": 1}, 1) == 0.0
        assert ndcg_at_k(["x", "a"], {"a": 1}, 1) == 0.0

    def test_metrics_at_ks_matches_scalar(self):
        from visual_rag_tpu.utils.metrics import metrics_at_ks

        rng = np.random.default_rng(7)
        for _ in range(20):
            docs = [f"d{i}" for i in range(30)]
            qrels = {d: int(rng.integers(0, 3)) for d in rng.choice(docs, 8, replace=False)}
            ranking = list(rng.permutation(docs))[: int(rng.integers(0, 25))]
            ks = [0, 1, 3, 5, 10, 100]  # k=0 must report 0.0, not full-window
            batched = metrics_at_ks(ranking, qrels, ks)
            for k in ks:
                assert batched[f"ndcg@{k}"] == pytest.approx(ndcg_at_k(ranking, qrels, k))
                assert batched[f"mrr@{k}"] == pytest.approx(mrr_at_k(ranking, qrels, k))
                assert batched[f"recall@{k}"] == pytest.approx(recall_at_k(ranking, qrels, k))


class TestIds:
    def test_deterministic_uuid_format(self):
        a = generate_point_id("doc.pdf", 3)
        b = generate_point_id("doc.pdf", 3)
        assert a == b
        parts = a.split("-")
        assert [len(p) for p in parts] == [8, 4, 4, 4, 12]

    def test_uniqueness(self):
        ids = {generate_point_id("doc.pdf", i) for i in range(100)}
        ids |= {generate_point_id(f"doc{i}.pdf", 0) for i in range(100)}
        assert len(ids) == 200

    def test_reference_key_format(self):
        # Must equal sha256("{filename}:page:{n}")[:32] formatted 8-4-4-4-12
        # (reference: qdrant_indexer.py:602-613).
        import hashlib

        h = hashlib.sha256(b"f.pdf:page:7").hexdigest()[:32]
        expected = f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"
        assert generate_point_id("f.pdf", 7) == expected

    def test_union_id_namespacing(self):
        import hashlib

        h = hashlib.sha256(b"coll::ds::42").hexdigest()[:32]
        expected = f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"
        assert union_point_id("ds", "42", namespace="coll") == expected
        assert union_point_id("ds", "42") != union_point_id("ds2", "42")
        assert stable_doc_uuid("k") == stable_doc_uuid("k")


class TestIO:
    def test_atomic_json(self, tmp_path):
        p = tmp_path / "out" / "report.json"
        write_json_atomic(p, {"x": 1})
        assert json.loads(p.read_text()) == {"x": 1}
        write_json_atomic(p, {"x": 2})
        assert json.loads(p.read_text()) == {"x": 2}

    def test_jsonl_roundtrip_and_dedupe(self, tmp_path):
        p = tmp_path / "fail.jsonl"
        append_jsonl(p, {"doc": "a", "err": 1})
        append_jsonl(p, {"doc": "b", "err": 1})
        append_jsonl(p, {"doc": "a", "err": 2})
        assert len(read_jsonl(p)) == 3
        kept = dedupe_jsonl(p, ["doc"])
        assert kept == 2
        recs = {r["doc"]: r for r in read_jsonl(p)}
        assert recs["a"]["err"] == 2


class TestConfig:
    def test_yaml_load_and_get(self, tmp_path, monkeypatch):
        from visual_rag_tpu import config as cfg

        yml = tmp_path / "config.yaml"
        yml.write_text("embedding:\n  model: vidore/colpali-v1.3\n  batch_size: 4\n")
        monkeypatch.setenv("VISUALRAG_CONFIG", str(yml))
        cfg.reset_cache()
        assert cfg.get("embedding.model") == "vidore/colpali-v1.3"
        assert cfg.get("embedding.batch_size") == 4
        assert cfg.get("missing.key", "dflt") == "dflt"
        cfg.reset_cache()

    def test_env_override_with_coercion(self, tmp_path, monkeypatch):
        from visual_rag_tpu import config as cfg

        yml = tmp_path / "config.yaml"
        yml.write_text("embedding:\n  batch_size: 4\n")
        monkeypatch.setenv("VISUALRAG_CONFIG", str(yml))
        monkeypatch.setenv("VISUALRAG_BATCH_SIZE", "16")
        monkeypatch.setenv("VISUALRAG_MODEL", "vidore/colSmol-500M")
        cfg.reset_cache()
        assert cfg.get("embedding.batch_size") == 16  # coerced to int
        assert cfg.get("embedding.model") == "vidore/colSmol-500M"
        cfg.reset_cache()

    def test_missing_file_defaults(self, tmp_path, monkeypatch):
        from visual_rag_tpu import config as cfg

        monkeypatch.delenv("VISUALRAG_CONFIG", raising=False)
        monkeypatch.chdir(tmp_path)
        cfg.reset_cache()
        emb = cfg.get_embedding_config()
        assert emb["batch_size"] == 8
        idx = cfg.get_index_config()
        assert idx["storage_dtype"] == "bfloat16"
        cfg.reset_cache()
