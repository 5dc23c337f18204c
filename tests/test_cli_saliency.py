"""CLI surface and saliency map math."""

import json

import numpy as np
import pytest

from visual_rag_tpu.visualization.saliency import generate_saliency_map


class TestSaliency:
    def test_tile_layout_highlights_matching_patch(self):
        rng = np.random.default_rng(0)
        dim = 32
        # 1x2 tile grid + global = 3 tiles, 64 patches each
        n_patches = 3 * 64
        doc = rng.standard_normal((n_patches, dim)).astype(np.float32)
        q = doc[70:71] * 5  # strongly matches patch 70 (tile 1, second tile)
        sal, info = generate_saliency_map(q, doc, n_rows=1, n_cols=2)
        assert info["layout"] == "tiles"
        assert sal.shape == (8, 16)  # 1 row x 2 cols of 8x8
        # patch 70 = tile 1, patch 6 -> row 0, col 8+6
        assert sal.max() == pytest.approx(1.0)
        r, c = np.unravel_index(sal.argmax(), sal.shape)
        assert c >= 8  # in the second tile

    def test_square_layout(self):
        rng = np.random.default_rng(1)
        doc = rng.standard_normal((16, 8)).astype(np.float32)
        q = rng.standard_normal((3, 8)).astype(np.float32)
        sal, info = generate_saliency_map(q, doc)
        assert info["layout"] == "square"
        assert sal.shape == (4, 4)
        assert 0.0 <= sal.min() and sal.max() <= 1.0

    def test_ragged_strip_fallback(self):
        doc = np.random.default_rng(2).standard_normal((7, 8)).astype(np.float32)
        q = np.random.default_rng(3).standard_normal((2, 8)).astype(np.float32)
        sal, info = generate_saliency_map(q, doc)
        assert info["layout"] == "strip"
        assert sal.shape == (1, 7)


class TestCLI:
    def test_end_to_end_process_like_flow_and_search(self, tmp_path, capsys, monkeypatch):
        # CLI 'process' needs PDFs; drive the same wiring through process_images
        # then exercise the real search/info commands against the saved index.
        from visual_rag_tpu.cli.main import main
        from visual_rag_tpu.index import CollectionSchema, IndexBuilder
        from visual_rag_tpu.index.builder import VectorSpec
        from visual_rag_tpu.models.colvlm import ColVLMConfig
        from visual_rag_tpu.models.embedder import VisualEmbedder
        from visual_rag_tpu.pipeline import ProcessingPipeline
        from visual_rag_tpu.pipeline.pipeline import experimental_vector_plan

        cfg = ColVLMConfig.tiny()
        embedder = VisualEmbedder("vidore/colSmol-500M", config=cfg, batch_size=2)
        plan = experimental_vector_plan("colsmol")
        dim = cfg.embed_dim
        vectors = {
            "initial": VectorSpec("initial", "ragged", dim),
            "mean_pooling": VectorSpec("mean_pooling", "padded", dim),
            "global_pooling": VectorSpec("global_pooling", "single", dim),
            **{n: VectorSpec(n, "padded", dim) for n in plan["names"]},
        }
        builder = IndexBuilder(CollectionSchema(vectors=vectors, storage_dtype="float32"))
        pipe = ProcessingPipeline(embedder, builder)
        rng = np.random.default_rng(0)
        imgs = [(rng.random((160, 120, 3)) * 255).astype(np.uint8) for _ in range(2)]
        pipe.process_images(imgs, "cli_doc.pdf", {"year": 2023})
        coll_dir = tmp_path / "idx" / "mycoll"
        builder.save(coll_dir)

        # monkeypatch the CLI's embedder to reuse the tiny config
        import visual_rag_tpu.models.embedder as emb_mod

        orig = emb_mod.VisualEmbedder

        def tiny_factory(model_name, *a, **kw):
            kw["config"] = cfg
            return orig(model_name, *a, **kw)

        monkeypatch.setattr(emb_mod, "VisualEmbedder", tiny_factory)

        rc = main(["search", "budget report", "--index-dir", str(tmp_path / "idx"),
                   "--collection", "mycoll", "--mode", "two_stage",
                   "--top-k", "2", "--json"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert len(out["results"]) == 2
        assert out["results"][0]["payload"]["year"] == 2023

        rc = main(["info", "--index-dir", str(tmp_path / "idx"),
                   "--collection", "mycoll"])
        assert rc == 0
        info = json.loads(capsys.readouterr().out)
        assert info["points_count"] == 2
        assert "initial" in info["vectors"]

    def test_search_unknown_experimental_vector_exits(self, tmp_path):
        from visual_rag_tpu.cli.main import main
        from visual_rag_tpu.index import CollectionSchema, IndexBuilder

        builder = IndexBuilder(CollectionSchema.standard(storage_dtype="float32"))
        coll = tmp_path / "idx" / "c"
        builder.save(coll)
        with pytest.raises(SystemExit):
            main(["search", "q", "--index-dir", str(tmp_path / "idx"),
                  "--collection", "c", "--experimental-pooling-k", "7"])

    def test_missing_collection_exits(self, tmp_path):
        from visual_rag_tpu.cli.main import main

        with pytest.raises(SystemExit):
            main(["info", "--index-dir", str(tmp_path), "--collection", "nope"])


class TestSaliencyOverlay:
    def test_overlay_and_results_figure(self):
        import matplotlib

        matplotlib.use("Agg")
        from visual_rag_tpu.visualization.saliency import (
            create_saliency_overlay, generate_saliency_map, visualize_search_results)

        rng = np.random.default_rng(0)
        doc = rng.standard_normal((2 * 64, 16)).astype(np.float32)
        q = rng.standard_normal((3, 16)).astype(np.float32)
        sal, _ = generate_saliency_map(q, doc, n_rows=1, n_cols=2)
        img = (rng.random((64, 128, 3)) * 255).astype(np.uint8)
        out = create_saliency_overlay(img, sal, threshold_percentile=50)
        assert out.size == (128, 64)  # PIL (w, h)
        fig = visualize_search_results(
            "query", [{"score_final": 1.0, "payload": {"filename": "a", "page_number": 1}},
                      {"score_final": 0.5, "payload": {}}],
            images=[img, None])
        assert fig is not None
        with pytest.raises(ValueError):
            visualize_search_results("q", [])
