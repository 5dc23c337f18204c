"""Ingest pipeline: crop, geometry, metadata, end-to-end image indexing."""

import numpy as np
import pytest

from visual_rag_tpu.index import CollectionSchema, IndexBuilder
from visual_rag_tpu.index.builder import VectorSpec
from visual_rag_tpu.models.colvlm import ColVLMConfig
from visual_rag_tpu.models.embedder import VisualEmbedder
from visual_rag_tpu.pipeline import CropEmptyConfig, PDFProcessor, ProcessingPipeline, crop_empty
from visual_rag_tpu.pipeline.pipeline import experimental_vector_plan
from visual_rag_tpu.retrieval import RetrievalEngine


class TestCropEmpty:
    def test_crops_white_borders(self):
        img = np.full((100, 80, 3), 255, dtype=np.uint8)
        img[30:70, 20:60] = 0  # content block
        cropped, meta = crop_empty(img, config=CropEmptyConfig(preserve_border_px=0))
        assert meta["applied"]
        assert meta["crop_box"] == [20, 30, 60, 70]
        assert cropped.shape[0] == 40 and cropped.shape[1] == 40

    def test_preserve_border(self):
        img = np.full((100, 80, 3), 255, dtype=np.uint8)
        img[30:70, 20:60] = 0
        _, meta = crop_empty(img, config=CropEmptyConfig(preserve_border_px=5))
        assert meta["crop_box"] == [15, 25, 65, 75]

    def test_all_white_invalid(self):
        img = np.full((50, 50, 3), 255, dtype=np.uint8)
        out, meta = crop_empty(img, config=CropEmptyConfig())
        assert not meta["applied"]
        assert meta["crop_box"] is None

    def test_remove_page_number(self):
        img = np.full((200, 100, 3), 255, dtype=np.uint8)
        img[20:100, 10:90] = 0  # dense main text
        img[180, 48:52] = 0  # tiny page number: 4/100 = 4% density < 5%
        _, meta_keep = crop_empty(img, config=CropEmptyConfig(
            remove_page_number=False, preserve_border_px=0))
        _, meta_drop = crop_empty(img, config=CropEmptyConfig(
            remove_page_number=True, preserve_border_px=0))
        assert meta_keep["crop_box"][3] == 181  # includes page number
        assert meta_drop["crop_box"][3] == 100  # main text only

    def test_config_echoed(self):
        img = np.full((50, 50, 3), 0, dtype=np.uint8)
        _, meta = crop_empty(img, config=CropEmptyConfig(color_threshold=200))
        assert meta["config"]["color_threshold"] == 200
        assert "min_white_fraction" in meta["config"]


class TestResizeGeometry:
    def test_square_image(self):
        p = PDFProcessor()
        img = np.zeros((1024, 1024, 3), dtype=np.uint8)
        resized, rows, cols = p.resize_for_colpali(img)
        assert (rows, cols) == (4, 4)
        assert resized.shape[:2] == (2048, 2048)

    def test_wide_image_canvas_centered(self):
        p = PDFProcessor()
        img = np.zeros((500, 2000, 3), dtype=np.uint8)
        resized, rows, cols = p.resize_for_colpali(img)
        assert cols == 4
        assert resized.shape[1] == cols * 512
        assert resized.shape[0] == rows * 512

    def test_filename_metadata(self):
        p = PDFProcessor()
        m = p.extract_metadata_from_filename("Gulu DLG Report 2021.pdf")
        assert m["year"] == 2021
        assert m["source"] == "Local Government"
        assert m["district"] == "Gulu"
        m2 = p.extract_metadata_from_filename("random_stuff.pdf")
        assert m2["source"] == "Unknown"
        m3 = p.extract_metadata_from_filename(
            "x.pdf", mapping={"x": {"source": "Ministry", "year": 2020}})
        assert m3 == {"source": "Ministry", "year": 2020}


class TestExperimentalPlan:
    def test_colqwen_plan(self):
        plan = experimental_vector_plan("colqwen2.5")
        assert set(plan["producers"]) == {
            "experimental_pooling_gaussian", "experimental_pooling_triangular"}
        assert plan["canonical"] == "experimental_pooling_gaussian"
        assert "experimental_pooling" in plan["names"]

    def test_colpali_plan_windows(self):
        plan = experimental_vector_plan("colpali", pooling_windows=(3, 5))
        assert set(plan["producers"]) == {
            "experimental_pooling_3", "experimental_pooling_5"}
        assert plan["canonical"] == "experimental_pooling_3"

    def test_colsmol_2d(self):
        plan = experimental_vector_plan("colsmol", colsmol_2d=True)
        assert set(plan["producers"]) == {
            "experimental_pooling", "experimental_pooling_2d"}


@pytest.fixture(scope="module")
def tiny_pipeline():
    cfg = ColVLMConfig.tiny()
    embedder = VisualEmbedder("vidore/colSmol-500M", config=cfg, batch_size=2)
    plan = experimental_vector_plan("colsmol")
    vectors = {
        "initial": VectorSpec("initial", "ragged", cfg.embed_dim),
        "mean_pooling": VectorSpec("mean_pooling", "padded", cfg.embed_dim),
        "global_pooling": VectorSpec("global_pooling", "single", cfg.embed_dim),
        **{n: VectorSpec(n, "padded", cfg.embed_dim) for n in plan["names"]},
    }
    schema = CollectionSchema(vectors=vectors, storage_dtype="float32")
    builder = IndexBuilder(schema)
    pipeline = ProcessingPipeline(
        embedder, builder, strategy="pooling",
        crop_config=CropEmptyConfig(), upload_batch_size=2)
    return embedder, builder, pipeline


class TestPipelineEndToEnd:
    def test_images_to_searchable_index(self, tiny_pipeline):
        embedder, builder, pipeline = tiny_pipeline
        rng = np.random.default_rng(0)
        images = [
            (rng.random((200, 150, 3)) * 255).astype(np.uint8) for _ in range(3)
        ]
        # put content in the images so crop doesn't no-op everything
        stats = pipeline.process_images(images, "mydoc.pdf", {"year": 2021})
        assert stats.pages_processed == 3
        assert stats.pages_failed == 0
        assert len(builder) == 3
        # deterministic ids -> re-processing skips at the builder level
        stats2 = pipeline.process_images(images, "mydoc.pdf", {"year": 2021})
        assert len(builder) == 3

        # payload provenance present
        payload = builder.manifest.payload(0)
        assert payload["year"] == 2021
        assert payload["pooling"]["strategy"] == "pooling"
        assert payload["num_visual_tokens"] > 0

        # the sealed index is searchable end to end
        engine = RetrievalEngine(builder.seal(), compute_dtype="float32")
        q = embedder.embed_query("find the thing")
        res = engine.search_embedded(q, mode="two_stage", top_k=2, prefetch_k=3)
        assert len(res) == 2
        assert res[0]["id"] == pipeline.generate_chunk_id("mydoc.pdf", res[0]["payload"]["page_number"])

    def test_required_vector_names(self, tiny_pipeline):
        _, _, pipeline = tiny_pipeline
        names = pipeline.required_vector_names
        assert "initial" in names and "experimental_pooling" in names


class TestStrategies:
    @pytest.mark.parametrize("strategy", ["standard", "all"])
    def test_strategy_vector_shapes(self, strategy):
        cfg = ColVLMConfig.tiny()
        embedder = VisualEmbedder("vidore/colSmol-500M", config=cfg, batch_size=2)
        plan = experimental_vector_plan("colsmol")
        vectors = {
            "initial": VectorSpec("initial", "ragged", cfg.embed_dim),
            "mean_pooling": VectorSpec("mean_pooling", "padded", cfg.embed_dim),
            "global_pooling": VectorSpec("global_pooling", "single", cfg.embed_dim),
            **{n: VectorSpec(n, "padded", cfg.embed_dim) for n in plan["names"]},
        }
        builder = IndexBuilder(CollectionSchema(vectors=vectors, storage_dtype="float32"))
        pipe = ProcessingPipeline(embedder, builder, strategy=strategy)
        rng = np.random.default_rng(0)
        imgs = [(rng.random((150, 110, 3)) * 255).astype(np.uint8)]
        stats = pipe.process_images(imgs, f"{strategy}.pdf")
        assert stats.pages_processed == 1
        idx = builder.seal()
        init = idx.store("initial")
        mp = idx.store("mean_pooling")
        n_visual = 2 * 64  # one 512px tile + global tile
        if strategy == "all":
            # visual tokens only (reference pipeline strategy=pooling/all)
            assert init.total_tokens == n_visual
            assert int(np.asarray(mp.mask).sum()) == 2  # tile means
        else:  # standard: ALL tokens incl. prompt; mean_pooling is [1, dim]
            assert init.total_tokens > n_visual
            assert int(np.asarray(mp.mask).sum()) == 1

    def test_invalid_strategy_raises(self):
        cfg = ColVLMConfig.tiny()
        embedder = VisualEmbedder("vidore/colSmol-500M", config=cfg)
        builder = IndexBuilder(CollectionSchema.standard(dim=cfg.embed_dim))
        with pytest.raises(ValueError, match="strategy"):
            ProcessingPipeline(embedder, builder, strategy="warp")
