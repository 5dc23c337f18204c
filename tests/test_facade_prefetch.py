"""MultiVectorRetriever facade + host prefetcher."""

import time

import numpy as np

from visual_rag_tpu.pipeline.prefetch import HostPrefetcher, PrefetchError, prefetched_batches


class TestPrefetcher:
    def test_order_preserved(self):
        out = list(HostPrefetcher(lambda x: x * 2, workers=4)(range(50)))
        assert out == [x * 2 for x in range(50)]

    def test_errors_in_order_dont_kill_stream(self):
        def fn(x):
            if x == 3:
                raise ValueError("boom")
            return x

        out = list(HostPrefetcher(fn, workers=2)(range(6)))
        assert out[:3] == [0, 1, 2]
        assert isinstance(out[3], PrefetchError)
        assert out[4:] == [4, 5]

    def test_overlap_actually_happens(self):
        t0 = time.time()
        list(HostPrefetcher(lambda x: time.sleep(0.05) or x, workers=8,
                            lookahead=16)(range(16)))
        elapsed = time.time() - t0
        assert elapsed < 0.05 * 16 * 0.7  # clearly parallel, not serial

    def test_prefetched_batches(self):
        def prep(x):
            if x % 5 == 4:
                raise RuntimeError("bad")
            return x

        batches = list(prefetched_batches(range(12), 4, prep, workers=3))
        flat = [x for b, _ in batches for x in b]
        errs = [e for _, es in batches for e in es]
        assert flat == [x for x in range(12) if x % 5 != 4]
        assert len(errs) == 2


class TestFacade:
    def test_text_search_and_batch(self, tmp_path):
        from visual_rag_tpu.index import CollectionSchema, IndexBuilder
        from visual_rag_tpu.index.builder import VectorSpec
        from visual_rag_tpu.models.colvlm import ColVLMConfig
        from visual_rag_tpu.models.embedder import VisualEmbedder
        from visual_rag_tpu.pipeline import ProcessingPipeline
        from visual_rag_tpu.pipeline.pipeline import experimental_vector_plan
        from visual_rag_tpu.retrieval.facade import MultiVectorRetriever

        cfg = ColVLMConfig.tiny()
        embedder = VisualEmbedder("vidore/colSmol-500M", config=cfg, batch_size=2)
        plan = experimental_vector_plan("colsmol")
        vectors = {
            "initial": VectorSpec("initial", "ragged", 128),
            "mean_pooling": VectorSpec("mean_pooling", "padded", 128),
            "global_pooling": VectorSpec("global_pooling", "single", 128),
            **{n: VectorSpec(n, "padded", 128) for n in plan["names"]},
        }
        builder = IndexBuilder(CollectionSchema(vectors=vectors, storage_dtype="float32"))
        pipe = ProcessingPipeline(embedder, builder, prefetch_workers=2)
        rng = np.random.default_rng(0)
        imgs = [(rng.random((150, 110, 3)) * 255).astype(np.uint8) for _ in range(4)]
        stats = pipe.process_images(imgs, "facade.pdf", {"year": 2025})
        assert stats.pages_processed == 4 and stats.pages_failed == 0
        # idempotent reprocessing through the prefetched path
        stats2 = pipe.process_images(imgs, "facade.pdf")
        assert stats2.pages_skipped == 4 and stats2.pages_processed == 0

        coll = tmp_path / "idx" / "fc"
        builder.save(coll)
        retriever = MultiVectorRetriever(
            index_dir=str(tmp_path / "idx"), collection="fc", embedder=embedder)
        res = retriever.search("annual report", mode="two_stage", top_k=2)
        assert len(res) == 2 and res[0]["payload"]["year"] == 2025
        batch = retriever.search_batch(["q one", "q two"], mode="single_global", top_k=2)
        assert len(batch) == 2 and len(batch[0]) == 2
        res3 = retriever.search("cascade", mode="three_stage", top_k=2,
                                stage1_k=4, stage2_k=3)
        assert len(res3) == 2  # no reference TypeError here
