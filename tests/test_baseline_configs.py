"""Integration tests mapping BASELINE.json's five target configs, hermetically.

Each config exercises the exact schema + retrieval plan named in
/root/repo/BASELINE.md (measured numbers come from bench.py / the harness on
real data; these tests pin the *wiring* for each config).
"""

import dataclasses

import numpy as np

from visual_rag_tpu.index import CollectionSchema, IndexBuilder
from visual_rag_tpu.index.builder import VectorSpec
from visual_rag_tpu.models.colvlm import ColVLMConfig
from visual_rag_tpu.models.embedder import VisualEmbedder
from visual_rag_tpu.parallel import ShardedEngine, ShardedIndex, make_mesh
from visual_rag_tpu.pipeline.pipeline import experimental_vector_plan
from visual_rag_tpu.retrieval import RetrievalEngine


def _build_collection(embedder, images, storage_dtype, pooling_windows=(3,),
                      max_mean_pool_vectors=32, kernel="auto"):
    plan = experimental_vector_plan(
        embedder.backend, pooling_windows=pooling_windows, kernel=kernel)
    dim = embedder.cfg.embed_dim
    vectors = {
        "initial": VectorSpec("initial", "ragged", dim),
        "mean_pooling": VectorSpec("mean_pooling", "padded", dim),
        "global_pooling": VectorSpec("global_pooling", "single", dim),
        **{n: VectorSpec(n, "padded", dim) for n in plan["names"]},
    }
    builder = IndexBuilder(CollectionSchema(vectors=vectors, storage_dtype=storage_dtype))
    embs, infos = embedder.embed_images(images, return_token_info=True)
    for i, (emb, info) in enumerate(zip(embs, infos)):
        visual = embedder.extract_visual_embedding(emb, info)
        mp = np.asarray(embedder.mean_pool_visual_embedding(
            visual, info, target_vectors=max_mean_pool_vectors))
        vecs = {
            "initial": visual,
            "mean_pooling": mp,
            "global_pooling": np.asarray(embedder.global_pool_from_mean_pool(mp)),
        }
        for name, spec in plan["producers"].items():
            kw = {}
            if spec["kind"] == "smooth":
                kw = {"kernel": spec["kernel"], "window_size": spec["window"]}
            elif spec["kind"] == "legacy":
                kw = {"kernel": "legacy", "window_size": spec["window"]}
            vecs[name] = np.asarray(embedder.experimental_pool_visual_embedding(
                visual, info, mean_pool=mp, **kw))
        vecs.setdefault("experimental_pooling", vecs[plan["canonical"]])
        builder.add(f"p{i}", vecs, {"i": i})
    return builder, plan


def _images(n, seed=0):
    rng = np.random.default_rng(seed)
    return [(rng.random((180, 140, 3)) * 255).astype(np.uint8) for i in range(n)]


class TestConfig1ColSmolTwoStageFp16:
    def test_tokens_vs_experimental_prefetch_plus_exact_rerank(self):
        emb = VisualEmbedder("vidore/colSmol-500M", config=ColVLMConfig.tiny())
        builder, _ = _build_collection(emb, _images(6), "float16")
        engine = RetrievalEngine(builder.seal(), compute_dtype="float32")
        assert str(engine.index.store("initial").flat.dtype) == "float16"
        q = emb.embed_query("find this page")
        res = engine.search_embedded(
            q, mode="two_stage", top_k=3, prefetch_k=4,
            stage1_mode="tokens_vs_experimental_pooling")
        assert len(res) == 3 and all(np.isfinite(r["score_final"]) for r in res)


class TestConfig2SingleStageAblations:
    def test_pooled_query_vs_global_and_tokens_vs_doc(self):
        emb = VisualEmbedder("vidore/colSmol-500M", config=ColVLMConfig.tiny())
        builder, _ = _build_collection(emb, _images(5), "float32")
        engine = RetrievalEngine(builder.seal(), compute_dtype="float32")
        q = emb.embed_query("ablation query")
        for mode in ("single_global", "single_tiles", "single_full"):
            res = engine.search_embedded(q, mode=mode, top_k=3)
            assert len(res) == 3, mode


class TestConfig3ColPaliWindowsThreeStage:
    def test_experimental_windows_and_three_stage(self):
        tiny = ColVLMConfig.tiny()
        # ColPali's fixed 32x32 grid needs 1024 patch positions
        cfg = dataclasses.replace(
            tiny, vision=dataclasses.replace(tiny.vision, max_patches=1024))
        emb = VisualEmbedder("vidore/colpali-v1.3", config=cfg)
        builder, plan = _build_collection(
            emb, _images(6), "float32", pooling_windows=(3, 5))
        assert {"experimental_pooling_3", "experimental_pooling_5"} <= set(
            builder.schema.vectors)
        index = builder.seal()
        # select the k=5 variant like --experimental-pooling-k 5
        engine5 = RetrievalEngine(
            index, compute_dtype="float32",
            experimental_vector_name="experimental_pooling_5")
        q = emb.embed_query("legacy conv windows")
        res = engine5.search_embedded(q, mode="single_experimental_tokens", top_k=3)
        assert len(res) == 3
        res3 = engine5.search_embedded(
            q, mode="three_stage", top_k=3, stage1_k=6, stage2_k=4)
        assert len(res3) == 3
        assert {"score_stage1", "score_stage2", "score_stage3"} <= set(res3[0])


class TestConfig4ColQwenAdaptiveInt8:
    def test_adaptive_cap_kernels_int8_storage(self):
        cfg = dataclasses.replace(ColVLMConfig.tiny(), spatial_merge=2)
        emb = VisualEmbedder("vidore/colqwen2.5-v0.2", config=cfg)
        builder, plan = _build_collection(
            emb, _images(6), "int8", max_mean_pool_vectors=8)
        assert {"experimental_pooling_gaussian",
                "experimental_pooling_triangular"} <= set(builder.schema.vectors)
        index = builder.seal()
        assert index.store("initial").scales is not None
        assert np.asarray(index.store("mean_pooling").mask).sum(axis=1).max() <= 8
        engine = RetrievalEngine(
            index, compute_dtype="float32",
            experimental_vector_name="experimental_pooling_triangular")
        q = emb.embed_query("quantized store query")
        res = engine.search_embedded(q, mode="two_stage", top_k=3, prefetch_k=4)
        assert len(res) == 3


class TestConfig5ShardedSuite:
    def test_sharded_beir_protocol(self):
        emb = VisualEmbedder("vidore/colSmol-500M", config=ColVLMConfig.tiny())
        builder, _ = _build_collection(emb, _images(11), "float32")
        index = builder.seal()
        mesh = make_mesh((8,), ("data",))
        sengine = ShardedEngine(ShardedIndex.from_index(index, mesh), use_pallas=False)
        engine = RetrievalEngine(index, compute_dtype="float32")
        queries = [emb.embed_query(f"query {i}") for i in range(3)]
        sharded = sengine.search_embedded_batch(
            queries, mode="two_stage", top_k=5, prefetch_k=6,
            stage1_mode="tokens_vs_experimental_pooling")
        single = engine.search_embedded_batch(
            queries, mode="two_stage", top_k=5, prefetch_k=6,
            stage1_mode="tokens_vs_experimental_pooling")
        for a, b in zip(sharded, single):
            assert [r["id"] for r in a] == [r["id"] for r in b]
