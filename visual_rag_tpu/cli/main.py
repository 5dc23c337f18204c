"""CLI entry point: ``visual-rag-tpu process | search | info``.

Surface parity with reference visual_rag/cli/main.py:518-826:
- process: scan a PDF directory, wire embedder + index builder + pipeline,
  metadata mapping, dry-run, summary
- search: embed a text query and run any retrieval mode with filters;
  experimental vector selection via --experimental-pooling-k (ColPali) or
  --experimental-pooling-technique (ColQwen), mutually exclusive, validated
  against the collection schema
- info: collection status / points / named vectors

The Qdrant endpoint flags are replaced by --index-dir (the on-disk collection
directory this engine persists to).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from pathlib import Path
from typing import List, Optional

logger = logging.getLogger("visual_rag_tpu.cli")


def _add_common(parser):
    parser.add_argument("--index-dir", default="index_data", help="collection root dir")
    parser.add_argument("--collection", default="visual_rag", help="collection name")
    parser.add_argument("--model", default="vidore/colSmol-500M")
    parser.add_argument("--checkpoint", default=None,
                        help="local directory of *.safetensors (real model "
                             "weights); config is inferred from its "
                             "config.json + tensor shapes")
    parser.add_argument("--tokenizer", default=None,
                        help="local tokenizer.json (or a checkpoint dir "
                             "containing one); defaults to $VISUALRAG_TOKENIZER "
                             "or, failing that, the hash tokenizer")
    parser.add_argument("--verbose", action="store_true")


def _make_embedder(args, config=None, params=None, **kw):
    """VisualEmbedder honoring --checkpoint/--tokenizer (turnkey real weights)."""
    from visual_rag_tpu.models.embedder import VisualEmbedder

    checkpoint = getattr(args, "checkpoint", None)
    if checkpoint and config is None:
        from visual_rag_tpu.models.convert import (
            config_from_checkpoint,
            read_state_dict,
        )

        config = config_from_checkpoint(
            checkpoint, args.model, state_dict=read_state_dict(checkpoint))
    tokenizer = getattr(args, "tokenizer", None)
    for d in (checkpoint, getattr(args, "checkpoint_dir", None)):
        if not tokenizer and d and (Path(d) / "tokenizer.json").exists():
            tokenizer = d  # HF snapshots ship tokenizer.json alongside
    return VisualEmbedder(
        args.model, config=config, params=params,
        checkpoint=None if params is not None else checkpoint,
        tokenizer_path=tokenizer, **kw)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="visual-rag-tpu",
        description="TPU-native visual document retrieval (late interaction)")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("process", help="index PDFs into a collection")
    _add_common(p)
    p.add_argument("pdf_dir", help="directory containing PDFs (or a single PDF)")
    p.add_argument("--strategy", choices=("pooling", "standard", "all"), default="pooling")
    p.add_argument("--storage-dtype", default="bfloat16",
                   choices=("float32", "bfloat16", "float16", "int8"))
    p.add_argument("--embedding-batch-size", type=int, default=8)
    p.add_argument("--upload-batch-size", type=int, default=16)
    p.add_argument("--max-mean-pool-vectors", type=int, default=32)
    p.add_argument("--pooling-windows", type=int, nargs="+", default=[3])
    p.add_argument("--experimental-pooling-kernel", default="auto",
                   choices=("auto", "legacy", "uniform", "triangular", "gaussian"))
    p.add_argument("--colsmol-experimental-2d", action="store_true")
    p.add_argument("--crop", action="store_true", help="crop empty page borders")
    p.add_argument("--image-store", metavar="DIR", default=None,
                   help="store page images (original/cropped/resized JPEGs) "
                        "under DIR and record their file:// URLs in payloads "
                        "— enables playground image + saliency rendering")
    p.add_argument("--metadata-mapping", help="JSON file {filename: metadata}")
    p.add_argument("--no-skip-existing", action="store_true")
    p.add_argument("--dry-run", action="store_true")

    s = sub.add_parser("search", help="search a collection with a text query")
    _add_common(s)
    s.add_argument("query")
    s.add_argument("--stage1-cut", choices=["auto", "exact", "approx"],
                   default="auto",
                   help="candidate-cut policy: auto uses approx_max_k at "
                        ">=64k docs (HNSW-parity; exact rerank regardless)")
    s.add_argument("--mode", default="two_stage",
                   choices=("single_full", "single_tiles", "single_pooled",
                            "single_global", "single_experimental_tokens",
                            "single_experimental_pooled", "two_stage", "three_stage"))
    s.add_argument("--top-k", type=int, default=10)
    s.add_argument("--prefetch-k", type=int, default=None)
    s.add_argument("--stage1-mode", default="pooled_query_vs_standard_pooling")
    s.add_argument("--stage1-k", type=int, default=1000)
    s.add_argument("--stage2-k", type=int, default=300)
    group = s.add_mutually_exclusive_group()
    group.add_argument("--experimental-pooling-k", type=int,
                       help="ColPali window variant (experimental_pooling_{k})")
    group.add_argument("--experimental-pooling-technique",
                       choices=("gaussian", "triangular"),
                       help="ColQwen smoothing variant")
    s.add_argument("--year", type=int)
    s.add_argument("--source")
    s.add_argument("--district")
    s.add_argument("--filename")
    s.add_argument("--has-text", action="store_true", default=None)
    s.add_argument("--json", action="store_true", help="machine-readable output")

    i = sub.add_parser("info", help="show collection status")
    _add_common(i)

    c = sub.add_parser(
        "checkpoint",
        help="convert + validate a local HF checkpoint (*.safetensors); "
             "optionally run an embed->index->search smoke test with it")
    _add_common(c)
    c.add_argument("checkpoint_dir",
                   help="directory with *.safetensors (+ config.json / "
                        "tokenizer.json when available)")
    c.add_argument("--smoke-test", action="store_true",
                   help="embed 3 synthetic pages + a query with the real "
                        "weights, seal an index, and search it end-to-end")
    c.add_argument("--json", action="store_true", help="machine-readable report")

    v = sub.add_parser("serve", help="HTTP search service with dynamic batching")
    _add_common(v)
    v.add_argument("--host", default="127.0.0.1")
    v.add_argument("--port", type=int, default=8090)
    v.add_argument("--max-batch", type=int, default=256,
                   help="max queries coalesced into one device dispatch")
    v.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="batching window after the first request")
    v.add_argument("--no-embedder", action="store_true",
                   help="embedding-only API (skip loading the model)")
    v.add_argument("--stage1-cut", choices=["auto", "exact", "approx"],
                   default="auto",
                   help="candidate-cut policy: auto uses approx_max_k at "
                        ">=64k docs (HNSW-parity; exact rerank regardless)")
    v.add_argument("--server", choices=["async", "threaded"], default="async",
                   help="asyncio event-loop front end (default) or the "
                        "thread-per-connection stdlib server")
    v.add_argument("--workers", type=int, default=0,
                   help="N>0: N SO_REUSEPORT front-end worker processes "
                        "feeding one engine backend over a unix socket — "
                        "scales HTTP parsing past one GIL on multi-core "
                        "hosts (the engine stays in this process)")
    return parser


def _load_builder(args):
    from visual_rag_tpu.index import IndexBuilder

    path = Path(args.index_dir) / args.collection
    if not (path / "schema.json").exists():
        raise SystemExit(f"No collection at {path} (run 'process' first)")
    return IndexBuilder.load(path)


def cmd_process(args) -> int:
    from visual_rag_tpu.index import CollectionSchema, IndexBuilder
    from visual_rag_tpu.index.builder import VectorSpec
    from visual_rag_tpu.pipeline import (
        CropEmptyConfig,
        LocalImageStore,
        ProcessingPipeline,
    )

    pdf_root = Path(args.pdf_dir)
    pdfs = [pdf_root] if pdf_root.is_file() else sorted(pdf_root.glob("**/*.pdf"))
    if not pdfs:
        print(f"No PDFs found under {pdf_root}")
        return 1
    print(f"Found {len(pdfs)} PDF(s)")
    if args.dry_run:
        for p in pdfs:
            print(f"  would process {p}")
        return 0

    embedder = _make_embedder(args, batch_size=args.embedding_batch_size)
    mapping = None
    if args.metadata_mapping:
        mapping = ProcessingPipeline.load_metadata_mapping(args.metadata_mapping)

    path = Path(args.index_dir) / args.collection
    if (path / "schema.json").exists():
        builder = IndexBuilder.load(path)
    else:
        from visual_rag_tpu.pipeline.pipeline import experimental_vector_plan

        plan = experimental_vector_plan(
            embedder.backend, pooling_windows=args.pooling_windows,
            kernel=args.experimental_pooling_kernel,
            colsmol_2d=args.colsmol_experimental_2d)
        dim = embedder.cfg.embed_dim
        vectors = {
            "initial": VectorSpec("initial", "ragged", dim),
            "mean_pooling": VectorSpec("mean_pooling", "padded", dim),
            "global_pooling": VectorSpec("global_pooling", "single", dim),
            **{n: VectorSpec(n, "padded", dim) for n in plan["names"]},
        }
        builder = IndexBuilder(CollectionSchema(vectors=vectors,
                                                storage_dtype=args.storage_dtype))

    pipeline = ProcessingPipeline(
        embedder, builder,
        strategy=args.strategy,
        embedding_batch_size=args.embedding_batch_size,
        upload_batch_size=args.upload_batch_size,
        max_mean_pool_vectors=args.max_mean_pool_vectors,
        pooling_windows=args.pooling_windows,
        experimental_kernel=args.experimental_pooling_kernel,
        colsmol_experimental_2d=args.colsmol_experimental_2d,
        crop_config=CropEmptyConfig() if args.crop else None,
        skip_existing=not args.no_skip_existing,
        metadata_mapping=mapping,
        image_uploader=(LocalImageStore(root=args.image_store)
                        if args.image_store else None),
    )
    totals = {"processed": 0, "skipped": 0, "failed": 0}
    t0 = time.time()
    for pdf in pdfs:
        stats = pipeline.process_pdf(pdf)
        totals["processed"] += stats.pages_processed
        totals["skipped"] += stats.pages_skipped
        totals["failed"] += stats.pages_failed
        print(f"  {pdf.name}: +{stats.pages_processed} pages "
              f"(skipped {stats.pages_skipped}, failed {stats.pages_failed})")
    builder.save(path)
    print(f"Done in {time.time()-t0:.1f}s: {totals['processed']} pages indexed, "
          f"{totals['skipped']} skipped, {totals['failed']} failed -> {path}")
    return 0


def cmd_search(args) -> int:
    from visual_rag_tpu.retrieval import RetrievalEngine, build_filter

    builder = _load_builder(args)
    index = builder.seal()

    exp_name = "experimental_pooling"
    if args.experimental_pooling_k is not None:
        exp_name = f"experimental_pooling_{args.experimental_pooling_k}"
    elif args.experimental_pooling_technique:
        exp_name = f"experimental_pooling_{args.experimental_pooling_technique}"
    if exp_name not in index.stores:
        raise SystemExit(
            f"Vector {exp_name!r} not in collection (have: {index.vector_names})")

    embedder = _make_embedder(args)
    engine = RetrievalEngine(index, experimental_vector_name=exp_name,
                             stage1_cut=getattr(args, "stage1_cut", "auto"))
    q = embedder.embed_query(args.query)
    filter_obj = build_filter(
        year=args.year, source=args.source, district=args.district,
        filename=args.filename, has_text=args.has_text)
    t0 = time.time()
    # fused batch plan with B=1: one device dispatch instead of one per stage
    results = engine.search_embedded_batch(
        [q], mode=args.mode, top_k=args.top_k, prefetch_k=args.prefetch_k,
        stage1_mode=args.stage1_mode, stage1_k=args.stage1_k,
        stage2_k=args.stage2_k, filter_obj=filter_obj)[0]
    dt = time.time() - t0
    if args.json:
        print(json.dumps({"query": args.query, "latency_ms": dt * 1000,
                          "results": results}, default=str))
        return 0
    print(f"Top {len(results)} results for {args.query!r} ({dt*1000:.0f} ms):")
    for r in results:
        payload = r.get("payload") or {}
        loc = f"{payload.get('filename', r['id'])} p{payload.get('page_number', '?')}"
        print(f"  {r['rank']+1:>2}. {r['score_final']:.4f}  {loc}")
    return 0


def cmd_serve(args) -> int:
    from visual_rag_tpu.retrieval import RetrievalEngine
    from visual_rag_tpu.serving import (
        AsyncSearchServer,
        MultiWorkerServer,
        SearchServer,
    )

    builder = _load_builder(args)
    engine = RetrievalEngine(builder.seal(),
                             stage1_cut=getattr(args, "stage1_cut", "auto"))
    embedder = None
    if not args.no_embedder:
        embedder = _make_embedder(args)
    if args.workers > 0:
        server = MultiWorkerServer(
            engine, embedder=embedder, host=args.host, port=args.port,
            workers=args.workers, max_batch=args.max_batch,
            max_wait_ms=args.max_wait_ms).start()
    else:
        cls = AsyncSearchServer if args.server == "async" else SearchServer
        server = cls(engine, embedder=embedder, host=args.host,
                     port=args.port, max_batch=args.max_batch,
                     max_wait_ms=args.max_wait_ms).start()
    print(f"serving http://{server.host}:{server.port} "
          f"(POST /search, GET /healthz, GET /stats); Ctrl-C to stop")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        print("stopping")
        server.stop()
    return 0


def cmd_checkpoint(args) -> int:
    """Turnkey real-weights path: local safetensors -> ColVLM params ->
    (optionally) embed -> index -> search, in one command.

    The day network egress exists, quality parity with the reference's
    checkpoint loading (visual_embedder.py:153-323 via colpali-engine) is:
    download the snapshot, then ``visual-rag-tpu checkpoint <dir> --smoke-test``.
    """
    import numpy as np

    from visual_rag_tpu.models.convert import (
        config_from_checkpoint,
        convert_state_dict,
        read_state_dict,
        validate_against_model,
    )
    from visual_rag_tpu.models.embedder import detect_backend

    state = read_state_dict(args.checkpoint_dir)
    cfg = config_from_checkpoint(args.checkpoint_dir, args.model, state_dict=state)
    params, report = convert_state_dict(state, cfg)
    issues = validate_against_model(params, cfg)
    summary = {
        "checkpoint": args.checkpoint_dir,
        "model": args.model,
        "backend": detect_backend(args.model),
        "hf_layout": cfg.hf_layout,
        "embed_dim": cfg.embed_dim,
        "text_layers": cfg.text.layers,
        "vision_layers": cfg.vision.layers,
        "tensors_matched": len(report["matched"]),
        "missing": report["missing"],
        "unused": report["unused"][:20],
        "shape_issues": issues,
        "ok": not report["missing"] and not issues,
    }

    if args.smoke_test and summary["ok"]:
        from visual_rag_tpu.index import CollectionSchema, IndexBuilder
        from visual_rag_tpu.index.builder import VectorSpec
        from visual_rag_tpu.pipeline import ProcessingPipeline
        from visual_rag_tpu.pipeline.pipeline import experimental_vector_plan
        from visual_rag_tpu.retrieval import RetrievalEngine

        embedder = _make_embedder(args, config=cfg, params=params)
        plan = experimental_vector_plan(embedder.backend)
        dim = cfg.embed_dim
        builder = IndexBuilder(CollectionSchema(vectors={
            "initial": VectorSpec("initial", "ragged", dim),
            "mean_pooling": VectorSpec("mean_pooling", "padded", dim),
            "global_pooling": VectorSpec("global_pooling", "single", dim),
            **{n: VectorSpec(n, "padded", dim) for n in plan["names"]},
        }, storage_dtype="bfloat16"))
        pipeline = ProcessingPipeline(embedder, builder, strategy="pooling")
        rng = np.random.default_rng(0)
        images = [rng.random((96, 128, 3), dtype=np.float32) for _ in range(3)]
        stats = pipeline.process_images(images, source_id="smoke.pdf")
        engine = RetrievalEngine(
            builder.seal(), experimental_vector_name=plan["canonical"])
        q = embedder.embed_query("what is the revenue table?")
        hits = engine.search_embedded(q, mode="two_stage", top_k=3,
                                      with_payload=False)
        summary["smoke"] = {
            "pages_indexed": stats.pages_processed,
            "pages_failed": stats.pages_failed,
            "top_hit": hits[0]["id"] if hits else None,
            "n_hits": len(hits),
            "ok": stats.pages_processed == 3 and bool(hits),
        }
        summary["ok"] = summary["ok"] and summary["smoke"]["ok"]

    if args.json:
        print(json.dumps(summary, default=str))
    else:
        print(f"checkpoint: {summary['checkpoint']}")
        print(f"  backend {summary['backend']} ({summary['hf_layout']}), "
              f"embed_dim {summary['embed_dim']}, "
              f"{summary['text_layers']}+{summary['vision_layers']} layers")
        print(f"  matched {summary['tensors_matched']} tensors; "
              f"{len(summary['missing'])} missing, "
              f"{len(report['unused'])} unused, "
              f"{len(issues)} shape issues")
        for m in summary["missing"][:10]:
            print(f"    missing: {m}")
        for s in issues[:10]:
            print(f"    {s}")
        if "smoke" in summary:
            s = summary["smoke"]
            print(f"  smoke test: {s['pages_indexed']} pages indexed, "
                  f"top hit {s['top_hit']} ({'ok' if s['ok'] else 'FAILED'})")
        print("OK" if summary["ok"] else "FAILED")
    return 0 if summary["ok"] else 1


def cmd_info(args) -> int:
    builder = _load_builder(args)
    info = builder.seal().info()
    print(json.dumps(info, indent=2, default=str))
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    import os

    platform = os.environ.get("VISUALRAG_PLATFORM")
    if platform:  # e.g. VISUALRAG_PLATFORM=cpu for small host-side jobs
        import jax

        jax.config.update("jax_platforms", platform)
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.DEBUG if args.verbose else logging.INFO)
    if args.command == "process":
        return cmd_process(args)
    if args.command == "search":
        return cmd_search(args)
    if args.command == "serve":
        return cmd_serve(args)
    if args.command == "checkpoint":
        return cmd_checkpoint(args)
    return cmd_info(args)


if __name__ == "__main__":
    sys.exit(main())
