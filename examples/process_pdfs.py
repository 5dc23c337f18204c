#!/usr/bin/env python3
"""Example: process PDFs into a device collection.

Full pipeline — render, crop, embed (flax ColVLM), pooling fan-out, index —
against the in-process TPU engine (reference examples/process_pdfs.py, with
Qdrant replaced by IndexBuilder).

Usage:
    python examples/process_pdfs.py --reports-dir ./pdfs --collection mydocs
    python examples/process_pdfs.py --reports-dir ./pdfs \
        --metadata-file metadata.json --crop
"""

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from visual_rag_tpu.index import IndexBuilder  # noqa: E402
from visual_rag_tpu.models.embedder import VisualEmbedder  # noqa: E402
from visual_rag_tpu.pipeline.pipeline import ProcessingPipeline  # noqa: E402

logging.basicConfig(level=logging.INFO)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reports-dir", required=True)
    ap.add_argument("--collection", default="example_docs")
    ap.add_argument("--index-dir", default="indexes")
    ap.add_argument("--model", default="vidore/colSmol-500M")
    ap.add_argument("--metadata-file", default=None)
    ap.add_argument("--storage-dtype", default="bfloat16")
    ap.add_argument("--crop", action="store_true")
    ap.add_argument("--strategy", default="pooling",
                    choices=["pooling", "standard", "all"])
    args = ap.parse_args()

    embedder = VisualEmbedder(args.model)
    from benchmarks.run_tpu_beir import make_schema_for_embedder

    index_dir = Path(args.index_dir) / args.collection
    builder = (IndexBuilder.load(index_dir)
               if (index_dir / "schema.json").exists()
               else IndexBuilder(make_schema_for_embedder(
                   embedder, args.storage_dtype)))
    metadata_mapping = None
    if args.metadata_file:
        import json

        metadata_mapping = json.loads(Path(args.metadata_file).read_text())
    from visual_rag_tpu.pipeline.crop_empty import CropEmptyConfig

    pipeline = ProcessingPipeline(
        embedder=embedder, indexer=builder, strategy=args.strategy,
        crop_config=CropEmptyConfig() if args.crop else None,
        metadata_mapping=metadata_mapping)
    pdfs = sorted(Path(args.reports_dir).glob("*.pdf"))
    if not pdfs:
        raise SystemExit(f"no PDFs in {args.reports_dir}")
    for pdf in pdfs:
        stats = pipeline.process_pdf(pdf)
        print(pdf.name, stats)
    builder.save(index_dir)
    print(f"collection saved to {index_dir} "
          f"({len(builder.manifest)} points)")


if __name__ == "__main__":
    main()
