"""Dump a collection's schema and per-vector stats (reference: inspect_qdrant_collection.py)."""

import argparse
import json

from _common import load_builder


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index-dir", default="index_data")
    ap.add_argument("--collection", required=True)
    args = ap.parse_args()
    builder, path = load_builder(args.index_dir, args.collection)
    from visual_rag_tpu.index.admin import get_collection_info

    print(json.dumps({
        "path": str(path),
        "schema": builder.schema.to_json(),
        "info": get_collection_info(builder.seal()),
    }, indent=2, default=str))


if __name__ == "__main__":
    main()
