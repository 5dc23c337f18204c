"""Clone a collection, optionally converting the storage dtype.

Reference: scripts/qdrant_clone_collection_no_index.py — its huge
indexing_threshold trick (preventing HNSW builds) is moot here: scoring is
exact and there is no ANN graph, so a clone is just a copy (+ optional dtype
migration via the admin layer).
"""

import argparse
import json
from pathlib import Path

from _common import load_builder


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index-dir", default="index_data")
    ap.add_argument("--collection", required=True)
    ap.add_argument("--dest", required=True, help="destination collection name")
    ap.add_argument("--storage-dtype", default=None,
                    choices=(None, "float32", "bfloat16", "float16", "int8"))
    args = ap.parse_args()
    builder, _ = load_builder(args.index_dir, args.collection)
    if args.storage_dtype:
        builder.schema.storage_dtype = args.storage_dtype
    dest = Path(args.index_dir) / args.dest
    builder.save(dest)
    print(json.dumps({"cloned_to": str(dest), "points": len(builder),
                      "storage_dtype": builder.schema.storage_dtype}))


if __name__ == "__main__":
    main()
