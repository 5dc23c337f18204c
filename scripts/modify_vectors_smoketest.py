"""Smoke test for per-vector residency toggles (HBM <-> host memory).

Reference: scripts/qdrant_modify_vectors_smoketest.py (VectorParamsDiff
on_disk toggles there; device placement here).
"""

import argparse
import json

from _common import load_builder


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index-dir", default="index_data")
    ap.add_argument("--collection", required=True)
    ap.add_argument("--vector", default="initial")
    args = ap.parse_args()
    builder, _ = load_builder(args.index_dir, args.collection)
    from visual_rag_tpu.index.admin import (
        get_collection_info,
        modify_vector_residency,
        vector_residency,
    )

    index = builder.seal()
    before = vector_residency(index.store(args.vector))
    index = modify_vector_residency(index, args.vector, "host")
    host = vector_residency(index.store(args.vector))
    index = modify_vector_residency(index, args.vector, "device")
    after = vector_residency(index.store(args.vector))
    print(json.dumps({
        "vector": args.vector,
        "initial_residency": before,
        "after_host_toggle": host,
        "after_device_toggle": after,
        "info": get_collection_info(index)["vectors"][args.vector],
    }, indent=2, default=str))


if __name__ == "__main__":
    main()
