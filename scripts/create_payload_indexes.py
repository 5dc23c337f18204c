"""Build interned payload-index columns for the native filter kernels.

Reference: scripts/create_qdrant_payload_indexes.py — payload indexes here are
int32 code columns over the manifest (index/manifest.py), consumed by the C++
columnar predicate kernels.
"""

import argparse
import json

from _common import load_builder


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index-dir", default="index_data")
    ap.add_argument("--collection", required=True)
    ap.add_argument("--fields", nargs="+",
                    default=["year", "source", "district", "filename", "has_text",
                             "dataset"])
    args = ap.parse_args()
    builder, _ = load_builder(args.index_dir, args.collection)
    report = {}
    for field in args.fields:
        codes, vocab = builder.manifest.payload_index(field)
        n_missing = int((codes == builder.manifest.MISSING_CODE).sum())
        report[field] = {"distinct_values": len(vocab), "missing": n_missing}
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
