"""Rebuild a collection in place: load + save roundtrip.

Reference: scripts/qdrant_rebuild_collection_no_index.py (copy out -> recreate
-> copy back to reset index state). Here it defragments the VRAG1 file and
migrates older layouts to the current format.
"""

import argparse
import json
import time

from _common import load_builder


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index-dir", default="index_data")
    ap.add_argument("--collection", required=True)
    args = ap.parse_args()
    builder, path = load_builder(args.index_dir, args.collection)
    t0 = time.time()
    builder.save(path)
    print(json.dumps({"rebuilt": str(path), "points": len(builder),
                      "seconds": round(time.time() - t0, 2)}))


if __name__ == "__main__":
    main()
