"""Verify qrels <-> point-id mapping: presence and retrieval ranks.

Reference: scripts/debug_vidore_qrels_alignment.py:1-18.
"""

import argparse
import json

from _common import load_builder


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index-dir", default="index_data")
    ap.add_argument("--collection", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--sample", type=int, default=10)
    args = ap.parse_args()

    from benchmarks.dataset_loader import load_vidore_dataset_auto
    from visual_rag_tpu.utils.ids import union_point_id

    builder, _ = load_builder(args.index_dir, args.collection)
    ds = load_vidore_dataset_auto(args.dataset)
    total = present = 0
    samples = []
    for qid, rels in list(ds.qrels.items())[: args.sample]:
        for did in rels:
            pid = union_point_id(ds.name, did, namespace=args.collection)
            ok = pid in builder.manifest
            total += 1
            present += int(ok)
            samples.append({"query_id": qid, "source_doc_id": did,
                            "point_id": pid, "present": ok})
    print(json.dumps({
        "dataset": ds.name,
        "checked": total,
        "present": present,
        "missing": total - present,
        "samples": samples,
    }, indent=2))


if __name__ == "__main__":
    main()
