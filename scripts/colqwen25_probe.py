"""Probe ColQwen2.5 embedding shapes/grid info and validate pooling compat.

Reference: scripts/colqwen25_probe.py:1-12.
"""

import argparse
import json

import numpy as np

import _common  # noqa: F401


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="vidore/colqwen2.5-v0.2")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--target-vectors", type=int, default=32)
    args = ap.parse_args()

    from visual_rag_tpu.models.embedder import VisualEmbedder

    embedder = VisualEmbedder(args.model)
    img = np.random.default_rng(0).random((args.height, args.width, 3)).astype(np.float32)
    embs, infos = embedder.embed_images([img], return_token_info=True)
    info = infos[0]
    visual = embedder.extract_visual_embedding(embs[0], info)
    mean_pool = embedder.mean_pool_visual_embedding(
        visual, info, target_vectors=args.target_vectors)
    exp = embedder.experimental_pool_visual_embedding(visual, info, mean_pool=mean_pool)
    ok = (info.get("grid_h_eff") or 0) * (info.get("grid_w_eff") or 0) == visual.shape[0]
    print(json.dumps({
        "model": args.model,
        "image": [args.width, args.height],
        "full_embedding": list(embs[0].shape),
        "visual_tokens": int(visual.shape[0]),
        "grid": {k: info.get(k) for k in
                 ("grid_t", "grid_h", "grid_w", "grid_h_eff", "grid_w_eff")},
        "mean_pool": list(np.asarray(mean_pool).shape),
        "experimental_pool": list(np.asarray(exp).shape),
        "pooling_compatible": bool(ok),
    }, indent=2))


if __name__ == "__main__":
    main()
