"""Re-derive pooled named vectors from the stored `initial` tokens.

Reference: scripts/qdrant_recompute_colqwen_pooling_from_initial.py — rebuild
mean/experimental/global pooled vectors WITHOUT re-embedding, inferring each
doc's (H, W) grid by factoring its token count against the stored aspect
ratio. Here the pooling is the device kernel pass from visual_rag_tpu.ops.
"""

import argparse

import numpy as np

from _common import load_builder


def infer_grid(num_tokens: int, aspect: float):
    """Pick (h, w) with h*w == num_tokens closest to the aspect ratio w/h."""
    best = None
    for h in range(1, int(num_tokens**0.5) + 1):
        if num_tokens % h:
            continue
        w = num_tokens // h
        for hh, ww in ((h, w), (w, h)):
            err = abs((ww / hh) - aspect)
            if best is None or err < best[0]:
                best = (err, hh, ww)
    return (best[1], best[2]) if best else (1, num_tokens)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index-dir", default="index_data")
    ap.add_argument("--collection", required=True)
    ap.add_argument("--backend", default="colqwen2.5",
                    choices=("colqwen2.5", "colpali", "colsmol"))
    ap.add_argument("--target-rows", type=int, default=32)
    ap.add_argument("--kernel", default="gaussian",
                    choices=("gaussian", "triangular", "uniform", "legacy"))
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()
    builder, path = load_builder(args.index_dir, args.collection)

    from visual_rag_tpu.ops import pooling as P

    initial = builder._vectors["initial"]
    n_updated = 0
    for i, tokens in enumerate(initial):
        tokens = np.asarray(tokens, dtype=np.float32)
        payload = builder.manifest.payload(i)
        n = tokens.shape[0]
        if args.backend == "colsmol":
            n_tiles = payload.get("num_tiles") or -(-n // 64)
            mean_pool = np.asarray(P.tile_level_mean_pooling(tokens, int(n_tiles)))
            exp = np.asarray(P.colsmol_experimental_pooling(tokens, int(n_tiles)))
        else:
            gh = payload.get("grid_h_eff")
            gw = payload.get("grid_w_eff")
            if not (gh and gw and int(gh) * int(gw) == n):
                aspect = float(payload.get("aspect_ratio")
                               or (payload.get("cropped_width", 1) or 1)
                               / max(payload.get("cropped_height", 1) or 1, 1))
                gh, gw = infer_grid(n, aspect)
            mean_pool = np.asarray(P.adaptive_row_mean_pooling_from_grid(
                tokens, grid_h=int(gh), grid_w=int(gw),
                target_rows=min(args.target_rows, int(gh))))
            if args.kernel == "legacy":
                exp = np.asarray(P.colpali_experimental_pooling_from_rows(mean_pool))
            else:
                exp = np.asarray(P.weighted_row_smoothing_same_length(
                    mean_pool, kernel=args.kernel))
        if not args.dry_run:
            builder._vectors["mean_pooling"][i] = mean_pool
            for name in builder._vectors:
                if name.startswith("experimental_pooling"):
                    builder._vectors[name][i] = exp
            builder._vectors["global_pooling"][i] = mean_pool.mean(axis=0)
        n_updated += 1
    print(f"{'Would update' if args.dry_run else 'Updated'} {n_updated} docs")
    if not args.dry_run:
        builder.save(path)
        print(f"Saved {path}")


if __name__ == "__main__":
    main()
