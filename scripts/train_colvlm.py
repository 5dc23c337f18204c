#!/usr/bin/env python
"""Contrastive fine-tuning CLI for ColVLM (late-interaction InfoNCE).

The reference trains through colpali-engine (torch); this is the TPU-native
counterpart: data/sequence/tensor/pipeline/expert-parallel training over a
jax mesh with orbax checkpointing.

Data format (--data DIR): DIR/pairs.jsonl with one JSON object per line:
    {"query": "what was the 2021 deficit?", "image": "pages/p3.npy"}
Images are .npy [H, W, 3] arrays (or anything PIL can open, if PIL is
installed); paths are relative to DIR. Without --data, trains on synthetic
batches (pipeline smoke / throughput measurement).

Examples:
    python scripts/train_colvlm.py --synthetic --steps 20 --mesh dp2,tp2
    python scripts/train_colvlm.py --data ./pairs --model vidore/colSmol-500M \
        --batch-size 8 --steps 500 --checkpoint-dir ckpts --save-every 100
"""

import argparse
import dataclasses
import json
import time
from pathlib import Path

import numpy as np

import _common  # noqa: F401  (sys.path + VISUALRAG_PLATFORM handling)


def parse_mesh(spec: str):
    """'dp2,sp2,tp2' -> ((2, 2, 2), ('dp', 'sp', 'tp'))."""
    shape, names = [], []
    for part in spec.split(","):
        name = part.rstrip("0123456789")
        n = part[len(name):]
        if not name or not n:
            raise SystemExit(f"bad mesh part {part!r} (want e.g. dp2)")
        names.append(name)
        shape.append(int(n))
    return tuple(shape), tuple(names)


def load_pairs(data_dir: Path):
    pairs_file = data_dir / "pairs.jsonl"
    if not pairs_file.exists():
        raise SystemExit(f"no pairs.jsonl under {data_dir}")
    pairs = [json.loads(line) for line in
             pairs_file.read_text().splitlines() if line.strip()]
    if not pairs:
        raise SystemExit(f"{pairs_file} is empty")
    return pairs


def load_image(path: Path) -> np.ndarray:
    if path.suffix == ".npy":
        return np.load(path)
    try:
        from PIL import Image
    except ImportError:
        raise SystemExit(f"{path}: non-.npy images need PIL installed")
    return np.asarray(Image.open(path).convert("RGB"))


def data_batches(embedder, pairs, batch_size, data_dir, seed):
    """Yield training batches forever: processor-built (query, page) tensors."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    order = np.arange(len(pairs))
    while True:
        rng.shuffle(order)
        for s in range(0, len(order) - batch_size + 1, batch_size):
            chunk = [pairs[i] for i in order[s : s + batch_size]]
            imgs = [load_image(data_dir / c["image"]) for c in chunk]
            p = embedder.processor.process_images(imgs)
            q_ids, q_mask = embedder.processor.process_queries(
                [c["query"] for c in chunk])
            batch = {
                "query_ids": jnp.asarray(q_ids),
                "query_mask": jnp.asarray(q_mask),
                "page_ids": jnp.asarray(p.input_ids),
                "page_mask": jnp.asarray(p.attn_mask),
                "patches": jnp.asarray(p.patches),
                "patch_mask": jnp.asarray(p.patch_mask),
            }
            if p.window_ids is not None:
                batch["window_ids"] = jnp.asarray(p.window_ids)
            yield batch


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", default="vidore/colSmol-500M")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config (tests/smoke) instead of the model shape")
    ap.add_argument("--data", help="dir with pairs.jsonl (else synthetic)")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--warmup", type=int, default=100)
    ap.add_argument("--temperature", type=float, default=0.02)
    ap.add_argument("--mesh", default="dp1",
                    help="e.g. dp2,sp2,tp2 / dp2,pp2,tp2 / dp4,ep2")
    ap.add_argument("--scan-layers", action="store_true",
                    help="stack decoder blocks (enables 'pp' sharding)")
    ap.add_argument("--ring-attention", action="store_true",
                    help="stream K/V around 'sp' instead of all-gathering")
    ap.add_argument("--checkpoint", help="HF safetensors dir to start from")
    ap.add_argument("--tokenizer", help="local tokenizer.json / ckpt dir")
    ap.add_argument("--checkpoint-dir", default="train_ckpts")
    ap.add_argument("--save-every", type=int, default=0, help="0 = final only")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--ema-decay", type=float, default=0.0,
                    help="keep an EMA of params (e.g. 0.999); saved as ema_*")
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    if not args.data and not args.synthetic:
        raise SystemExit("pass --data DIR or --synthetic")

    import jax
    from jax.sharding import set_mesh

    from visual_rag_tpu.models.colvlm import ColVLMConfig
    from visual_rag_tpu.models.embedder import _CONFIG_BY_BACKEND, detect_backend
    from visual_rag_tpu.models.train import (
        Trainer, ema_update, restore_train_state, save_train_state,
        synthetic_batch)
    from visual_rag_tpu.parallel import make_mesh

    cfg = (ColVLMConfig.tiny() if args.tiny
           else _CONFIG_BY_BACKEND[detect_backend(args.model)]())
    text_updates = {}
    if args.scan_layers:
        text_updates["scan_layers"] = True
    if args.ring_attention:
        text_updates["ring_axis"] = "sp"
    if text_updates:
        cfg = dataclasses.replace(
            cfg, text=dataclasses.replace(cfg.text, **text_updates))

    shape, names = parse_mesh(args.mesh)
    need = int(np.prod(shape))
    if need > jax.device_count():
        raise SystemExit(
            f"mesh {args.mesh} needs {need} devices, have {jax.device_count()}")
    mesh = make_mesh(shape, names, devices=jax.devices()[:need])
    trainer = Trainer(cfg, mesh, lr=args.lr, warmup=args.warmup,
                      temperature=args.temperature)

    if args.data:
        from visual_rag_tpu.models.embedder import VisualEmbedder

        embedder = VisualEmbedder(args.model, config=cfg,
                                  checkpoint=args.checkpoint,
                                  tokenizer_path=args.tokenizer)
        pairs = load_pairs(Path(args.data))
        print(f"{len(pairs)} training pairs from {args.data}")
        batches = data_batches(embedder, pairs, args.batch_size,
                               Path(args.data), args.seed)
    else:
        def synth():
            while True:
                yield synthetic_batch(cfg, batch=args.batch_size, query_len=12,
                                      n_patches=64, seed=args.seed)
        batches = synth()

    first = next(batches)
    with set_mesh(mesh):
        state = trainer.init_state(jax.random.PRNGKey(args.seed), first)
        ckpt_dir = Path(args.checkpoint_dir)
        if args.resume and ckpt_dir.exists():
            state = restore_train_state(ckpt_dir, template=state)
            print(f"resumed from step {state.step}")
        step_fn = trainer.make_train_step()
        params, opt_state = state.params, state.opt_state
        # real copy: the train step DONATES param buffers, so aliasing them
        # here would leave ema pointing at deleted arrays after step 1
        import jax.numpy as jnp

        ema = jax.tree.map(jnp.copy, params) if args.ema_decay else None
        t0 = time.time()
        for step in range(int(state.step), args.steps):
            batch = first if step == int(state.step) else next(batches)
            params, opt_state, metrics = step_fn(params, opt_state, batch)
            if ema is not None:
                ema = ema_update(ema, params, args.ema_decay)
            if step % args.log_every == 0 or step == args.steps - 1:
                loss = float(metrics["loss"])
                extra = (f" moe_aux={float(metrics['moe_aux']):.3f}"
                         if "moe_aux" in metrics else "")
                rate = (step - int(state.step) + 1) / (time.time() - t0)
                print(f"step {step:>5d}  loss {loss:.4f}{extra}  "
                      f"{rate:.2f} steps/s", flush=True)
            if args.save_every and step and step % args.save_every == 0:
                state = dataclasses.replace(
                    state, params=params, opt_state=opt_state, step=step)
                print("saved", save_train_state(state, ckpt_dir, step=step))
        state = dataclasses.replace(
            state, params=params, opt_state=opt_state, step=args.steps)
        print("saved", save_train_state(state, ckpt_dir, step=args.steps))
        if ema is not None:
            ema_state = dataclasses.replace(state, params=ema)
            print("saved EMA", save_train_state(
                ema_state, ckpt_dir / "ema", step=args.steps))


if __name__ == "__main__":
    main()
