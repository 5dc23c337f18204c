"""Late-interaction contrastive training for ColVLM on a (dp, tp) mesh.

Objective (the ColPali-family training recipe): embed a batch of queries and
their positive pages, score every query against every page with MaxSim, and
apply in-batch-negative cross-entropy on the [B, B] score matrix (diagonal =
positives). The MaxSim scoring reuses ops.maxsim.maxsim_matrix_padded — the
same math the retrieval engine serves.

The train step is one jit: batch sharded over 'dp', parameters sharded per
models.sharding rules over 'tp'; XLA/GSPMD inserts the psum/all-gather
collectives over ICI.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from visual_rag_tpu.models.colvlm import ColVLM, ColVLMConfig
from visual_rag_tpu.models.sharding import param_shardings
from visual_rag_tpu.ops.maxsim import maxsim_matrix_padded


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def colbert_infonce_loss(
    q_emb: jnp.ndarray,  # [B, Lq, dim] normalized, masked
    q_mask: jnp.ndarray,  # [B, Lq]
    p_emb: jnp.ndarray,  # [B, Lp, dim]
    p_mask: jnp.ndarray,  # [B, Lp]
    temperature: float = 0.02,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    scores = maxsim_matrix_padded(q_emb, q_mask, p_emb, p_mask)  # [B, B]
    logits = scores / temperature
    labels = jnp.arange(scores.shape[0])
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    acc = jnp.mean(jnp.argmax(scores, axis=1) == labels)
    return loss, {"loss": loss, "in_batch_acc": acc,
                  "pos_score": jnp.mean(jnp.diagonal(scores))}


def make_optimizer(lr: float = 5e-5, weight_decay: float = 0.01,
                   warmup: int = 100, total_steps: int = 10_000):
    if warmup <= 0:
        sched = optax.cosine_decay_schedule(lr, total_steps)
    else:
        sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, max(total_steps, warmup + 1))
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, b1=0.9, b2=0.999, weight_decay=weight_decay),
    )


class Trainer:
    """Builds sharded params + a jitted multi-chip train step."""

    def __init__(self, cfg: ColVLMConfig, mesh: Mesh, lr: float = 5e-5,
                 temperature: float = 0.02, warmup: int = 100):
        self.cfg = cfg
        self.mesh = mesh
        self.model = ColVLM(cfg)
        self.optimizer = make_optimizer(lr=lr, warmup=warmup)
        self.temperature = float(temperature)

    def init_state(self, rng, example_batch) -> TrainState:
        """Initialize parameters directly into their mesh shardings."""

        def init_fn(rng):
            variables = self.model.init(
                rng,
                example_batch["page_ids"][:1],
                example_batch["page_mask"][:1],
                example_batch["patches"][:1],
                example_batch["patch_mask"][:1],
            )
            # keep only trainable params ('losses' holds MoE sown aux terms)
            return {"params": variables["params"]}

        abstract = jax.eval_shape(init_fn, rng)
        shardings = param_shardings(self.mesh, abstract)
        params = jax.jit(init_fn, out_shardings=shardings)(rng)
        # optax init uses zeros_like -> moment buffers inherit the param shardings
        opt_state = self.optimizer.init(params)
        return TrainState(params=params, opt_state=opt_state, step=0)

    def _loss_fn(self, params, batch):
        moe = self.cfg.text.moe_experts > 0
        aux = jnp.zeros((), jnp.float32)
        wids = batch.get("window_ids")  # tile/window segments (pixel-shuffle)
        if moe:  # collect MoEFFN's sown Switch load-balance terms
            q_emb, v1 = self.model.apply(
                params, batch["query_ids"], batch["query_mask"],
                mutable=["losses"])
            p_emb, v2 = self.model.apply(
                params, batch["page_ids"], batch["page_mask"],
                batch["patches"], batch["patch_mask"], wids,
                mutable=["losses"])
            for v in (v1, v2):
                for leaf in jax.tree.leaves(v.get("losses", {})):
                    aux = aux + jnp.sum(leaf)
        else:
            q_emb = self.model.apply(params, batch["query_ids"], batch["query_mask"])
            p_emb = self.model.apply(
                params, batch["page_ids"], batch["page_mask"],
                batch["patches"], batch["patch_mask"], wids)
        loss, metrics = colbert_infonce_loss(
            q_emb, batch["query_mask"], p_emb, batch["page_mask"],
            temperature=self.temperature)
        if moe:
            metrics = dict(metrics, moe_aux=aux)
            loss = loss + 0.01 * aux
        return loss, metrics

    def _batch_spec(self, x):
        """dp over batch; sp (if present in the mesh) over the sequence dim.

        Axes absent from the mesh are dropped (a pp/ep/tp-only mesh gets a
        replicated batch instead of a crash).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = "dp" if "dp" in self.mesh.axis_names else None
        sp = "sp" if "sp" in self.mesh.axis_names else None
        if x.ndim >= 2:
            spec = P(dp, sp, *([None] * (x.ndim - 2)))
        else:
            spec = P(dp)
        return NamedSharding(self.mesh, spec)

    def make_train_step(self):
        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch):
            batch = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, self._batch_spec(x)),
                batch)
            (loss, metrics), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True)(params, batch)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        return train_step

    def train_step_once(self, state: TrainState, batch) -> Tuple[TrainState, Dict]:
        step_fn = self.make_train_step()
        params, opt_state, metrics = step_fn(state.params, state.opt_state, batch)
        return TrainState(params, opt_state, state.step + 1), metrics


@jax.jit
def ema_update(ema: Any, params: Any, decay) -> Any:
    """Exponential moving average of parameters (per-leaf lerp on device).

    The reference ecosystem publishes EMA variants (e.g.
    Metric-AI/ColQwen2_5-ema); call after each optimizer step:
    ``ema = ema_update(ema, params, 0.999)`` (decay is traced — any float
    works without recompiling).
    """
    d = jnp.asarray(decay, jnp.float32)
    return jax.tree.map(
        lambda e, p: (e.astype(jnp.float32) * d
                      + p.astype(jnp.float32) * (1.0 - d)).astype(e.dtype),
        ema, params)


def save_train_state(state: TrainState, directory, step: Optional[int] = None) -> str:
    """Checkpoint params+opt_state with orbax (async-safe, atomic dirs)."""
    import orbax.checkpoint as ocp

    from pathlib import Path

    step = state.step if step is None else int(step)
    path = Path(directory).resolve() / f"step_{step:08d}"
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(path, {"params": state.params, "opt_state": state.opt_state,
                     "step": step}, force=True)
    return str(path)


def restore_train_state(directory, step: Optional[int] = None,
                        template: Optional[TrainState] = None) -> TrainState:
    """Restore the latest (or given) step; template supplies shardings."""
    import orbax.checkpoint as ocp

    from pathlib import Path

    root = Path(directory).resolve()
    if step is None:
        steps = sorted(int(p.name.split("_")[1]) for p in root.glob("step_*"))
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {root}")
        step = steps[-1]
    ckpt = ocp.PyTreeCheckpointer()
    target = None
    if template is not None:
        target = {"params": template.params, "opt_state": template.opt_state,
                  "step": template.step}
    restored = ckpt.restore(root / f"step_{step:08d}", item=target)
    return TrainState(params=restored["params"], opt_state=restored["opt_state"],
                      step=int(restored["step"]))


def synthetic_batch(cfg: ColVLMConfig, batch: int, query_len: int, n_patches: int,
                    seed: int = 0):
    """Deterministic synthetic (query, page) batch for tests/dry-runs."""
    import numpy as np

    rng = np.random.default_rng(seed)
    m2 = cfg.spatial_merge * cfg.spatial_merge
    n_img_tokens = n_patches // m2
    page_len = n_img_tokens + 4
    page_ids = np.full((batch, page_len), cfg.image_token_id, dtype=np.int32)
    page_ids[:, n_img_tokens:] = rng.integers(
        4, min(cfg.text.vocab, 1000), (batch, 4))
    return {
        "query_ids": jnp.asarray(rng.integers(
            4, min(cfg.text.vocab, 1000), (batch, query_len)), jnp.int32),
        "query_mask": jnp.ones((batch, query_len), jnp.bool_),
        "page_ids": jnp.asarray(page_ids),
        "page_mask": jnp.ones((batch, page_len), jnp.bool_),
        "patches": jnp.asarray(rng.standard_normal(
            (batch, n_patches, cfg.vision.patch_pixels)), jnp.float32),
        "patch_mask": jnp.ones((batch, n_patches), jnp.bool_),
    }
