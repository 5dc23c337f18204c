"""Mixture-of-experts FFN: routing math, dense-dispatch contracts, ep sharding.

No reference counterpart (torch ColVLMs are dense); internal contracts:
single-expert MoE == dense SwiGLU, routed mass conservation, capacity
overflow falls through the residual, experts shard over 'ep'.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from visual_rag_tpu.models.colvlm import ColVLM, ColVLMConfig, MoEFFN, SwiGLU
from visual_rag_tpu.parallel import make_mesh


def _cfg(experts, top_k=2, capacity=1.25, scan=False):
    tiny = ColVLMConfig.tiny()
    return dataclasses.replace(
        tiny, dtype="float32",
        text=dataclasses.replace(tiny.text, moe_experts=experts,
                                 moe_top_k=top_k, moe_capacity_factor=capacity,
                                 scan_layers=scan))


class TestMoERouting:
    def test_single_expert_equals_dense_swiglu(self):
        """E=1, k=1, ample capacity: dispatch is the identity, so the MoE
        layer must reproduce plain SwiGLU with the same weights."""
        cfg = _cfg(experts=1, top_k=1, capacity=2.0)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 16, 64)), jnp.float32)
        moe = MoEFFN(cfg.text, dtype=jnp.float32)
        var = moe.init(jax.random.PRNGKey(0), x)
        p = var["params"]
        dense = SwiGLU(cfg.text.mlp_hidden, dtype=jnp.float32)
        dense_params = {
            "gate": {"kernel": p["gate_kernel"][0]},
            "up": {"kernel": p["up_kernel"][0]},
            "down": {"kernel": p["down_kernel"][0]},
        }
        out_moe = moe.apply({"params": p}, x, mutable=["losses"])[0]
        out_dense = dense.apply({"params": dense_params}, x)
        np.testing.assert_allclose(np.asarray(out_moe), np.asarray(out_dense),
                                   atol=1e-5)

    def test_combine_mass_conserved(self):
        """Identical experts + ample capacity: out == dense SwiGLU for every
        token REGARDLESS of routing — holds iff each token's combine weights
        sum to exactly 1 (out = sum_e combine_e * F(x) = F(x))."""
        cfg = _cfg(experts=4, top_k=2, capacity=8.0)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 8, 64)), jnp.float32)
        moe = MoEFFN(cfg.text, dtype=jnp.float32)
        p = dict(moe.init(jax.random.PRNGKey(0), x)["params"])
        for k in ("gate_kernel", "up_kernel", "down_kernel"):
            p[k] = jnp.tile(p[k][:1], (4, 1, 1))  # all experts identical
        out = moe.apply({"params": p}, x, mutable=["losses"])[0]
        dense = SwiGLU(cfg.text.mlp_hidden, dtype=jnp.float32)
        ref = dense.apply({"params": {
            "gate": {"kernel": p["gate_kernel"][0]},
            "up": {"kernel": p["up_kernel"][0]},
            "down": {"kernel": p["down_kernel"][0]}}}, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_capacity_overflow_drops_tokens(self):
        """Tiny capacity: MoE output for overflowed tokens is exactly zero
        (they ride the residual in the decoder block)."""
        cfg = _cfg(experts=2, top_k=1, capacity=0.1)  # cap = 1 slot/expert
        x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 16, 64)),
                        jnp.float32)
        moe = MoEFFN(cfg.text, dtype=jnp.float32)
        var = moe.init(jax.random.PRNGKey(0), x)
        out = moe.apply({"params": var["params"]}, x, mutable=["losses"])[0]
        norms = np.linalg.norm(np.asarray(out)[0], axis=-1)
        assert (norms < 1e-7).sum() >= 14  # >= s - E*cap tokens dropped
        assert (norms > 1e-7).sum() >= 1   # but someone got routed

    def test_full_model_forward_and_aux(self):
        cfg = _cfg(experts=4)
        m = ColVLM(cfg)
        ids = jnp.arange(2 * 16, dtype=jnp.int32).reshape(2, 16) % 40 + 4
        mask = jnp.ones((2, 16), bool)
        var = m.init(jax.random.PRNGKey(0), ids, mask)
        assert "losses" in var
        out, sown = m.apply({"params": var["params"]}, ids, mask,
                            mutable=["losses"])
        assert out.shape == (2, 16, cfg.embed_dim)
        assert np.isfinite(np.asarray(out)).all()
        aux = [float(jnp.sum(a)) for a in jax.tree.leaves(sown["losses"])]
        assert len(aux) == cfg.text.layers
        # Switch loss lower bound is 1.0 at perfectly uniform routing
        assert all(a >= 0.99 for a in aux)


class TestExpertParallel:
    def test_trainer_on_ep_mesh(self):
        from visual_rag_tpu.models.train import Trainer, synthetic_batch

        cfg = _cfg(experts=4)
        mesh = make_mesh((2, 2, 2), ("dp", "ep", "tp"))
        trainer = Trainer(cfg, mesh, lr=1e-3, warmup=0)
        batch = synthetic_batch(cfg, batch=4, query_len=8, n_patches=16)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        specs = {
            "/".join(str(getattr(p, "key", p)) for p in path):
                str(leaf.sharding.spec)
            for path, leaf in jax.tree_util.tree_leaves_with_path(state.params)
        }
        experts = {k: v for k, v in specs.items() if k.endswith("_kernel")}
        assert experts and all("ep" in v for v in experts.values()), experts
        step = trainer.make_train_step()
        p, o = state.params, state.opt_state
        first = None
        for _ in range(4):
            p, o, metrics = step(p, o, batch)
            loss = float(metrics["loss"])
            first = loss if first is None else first
        assert np.isfinite(loss) and "moe_aux" in metrics
        assert loss <= first + 1e-3

    def test_moe_with_scan_layers_shards_pp_and_ep(self):
        from visual_rag_tpu.models.sharding import param_shardings

        cfg = _cfg(experts=4, scan=True)
        m = ColVLM(cfg)
        ids = jnp.ones((1, 8), jnp.int32)
        mask = jnp.ones((1, 8), bool)
        abstract = jax.eval_shape(
            lambda: {"params": m.init(jax.random.PRNGKey(0), ids, mask)["params"]})
        mesh = make_mesh((2, 2, 2), ("pp", "ep", "tp"))
        shardings = param_shardings(mesh, abstract)
        flat = {
            "/".join(str(getattr(p, "key", p)) for p in path): v.spec
            for path, v in jax.tree_util.tree_leaves_with_path(shardings)
        }
        key = next(k for k in flat if k.endswith("gate_kernel"))
        spec = tuple(flat[key])
        assert spec[0] == "pp" and spec[1] == "ep", (key, spec)
