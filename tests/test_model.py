"""ColVLM model: forward shapes/invariants + sharded training step on the mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visual_rag_tpu.models.colvlm import ColVLM, ColVLMConfig
from visual_rag_tpu.models.train import Trainer, synthetic_batch
from visual_rag_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def tiny():
    cfg = ColVLMConfig.tiny()
    model = ColVLM(cfg)
    batch = synthetic_batch(cfg, batch=2, query_len=8, n_patches=16)
    params = model.init(
        jax.random.PRNGKey(0), batch["page_ids"], batch["page_mask"],
        batch["patches"], batch["patch_mask"])
    return cfg, model, params, batch


class TestForward:
    def test_query_embedding_shape_and_norm(self, tiny):
        cfg, model, params, batch = tiny
        emb = model.apply(params, batch["query_ids"], batch["query_mask"])
        assert emb.shape == (2, 8, cfg.embed_dim)
        norms = np.linalg.norm(np.asarray(emb), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)

    def test_page_embedding_uses_images(self, tiny):
        cfg, model, params, batch = tiny
        emb1 = model.apply(
            params, batch["page_ids"], batch["page_mask"],
            batch["patches"], batch["patch_mask"])
        # different pixels -> different embeddings at image positions
        patches2 = batch["patches"] + 1.0
        emb2 = model.apply(
            params, batch["page_ids"], batch["page_mask"], patches2, batch["patch_mask"])
        assert not np.allclose(np.asarray(emb1), np.asarray(emb2), atol=1e-4)

    def test_mask_zeroes_padded_tokens(self, tiny):
        cfg, model, params, batch = tiny
        mask = np.asarray(batch["query_mask"]).copy()
        mask[:, -3:] = False
        emb = model.apply(params, batch["query_ids"], jnp.asarray(mask))
        assert np.abs(np.asarray(emb)[:, -3:]).max() == 0.0

    def test_causal_lm_prefix_invariance(self, tiny):
        # Changing a later token must not affect earlier positions (causality).
        cfg, model, params, batch = tiny
        ids = np.asarray(batch["query_ids"]).copy()
        emb1 = np.asarray(model.apply(params, jnp.asarray(ids), batch["query_mask"]))
        ids[:, -1] = (ids[:, -1] + 1) % 500
        emb2 = np.asarray(model.apply(params, jnp.asarray(ids), batch["query_mask"]))
        np.testing.assert_allclose(emb1[:, :-1], emb2[:, :-1], atol=1e-5)

    def test_spatial_merge_halves_tokens(self):
        cfg = ColVLMConfig(
            vision=ColVLMConfig.tiny().vision,
            text=ColVLMConfig.tiny().text,
            spatial_merge=2, image_token_id=500)
        model = ColVLM(cfg)
        patches = jnp.ones((1, 16, cfg.vision.patch_pixels))
        pmask = jnp.ones((1, 16), bool)
        params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                            jnp.ones((1, 8), bool), patches, pmask)
        img = model.apply(params, patches, pmask, method=ColVLM.encode_images)
        assert img.shape == (1, 4, cfg.text.hidden)  # 16 patches -> 4 merged


class TestTraining:
    def test_sharded_train_step(self, tiny):
        cfg, _, _, _ = tiny
        mesh = make_mesh((2, 4), ("dp", "tp"))
        trainer = Trainer(cfg, mesh, lr=1e-3, warmup=0)
        batch = synthetic_batch(cfg, batch=4, query_len=8, n_patches=16)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        step = trainer.make_train_step()
        params, opt_state, metrics = step(state.params, state.opt_state, batch)
        assert np.isfinite(float(metrics["loss"]))
        _, _, metrics2 = step(params, opt_state, batch)
        # a second step on the same batch must reduce the loss
        assert float(metrics2["loss"]) < float(metrics["loss"])

    def test_param_shardings_applied(self, tiny):
        cfg, _, _, _ = tiny
        mesh = make_mesh((2, 4), ("dp", "tp"))
        trainer = Trainer(cfg, mesh)
        batch = synthetic_batch(cfg, batch=4, query_len=8, n_patches=16)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        # at least one kernel should actually be tp-sharded
        specs = jax.tree.leaves(
            jax.tree.map(lambda x: str(x.sharding.spec), state.params))
        assert any("tp" in s for s in specs), specs


class TestCheckpointing:
    def test_save_restore_roundtrip(self, tiny, tmp_path):
        import numpy as np

        from visual_rag_tpu.models.train import (
            Trainer, restore_train_state, save_train_state, synthetic_batch)
        from visual_rag_tpu.parallel import make_mesh

        cfg, _, _, _ = tiny
        mesh = make_mesh((2, 4), ("dp", "tp"))
        trainer = Trainer(cfg, mesh, lr=1e-3, warmup=0)
        batch = synthetic_batch(cfg, batch=4, query_len=8, n_patches=16)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        state, _ = trainer.train_step_once(state, batch)
        path = save_train_state(state, tmp_path / "ckpt")
        assert "step_" in path
        restored = restore_train_state(tmp_path / "ckpt", template=state)
        assert restored.step == state.step
        a = jax.tree.leaves(state.params)[0]
        b = jax.tree.leaves(restored.params)[0]
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32))
        # training continues from the restored state
        state2, metrics = trainer.train_step_once(restored, batch)
        assert np.isfinite(float(metrics["loss"]))


class TestShardingRules:
    def test_mesh_without_tp_axis_replicates(self, tiny):
        # serving/dp-only meshes must not crash the sharding rules
        cfg, _, _, _ = tiny
        mesh = make_mesh((8,), ("dp",))
        trainer = Trainer(cfg, mesh, lr=1e-3, warmup=0)
        batch = synthetic_batch(cfg, batch=8, query_len=8, n_patches=16)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        _, _, metrics = trainer.make_train_step()(
            state.params, state.opt_state, batch)
        assert np.isfinite(float(metrics["loss"]))


class TestWindowAttention:
    def test_windows_isolate_in_windowed_layers(self):
        import dataclasses

        tiny = ColVLMConfig.tiny()
        cfg = dataclasses.replace(
            tiny,
            vision=dataclasses.replace(tiny.vision, window_side=2,
                                       full_attn_layers=()))
        model = ColVLM(cfg)
        # 4x4 patch grid -> four 2x2 windows, row-major
        gh = gw = 4
        n = gh * gw
        rng = np.random.default_rng(0)
        patches = rng.standard_normal((1, n, cfg.vision.patch_pixels)).astype(np.float32)
        pmask = np.ones((1, n), bool)
        rr = np.arange(gh)[:, None] // 2
        cc = np.arange(gw)[None, :] // 2
        wids = (rr * 2 + cc).reshape(1, -1).astype(np.int32)
        params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32),
                            jnp.ones((1, 4), bool), jnp.asarray(patches),
                            jnp.asarray(pmask), jnp.asarray(wids))

        def enc(p):
            return np.asarray(model.apply(
                params, jnp.asarray(p), jnp.asarray(pmask), jnp.asarray(wids),
                method=ColVLM.encode_images), np.float32)

        base = enc(patches)
        perturbed = patches.copy()
        perturbed[0, 0] += 3.0  # patch (0,0): window 0
        out = enc(perturbed)
        # window 0 covers grid positions (0,0),(0,1),(1,0),(1,1) = flat 0,1,4,5
        win0 = [0, 1, 4, 5]
        others = [i for i in range(n) if i not in win0]
        assert np.abs(out[0, win0] - base[0, win0]).max() > 1e-4
        np.testing.assert_allclose(out[0, others], base[0, others], atol=1e-5)

    def test_full_attn_layer_mixes_across_windows(self):
        import dataclasses

        tiny = ColVLMConfig.tiny()
        cfg = dataclasses.replace(
            tiny,
            vision=dataclasses.replace(tiny.vision, window_side=2,
                                       full_attn_layers=(1,)))
        model = ColVLM(cfg)
        gh = gw = 4
        n = gh * gw
        rng = np.random.default_rng(1)
        patches = rng.standard_normal((1, n, cfg.vision.patch_pixels)).astype(np.float32)
        pmask = np.ones((1, n), bool)
        rr = np.arange(gh)[:, None] // 2
        cc = np.arange(gw)[None, :] // 2
        wids = (rr * 2 + cc).reshape(1, -1).astype(np.int32)
        params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32),
                            jnp.ones((1, 4), bool), jnp.asarray(patches),
                            jnp.asarray(pmask), jnp.asarray(wids))

        def enc(p):
            return np.asarray(model.apply(
                params, jnp.asarray(p), jnp.asarray(pmask), jnp.asarray(wids),
                method=ColVLM.encode_images), np.float32)

        base = enc(patches)
        perturbed = patches.copy()
        perturbed[0, 0] += 3.0
        out = enc(perturbed)
        # the full-attention layer mixes all windows -> everything changes
        assert np.abs(out - base).max() > 1e-4
        assert np.abs(out[0, 10] - base[0, 10]).max() > 1e-6
