"""Pipeline parallelism: scanned decoder stack + GPipe schedule over 'pp'.

The reference scales out via a Qdrant server cluster; training-side pipeline
parallelism has no reference counterpart — contract here is purely internal:
the pipelined decoder must match the sequential decoder bit-for-tolerance,
forward and backward, and the trainer must run on a mesh with a 'pp' axis.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visual_rag_tpu.models.colvlm import ColVLM, ColVLMConfig, ScannedDecoder
from visual_rag_tpu.parallel import make_mesh
from visual_rag_tpu.parallel.pipeline import pipelined_decoder


def _scan_cfg(layers=4):
    tiny = ColVLMConfig.tiny()
    return dataclasses.replace(
        tiny, text=dataclasses.replace(tiny.text, scan_layers=True,
                                       layers=layers))


@pytest.fixture(scope="module")
def decoder_setup():
    cfg = _scan_cfg(layers=4)
    dec = ScannedDecoder(cfg.text, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    b, seq, h = 8, 16, 64
    x = jnp.asarray(rng.standard_normal((b, seq, h)), jnp.float32)
    mask = jnp.ones((b, seq), bool)
    positions = jnp.tile(jnp.arange(seq), (b, 1))
    params = dec.init(jax.random.PRNGKey(0), x, mask, positions)
    return cfg, dec, params, x, mask, positions


class TestScannedDecoder:
    def test_matches_per_layer_blocks(self):
        """scan_layers=True and False give identical forward outputs when
        fed the same weights (same DecoderBlock body)."""
        cfg = dataclasses.replace(_scan_cfg(layers=2), dtype="float32")
        loop_cfg = dataclasses.replace(
            cfg, text=dataclasses.replace(cfg.text, scan_layers=False))
        ids = jnp.arange(2 * 8, dtype=jnp.int32).reshape(2, 8) % 50 + 4
        mask = jnp.ones((2, 8), bool)
        m_scan, m_loop = ColVLM(cfg), ColVLM(loop_cfg)
        p_loop = m_loop.init(jax.random.PRNGKey(0), ids, mask)["params"]
        # re-wire per-layer params into the scanned layout
        stacked = jax.tree.map(
            lambda *xs: jnp.stack(xs), p_loop["layer_0"], p_loop["layer_1"])
        p_scan = {k: v for k, v in p_loop.items()
                  if not k.startswith("layer_")}
        p_scan["scan_blocks"] = {"layers_scan": {"block": stacked}}
        out_loop = m_loop.apply({"params": p_loop}, ids, mask)
        out_scan = m_scan.apply({"params": p_scan}, ids, mask)
        np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_loop),
                                   atol=2e-5)

    def test_param_tree_is_stacked(self, decoder_setup):
        _, _, params, *_ = decoder_setup
        leaves = jax.tree.leaves(params)
        assert all(leaf.shape[0] == 4 for leaf in leaves)


class TestGPipe:
    @pytest.mark.parametrize("n_stages,n_micro", [(2, 2), (4, 4), (2, 8)])
    def test_forward_parity(self, decoder_setup, n_stages, n_micro):
        cfg, dec, params, x, mask, positions = decoder_setup
        seq = dec.apply(params, x, mask, positions)
        mesh = make_mesh((n_stages,), ("pp",))
        pipe = pipelined_decoder(
            mesh, cfg.text, params["params"]["layers_scan"], x, mask,
            positions, n_microbatches=n_micro, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(pipe), np.asarray(seq),
                                   atol=1e-4)

    def test_gradient_parity(self, decoder_setup):
        cfg, dec, params, x, mask, positions = decoder_setup
        mesh = make_mesh((4,), ("pp",))
        stacked = params["params"]["layers_scan"]

        def loss_seq(p):
            out = dec.apply({"params": {"layers_scan": p}}, x, mask, positions)
            return jnp.mean(out ** 2)

        def loss_pipe(p):
            out = pipelined_decoder(mesh, cfg.text, p, x, mask, positions,
                                    n_microbatches=4, dtype=jnp.float32)
            return jnp.mean(out ** 2)

        gs = jax.grad(loss_seq)(stacked)
        gp = jax.grad(loss_pipe)(stacked)
        for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gp)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-4, rtol=1e-3)

    def test_rejects_indivisible(self, decoder_setup):
        cfg, _, params, x, mask, positions = decoder_setup
        mesh3 = make_mesh((3,), ("pp",)) if jax.device_count() >= 3 else None
        if mesh3 is not None:  # layers=4 not divisible by pp=3
            with pytest.raises(ValueError, match="divisible"):
                pipelined_decoder(mesh3, cfg.text,
                                  params["params"]["layers_scan"],
                                  x, mask, positions, n_microbatches=4)
        mesh = make_mesh((2,), ("pp",))
        with pytest.raises(ValueError, match="microbatches"):
            pipelined_decoder(mesh, cfg.text,
                              params["params"]["layers_scan"],
                              x, mask, positions, n_microbatches=3)


class TestTrainerOnPPMesh:
    def test_train_step_with_pp_axis(self):
        """GSPMD mode: stacked stage dim sharded over 'pp' in the trainer."""
        from visual_rag_tpu.models.train import Trainer, synthetic_batch

        cfg = _scan_cfg(layers=2)
        mesh = make_mesh((2, 2, 2), ("dp", "pp", "tp"))
        trainer = Trainer(cfg, mesh, lr=1e-3, warmup=0)
        batch = synthetic_batch(cfg, batch=4, query_len=8, n_patches=16)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        specs = {
            "/".join(str(getattr(p, "key", p)) for p in path):
                str(leaf.sharding.spec)
            for path, leaf in jax.tree_util.tree_leaves_with_path(state.params)
        }
        scanned = {k: v for k, v in specs.items() if "layers_scan" in k}
        assert scanned and all("pp" in v for v in scanned.values()), scanned
        step = trainer.make_train_step()
        params, opt_state, metrics = step(state.params, state.opt_state, batch)
        assert np.isfinite(float(metrics["loss"]))


class TestScannedConvert:
    def test_checkpoint_stacks_layers(self):
        from test_convert import synthetic_state_dict

        from visual_rag_tpu.models.convert import (
            convert_state_dict, validate_against_model)

        cfg = _scan_cfg(layers=2)
        loop_cfg = dataclasses.replace(
            cfg, text=dataclasses.replace(cfg.text, scan_layers=False))
        state = synthetic_state_dict(loop_cfg)  # HF exports are per-layer
        params, report = convert_state_dict(state, cfg)
        blk = params["params"]["scan_blocks"]["layers_scan"]["block"]
        assert blk["attn"]["q"]["kernel"].shape[0] == 2
        assert not [m for m in report["missing"] if "scan" in m]
        assert not validate_against_model(params, cfg)


class TestEMA:
    def test_ema_converges_toward_params(self):
        import jax.numpy as jnp

        from visual_rag_tpu.models.train import ema_update

        ema = {"w": jnp.zeros((4,)), "b": jnp.ones((2,), jnp.bfloat16)}
        target = {"w": jnp.full((4,), 10.0), "b": jnp.full((2,), 3.0, jnp.bfloat16)}
        x = ema
        for _ in range(200):
            x = jax.tree.map(lambda a: a, ema_update(x, target, 0.95))
        assert float(jnp.abs(x["w"] - 10.0).max()) < 1e-3
        assert x["b"].dtype == jnp.bfloat16  # dtype preserved
        # decay is traced: different decays reuse the compiled fn
        y = ema_update(ema, target, 0.5)
        np.testing.assert_allclose(np.asarray(y["w"]), np.full(4, 5.0), atol=1e-6)
