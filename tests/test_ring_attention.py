"""Ring attention over 'sp': parity with dense attention, grads, masks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visual_rag_tpu.parallel import make_mesh
from visual_rag_tpu.parallel.ring_attention import dense_reference, ring_attention


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)
    b, h, s, d = 2, 4, 32, 16
    mk = lambda: jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    return mk(), mk(), mk()


class TestRingAttention:
    @pytest.mark.parametrize("n_ring", [2, 4, 8])
    def test_bidirectional_parity(self, qkv, n_ring):
        q, k, v = qkv
        mesh = make_mesh((n_ring,), ("sp",))
        out = ring_attention(q, k, v, None, mesh)
        ref = dense_reference(q, k, v, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_causal_parity(self, qkv):
        q, k, v = qkv
        mesh = make_mesh((4,), ("sp",))
        out = ring_attention(q, k, v, None, mesh, causal=True)
        ref = dense_reference(q, k, v, None, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_padding_mask_parity(self, qkv):
        q, k, v = qkv
        b, _, s, _ = q.shape
        rng = np.random.default_rng(3)
        mask = jnp.asarray(rng.random((b, s)) > 0.3)
        mesh = make_mesh((4,), ("sp",))
        out = ring_attention(q, k, v, mask, mesh)
        ref = dense_reference(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_gradients_match_dense(self, qkv):
        q, k, v = qkv
        mesh = make_mesh((4,), ("sp",))

        def loss_ring(q, k, v):
            return jnp.mean(ring_attention(q, k, v, None, mesh, causal=True) ** 2)

        def loss_dense(q, k, v):
            return jnp.mean(dense_reference(q, k, v, None, causal=True) ** 2)

        gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gr, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)

    def test_rejects_indivisible_seq(self, qkv):
        q, k, v = qkv
        mesh = make_mesh((8,), ("sp",))
        with pytest.raises(ValueError, match="divisible"):
            ring_attention(q[:, :, :30], k[:, :, :30], v[:, :, :30], None, mesh)

    def test_fully_masked_rows_are_finite(self, qkv):
        """A row whose keys are ALL padded must not produce NaN."""
        q, k, v = qkv
        b, _, s, _ = q.shape
        mask = jnp.zeros((b, s), bool)  # everything padded
        mesh = make_mesh((4,), ("sp",))
        out = ring_attention(q, k, v, mask, mesh)
        assert np.isfinite(np.asarray(out)).all()


class TestModelIntegration:
    def test_colvlm_ring_matches_dense(self):
        """ring_axis='sp' under an ambient mesh gives the same embeddings as
        the default path (same weights, valid tokens compared)."""
        import dataclasses

        from jax.sharding import set_mesh

        from visual_rag_tpu.models.colvlm import ColVLM, ColVLMConfig

        tiny = ColVLMConfig.tiny()
        base = dataclasses.replace(tiny, dtype="float32")
        ring = dataclasses.replace(
            base, text=dataclasses.replace(base.text, ring_axis="sp"))
        ids = jnp.arange(2 * 16, dtype=jnp.int32).reshape(2, 16) % 40 + 4
        mask = jnp.asarray(np.array([[True] * 16, [True] * 12 + [False] * 4]))
        m_base, m_ring = ColVLM(base), ColVLM(ring)
        params = m_base.init(jax.random.PRNGKey(0), ids, mask)
        ref = np.asarray(m_base.apply(params, ids, mask))
        mesh = make_mesh((2, 4), ("dp", "sp"))
        with set_mesh(mesh):
            out = np.asarray(jax.jit(m_ring.apply)(params, ids, mask))
        valid = np.asarray(mask)
        np.testing.assert_allclose(out[valid], ref[valid], atol=2e-5)

    def test_ring_axis_without_mesh_falls_back(self):
        """No ambient mesh: ring_axis config is inert, not an error."""
        import dataclasses

        from visual_rag_tpu.models.colvlm import ColVLM, ColVLMConfig

        tiny = ColVLMConfig.tiny()
        cfg = dataclasses.replace(
            tiny, text=dataclasses.replace(tiny.text, ring_axis="sp"))
        m = ColVLM(cfg)
        ids = jnp.ones((1, 8), jnp.int32) * 5
        mask = jnp.ones((1, 8), bool)
        params = m.init(jax.random.PRNGKey(0), ids, mask)
        out = m.apply(params, ids, mask)
        assert np.isfinite(np.asarray(out)).all()

    def test_segmented_ring_parity(self, qkv):
        """Window/tile segments respected across ring steps."""
        q, k, v = qkv
        b, _, s, _ = q.shape
        seg = jnp.asarray(np.repeat(np.arange(4), s // 4)[None, :].repeat(b, 0))
        mesh = make_mesh((8,), ("sp",))
        out = ring_attention(q, k, v, None, mesh, segments=seg)
        ref = dense_reference(q, k, v, None, segments=seg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
