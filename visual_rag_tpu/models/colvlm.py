"""Config-driven ColVLM in flax.linen: vision tower + merger + LM + projection.

Architecture family (shapes configurable to the ColSmol / ColPali / ColQwen2.5
operating points the reference drives through colpali-engine):

- vision tower: ViT with conv patch embed, learned positions, pre-LN blocks,
  GELU MLP (SigLIP shape)
- optional PatchMerger: 2x2 spatial merge + MLP (Qwen2.5-VL shape; gives the
  "effective grid" H/2 x W/2 the reference infers at
  visual_embedder.py:654-667)
- language model: decoder-only transformer with RMSNorm, RoPE, grouped-query
  attention, SwiGLU MLP (Llama/Gemma/Qwen shape)
- projection: hidden -> dim (128) linear; outputs L2-normalized per-token
  embeddings, the late-interaction representation

Everything is static-shape and jit-friendly: images arrive as
[B, N_patches, patch_pixels], text as [B, L] ids; image embeddings are merged
into the sequence at image-placeholder positions with a mask-based select.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_EMBED_DIM = 128


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    patch_pixels: int = 3 * 16 * 16  # flattened patch input size
    max_patches: int = 1024
    # Qwen2.5-VL-style window attention: tokens attend within window_side x
    # window_side patch windows except at full_attn_layers (0 = full attention
    # everywhere, the SigLIP/ColPali behavior)
    window_side: int = 0
    full_attn_layers: tuple = ()
    # SmolVLM/ColSmol pixel shuffle: each tile is (8*s)^2 real patches through
    # the ViT, then s x s spatial blocks fold into channels -> 64 tokens of
    # hidden*s^2 per tile (1 = no shuffle). Tiles attend independently via the
    # processor-supplied per-tile segment ids.
    pixel_shuffle: int = 1
    # HF-checkpoint fidelity knobs (exact parametrizations of the real
    # towers; defaults keep the lean test-scale tree):
    attn_bias: bool = False  # SigLIP & Qwen-ViT attention carries q/k/v/o biases
    mlp_gated: bool = False  # Qwen2.5-VL ViT MLP is biased SwiGLU (gate/up/down)
    rms_norm: bool = False  # Qwen2.5-VL ViT norms are RMSNorm (not LayerNorm)
    patch_bias: bool = True  # Qwen2.5-VL patch embed is a bias-free Conv3d
    learned_pos: bool = True  # Qwen2.5-VL has no learned pos table (2D RoPE)
    post_ln: bool = True  # Qwen2.5-VL has no final vision LayerNorm
    rope_2d: bool = False  # Qwen2.5-VL 2D rotary over (row, col) positions
    rope_theta: float = 10000.0


@dataclasses.dataclass(frozen=True)
class TextConfig:
    hidden: int = 960
    layers: int = 12
    heads: int = 15
    kv_heads: int = 5
    mlp_hidden: int = 2560
    vocab: int = 49280
    rope_theta: float = 100000.0
    max_seq: int = 4096
    # Stack the decoder blocks into ONE nn.scan-ned block with [L, ...]
    # params. Required for pipeline parallelism (the stage dim shards over
    # the 'pp' mesh axis) and cuts compile time for deep stacks. Param tree
    # shape differs from the per-layer layout, so it's opt-in.
    scan_layers: bool = False
    # Mixture-of-experts FFN (0 = dense SwiGLU). Experts shard over the
    # 'ep' mesh axis; routing is GShard-style dense dispatch (static-shape
    # einsums on the MXU, no ragged gathers).
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    # Stream K/V around this mesh axis (ring attention) instead of
    # all-gathering, for sequences too long for one chip. Takes effect only
    # under an ambient mesh (jax.sharding.set_mesh) carrying the axis with a
    # divisible sequence length; otherwise falls back to flash/dense.
    ring_axis: Optional[str] = None
    # HF-checkpoint fidelity knobs:
    attn_qkv_bias: bool = False  # Qwen2/2.5 text attention has q/k/v biases
    mlp_act: str = "silu"  # Gemma (ColPali) uses gelu_tanh GeGLU
    rms_offset: bool = False  # Gemma RMSNorm computes x * (1 + w)
    embed_scale: bool = False  # Gemma scales embeddings by sqrt(hidden)
    # PaliGemma is a prefix-LM: the whole embedding input (image + text) is
    # prompt, so HF builds a FULL bidirectional mask for the ColPali forward
    # (no labels, no generation). Llama/Qwen backbones stay causal.
    causal: bool = True
    # Qwen2.5-VL M-RoPE: half-dim frequency bands partitioned into
    # (temporal, height, width) sections; image tokens rotate by their 2D
    # grid coordinates (HF get_rope_index). None = standard 1D RoPE.
    mrope_section: Optional[tuple] = None


@dataclasses.dataclass(frozen=True)
class ColVLMConfig:
    """Full model config. ``spatial_merge`` 1 = ColSmol/ColPali, 2 = ColQwen2.5."""

    vision: VisionConfig = VisionConfig()
    text: TextConfig = TextConfig()
    embed_dim: int = DEFAULT_EMBED_DIM
    spatial_merge: int = 1
    image_token_id: int = 49190
    dtype: str = "bfloat16"
    remat: bool = False  # jax.checkpoint each block: trade FLOPs for HBM in training
    # HF-checkpoint fidelity knobs:
    proj_bias: bool = False  # colpali-engine custom_text_proj is Linear(bias=True)
    connector_bias: bool = True  # Idefics3 modality projection has NO bias
    # which HF export naming the converter should expect for this config
    hf_layout: str = "idefics3"  # idefics3 | paligemma | qwen2.5

    @classmethod
    def colsmol_500m(cls) -> "ColVLMConfig":
        """ColSmol-500M shape (SmolVLM2-500M backbone: SigLIP-B/16 + 500M LM)."""
        return cls(
            vision=VisionConfig(hidden=768, layers=12, heads=12, patch_pixels=3 * 16 * 16,
                                max_patches=18432, pixel_shuffle=4, attn_bias=True),
            text=TextConfig(hidden=960, layers=32, heads=15, kv_heads=5,
                            mlp_hidden=2560, vocab=49280),
            spatial_merge=1,
            proj_bias=True, connector_bias=False, hf_layout="idefics3",
        )

    @classmethod
    def colpali_v13(cls) -> "ColVLMConfig":
        """ColPali-v1.3 shape (PaliGemma-3B: SigLIP-So400m + Gemma-2B)."""
        return cls(
            vision=VisionConfig(hidden=1152, layers=27, heads=16, patch_pixels=3 * 14 * 14,
                                max_patches=1024, attn_bias=True),
            text=TextConfig(hidden=2048, layers=18, heads=8, kv_heads=1,
                            mlp_hidden=16384, vocab=257216, rope_theta=10000.0,
                            mlp_act="gelu_tanh", rms_offset=True,
                            embed_scale=True, causal=False),
            spatial_merge=1,
            image_token_id=257152,
            proj_bias=True, connector_bias=True, hf_layout="paligemma",
        )

    @classmethod
    def colqwen25_v02(cls) -> "ColVLMConfig":
        """ColQwen2.5-v0.2 shape (Qwen2.5-VL-3B: window-attn ViT + 2x2 merge)."""
        return cls(
            vision=VisionConfig(hidden=1280, layers=32, heads=16, patch_pixels=3 * 14 * 14,
                                max_patches=4096, window_side=8,
                                full_attn_layers=(7, 15, 23, 31),
                                attn_bias=True, mlp_gated=True, rms_norm=True,
                                patch_bias=False, learned_pos=False,
                                post_ln=False, rope_2d=True),
            text=TextConfig(hidden=2048, layers=36, heads=16, kv_heads=2,
                            mlp_hidden=11008, vocab=151936, rope_theta=1000000.0,
                            attn_qkv_bias=True, mrope_section=(16, 24, 24)),
            spatial_merge=2,
            image_token_id=151655,
            proj_bias=True, hf_layout="qwen2.5",
        )

    @classmethod
    def tiny(cls) -> "ColVLMConfig":
        """Test/dry-run scale."""
        return cls(
            vision=VisionConfig(hidden=64, layers=2, heads=4, patch_pixels=48,
                                max_patches=512),
            text=TextConfig(hidden=64, layers=2, heads=4, kv_heads=2,
                            mlp_hidden=128, vocab=512, max_seq=128),
            spatial_merge=1,
            image_token_id=500,
        )


def _rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float,
          mrope_section=None) -> jnp.ndarray:
    """Rotary embedding over the last dim of [B, T, H, Dh].

    positions: [B, T] (standard 1D), or [B, T, 3] with ``mrope_section``
    (Qwen2.5-VL M-RoPE): the half-dim frequency bands are partitioned into
    (temporal, height, width) sections and each band rotates by its own
    axis's position (HF Qwen2_5_VLRotaryEmbedding + the mrope_section cos/sin
    interleave in modeling_qwen2_5_vl.py). Text-only sequences carry equal
    positions on all three axes, so M-RoPE degenerates to standard RoPE.
    """
    dh = x.shape[-1]
    half = dh // 2
    freqs = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) / half))
    if mrope_section is not None and positions.ndim == 3:
        assert sum(mrope_section) == half, (mrope_section, half)
        axis_of_freq = jnp.asarray(
            np.repeat(np.arange(3), np.asarray(mrope_section)))  # [half]
        pos_sel = jnp.take(positions, axis_of_freq, axis=2)  # [B, T, half]
        angles = pos_sel.astype(jnp.float32) * freqs  # [B, T, half]
    else:
        if positions.ndim == 3:  # 3D positions without sections: axes equal
            positions = positions[..., 0]
        angles = positions[..., None].astype(jnp.float32) * freqs  # [B, T, half]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


def _rope_2d(x, pos2d, theta: float):
    """Qwen2/2.5-VL vision rotary: head_dim/4 frequencies per axis,
    freqs = cat(freqs_row, freqs_col) repeated twice, rotate-half applied in
    f32 (transformers apply_rotary_pos_emb_vision, verified against 4.57).

    x: [B, T, H, dh]; pos2d: [B, T, 2] int (row, col).
    """
    dh = x.shape[-1]
    half = dh // 2
    inv = 1.0 / (theta ** (jnp.arange(0, half, 2, dtype=jnp.float32) / half))
    fr = pos2d[..., 0:1].astype(jnp.float32) * inv[None, None, :]  # [B, T, dh/4]
    fc = pos2d[..., 1:2].astype(jnp.float32) * inv[None, None, :]
    freqs = jnp.concatenate([fr, fc], axis=-1)  # [B, T, dh/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)[:, :, None, :]  # [B, T, 1, dh]
    cos, sin = jnp.cos(emb), jnp.sin(emb)
    x32 = x.astype(jnp.float32)
    x1, x2 = x32[..., :half], x32[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x32 * cos + rotated * sin).astype(x.dtype)


class RMSNorm(nn.Module):
    eps: float = 1e-6
    # Gemma parametrization: output = norm(x) * (1 + w), stored w init 0.
    # (HF Gemma checkpoints store w; PaliGemma/ColPali needs this exactly.)
    offset: bool = False

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros if self.offset else nn.initializers.ones
        scale = self.param("scale", init, (x.shape[-1],))
        x32 = x.astype(jnp.float32)
        norm = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + self.eps)
        if self.offset:
            return (norm * (1.0 + scale)).astype(x.dtype)
        return (norm * scale).astype(x.dtype)


class GQAttention(nn.Module):
    """Grouped-query attention with optional RoPE and causal masking."""

    heads: int
    kv_heads: int
    rope_theta: Optional[float] = None
    causal: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    use_flash: bool = True
    ring_axis: Optional[str] = None
    qkv_bias: bool = False  # SigLIP/Qwen-ViT and Qwen text carry q/k/v biases
    out_bias: bool = False  # SigLIP/Qwen-ViT carry an output-proj bias

    rope_2d_theta: Optional[float] = None  # set -> 2D vision rotary
    mrope_section: Optional[tuple] = None  # set -> Qwen2.5-VL text M-RoPE

    @nn.compact
    def __call__(self, x, mask, positions=None, segments=None,
                 positions_2d=None):
        from visual_rag_tpu.models.attention import mha

        b, t, h = x.shape
        dh = h // self.heads
        qb = self.qkv_bias
        q = nn.Dense(self.heads * dh, use_bias=qb, dtype=self.dtype, name="q")(x)
        k = nn.Dense(self.kv_heads * dh, use_bias=qb, dtype=self.dtype, name="k")(x)
        v = nn.Dense(self.kv_heads * dh, use_bias=qb, dtype=self.dtype, name="v")(x)
        q = q.reshape(b, t, self.heads, dh)
        k = k.reshape(b, t, self.kv_heads, dh)
        v = v.reshape(b, t, self.kv_heads, dh)
        if self.rope_2d_theta is not None and positions_2d is not None:
            q = _rope_2d(q, positions_2d, self.rope_2d_theta)
            k = _rope_2d(k, positions_2d, self.rope_2d_theta)
        elif self.rope_theta is not None:
            if positions is None:
                positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
            q = _rope(q, positions, self.rope_theta, self.mrope_section)
            k = _rope(k, positions, self.rope_theta, self.mrope_section)
        rep = self.heads // self.kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        out = mha(q, k, v, mask, causal=self.causal, dtype=self.dtype,
                  use_flash=self.use_flash, segments=segments,
                  ring_axis=self.ring_axis)
        out = out.reshape(b, t, self.heads * dh)
        return nn.Dense(h, use_bias=self.out_bias, dtype=self.dtype, name="o")(out)


class SwiGLU(nn.Module):
    mlp_hidden: int
    dtype: jnp.dtype = jnp.bfloat16
    act: str = "silu"  # gelu_tanh for Gemma's GeGLU
    use_bias: bool = False  # Qwen2.5-VL's ViT MLP is biased

    @nn.compact
    def __call__(self, x):
        gate = nn.Dense(self.mlp_hidden, use_bias=self.use_bias,
                        dtype=self.dtype, name="gate")(x)
        up = nn.Dense(self.mlp_hidden, use_bias=self.use_bias,
                      dtype=self.dtype, name="up")(x)
        a = nn.gelu(gate) if self.act == "gelu_tanh" else nn.silu(gate)
        return nn.Dense(x.shape[-1], use_bias=self.use_bias,
                        dtype=self.dtype, name="down")(a * up)


class MoEFFN(nn.Module):
    """Mixture-of-experts SwiGLU with GShard-style dense dispatch.

    TPU-first formulation: routing is expressed as static-shape one-hot
    dispatch/combine einsums (MXU work, no ragged gather/scatter), so the
    expert dim E shards cleanly over the 'ep' mesh axis and XLA lowers the
    token exchange to all-to-alls over ICI. Capacity C per expert is
    ``ceil(top_k * S * capacity_factor / E)``; overflow tokens fall through
    the residual (their combine weight is zero). A Switch-style load-balance
    loss is exposed via ``self.sow('losses', 'moe_aux', ...)``.
    """

    cfg: TextConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        E = self.cfg.moe_experts
        k_choices = min(self.cfg.moe_top_k, E)
        b, s, h = x.shape
        cap = max(1, int(-(-k_choices * s * self.cfg.moe_capacity_factor // E)))

        logits = nn.Dense(E, use_bias=False, dtype=jnp.float32,
                          name="router")(x.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)  # [b, s, E]

        dispatch = jnp.zeros((b, s, E, cap), jnp.float32)
        combine = jnp.zeros((b, s, E, cap), jnp.float32)
        remaining = probs
        count = jnp.zeros((b, 1, E), jnp.float32)  # filled slots per expert
        gate_sum = jnp.zeros((b, s), jnp.float32)
        top1_mask = None
        for _ in range(k_choices):
            idx = jnp.argmax(remaining, axis=-1)            # [b, s]
            m = jax.nn.one_hot(idx, E, dtype=jnp.float32)    # [b, s, E]
            if top1_mask is None:
                top1_mask = m
            gate = jnp.sum(probs * m, axis=-1)               # [b, s]
            pos = jnp.cumsum(m, axis=1) - 1 + count          # slot per token
            keep = (pos < cap) * m
            slot = jax.nn.one_hot(
                pos.astype(jnp.int32), cap, dtype=jnp.float32)  # [b, s, E, cap]
            dispatch = dispatch + keep[..., None] * slot
            combine = combine + (gate[..., None] * keep)[..., None] * slot
            gate_sum = gate_sum + gate * jnp.sum(keep, axis=-1)
            count = count + jnp.sum(m, axis=1, keepdims=True)
            remaining = remaining * (1.0 - m)
        # renormalize kept gates so routed mass sums to 1 per token
        combine = combine / jnp.maximum(gate_sum[..., None, None], 1e-9)

        # Switch load-balance loss: E * sum_e f_e * p_e (minimized at uniform)
        frac = jnp.mean(top1_mask, axis=(0, 1))              # tokens per expert
        prob = jnp.mean(probs, axis=(0, 1))                  # router mass
        self.sow("losses", "moe_aux", E * jnp.sum(frac * prob))

        gate_k = self.param(
            "gate_kernel", nn.initializers.lecun_normal(),
            (E, h, self.cfg.mlp_hidden), self.dtype)
        up_k = self.param(
            "up_kernel", nn.initializers.lecun_normal(),
            (E, h, self.cfg.mlp_hidden), self.dtype)
        down_k = self.param(
            "down_kernel", nn.initializers.lecun_normal(),
            (E, self.cfg.mlp_hidden, h), self.dtype)

        xin = jnp.einsum("bsec,bsh->ebch", dispatch.astype(self.dtype), x)
        act = nn.silu(jnp.einsum("ebch,ehm->ebcm", xin, gate_k))
        act = act * jnp.einsum("ebch,ehm->ebcm", xin, up_k)
        out = jnp.einsum("ebcm,emh->ebch", act, down_k)
        return jnp.einsum("bsec,ebch->bsh", combine.astype(self.dtype), out)


class DecoderBlock(nn.Module):
    cfg: TextConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask, positions):
        off = self.cfg.rms_offset
        h = x + GQAttention(
            heads=self.cfg.heads, kv_heads=self.cfg.kv_heads,
            rope_theta=self.cfg.rope_theta, causal=self.cfg.causal,
            dtype=self.dtype,
            ring_axis=self.cfg.ring_axis, qkv_bias=self.cfg.attn_qkv_bias,
            mrope_section=self.cfg.mrope_section,
            name="attn",
        )(RMSNorm(offset=off, name="ln1")(x), mask, positions)
        if self.cfg.moe_experts > 0:
            ffn = MoEFFN(self.cfg, dtype=self.dtype, name="moe")
        else:
            ffn = SwiGLU(self.cfg.mlp_hidden, dtype=self.dtype,
                         act=self.cfg.mlp_act, name="mlp")
        h = h + ffn(RMSNorm(offset=off, name="ln2")(h))
        return h


class ScannedDecoder(nn.Module):
    """All decoder blocks as ONE nn.scan-ned block with [L, ...] params.

    The leading (stage) param dim is what pipeline parallelism shards over
    the 'pp' mesh axis (models/sharding.py) and what parallel/pipeline.py's
    GPipe runner splits into per-stage chunks. Numerically identical to the
    per-layer block list (same DecoderBlock body).
    """

    cfg: TextConfig
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, h, mask, positions):
        body = _DecoderScanBody
        if self.remat:
            body = nn.remat(body, static_argnums=())
        blocks = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.cfg.layers,
            in_axes=(nn.broadcast, nn.broadcast),
        )(self.cfg, dtype=self.dtype, name="layers_scan")
        h, _ = blocks(h, mask, positions)
        return h


class _DecoderScanBody(nn.Module):
    cfg: TextConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, h, mask, positions):
        h = DecoderBlock(self.cfg, dtype=self.dtype, name="block")(
            h, mask, positions)
        return h, None


class ViTBlock(nn.Module):
    cfg: VisionConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask, segments=None, positions_2d=None):
        def norm(name):
            if self.cfg.rms_norm:  # Qwen2.5-VL ViT
                return RMSNorm(name=name)
            return nn.LayerNorm(dtype=self.dtype, name=name)

        h = x + GQAttention(
            heads=self.cfg.heads, kv_heads=self.cfg.heads, rope_theta=None,
            causal=False, dtype=self.dtype, name="attn",
            qkv_bias=self.cfg.attn_bias, out_bias=self.cfg.attn_bias,
            rope_2d_theta=(self.cfg.rope_theta if self.cfg.rope_2d else None),
        )(norm("ln1")(x), mask, segments=segments, positions_2d=positions_2d)
        y = norm("ln2")(h)
        if self.cfg.mlp_gated:  # Qwen2.5-VL: biased SwiGLU
            y = SwiGLU(int(self.cfg.hidden * self.cfg.mlp_ratio),
                       dtype=self.dtype, use_bias=True, name="mlp")(y)
        else:  # SigLIP: gelu_tanh MLP with biases
            y = nn.Dense(int(self.cfg.hidden * self.cfg.mlp_ratio),
                         dtype=self.dtype, name="fc1")(y)
            y = nn.gelu(y)
            y = nn.Dense(self.cfg.hidden, dtype=self.dtype, name="fc2")(y)
        return h + y


class VisionTower(nn.Module):
    cfg: VisionConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, patches, patch_mask, window_ids=None,
                 patch_positions=None):
        # patches: [B, N, patch_pixels] flattened pixel patches
        b, n, _ = patches.shape
        if n > self.cfg.max_patches:
            raise ValueError(
                f"{n} patches exceeds vision.max_patches={self.cfg.max_patches}")
        x = nn.Dense(self.cfg.hidden, use_bias=self.cfg.patch_bias,
                     dtype=self.dtype, name="patch_embed")(
            patches.astype(self.dtype))
        if self.cfg.learned_pos:
            # Table size must equal the HF export's position_embedding rows:
            # with pixel shuffle, positions index WITHIN one (8*s)^2-patch
            # tile, so the table has (8*s)^2 rows regardless of how many
            # tiles a page carries (real ColSmol: 1024 rows vs an 18432-patch
            # page budget) — sizing it max_patches would reject real weights.
            s = self.cfg.pixel_shuffle
            pos_rows = (8 * s) ** 2 if s > 1 else self.cfg.max_patches
            pos = self.param(
                "pos_embed", nn.initializers.normal(0.02),
                (pos_rows, self.cfg.hidden))
            if self.cfg.pixel_shuffle > 1:
                # per-tile position table: SigLIP positions index within each
                # (8*s)^2-patch tile, not across the page's tile sequence.
                # Idefics3VisionEmbeddings bucketizes fractional coordinates
                # with a (1 - 1e-6) epsilon (modeling_idefics3.py), so at full
                # tile resolution the per-axis ids come out [0, 0, 1, ...,
                # side-2] — NOT sequential. SmolVLM was trained with this
                # quirk; replicating it is required for checkpoint fidelity
                # (verified against the live torch forward in
                # tests/test_torch_forward_parity.py).
                side = 8 * self.cfg.pixel_shuffle
                tile_patches = side * side
                axis_bucket = jnp.maximum(jnp.arange(side) - 1, 0)
                tile_pos = (axis_bucket[:, None] * side
                            + axis_bucket[None, :]).reshape(-1)
                pos_idx = tile_pos[jnp.arange(n) % tile_patches]
                x = x + pos[pos_idx][None, :, :].astype(self.dtype)
            else:
                x = x + pos[:n][None, :, :].astype(self.dtype)
        windowed = window_ids is not None  # tiles or windows, per the processor
        for i in range(self.cfg.layers):
            seg = None
            if windowed and i not in self.cfg.full_attn_layers:
                seg = window_ids
            x = ViTBlock(self.cfg, dtype=self.dtype, name=f"block_{i}")(
                x, patch_mask, segments=seg, positions_2d=patch_positions)
        if not self.cfg.post_ln:  # Qwen2.5-VL: merger's ln_q does the norm
            return x
        return nn.LayerNorm(dtype=self.dtype, name="post_ln")(x)


class PatchMerger(nn.Module):
    """Qwen2.5-VL style 2x2 spatial merge + MLP to the LM hidden size."""

    out_hidden: int
    merge: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # x: [B, N, H] with N divisible by merge**2, row-major over the grid
        b, n, h = x.shape
        m2 = self.merge * self.merge
        x = RMSNorm(name="ln_q")(x)  # Qwen2.5-VL merger pre-norm
        x = x.reshape(b, n // m2, m2 * h)
        x = nn.Dense(m2 * h, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x)
        return nn.Dense(self.out_hidden, dtype=self.dtype, name="fc2")(x)


class ColVLM(nn.Module):
    """Late-interaction VLM: returns L2-normalized [B, L, embed_dim] tokens."""

    cfg: ColVLMConfig

    def setup(self):
        dtype = jnp.dtype(self.cfg.dtype)
        self._dtype = dtype
        self.vision = VisionTower(self.cfg.vision, dtype=dtype)
        if self.cfg.spatial_merge > 1:
            self.merger = PatchMerger(
                out_hidden=self.cfg.text.hidden, merge=self.cfg.spatial_merge, dtype=dtype)
        else:
            self.connector = nn.Dense(
                self.cfg.text.hidden, use_bias=self.cfg.connector_bias,
                dtype=dtype, name="connector")
        if self.cfg.remat:
            # rematerialize transformer blocks: activations recomputed in the
            # backward pass instead of living in HBM (task: trade FLOPs for memory)
            decoder_cls = nn.remat(DecoderBlock)
            vit_cls = nn.remat(ViTBlock)
        else:
            decoder_cls = DecoderBlock
            vit_cls = ViTBlock
        self._decoder_cls = decoder_cls
        self.tok_embed = nn.Embed(
            self.cfg.text.vocab, self.cfg.text.hidden, dtype=dtype,
            embedding_init=nn.initializers.normal(0.02))
        if self.cfg.text.scan_layers:
            self.scan_blocks = ScannedDecoder(
                self.cfg.text, dtype=dtype, remat=self.cfg.remat,
                name="scan_blocks")
            self.blocks = None
        else:
            self.blocks = [
                decoder_cls(self.cfg.text, dtype=dtype, name=f"layer_{i}")
                for i in range(self.cfg.text.layers)
            ]
        self.final_norm = RMSNorm(offset=self.cfg.text.rms_offset)
        self.proj = nn.Dense(self.cfg.embed_dim, use_bias=self.cfg.proj_bias,
                             dtype=dtype, name="embedding_proj")

    def encode_images(self, patches, patch_mask, window_ids=None,
                      patch_positions=None):
        """[B, N, patch_pixels] -> [B, N', text_hidden] image token embeddings."""
        feats = self.vision(patches, patch_mask, window_ids, patch_positions)
        if self.cfg.spatial_merge > 1:
            return self.merger(feats)
        sps = self.cfg.vision.pixel_shuffle
        if sps > 1:
            # SmolVLM pixel shuffle, HF op order for weight compatibility:
            # [tiles, side, side, H] -> fold s x s spatial blocks into channels
            b, n, h = feats.shape
            side = 8 * sps
            tile_patches = side * side
            tiles = n // tile_patches
            x = feats.reshape(b * tiles, side, side, h)
            x = x.reshape(b * tiles, side, side // sps, h * sps)
            x = jnp.transpose(x, (0, 2, 1, 3))
            x = x.reshape(b * tiles, side // sps, side // sps, h * sps * sps)
            x = jnp.transpose(x, (0, 2, 1, 3))
            feats = x.reshape(b, tiles * 64, h * sps * sps)
        return self.connector(feats)

    def _mrope_positions(self, input_ids, attn_mask, patch_positions):
        """[B, L, 3] (t, h, w) positions — HF Qwen2_5_VLModel.get_rope_index.

        Text tokens carry equal positions on all axes; image tokens carry
        (block_start, block_start + row, block_start + col) of their MERGED
        grid cell, and the block advances the running counter by
        max(grid_h_eff, grid_w_eff).
        """
        mask_i = attn_mask.astype(jnp.int32)
        is_img = (input_ids == self.cfg.image_token_id) & (mask_i > 0)
        if patch_positions is None:  # text-only: all axes equal
            base = jnp.maximum(jnp.cumsum(mask_i, axis=1) - 1, 0)
            return jnp.repeat(base[..., None], 3, axis=-1)
        # merged-grid coords per image token: merge-block order means each
        # group of merge^2 consecutive patches is one token (row-major cells)
        m2 = self.cfg.spatial_merge ** 2
        mer = patch_positions[:, ::m2, :] // self.cfg.spatial_merge  # [B, Ni, 2]
        slot = jnp.clip(jnp.cumsum(is_img.astype(jnp.int32), axis=1) - 1,
                        0, mer.shape[1] - 1)
        h_c = jnp.take_along_axis(mer[..., 0], slot, axis=1)  # [B, L]
        w_c = jnp.take_along_axis(mer[..., 1], slot, axis=1)
        nxt_img = jnp.concatenate(
            [is_img[:, 1:], jnp.zeros_like(is_img[:, :1])], axis=1)
        block_end = is_img & ~nxt_img
        adv = jnp.where(is_img,
                        jnp.where(block_end, jnp.maximum(h_c, w_c) + 1, 0),
                        mask_i)
        adv = adv * mask_i
        excl = jnp.cumsum(adv, axis=1) - adv  # position base BEFORE each token
        return jnp.stack(
            [excl,
             excl + jnp.where(is_img, h_c, 0),
             excl + jnp.where(is_img, w_c, 0)], axis=-1)

    def _lm(self, embeds, mask, positions=None):
        if positions is None:
            positions = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
            positions = jnp.maximum(positions, 0)
        h = embeds
        if self.cfg.text.scan_layers:
            h = self.scan_blocks(h, mask, positions)
        else:
            for blk in self.blocks:
                h = blk(h, mask, positions)
        return self.final_norm(h)

    def _project(self, h, mask):
        e = self.proj(h).astype(jnp.float32)
        e = e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-8)
        return e * mask[..., None].astype(jnp.float32)

    def __call__(self, input_ids, attn_mask, patches=None, patch_mask=None,
                 window_ids=None, patch_positions=None):
        """Forward pages (ids containing image placeholders) or plain queries.

        input_ids: [B, L]; image placeholder positions (== cfg.image_token_id)
        are filled with the image embeddings IN ORDER (mask-based merge, like
        HF's masked_scatter path).
        """
        x = self.tok_embed(input_ids)
        if patches is not None:
            img = self.encode_images(patches, patch_mask, window_ids,
                                     patch_positions)  # [B, Ni, H]
            if self.cfg.text.embed_scale:
                # PaliGemma: image features are pre-divided by sqrt(hidden) so
                # the Gemma-wide sqrt(hidden) embed scaling nets out to 1.
                img = img * (self.cfg.text.hidden ** -0.5)
            is_img = input_ids == self.cfg.image_token_id  # [B, L]
            # index of each image slot within its row: 0..Ni-1
            slot = jnp.cumsum(is_img.astype(jnp.int32), axis=1) - 1
            slot = jnp.clip(slot, 0, img.shape[1] - 1)
            gathered = jnp.take_along_axis(img, slot[..., None], axis=1)
            x = jnp.where(is_img[..., None], gathered.astype(x.dtype), x)
        if self.cfg.text.embed_scale:  # Gemma embedding normalizer
            x = x * (self.cfg.text.hidden ** 0.5)
        positions = None
        if self.cfg.text.mrope_section is not None:
            positions = self._mrope_positions(
                input_ids, attn_mask,
                patch_positions if patches is not None else None)
        h = self._lm(x, attn_mask, positions)
        return self._project(h, attn_mask)

    def embed_queries(self, input_ids, attn_mask):
        return self(input_ids, attn_mask)

    def embed_pages(self, input_ids, attn_mask, patches, patch_mask,
                    window_ids=None, patch_positions=None):
        return self(input_ids, attn_mask, patches, patch_mask, window_ids,
                    patch_positions)
