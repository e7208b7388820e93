"""Transformer embedding with RoPE + RMSNorm (+ optional ViT patching).

Ref `sbi/neural_nets/embedding_nets/transformer.py:72,327,352,521,630`.
TPU-first: attention as batched matmuls (MXU), RoPE as fused elementwise.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _rope(x: jnp.ndarray, base: float = 10000.0) -> jnp.ndarray:
    """Rotary position embedding over the last dim; x: (B, H, T, Dh)."""
    B, H, T, Dh = x.shape
    half = Dh // 2
    freqs = base ** (-jnp.arange(half) / half)
    t = jnp.arange(T)[:, None] * freqs[None, :]  # (T, half)
    # Angles in f32, factors in x.dtype: a bf16 x must stay bf16 (f32
    # promotion here would silently upcast the attention matmuls).
    cos = jnp.cos(t).astype(x.dtype)
    sin = jnp.sin(t).astype(x.dtype)
    x1, x2 = x[..., :half], x[..., half: 2 * half]
    rot1 = x1 * cos - x2 * sin
    rot2 = x1 * sin + x2 * cos
    return jnp.concatenate([rot1, rot2, x[..., 2 * half:]], axis=-1)


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        # Statistics in f32 regardless of compute dtype (bf16 mean-of-
        # squares loses too much precision), output in x.dtype.
        x32 = x.astype(jnp.float32)
        norm = jax.lax.rsqrt(
            jnp.mean(x32**2, axis=-1, keepdims=True) + self.eps
        )
        return (x32 * norm * scale).astype(x.dtype)


class _Attention(nn.Module):
    dim: int
    num_heads: int
    use_rope: bool = True
    dtype: Optional[jnp.dtype] = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x):
        B, T, D = x.shape
        H = self.num_heads
        Dh = self.dim // H
        qkv = nn.Dense(3 * self.dim, use_bias=False, dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        if self.use_rope:
            q, k = _rope(q), _rope(k)
        att = jnp.einsum("bhtd,bhsd->bhts", q, k) / jnp.sqrt(Dh).astype(q.dtype)
        # Softmax in f32 (bf16 exp/normalize is the classic instability).
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.dim)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype)(out)


class _MoEFFN(nn.Module):
    """Mixture-of-experts feed-forward (ref `transformer.py:521` MoE block).

    Top-k softmax routing per token. TPU-dense formulation: every expert is
    computed as one batched einsum over the expert axis (MXU-friendly, no
    ragged dispatch) and combined with the sparse gate weights — the right
    trade at embedding-net scale, where experts are small and the ragged
    all-to-all of a dispatched MoE would dominate."""

    dim: int
    num_experts: int = 4
    top_k: int = 2
    mlp_ratio: int = 4
    dtype: Optional[jnp.dtype] = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x):  # (B, T, D)
        E, D, H = self.num_experts, self.dim, self.mlp_ratio * self.dim
        # Router stays f32: tiny compute, and routing decisions are the
        # one place bf16 noise changes program behavior discretely.
        gate_logits = nn.Dense(E, use_bias=False, name="router",
                               dtype=jnp.float32)(x)  # (B,T,E)
        top_vals, top_idx = jax.lax.top_k(gate_logits, self.top_k)
        gates = jax.nn.softmax(top_vals, axis=-1)  # (B,T,k)
        # (B,T,E) sparse combine weights
        combine = jnp.sum(
            jax.nn.one_hot(top_idx, E) * gates[..., None], axis=-2
        )
        init = nn.initializers.lecun_normal()
        w1 = self.param("w1", init, (E, D, H))
        b1 = self.param("b1", nn.initializers.zeros, (E, H))
        w2 = self.param("w2", init, (E, H, D))
        b2 = self.param("b2", nn.initializers.zeros, (E, D))
        cdt = self.dtype or x.dtype
        h = nn.gelu(
            jnp.einsum("btd,edh->bteh", x.astype(cdt), w1.astype(cdt))
            + b1.astype(cdt)
        )
        out = jnp.einsum("bteh,ehd->bted", h, w2.astype(cdt)) + b2.astype(cdt)
        return jnp.einsum(
            "bte,bted->btd", combine.astype(cdt), out
        )


class _Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int = 4
    ffn_type: str = "mlp"  # "mlp" | "moe"
    num_experts: int = 4
    top_k: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = x + _Attention(self.dim, self.num_heads,
                           dtype=self.dtype)(RMSNorm()(x))
        h = RMSNorm()(x)
        if self.ffn_type == "moe":
            h = _MoEFFN(self.dim, self.num_experts, self.top_k,
                        self.mlp_ratio, dtype=self.dtype)(h)
        else:
            h = nn.Dense(self.mlp_ratio * self.dim, dtype=self.dtype)(h)
            h = nn.gelu(h)
            h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return x + h


class TransformerEmbedding(nn.Module):
    """Sequence input (B, T) or (B, T, C) -> (B, output_dim).

    ``patch_mode="2d"`` treats the input as an image (B, H, W) or
    (B, H, W, C) and tokenizes non-overlapping patch_size x patch_size
    patches (ref ViT patching `transformer.py:630`); ``ffn_type="moe"``
    swaps the MLP for a top-k mixture-of-experts block
    (ref `transformer.py:521`).

    ``dtype=jnp.bfloat16`` runs the block matmuls (attention + FFN) in
    bf16 on the MXU with f32 parameters, norms, softmax, MoE routing, and
    output head — the standard TPU mixed-precision recipe. Embedding nets
    are the one SBI component large enough for this to matter (see
    docs/performance.md)."""

    input_shape: Tuple[int, ...]
    dim: int = 64
    num_heads: int = 4
    num_layers: int = 2
    output_dim: int = 20
    patch_size: int = 1  # >1 enables ViT-style patching
    patch_mode: str = "1d"  # "1d" | "2d"
    ffn_type: str = "mlp"  # "mlp" | "moe"
    num_experts: int = 4
    top_k: int = 2
    dtype: Optional[jnp.dtype] = None  # e.g. jnp.bfloat16 (params stay f32)

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        if len(self.input_shape) == 1:
            x = x.reshape((B, self.input_shape[0], 1))
        else:
            x = x.reshape((B,) + tuple(self.input_shape))
        p = self.patch_size
        if self.patch_mode == "2d" and p > 1:
            if x.ndim == 3:  # (B, H, W) -> (B, H, W, 1)
                x = x[..., None]
            _, Hh, Ww, C = x.shape
            H2, W2 = (Hh // p) * p, (Ww // p) * p
            x = x[:, :H2, :W2]
            x = x.reshape(B, H2 // p, p, W2 // p, p, C)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                B, (H2 // p) * (W2 // p), p * p * C
            )
        elif p > 1:
            T, C = x.shape[1], x.shape[2]
            T2 = (T // p) * p
            x = x[:, :T2].reshape(B, T2 // p, p * C)
        h = nn.Dense(self.dim, dtype=self.dtype)(x)
        for _ in range(self.num_layers):
            h = _Block(
                self.dim,
                self.num_heads,
                ffn_type=self.ffn_type,
                num_experts=self.num_experts,
                top_k=self.top_k,
                dtype=self.dtype,
            )(h)
        # Pool + output head in f32: this is the statistical interface the
        # density estimator conditions on.
        h = RMSNorm()(h.astype(jnp.float32)).mean(axis=1)
        return nn.Dense(self.output_dim)(h)
