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
    cos, sin = jnp.cos(t), jnp.sin(t)
    x1, x2 = x[..., :half], x[..., half: 2 * half]
    rot1 = x1 * cos - x2 * sin
    rot2 = x1 * sin + x2 * cos
    return jnp.concatenate([rot1, rot2, x[..., 2 * half:]], axis=-1)


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        norm = jax.lax.rsqrt(jnp.mean(x**2, axis=-1, keepdims=True) + self.eps)
        return x * norm * scale


class _Attention(nn.Module):
    dim: int
    num_heads: int
    use_rope: bool = True

    @nn.compact
    def __call__(self, x):
        B, T, D = x.shape
        H = self.num_heads
        Dh = self.dim // H
        qkv = nn.Dense(3 * self.dim, use_bias=False)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        if self.use_rope:
            q, k = _rope(q), _rope(k)
        att = jnp.einsum("bhtd,bhsd->bhts", q, k) / jnp.sqrt(Dh)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhts,bhsd->bhtd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.dim)
        return nn.Dense(self.dim, use_bias=False)(out)


class _Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x):
        x = x + _Attention(self.dim, self.num_heads)(RMSNorm()(x))
        h = RMSNorm()(x)
        h = nn.Dense(self.mlp_ratio * self.dim)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim)(h)
        return x + h


class TransformerEmbedding(nn.Module):
    """Sequence input (B, T) or (B, T, C) -> (B, output_dim)."""

    input_shape: Tuple[int, ...]
    dim: int = 64
    num_heads: int = 4
    num_layers: int = 2
    output_dim: int = 20
    patch_size: int = 1  # >1 enables ViT-style 1D patching

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        if len(self.input_shape) == 1:
            x = x.reshape((B, self.input_shape[0], 1))
        else:
            x = x.reshape((B,) + tuple(self.input_shape))
        if self.patch_size > 1:
            T, C = x.shape[1], x.shape[2]
            T2 = (T // self.patch_size) * self.patch_size
            x = x[:, :T2].reshape(B, T2 // self.patch_size, self.patch_size * C)
        h = nn.Dense(self.dim)(x)
        for _ in range(self.num_layers):
            h = _Block(self.dim, self.num_heads)(h)
        h = RMSNorm()(h).mean(axis=1)
        return nn.Dense(self.output_dim)(h)
