"""Vector-field networks and builders for score / flow-matching estimators.

JAX counterpart of `sbi/neural_nets/net_builders/vector_field_nets.py`
(`VectorFieldMLP` `:112`, `VectorFieldAdaMLP` `:552`, DiT-style
`VectorFieldTransformer` `:664`, time embeddings `:307,364`,
`build_vector_field_estimator` `:993`).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.sbiutils import next_key, standardizing_transform
from ..estimators.flowmatching_estimator import FlowMatchingEstimator
from ..estimators.score_estimator import (
    SubVPScoreEstimator,
    VEScoreEstimator,
    VPScoreEstimator,
)

Array = jax.Array


# ---------------------------------------------------------------------------
# Time embeddings (ref `:307,364`)
# ---------------------------------------------------------------------------


class SinusoidalTimeEmbedding(nn.Module):
    dim: int = 32
    max_freq: float = 1000.0

    @nn.compact
    def __call__(self, t: Array) -> Array:  # t: (B,)
        half = self.dim // 2
        freqs = jnp.exp(jnp.linspace(0.0, math.log(self.max_freq), half))
        angles = t[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)


class RandomFourierTimeEmbedding(nn.Module):
    dim: int = 32
    scale: float = 16.0

    @nn.compact
    def __call__(self, t: Array) -> Array:
        w = self.param(
            "freqs", nn.initializers.normal(self.scale), (self.dim // 2,)
        )
        w = jax.lax.stop_gradient(w)
        angles = 2 * jnp.pi * t[:, None] * w[None, :]
        return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)


# ---------------------------------------------------------------------------
# Nets: (z_t, cond_embedding, t) -> vector field over z
# ---------------------------------------------------------------------------


class VectorFieldMLP(nn.Module):
    """Plain MLP over [z_t, cond, t_emb] with skips (ref `:112`)."""

    dim: int
    hidden_features: int = 100
    num_layers: int = 4
    time_emb_dim: int = 32
    embedding_net: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, z: Array, cond: Array, t: Array) -> Array:
        temb = SinusoidalTimeEmbedding(self.time_emb_dim)(t)
        c = cond
        if self.embedding_net is not None:
            c = self.embedding_net(c)
        c = c.reshape(c.shape[0], -1)
        h = jnp.concatenate([z, c, temb], axis=-1)
        h = nn.Dense(self.hidden_features)(h)
        for _ in range(self.num_layers - 1):
            r = nn.gelu(h)
            r = nn.Dense(self.hidden_features)(r)
            h = h + r
        return nn.Dense(self.dim)(nn.gelu(h))


class AdaLNBlock(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, h: Array, cond: Array) -> Array:
        # AdaLN-Zero conditioning (DiT-style)
        mod = nn.Dense(3 * self.hidden, kernel_init=nn.initializers.zeros)(cond)
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        x = nn.LayerNorm(use_bias=False, use_scale=False)(h)
        x = x * (1 + scale) + shift
        x = nn.Dense(self.hidden)(nn.gelu(x))
        x = nn.Dense(self.hidden)(nn.gelu(x))
        return h + gate * x


class VectorFieldAdaMLP(nn.Module):
    """MLP with AdaLN-Zero conditioning on (cond, t) (ref `:552`)."""

    dim: int
    hidden_features: int = 100
    num_layers: int = 4
    time_emb_dim: int = 32
    embedding_net: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, z: Array, cond: Array, t: Array) -> Array:
        temb = SinusoidalTimeEmbedding(self.time_emb_dim)(t)
        c = cond
        if self.embedding_net is not None:
            c = self.embedding_net(c)
        c = c.reshape(c.shape[0], -1)
        cond_emb = nn.Dense(self.hidden_features)(
            jnp.concatenate([c, temb], axis=-1)
        )
        cond_emb = nn.gelu(cond_emb)
        h = nn.Dense(self.hidden_features)(z)
        for _ in range(self.num_layers):
            h = AdaLNBlock(self.hidden_features)(h, cond_emb)
        out = nn.LayerNorm()(h)
        return nn.Dense(self.dim, kernel_init=nn.initializers.zeros)(out)


class DiTBlock(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, tokens: Array, cond: Array) -> Array:
        # tokens: (B, T, dim); cond: (B, dim)
        mod = nn.Dense(6 * self.dim, kernel_init=nn.initializers.zeros)(cond)
        (s1, sc1, g1, s2, sc2, g2) = jnp.split(mod[:, None, :], 6, axis=-1)
        h = nn.LayerNorm(use_bias=False, use_scale=False)(tokens)
        h = h * (1 + sc1) + s1
        attn = nn.SelfAttention(num_heads=self.num_heads)(h)
        tokens = tokens + g1 * attn
        h = nn.LayerNorm(use_bias=False, use_scale=False)(tokens)
        h = h * (1 + sc2) + s2
        h = nn.Dense(4 * self.dim)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim)(h)
        return tokens + g2 * h


class VectorFieldTransformer(nn.Module):
    """DiT-style transformer: theta dims as tokens, AdaLN-Zero on (cond, t)
    (ref `:664`)."""

    dim: int
    hidden_features: int = 64
    num_layers: int = 2
    num_heads: int = 4
    time_emb_dim: int = 32
    embedding_net: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, z: Array, cond: Array, t: Array) -> Array:
        B, D = z.shape
        temb = SinusoidalTimeEmbedding(self.time_emb_dim)(t)
        c = cond
        if self.embedding_net is not None:
            c = self.embedding_net(c)
        c = c.reshape(B, -1)
        cond_emb = nn.gelu(
            nn.Dense(self.hidden_features)(jnp.concatenate([c, temb], axis=-1))
        )
        # One token per theta dim, with learned positional embedding.
        tokens = nn.Dense(self.hidden_features)(z[..., None])  # (B, D, H)
        pos = self.param(
            "pos_emb", nn.initializers.normal(0.02), (1, D, self.hidden_features)
        )
        tokens = tokens + pos
        for _ in range(self.num_layers):
            tokens = DiTBlock(self.hidden_features, self.num_heads)(tokens, cond_emb)
        out = nn.LayerNorm()(tokens)
        return nn.Dense(1, kernel_init=nn.initializers.zeros)(out)[..., 0]


_NETS = {"mlp": VectorFieldMLP, "ada_mlp": VectorFieldAdaMLP,
         "transformer": VectorFieldTransformer}


def _make_net(net, dim, hidden_features, embedding_net, **kwargs):
    if isinstance(net, str):
        cls = _NETS[net]
        return cls(dim=dim, hidden_features=hidden_features,
                   embedding_net=embedding_net)
    return net


def _transforms(batch, z_score):
    from ...utils.sbiutils import assert_transform_to_unconstrained_supported

    assert_transform_to_unconstrained_supported(
        z_score, "vector-field builders", "Use 'independent' or 'structured'."
    )
    if z_score in (None, "none", False):
        return None
    return standardizing_transform(batch, structured=(z_score == "structured"))


def build_score_estimator(
    batch_theta,
    batch_x,
    sde_type: str = "ve",
    net: str = "mlp",
    z_score_theta="independent",
    z_score_x="independent",
    hidden_features: int = 100,
    embedding_net=None,
    key=None,
    **kwargs,
):
    """Build a score estimator (ref factory.py:344 + vector_field_nets.py:993).
    Default sde 've' matches `npse.py:80`."""
    batch_theta = jnp.asarray(batch_theta, jnp.float32)
    batch_x = jnp.asarray(batch_x, jnp.float32)
    dim = batch_theta.shape[-1]
    module = _make_net(net, dim, hidden_features, embedding_net)
    cond_t = _transforms(batch_x, z_score_x)
    zc0 = cond_t.forward(batch_x[:2]) if cond_t else batch_x[:2]
    params = module.init(
        next_key(key), batch_theta[:2], zc0, jnp.zeros(2)
    )
    cls = {"vp": VPScoreEstimator, "subvp": SubVPScoreEstimator,
           "ve": VEScoreEstimator}[sde_type]
    return cls(
        net=module,
        params=params,
        input_shape=(dim,),
        condition_shape=tuple(batch_x.shape[1:]),
        input_transform=_transforms(batch_theta, z_score_theta),
        condition_transform=cond_t,
    )


def build_flow_matching_estimator(
    batch_theta,
    batch_x,
    net: str = "mlp",
    z_score_theta="independent",
    z_score_x="independent",
    hidden_features: int = 100,
    embedding_net=None,
    gaussian_baseline: bool = False,
    key=None,
    **kwargs,
):
    batch_theta = jnp.asarray(batch_theta, jnp.float32)
    batch_x = jnp.asarray(batch_x, jnp.float32)
    dim = batch_theta.shape[-1]
    module = _make_net(net, dim, hidden_features, embedding_net)
    cond_t = _transforms(batch_x, z_score_x)
    zc0 = cond_t.forward(batch_x[:2]) if cond_t else batch_x[:2]
    params = module.init(next_key(key), batch_theta[:2], zc0, jnp.zeros(2))
    return FlowMatchingEstimator(
        net=module,
        params=params,
        input_shape=(dim,),
        condition_shape=tuple(batch_x.shape[1:]),
        input_transform=_transforms(batch_theta, z_score_theta),
        condition_transform=cond_t,
        gaussian_baseline=gaussian_baseline,
    )


# Reference-API name
build_score_matching_estimator = build_score_estimator
