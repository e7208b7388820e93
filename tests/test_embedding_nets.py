"""Embedding-net zoo: every net builds, embeds, and trains inside an NPE
estimator (counterpart of `tests/embedding_net_test.py`)."""

import jax
import jax.numpy as jnp
import pytest

from sbi_tpu.neural_nets.embedding_nets import (
    CNNEmbedding,
    CausalCNNEmbedding,
    FCEmbedding,
    LRUEmbedding,
    PermutationInvariantEmbedding,
    ResNetEmbedding1D,
    ResNetEmbedding2D,
    SpectralConvEmbedding,
    TransformerEmbedding,
)
from sbi_tpu.neural_nets.factory import posterior_nn
from sbi_tpu.utils.sbiutils import seed_all_backends

SEQ = (32,)
IMG = (8, 8)

CASES = [
    ("fc", FCEmbedding(output_dim=8), SEQ),
    ("cnn1d", CNNEmbedding(input_shape=SEQ, output_dim=8), SEQ),
    ("cnn2d", CNNEmbedding(input_shape=IMG, output_dim=8), IMG),
    ("resnet1d", ResNetEmbedding1D(input_shape=SEQ, output_dim=8), SEQ),
    ("resnet2d", ResNetEmbedding2D(input_shape=IMG, output_dim=8), IMG),
    ("causal", CausalCNNEmbedding(input_shape=SEQ, output_dim=8), SEQ),
    ("transformer", TransformerEmbedding(input_shape=SEQ, output_dim=8,
                                          dim=16, num_layers=1), SEQ),
    ("transformer_patch", TransformerEmbedding(input_shape=SEQ, output_dim=8,
                                               dim=16, num_layers=1,
                                               patch_size=4), SEQ),
    ("transformer_vit2d", TransformerEmbedding(input_shape=IMG, output_dim=8,
                                               dim=16, num_layers=1,
                                               patch_size=2,
                                               patch_mode="2d"), IMG),
    ("transformer_moe", TransformerEmbedding(input_shape=SEQ, output_dim=8,
                                             dim=16, num_layers=1,
                                             ffn_type="moe", num_experts=4,
                                             top_k=2), SEQ),
    ("lru", LRUEmbedding(input_shape=SEQ, output_dim=8, num_layers=1), SEQ),
    ("spectral", SpectralConvEmbedding(input_shape=SEQ, output_dim=8,
                                       num_layers=1), SEQ),
    ("perm_inv", PermutationInvariantEmbedding(output_dim=8), (5, 4)),
]


@pytest.mark.parametrize("name,net,x_shape", CASES, ids=[c[0] for c in CASES])
def test_embedding_net_in_npe(name, net, x_shape):
    seed_all_backends(0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    theta = jax.random.normal(k1, (64, 2))
    x = jax.random.normal(k2, (64,) + x_shape)
    build = posterior_nn("mdn", embedding_net=net)
    est = build(theta, x)
    lp = est.log_prob(theta[:4][None], x[:4])
    assert lp.shape == (1, 4) and bool(jnp.isfinite(lp).all())
    # gradient flows through the embedding
    g = jax.grad(lambda p: est.loss_fn(p, theta[:8], x[:8]).mean())(est.params)
    leaves = jax.tree_util.tree_leaves(g)
    assert any(bool(jnp.abs(l).sum() > 0) for l in leaves)


def test_permutation_invariance():
    net = PermutationInvariantEmbedding(output_dim=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 4))
    params = net.init(jax.random.PRNGKey(1), x)
    e1 = net.apply(params, x)
    e2 = net.apply(params, x[:, ::-1, :])  # permute trials
    assert jnp.allclose(e1, e2, atol=1e-5)


def test_transformer_bf16_compute_dtype():
    """dtype=bfloat16 runs the block matmuls in bf16 with f32 params and
    f32 output, matching the f32 forward closely on the same params."""
    from sbi_tpu.neural_nets.embedding_nets.transformer import (
        TransformerEmbedding,
    )

    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (4, 64 * 2))
    for ffn in ("mlp", "moe"):
        kw = dict(input_shape=(64, 2), dim=32, num_heads=4, num_layers=2,
                  output_dim=8, patch_size=4, ffn_type=ffn)
        m32 = TransformerEmbedding(**kw)
        mbf = TransformerEmbedding(dtype=jnp.bfloat16, **kw)
        p = m32.init(k, x)
        assert all(
            leaf.dtype == jnp.float32
            for leaf in jax.tree_util.tree_leaves(p)
        )
        o32, obf = m32.apply(p, x), mbf.apply(p, x)
        assert o32.dtype == jnp.float32 and obf.dtype == jnp.float32
        rel = float(jnp.abs(o32 - obf).max() / (jnp.abs(o32).max() + 1e-8))
        assert rel < 0.1, (ffn, rel)
        g = jax.grad(lambda pp: mbf.apply(pp, x).sum())(p)
        assert all(
            leaf.dtype == jnp.float32
            for leaf in jax.tree_util.tree_leaves(g)
        )
