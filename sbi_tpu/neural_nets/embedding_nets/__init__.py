from .fully_connected import FCEmbedding, IdentityEmbedding
from .cnn import CNNEmbedding
from .permutation_invariant import PermutationInvariantEmbedding
from .resnet import ResNetEmbedding1D, ResNetEmbedding2D
from .causal_cnn import CausalCNNEmbedding
from .transformer import TransformerEmbedding
from .lru import LRUEmbedding
from .spectral_conv import SpectralConvEmbedding

__all__ = [
    "FCEmbedding",
    "IdentityEmbedding",
    "CNNEmbedding",
    "PermutationInvariantEmbedding",
    "ResNetEmbedding1D",
    "ResNetEmbedding2D",
    "CausalCNNEmbedding",
    "TransformerEmbedding",
    "LRUEmbedding",
    "SpectralConvEmbedding",
]
