"""Core NN building blocks with PyTorch-compatible numerics, NHWC layout."""

from .conv import conv2d, conv_transpose2d, linear
from .norm import instance_norm, batch_norm, spectral_normalize
from .activations import leaky_relu, relu, tanh

__all__ = [
    "conv2d",
    "conv_transpose2d",
    "linear",
    "instance_norm",
    "batch_norm",
    "spectral_normalize",
    "leaky_relu",
    "relu",
    "tanh",
]
