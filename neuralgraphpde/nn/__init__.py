from .core import Layer, ContainerLayer, setup, apply
from .basic import (
    Dense,
    Chain,
    chain,
    MLP,
    WrappedFunction,
    glorot_uniform,
    glorot_normal,
    zeros_init,
    ones_init,
    resolve_activation,
)
from .gnn import AbstractGNNLayer, AbstractGNNContainerLayer, INPUT_KEY
from .conv import (
    ExplicitEdgeConv,
    GCNConv,
    VMHConv,
    MPPDEConv,
    GNOConv,
    SpectralConv,
)
from .precision import Precision, bf16

__all__ = [
    "Layer", "ContainerLayer", "setup", "apply", "Dense", "Chain", "chain",
    "MLP", "WrappedFunction", "glorot_uniform", "glorot_normal", "zeros_init",
    "ones_init", "resolve_activation", "AbstractGNNLayer",
    "AbstractGNNContainerLayer", "INPUT_KEY", "ExplicitEdgeConv", "GCNConv",
    "VMHConv", "MPPDEConv", "GNOConv", "SpectralConv", "Precision", "bf16",
]
