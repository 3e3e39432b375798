from . import core, erb, rnn
from .core import (
    conv1d,
    conv1d_transpose,
    conv2d,
    conv2d_transpose,
    dense,
    layer_norm,
    prelu,
    rms_norm,
)
from .rnn import grouped_gru, grouped_gru_bidir, gru, gru_bidir, lstm

__all__ = [
    "core",
    "erb",
    "rnn",
    "conv1d",
    "conv1d_transpose",
    "conv2d",
    "conv2d_transpose",
    "dense",
    "layer_norm",
    "prelu",
    "rms_norm",
    "grouped_gru",
    "grouped_gru_bidir",
    "gru",
    "gru_bidir",
    "lstm",
]
