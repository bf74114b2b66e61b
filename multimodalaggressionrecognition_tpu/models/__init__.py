from .layers import (
    TorchLinear,
    TorchLayerNorm,
    MultiheadSelfAttention,
    TransformerEncoderLayer,
    TransformerEncoder,
)
from .rnn import GRU, LSTM
