import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from torch import nn as tnn

from multimodalaggressionrecognition_tpu.io import torch_import
from multimodalaggressionrecognition_tpu.models.heads import (
    AverageFeatureSequence, FeatureSequenceProcessing, MultiHeadModel,
    OutputClassifier, TransformerSequenceClassifier)
from multimodalaggressionrecognition_tpu.models.wav2vec import (
    WAV2VEC2_BASE, ConvFeatureEncoder, Wav2Vec1ConvEncoder, Wav2Vec2Model)


class _TorchSeqHead(tnn.Module):
    """Reference FeatureSequenceProcessing (models.py:107-124) golden spec."""

    def __init__(self, cell, e, h, c):
        super().__init__()
        self.rnn = cell(e, h, batch_first=True)
        self.mlp = tnn.Sequential(tnn.Linear(h, 256), tnn.ReLU(), tnn.Dropout(),
                                  tnn.Linear(256, c))

    def forward(self, x):
        seq, _ = self.rnn(x)
        return self.mlp(seq[:, -1, :])


def _seq_head_params(tm, cell):
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    return {"params": {
        "sequence_nn": torch_import.rnn(sd, "rnn."),
        "fc1": torch_import.linear(sd, "mlp.0."),
        "fc2": torch_import.linear(sd, "mlp.3."),
    }}


def test_feature_sequence_processing_parity(rng):
    x = rng.standard_normal((3, 9, 12)).astype(np.float32)
    for cell_name, tcell in [("gru", tnn.GRU), ("lstm", tnn.LSTM)]:
        tm = _TorchSeqHead(tcell, 12, 20, 2).eval()
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()
        m = FeatureSequenceProcessing(class_num=2, hidden_size=20, cell=cell_name)
        got = m.apply(jax.tree.map(jnp.asarray, _seq_head_params(tm, cell_name)),
                      jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_avg_head_equals_mean_classification(rng):
    x = rng.standard_normal((3, 9, 12)).astype(np.float32)
    m = FeatureSequenceProcessing(class_num=2, hidden_size=12, cell="avg")
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = m.apply(variables, jnp.asarray(x))
    # avg cell: "last timestep" of the (B,1,H) mean == the mean itself
    got2 = m.apply(variables, jnp.asarray(np.repeat(x.mean(1, keepdims=True), 9, 1)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(got2), atol=1e-5)


def test_transformer_sequence_classifier_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 48, 64)).astype(np.float32))
    m = TransformerSequenceClassifier(class_num=2, hidden_size=64, num_layers=2,
                                      num_heads=8)
    variables = m.init(jax.random.PRNGKey(0), x)
    logits = m.apply(variables, x)
    assert logits.shape == (2, 2)
    feats = m.apply(variables, x, return_type="features")
    assert feats.shape == (2, 48, 64)
    both = m.apply(variables, x, return_type="all")
    assert both[0].shape == (2, 2) and both[1].shape == (2, 48, 64)


def test_multihead_model(rng):
    x = jnp.asarray(rng.standard_normal((2, 9, 16)).astype(np.float32))
    m = MultiHeadModel(heads={
        "LSTM_1_layer": FeatureSequenceProcessing(2, 32, "lstm"),
        "GRU_1_layer": FeatureSequenceProcessing(2, 32, "gru"),
        "Avg": FeatureSequenceProcessing(2, 16, "avg"),
    })
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert set(out) == {"LSTM_1_layer", "GRU_1_layer", "Avg"}
    assert all(v.shape == (2, 2) for v in out.values())


def test_conv_feature_encoder_stride_and_shape(rng):
    x = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32))
    enc = ConvFeatureEncoder()
    variables = enc.init(jax.random.PRNGKey(0), x)
    y = enc.apply(variables, x)
    # total stride 320 => 16000 -> 49 frames (torchaudio wav2vec2 convention)
    assert y.shape == (2, 49, 512)


def test_conv_encoder_first_layer_matches_torch(rng):
    """Conv + GroupNorm(instance) + GELU parity for the group_norm mode."""
    x = rng.standard_normal((2, 1, 4000)).astype(np.float32)
    tconv = tnn.Conv1d(1, 512, 10, stride=5, bias=False)
    tnorm = tnn.GroupNorm(512, 512)
    with torch.no_grad():
        tnorm.weight.mul_(1.2).add_(0.1)
        ref = tnn.functional.gelu(tnorm(tconv(torch.from_numpy(x)))).numpy()
    enc = ConvFeatureEncoder(conv_layers=((512, 10, 5),))
    sd = {"conv.weight": tconv.weight.detach().numpy(),
          "norm.weight": tnorm.weight.detach().numpy(),
          "norm.bias": tnorm.bias.detach().numpy()}
    params = {"params": {
        "conv0": torch_import.conv1d(sd, "conv."),
        "norm0": torch_import.norm(sd, "norm."),
    }}
    y = enc.apply(jax.tree.map(jnp.asarray, params), jnp.asarray(x[:, 0]))
    np.testing.assert_allclose(np.asarray(y), ref.transpose(0, 2, 1), atol=1e-4)


def test_wav2vec2_model_shapes(rng):
    cfg = WAV2VEC2_BASE
    small = type(cfg)(num_layers=2)  # tiny stack for test speed
    x = jnp.asarray(rng.standard_normal((1, 16000)).astype(np.float32))
    m = Wav2Vec2Model(small)
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (1, 49, 768)


@pytest.mark.slow
def test_wav2vec1_encoder_shape(rng):
    x = jnp.asarray(rng.standard_normal((2, 80000)).astype(np.float32))
    m = Wav2Vec1ConvEncoder()
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape[0] == 2 and y.shape[2] == 512
