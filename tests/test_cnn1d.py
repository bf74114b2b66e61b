"""CNN1D parity against a torch replica of the reference architecture.

The torch model below re-encodes the golden spec of the reference CNN1D
(reference models.py:930-1006; layer printout in reference 1.txt:4-46) so the
Flax port can be checked logit-for-logit through the weight converter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
from torch import nn as tnn

from multimodalaggressionrecognition_tpu.io import torch_import
from multimodalaggressionrecognition_tpu.models.cnn1d import (
    CNN1D, AudioCnn1DExtractorWrapper, CNN1DExtractor)


def _torch_cnn1d_extractor():
    def block(cin, cout, pool=True):
        layers = [tnn.Conv1d(cin, cout, 3, padding=1), tnn.BatchNorm1d(cout), tnn.ReLU(),
                  tnn.Conv1d(cout, cout, 3, padding=1), tnn.BatchNorm1d(cout), tnn.ReLU()]
        if pool:
            layers.append(tnn.MaxPool1d(4, 4))
        layers.append(tnn.Dropout1d(0.1))
        return layers

    return tnn.Sequential(
        tnn.Conv1d(1, 64, kernel_size=160, stride=40, padding=80),
        tnn.BatchNorm1d(64), tnn.ReLU(), tnn.MaxPool1d(4, 4), tnn.Dropout1d(0.1),
        *block(64, 64), *block(64, 128), *block(128, 256), *block(256, 512, pool=False),
    )


class _TorchCNN1D(tnn.Module):
    def __init__(self, class_num=2):
        super().__init__()
        self.extractor = _torch_cnn1d_extractor()
        self.classifier = tnn.Sequential(
            tnn.AdaptiveAvgPool1d(1), tnn.Flatten(), tnn.Dropout1d(0.2),
            tnn.Linear(512, class_num))

    def forward(self, x):
        return self.classifier(self.extractor(x))


class _TorchWrapper(tnn.Module):
    def __init__(self, hidden=768):
        super().__init__()
        self.extractor = _torch_cnn1d_extractor()
        self.adaptor = tnn.Sequential(tnn.Linear(512, hidden), tnn.ReLU(), tnn.Dropout(0.3))

    def forward(self, x):
        return self.adaptor(self.extractor(x).permute(0, 2, 1))


def _sd(model):
    return {k: v.numpy() for k, v in model.state_dict().items()}


def test_cnn1d_logit_parity(rng):
    x = rng.standard_normal((2, 80000)).astype(np.float32) * 0.1
    tm = _TorchCNN1D(2).eval()
    with torch.no_grad():
        # make running stats non-trivial
        tm(torch.from_numpy(rng.standard_normal((4, 1, 80000)).astype(np.float32)))
        tm.train()
        tm(torch.from_numpy(rng.standard_normal((4, 1, 80000)).astype(np.float32)))
        tm.eval()
        ref = tm(torch.from_numpy(x[:, None, :])).numpy()
    variables = jax.tree.map(jnp.asarray, torch_import.cnn1d(_sd(tm)))
    got = CNN1D(2).apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3)


def test_extractor_output_shape(rng):
    x = jnp.asarray(rng.standard_normal((2, 80000)).astype(np.float32))
    m = CNN1DExtractor()
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (2, 7, 512)  # 80000 -> 2001 -> 500 -> 125 -> 31 -> 7


def test_wrapper_parity(rng):
    x = rng.standard_normal((2, 80000)).astype(np.float32) * 0.1
    tm = _TorchWrapper(768).eval()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x[:, None, :])).numpy()
    variables = jax.tree.map(jnp.asarray, torch_import.audio_cnn1d_wrapper(_sd(tm)))
    got = AudioCnn1DExtractorWrapper(768).apply(variables, jnp.asarray(x))
    assert got.shape == (2, 7, 768)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3)


def test_batchnorm_training_stats_match_torch(rng):
    """One train-mode forward: running stats update identically."""
    x = rng.standard_normal((2, 1, 80000)).astype(np.float32)
    tm = _TorchCNN1D(2)
    tm.train()
    for m in tm.modules():  # disable dropout noise; keep BN in train mode
        if isinstance(m, (tnn.Dropout1d, tnn.Dropout)):
            m.eval()
    with torch.no_grad():
        tm(torch.from_numpy(x))
    ref_stats = {k: v.numpy() for k, v in tm.state_dict().items() if "running" in k}

    # convert torch's post-forward weights+stats; run our own train-mode
    # forward (dropout zeroed to match the disabled torch dropouts) and
    # compare against torch's stats after its second forward
    variables = torch_import.cnn1d(_sd(tm))
    variables = jax.tree.map(jnp.asarray, variables)
    got, updates = CNN1D(2, dropout=0.0, classifier_dropout=0.0).apply(
        variables, jnp.asarray(x[:, 0, :]), train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)})
    with torch.no_grad():
        tm(torch.from_numpy(x))
    ref_stats2 = {k: v.numpy() for k, v in tm.state_dict().items() if "running" in k}
    # our updated stats should equal torch's after its second forward
    flat = updates["batch_stats"]["extractor"]
    conv_idx, bn_idx = torch_import._sequential_conv_bn_indices(_sd(tm), "extractor.")
    for j, bi in enumerate(bn_idx):
        np.testing.assert_allclose(
            np.asarray(flat[f"bn{j}"]["mean"]),
            ref_stats2[f"extractor.{bi}.running_mean"], atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(flat[f"bn{j}"]["var"]),
            ref_stats2[f"extractor.{bi}.running_var"], atol=1e-4)
