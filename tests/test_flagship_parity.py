"""End-to-end logit parity: the full flagship multimodal model vs torch.

Builds the live train_multimodal configuration (reference
train_multimodal.py:298, 365, 374, 406-411: CNN1D-wrapper audio tower,
identity text tower, 1-layer/768/8-head fusion encoder,
PhysVerbClassifierConcatFeatures heads) as a complete torch model, converts
every weight through io/torch_import, and requires logits within 1e-3 —
the BASELINE.md north-star parity bound — including zero-padded (masked)
text rows exercising the eval-mode masked-row semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
from torch import nn as tnn

from multimodalaggressionrecognition_tpu.io import torch_import
from multimodalaggressionrecognition_tpu.models.cnn1d import (
    AudioCnn1DExtractorWrapper)
from multimodalaggressionrecognition_tpu.models.fusion import (
    EqualSizedTransformerModalitiesFusion)
from multimodalaggressionrecognition_tpu.models.physverb import (
    IdentityExtractor, PhysVerbClassifierConcatFeatures, PhysVerbModel)
from tests.test_cnn1d import _torch_cnn1d_extractor

HIDDEN = 768
ADAPT = 256


class _TorchFlagship(tnn.Module):
    def __init__(self):
        super().__init__()
        self.audio_extractor = _torch_cnn1d_extractor()
        self.audio_adaptor = tnn.Sequential(
            tnn.Linear(512, HIDDEN), tnn.ReLU(), tnn.Dropout(0.3))
        layer = tnn.TransformerEncoderLayer(d_model=HIDDEN, nhead=8,
                                            batch_first=True)
        self.fusion = tnn.TransformerEncoder(layer, 1,
                                             norm=tnn.LayerNorm(HIDDEN))
        self.adapt_audio = tnn.Sequential(tnn.Linear(HIDDEN, ADAPT),
                                          tnn.Dropout(0.3), tnn.ReLU())
        self.adapt_text = tnn.Sequential(tnn.Linear(HIDDEN, ADAPT),
                                         tnn.Dropout(0.3), tnn.ReLU())
        concat = 2 * ADAPT
        self.head_phys = tnn.Sequential(
            tnn.Linear(concat, concat // 3), tnn.ReLU(), tnn.Dropout(0.3),
            tnn.Linear(concat // 3, 2))
        self.head_verb = tnn.Sequential(
            tnn.Linear(concat, concat // 3), tnn.ReLU(), tnn.Dropout(0.3),
            tnn.Linear(concat // 3, 2))

    def forward(self, wav, text):
        a = self.audio_adaptor(self.audio_extractor(wav).permute(0, 2, 1))
        concat = torch.cat([a, text], dim=1)  # sorted: audio, text
        mask = concat.sum(dim=2) == 0
        fused = self.fusion(concat, src_key_padding_mask=mask)
        fa = self.adapt_audio(fused[:, :a.shape[1]]).mean(1)
        ft = self.adapt_text(fused[:, a.shape[1]:]).mean(1)
        h = torch.cat([fa, ft], dim=1)
        return {"phys": self.head_phys(h), "verb": self.head_verb(h)}


def _convert(tm):
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    ext_params, ext_stats = torch_import.cnn1d_extractor(sd, "audio_extractor.")
    params = {
        "extractors_audio": {"extractor": ext_params,
                             "adaptor": torch_import.linear(sd, "audio_adaptor.0.")},
        "fusion": {"encoder": torch_import.transformer_encoder(sd, "fusion.", 1)},
        "classifier": {
            "adaptor_audio": torch_import.linear(sd, "adapt_audio.0."),
            "adaptor_text": torch_import.linear(sd, "adapt_text.0."),
            "head_phys_fc1": torch_import.linear(sd, "head_phys.0."),
            "head_phys_fc2": torch_import.linear(sd, "head_phys.3."),
            "head_verb_fc1": torch_import.linear(sd, "head_verb.0."),
            "head_verb_fc2": torch_import.linear(sd, "head_verb.3."),
        },
    }
    stats = {"extractors_audio": {"extractor": ext_stats}}
    return jax.tree.map(jnp.asarray, {"params": params, "batch_stats": stats})


def test_flagship_logit_parity_1e3(rng):
    tm = _TorchFlagship().eval()
    with torch.no_grad():  # make BN running stats non-trivial
        tm.train()
        tm(torch.from_numpy(rng.standard_normal((2, 1, 80000)).astype(np.float32)),
           torch.from_numpy(rng.standard_normal((2, 48, HIDDEN)).astype(np.float32)))
        tm.eval()

    wav = rng.standard_normal((2, 80000)).astype(np.float32) * 0.1
    text = rng.standard_normal((2, 48, HIDDEN)).astype(np.float32)
    text[0, 30:] = 0.0  # zero-padded (masked) rows: eval fast-path semantics
    with torch.no_grad():
        ref = tm(torch.from_numpy(wav[:, None, :]), torch.from_numpy(text))

    model = PhysVerbModel(
        extractors={"audio": AudioCnn1DExtractorWrapper(HIDDEN),
                    "text": IdentityExtractor()},
        fusion=EqualSizedTransformerModalitiesFusion(1, HIDDEN, 8),
        classifier=PhysVerbClassifierConcatFeatures(
            class_num=2,
            adaptor_sizes={"audio": (HIDDEN, ADAPT), "text": (HIDDEN, ADAPT)}),
        feature_shapes={}, modalities=("audio", "text"))
    variables = _convert(tm)
    batch = {
        "audio": {"data": jnp.asarray(wav), "present": jnp.ones((2,))},
        "text": {"data": jnp.asarray(text), "present": jnp.ones((2,))},
    }
    got = jax.jit(model.apply)(variables, batch)
    for head in ("phys", "verb"):
        np.testing.assert_allclose(np.asarray(got[head]),
                                   ref[head].numpy(), atol=1e-3)
