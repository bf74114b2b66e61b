"""Raw-waveform 1-D CNN (reference models.py:930-1006) rebuilt channels-last.

Architecture (matching the reference exactly; shapes for an 80 000-sample
16 kHz clip):
  stem  Conv(1->64, k160, s40, p80) BN ReLU MaxPool4 Drop1d(.1)   L: 80000->2001->500
  b1    [Conv(64->64, k3, p1) BN ReLU] x2  MaxPool4 Drop1d(.1)    L: 500->125
  b2    [Conv(64->128) / Conv(128->128)]   MaxPool4 Drop1d(.1)    L: 125->31
  b3    [Conv(128->256) / Conv(256->256)]  MaxPool4 Drop1d(.1)    L: 31->7
  b4    [Conv(256->512) / Conv(512->512)]  Drop1d(.1)             L: 7
  classifier: mean over L -> SampleDropout(.2) -> Linear(512, classes)

`AudioCnn1DExtractorWrapper` (reference models.py:265-282) exposes the conv
trunk as a (B, T', 768) token sequence for the multimodal fusion model: the
trainable audio extractor of the live train_multimodal.py (:298).

Every convolution here lowers to one MXU matmul via ops.framing.framed_matmul;
the stem (k=160, s=40) is the hot op — an (B*2001, 160) x (160, 64) matmul.
"""

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .nn1d import BatchNorm1d, Conv1d, Dropout1d, SampleDropout, max_pool1d
from .layers import TorchLinear

# (features, kernel, stride, padding), grouped into pool blocks.
_CNN1D_BLOCKS: Sequence[Tuple[Tuple[int, int, int, int], ...]] = (
    ((64, 160, 40, 80),),
    ((64, 3, 1, 1), (64, 3, 1, 1)),
    ((128, 3, 1, 1), (128, 3, 1, 1)),
    ((256, 3, 1, 1), (256, 3, 1, 1)),
    ((512, 3, 1, 1), (512, 3, 1, 1)),
)


class CNN1DExtractor(nn.Module):
    """Conv trunk: (B, L) or (B, L, 1) waveform -> (B, T', 512) features.

    `pallas_stem` runs the hot k=160/s=40 stem conv through the fused Pallas
    kernel (Pallas forward + XLA custom-VJP backward; 333us vs 979us XLA on
    v5e, 2.1x-faster custom VJP).  None (default) auto-enables it on the
    TPU backend — the production CLIs get the benchmarked kernel without
    flags (the Swin fused attention follows the same convention,
    models/swin3d.py).  `folded=True` skips
    the BatchNorm modules — for inference params produced by
    utils/fold_bn.fold_cnn1d_variables (BN folded into conv weights)."""

    dropout: float = 0.1
    pallas_stem: bool | None = None
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        import jax

        if self.folded and train:
            raise ValueError("folded=True is an inference-only variant")
        if x.ndim == 2:
            x = x[..., None]
        pallas_stem = self.pallas_stem
        if pallas_stem is None:
            from ..utils.kernels import pallas_auto

            pallas_stem = pallas_auto()
        idx = 0
        num_blocks = len(_CNN1D_BLOCKS)
        for block_i, block in enumerate(_CNN1D_BLOCKS):
            for feats, k, s, p in block:
                x = Conv1d(feats, k, stride=s, padding=p,
                           use_pallas=pallas_stem and idx == 0,
                           name=f"conv{idx}")(x)
                if not self.folded:
                    x = BatchNorm1d(name=f"bn{idx}")(
                        x, use_running_average=not train)
                x = nn.relu(x)
                idx += 1
            if block_i < num_blocks - 1:
                x = max_pool1d(x, 4)
            x = Dropout1d(self.dropout, name=f"drop{block_i}")(
                x, deterministic=not train)
        return x


class CNN1D(nn.Module):
    """Waveform classifier (reference CNN1D): logits (B, class_num)."""

    class_num: int
    dropout: float = 0.1
    classifier_dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = CNN1DExtractor(self.dropout, name="extractor")(x, train=train)
        h = jnp.mean(h, axis=1)  # AdaptiveAvgPool1d(1) + Flatten
        h = SampleDropout(self.classifier_dropout, name="cls_drop")(
            h, deterministic=not train)
        return TorchLinear(self.class_num, name="head")(h)


class AudioCnn1DExtractorWrapper(nn.Module):
    """Conv trunk + Linear(512->hidden) ReLU Dropout(0.3): (B, L) -> (B, T', hidden)."""

    hidden_size: int = 768
    pallas_stem: bool | None = None  # None = auto (Pallas stem on TPU)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = CNN1DExtractor(pallas_stem=self.pallas_stem,
                           name="extractor")(x, train=train)
        h = TorchLinear(self.hidden_size, name="adaptor")(h)
        h = nn.relu(h)
        return nn.Dropout(0.3)(h, deterministic=not train)
