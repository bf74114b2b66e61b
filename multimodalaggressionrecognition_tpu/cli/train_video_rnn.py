"""Video feature-sequence RNN training (reference train_video_rnn.py).

Precomputed per-clip feature sequences (.npy, filename-labeled) -> three
parallel heads {LSTM_1_layer, GRU_1_layer, Avg}.  Supports the reference's
per-epoch pre-augmented feature dirs (`train/<epoch>/`, reference
trainer.py:840-850) via --epoch_dirs; with on-device extraction
(extract_features CLI / WindowedVideoExtractor) that storage trick is
obsolete but kept for drop-in compatibility.
"""

import os
from dataclasses import dataclass

from .common import (NamesPinConfig, build_trainer, parse_config,
                     pinned_files, run_training)

_HEADS = ("LSTM_1_layer", "GRU_1_layer", "Avg")


@dataclass
class VideoRnnConfig(NamesPinConfig):
    model_name: str = "video_rnn"
    files_root: str = ""           # dir with train[/epoch]/ and test/ .npy
    hidden_size: int = 512
    feature_dim: int = 512
    sequence_len: int = 19         # feature tokens per clip (export only;
                                   # 304 frames / 16-frame windows)
    epoch_dirs: bool = False       # advance train/<epoch>/ each epoch
    synthetic_features: bool = False


def make_model(cfg):
    import flax.linen as nn

    from ..models.heads import FeatureSequenceProcessing, MultiHeadModel

    class Adapter(nn.Module):
        inner: nn.Module

        @nn.compact
        def __call__(self, modalities, train: bool = False):
            return self.inner(modalities["video"]["data"], train=train)

    return Adapter(MultiHeadModel(heads={
        "LSTM_1_layer": FeatureSequenceProcessing(2, cfg.hidden_size, "lstm"),
        "GRU_1_layer": FeatureSequenceProcessing(2, cfg.hidden_size, "gru"),
        "Avg": FeatureSequenceProcessing(2, cfg.feature_dim, "avg"),
    }))


def _make_synthetic_features(root, dim, n_train=32, n_test=8, seq=19, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    for sub, n in (("train/0", n_train), ("test", n_test)):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
        for i in range(n):
            label = "AGGR" if i % 2 else "NOAGGR"
            shift = 0.3 if label == "AGGR" else -0.3
            feats = rng.standard_normal((seq, dim)).astype(np.float32) + shift
            np.save(os.path.join(root, sub, f"clip{i}_{label}.npy"), feats)


def make_loaders(cfg):
    from ..data.files import FilenameLabelSource, RandomBatchSampler
    from ..data.pipeline import BatchLoader

    if cfg.synthetic_features and not os.path.isdir(os.path.join(cfg.files_root, "test")):
        _make_synthetic_features(cfg.files_root, cfg.feature_dim)
    train_root = os.path.join(cfg.files_root, "train")
    if os.path.isdir(os.path.join(train_root, "0")):
        train_root = os.path.join(train_root, "0")
    sources = []
    loaders = []
    for root, shuffle, sub in ((train_root, True, "train"),
                               (os.path.join(cfg.files_root, "test"), False,
                                "test")):
        src = FilenameLabelSource(root, "video", heads=_HEADS,
                                  files=pinned_files(cfg, sub))
        sampler = RandomBatchSampler(len(src), cfg.batch_size, shuffle, cfg.seed)
        sources.append(src)
        loaders.append(BatchLoader(src, sampler, pad_to=cfg.batch_size,
                                   num_threads=cfg.num_threads))
    return loaders, sources[0]


def main(argv=None):
    from ..train import LossSpec

    cfg = parse_config(VideoRnnConfig, argv)
    (train_loader, test_loader), train_src = make_loaders(cfg)

    on_epoch_start = None
    if cfg.epoch_dirs:
        base = os.path.join(cfg.files_root, "train")

        def on_epoch_start(epoch):
            path = os.path.join(base, str(epoch))
            if os.path.isdir(path):
                train_src.set_root(path)

    trainer = build_trainer(cfg, make_model(cfg),
                            {h: LossSpec("ce") for h in _HEADS},
                            train_loader, test_loader,
                            on_epoch_start=on_epoch_start)
    run_training(cfg, trainer, train_loader)
    return trainer



def export_spec(cfg):
    """Per-modality clip shapes for AOT export (cli/export_model.py): the
    precomputed feature sequences are (sequence_len, feature_dim) — 19
    tokens for the reference's 304-frame/16-window extraction."""
    return {"video": (cfg.sequence_len, cfg.feature_dim)}

if __name__ == "__main__":
    main()
