"""Video transformer training (reference train_video_transformer.py).

128x128 .pt videos -> resize 112 + pad 128 frames -> frozen windowed
Swin3D-T extractor (one batched call) -> 2-layer transformer encoder ->
mean-pool classifier; weighted CE (the reference passed an invalid
`loss_class_weights` kwarg, train_video_transformer.py:134 — here the class
weights actually apply), best-UAR checkpointing.
"""

from dataclasses import dataclass

from .common import (NamesPinConfig, build_trainer, parse_config,
                     pinned_files, run_training)


@dataclass
class VideoTransformerConfig(NamesPinConfig):
    model_name: str = "Swin3D_transformer+weighted_loss"
    files_root: str = ""
    video_frames: int = 128
    video_size: int = 112
    video_window: int = 8
    hidden_size: int = 768
    num_layers: int = 2
    num_heads: int = 8
    class_weight_0: float = 0.5
    class_weight_1: float = 2.0
    batch_size: int = 8
    synthetic_videos: bool = False
    synthetic_files: int = 8           # train videos in the fixture (test n/2)


def make_model(cfg):
    import flax.linen as nn

    from ..models.heads import TransformerSequenceClassifier
    from ..models.swin3d import Swin3dTExtractor
    from ..models.video_extractors import WindowedVideoExtractor
    from ..ops.video import resize_bilinear

    class Model(nn.Module):
        @nn.compact
        def __call__(self, modalities, train: bool = False):
            video = modalities["video"]["data"]  # (B, T, H, W, C)
            if video.shape[2] != cfg.video_size:
                video = resize_bilinear(video, cfg.video_size, cfg.video_size)
            feats = WindowedVideoExtractor(
                Swin3dTExtractor(), window=cfg.video_window,
                name="extractor")(video, train=train)
            logits = TransformerSequenceClassifier(
                class_num=2, hidden_size=cfg.hidden_size,
                num_layers=cfg.num_layers, num_heads=cfg.num_heads,
                name="head")(feats, train=train)
            return {"main": logits}

    return Model()


def _make_synthetic_videos(root, n_train=8, n_test=4, frames=32, hw=64, seed=0):
    import os

    import numpy as np
    import torch

    rng = np.random.default_rng(seed)
    for sub, n in (("train", n_train), ("test", n_test)):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
        for i in range(n):
            label = "AGGR" if i % 2 else "NOAGGR"
            shift = 0.3 if label == "AGGR" else -0.3
            vid = rng.standard_normal((frames, 3, hw, hw)).astype(np.float32) * 0.2 + shift
            torch.save(torch.from_numpy(vid),
                       os.path.join(root, sub, f"clip{i}_{label}.pt"))


def make_loaders(cfg):
    import os

    import numpy as np

    from ..data.files import FilenameLabelSource, RandomBatchSampler
    from ..data.pipeline import BatchLoader
    from ..data.transforms import pad_video

    if cfg.synthetic_videos and not os.path.isdir(os.path.join(cfg.files_root, "train")):
        n = int(getattr(cfg, "synthetic_files", 8))
        _make_synthetic_videos(cfg.files_root, n_train=n,
                               n_test=max(2, n // 2))

    def to_thwc(x):
        x = np.asarray(x, np.float32)
        if x.ndim == 4 and x.shape[1] in (1, 3):  # (T, C, H, W) -> (T, H, W, C)
            x = x.transpose(0, 2, 3, 1)
        return pad_video(cfg.video_frames)(x)

    loaders = []
    for sub, shuffle in (("train", True), ("test", False)):
        src = FilenameLabelSource(os.path.join(cfg.files_root, sub), "video",
                                  transform=to_thwc,
                                  files=pinned_files(cfg, sub))
        sampler = RandomBatchSampler(len(src), cfg.batch_size, shuffle, cfg.seed)
        loaders.append(BatchLoader(src, sampler, pad_to=cfg.batch_size,
                                   num_threads=cfg.num_threads))
    return loaders


def main(argv=None):
    from ..train import LossSpec

    cfg = parse_config(VideoTransformerConfig, argv)
    train_loader, test_loader = make_loaders(cfg)
    spec = LossSpec("weighted_ce",
                    class_weights=(cfg.class_weight_0, cfg.class_weight_1))
    trainer = build_trainer(cfg, make_model(cfg), {"main": spec},
                            train_loader, test_loader)
    run_training(cfg, trainer, train_loader)
    return trainer



def export_spec(cfg):
    """Per-modality clip shapes for AOT export (cli/export_model.py)."""
    return {"video": (cfg.video_frames, cfg.video_size, cfg.video_size, 3)}

if __name__ == "__main__":
    main()
