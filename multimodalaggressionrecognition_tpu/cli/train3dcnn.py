"""3D-CNN with bbox masks training (reference train3dcnn.py).

Clip dirs (video.mp4|video.pt + bboxes.npy, 4-class Russian labels) ->
paired flip/affine/perspective augmentation -> R3DWithBboxes (stage-wise
mask blending, alpha=0.4) -> CE, accuracy checkpoint criterion,
32 frames @ 112px.
"""

from dataclasses import dataclass

from .common import TrainConfig, build_trainer, parse_config, run_training


@dataclass
class Cnn3DConfig(TrainConfig):
    model_name: str = "r3d_bboxes"
    files_root: str = ""
    class_num: int = 4
    two_class: bool = False
    frame_num: int = 32
    video_size: int = 112
    alpha: float = 0.4
    batch_size: int = 8
    checkpoint_criterion: str = "accuracy"
    synthetic_clips: bool = False
    synthetic_files: int = 8           # train clips in the fixture (test n/2)


def make_model(cfg):
    import flax.linen as nn

    from ..models.r3d import R3DWithBboxes

    class Adapter(nn.Module):
        @nn.compact
        def __call__(self, modalities, train: bool = False):
            v = modalities["video"]
            logits = R3DWithBboxes(
                class_num=2 if cfg.two_class else cfg.class_num,
                alpha=cfg.alpha, name="r3d")(
                v["data"], v.get("mask"), train=train)
            return {"main": logits}

    return Adapter()


def _make_synthetic_clips(root, n_train=8, n_test=4, frames=16, hw=64, seed=0):
    import os

    import numpy as np
    import torch

    labels = ["Нет", "Захваты", "Толчки", "Удары"]
    rng = np.random.default_rng(seed)
    for sub, n in (("train", n_train), ("test", n_test)):
        for i in range(n):
            label = labels[i % len(labels)]
            d = os.path.join(root, sub, f"clip!person,{i}!(0,1)!{label}")
            os.makedirs(d, exist_ok=True)
            vid = rng.uniform(0, 1, (frames, 3, hw, hw)).astype(np.float32)
            vid += 0.1 * (labels.index(label))
            torch.save(torch.from_numpy(vid), os.path.join(d, "video.pt"))
            boxes = np.tile(np.asarray([[8, 8, 40, 40]], np.float32), (frames, 1))
            np.save(os.path.join(d, "bboxes.npy"), boxes)


def make_loaders(cfg):
    import os

    from ..data.augment import PairedVideoAugment
    from ..data.files import RandomBatchSampler
    from ..data.pipeline import BatchLoader
    from ..data.video_clips import LABELS_2CLASS, LABELS_4CLASS, ClipDirSource

    if cfg.synthetic_clips and not os.path.isdir(os.path.join(cfg.files_root, "train")):
        n = int(getattr(cfg, "synthetic_files", 8))
        _make_synthetic_clips(cfg.files_root, n_train=n,
                              n_test=max(2, n // 2),
                              frames=cfg.frame_num, hw=cfg.video_size)
    label_dict = LABELS_2CLASS if cfg.two_class else LABELS_4CLASS
    loaders = []
    for sub, shuffle in (("train", True), ("test", False)):
        src = ClipDirSource(
            os.path.join(cfg.files_root, sub), frame_num=cfg.frame_num,
            size=cfg.video_size, label_dict=label_dict,
            augment=PairedVideoAugment(seed=cfg.seed) if shuffle else None)
        sampler = RandomBatchSampler(len(src), cfg.batch_size, shuffle, cfg.seed)
        loaders.append(BatchLoader(src, sampler, pad_to=cfg.batch_size,
                                   num_threads=cfg.num_threads))
    return loaders


def main(argv=None):
    from ..train import LossSpec

    cfg = parse_config(Cnn3DConfig, argv)
    train_loader, test_loader = make_loaders(cfg)
    trainer = build_trainer(cfg, make_model(cfg), {"main": LossSpec("ce")},
                            train_loader, test_loader,
                            num_classes=2 if cfg.two_class else cfg.class_num)
    run_training(cfg, trainer, train_loader)
    return trainer



def export_spec(cfg):
    """Per-modality clip shapes for AOT export (cli/export_model.py).
    The exported forward scores raw clips WITHOUT bbox masks (the mask
    input is optional in R3DWithBboxes; serving requests carry none)."""
    size = cfg.video_size
    return {"video": (cfg.frame_num, size, size, 3)}

if __name__ == "__main__":
    main()
