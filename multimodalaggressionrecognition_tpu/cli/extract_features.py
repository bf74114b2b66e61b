"""Offline feature extraction (reference extract_video_features.py /
extract_audio_features.py).

Runs a frozen windowed video extractor (Swin3D-T / R3D-18 / S3D) over .npy
or .pt clips and saves (T/window, D) feature sequences per clip.  The
reference re-extracted the train set once per "epoch" with fresh random
augmentations into `train/<epoch>/` dirs (extract_video_features.py:100-112)
— supported via --num_epochs, though on-device extraction makes the
storage-for-compute trade unnecessary (SURVEY.md §2.8).
"""

import os
from dataclasses import dataclass

import numpy as np

from .common import NamesPinConfig, parse_config, pinned_files


@dataclass
class ExtractConfig(NamesPinConfig):
    model_name: str = "extract"
    files_root: str = ""            # dir with train/ and test/ clip files
    out_root: str = ""
    backbone: str = "swin3d_t"      # swin3d_t | r3d18 | s3d
    frame_num: int = 304
    window: int = 16
    video_size: int = 112
    num_epochs: int = 0             # extra augmented train extractions
    batch_size: int = 4
    # GELU mode for the frozen Swin backbone: "poly" (default, f32-exact
    # polynomial erf), "erf" (XLA), "tanh" (approx) — models/swin3d.py
    swin_gelu: str = "poly"


def make_extractor(cfg):
    import flax.linen as nn

    from ..models.video_extractors import WindowedVideoExtractor

    if cfg.backbone == "swin3d_t":
        from ..models.swin3d import Swin3dTExtractor

        backbone = Swin3dTExtractor(gelu=cfg.swin_gelu)
    elif cfg.backbone == "r3d18":
        from ..models.r3d import R3D18Extractor

        backbone = R3D18Extractor()
    elif cfg.backbone == "s3d":
        from ..models.s3d import S3DExtractor

        backbone = S3DExtractor()
    else:
        raise ValueError(cfg.backbone)

    class Extractor(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            return WindowedVideoExtractor(backbone, window=cfg.window,
                                          name="windowed")(x, train=train)

    return Extractor()


def main(argv=None):
    import jax

    from ..data.files import FilenameLabelSource
    from ..data.transforms import pad_video
    from ..data.augment import PairedVideoAugment

    cfg = parse_config(ExtractConfig, argv)
    out_root = cfg.out_root or (cfg.files_root + "_features")
    model = make_extractor(cfg)

    def to_thwc(x):
        x = np.asarray(x, np.float32)
        if x.ndim == 4 and x.shape[1] in (1, 3):
            x = x.transpose(0, 2, 3, 1)
        return pad_video(cfg.frame_num)(x)

    from ..utils.precision import cast_floating, resolve_dtype

    dtype = resolve_dtype(cfg.compute_dtype)
    variables = None
    forward = jax.jit(lambda v, x: model.apply(v, x))

    def run_split(split_root, out_dir, augment=None, names=None):
        nonlocal variables
        from collections import deque

        src = FilenameLabelSource(split_root, "video", transform=to_thwc,
                                  files=names)
        os.makedirs(out_dir, exist_ok=True)

        def save(idx, feats):
            feats = np.asarray(feats, np.float32)  # D2H readback
            for j, i in enumerate(idx):
                stem = os.path.splitext(src.files[i])[0]
                np.save(os.path.join(out_dir, f"{stem}.npy"), feats[j])

        # lag-1 pipeline: dispatch batch N, read back batch N-1 while the
        # device computes N — the D2H readback (a blocking round trip) and
        # the host-side clip decode/augment/save overlap device compute
        # instead of serializing behind it.  Depth 1 bounds in-flight HBM
        # to two batches of activations.  MAR_EXTRACT_PIPELINE=0 forces the
        # sequential order (A/B + debugging).
        depth = 0 if os.environ.get("MAR_EXTRACT_PIPELINE") == "0" else 1
        pending = deque()
        for start in range(0, len(src), cfg.batch_size):
            idx = list(range(start, min(start + cfg.batch_size, len(src))))
            clips = []
            for i in idx:
                x, _ = src.load(i)
                if augment is not None:
                    x, _ = augment(x, None)
                clips.append(x)
            batch = np.stack(clips)
            if variables is None:
                variables = model.init(jax.random.PRNGKey(0), batch[:1])
                if dtype is not None:  # bf16 frozen extraction (+56% on v5e)
                    variables = cast_floating(variables, dtype)
            if dtype is not None:
                batch = batch.astype(dtype)
            pending.append((idx, forward(variables, batch)))
            if len(pending) > depth:
                save(*pending.popleft())
        while pending:
            save(*pending.popleft())

    # --train_names/--test_names: the reference's train_names.txt order pin
    # (extract_video_features.py:31-42) — pins membership AND extraction
    # order of each split, including the per-epoch augmented re-extractions.
    run_split(os.path.join(cfg.files_root, "test"),
              os.path.join(out_root, "test"),
              names=pinned_files(cfg, "test"))
    run_split(os.path.join(cfg.files_root, "train"),
              os.path.join(out_root, "train", "0"),
              names=pinned_files(cfg, "train"))
    for epoch in range(1, cfg.num_epochs + 1):
        run_split(os.path.join(cfg.files_root, "train"),
                  os.path.join(out_root, "train", str(epoch)),
                  augment=PairedVideoAugment(seed=cfg.seed + epoch),
                  names=pinned_files(cfg, "train"))
    print(f"features written to {out_root}")


if __name__ == "__main__":
    main()
