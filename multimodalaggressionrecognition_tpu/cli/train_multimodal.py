"""Multimodal PhysVerb training (reference train_multimodal.py equivalent).

Pipeline: time-intervals table + cluster split -> homogeneous aggr-type
batches with the EMPTY protocol -> PhysVerbModel (audio CNN1D wrapper /
identity text / optional windowed Swin3D-T video tower) -> fusion
transformer -> per-aggr-type heads with focal('phys') + CE('verb') losses,
inverse-frequency class weights, best-UAR checkpointing.

Usage:
  python -m multimodalaggressionrecognition_tpu.cli.train_multimodal \
      --dataset_root data/avabos --modalities audio,text --synthetic
"""

from dataclasses import dataclass

import numpy as np

from .common import resolve_pallas_stem, TrainConfig, build_trainer, ensure_dataset, parse_config, run_training


@dataclass
class MultimodalConfig(TrainConfig):
    model_name: str = "multimodal_physverb"
    modalities: str = "audio,text"       # comma-separated; +video to enable
    hidden_size: int = 768
    fusion_layers: int = 1
    fusion_heads: int = 8
    adaptor_out: int = 256
    audio_samples: int = 80000
    text_tokens: int = 48
    video_frames: int = 128
    video_size: int = 112
    video_window: int = 8
    # GELU mode in the frozen Swin video extractor: "poly" (default,
    # float32-exact polynomial erf — fast AND parity-exact), "erf" (XLA
    # lowering), "tanh" (approx, ~3e-3 deviation) — models/swin3d.py
    swin_gelu: str = "poly"
    # Fine-tune the Swin video tower instead of freezing it (the reference
    # always froze its extractors, models.py:49-59).  When unfrozen, remat
    # checkpoints the backbone so 128-frame clips fit HBM; the window
    # attention uses the fused Pallas forward+flash-backward kernels.
    video_freeze: bool = True
    # remat=True is the SAFE default (long clips).  Measured on v5e at the
    # bench shape (b8 x 128f@112, bf16): activations fit HBM and the
    # recompute is pure overhead — `--video_remat false --compute_dtype
    # bfloat16` is +62% train throughput (results_v5e.json
    # 7_trimodal_finetune_unfrozen_tuned; benchmarks/profile_finetune_step.py)
    video_remat: bool = True
    # remat policy when fine-tuning: "none" (save nothing, minimum HBM) or
    # "dots" (save matmul outputs, recompute elementwise — measured never
    # to win; sweep: benchmarks/profile_finetune_remat.py)
    video_remat_policy: str = "none"
    focal_gamma: float = 2.0
    batch_size: int = 32
    # Pallas CNN1D stem kernel: auto (on for TPU) | on | off
    pallas_stem: str = "auto"


def class_weights_from_df(df, label_col):
    """Inverse-frequency alpha weights (reference train_multimodal.py:467-486)."""
    labels = df[label_col].map({"NOAGGR": 0, "AGGR": 1}).dropna()
    counts = np.bincount(labels.astype(int), minlength=2).astype(np.float64)
    weights = counts.sum() / np.maximum(counts, 1.0)
    return tuple((weights / weights.sum()).tolist())


def build_model(cfg, modalities):
    import flax.linen as nn

    from ..models.cnn1d import AudioCnn1DExtractorWrapper
    from ..models.fusion import EqualSizedTransformerModalitiesFusion
    from ..models.physverb import (IdentityExtractor,
                                   PhysVerbClassifierConcatFeatures,
                                   PhysVerbModel)

    extractors = {}
    adaptor_sizes = {}
    feature_shapes = {}
    if "audio" in modalities:
        extractors["audio"] = AudioCnn1DExtractorWrapper(
            cfg.hidden_size,
            pallas_stem=resolve_pallas_stem(cfg))
        adaptor_sizes["audio"] = (cfg.hidden_size, cfg.adaptor_out)
        # CNN1D conv trunk token count for the EMPTY stub
        t_audio = cfg.audio_samples // 40 + 1
        for _ in range(4):
            t_audio //= 4
        feature_shapes["audio"] = (t_audio, cfg.hidden_size)
    if "text" in modalities:
        extractors["text"] = IdentityExtractor()
        adaptor_sizes["text"] = (cfg.hidden_size, cfg.adaptor_out)
        feature_shapes["text"] = (cfg.text_tokens, cfg.hidden_size)
    if "video" in modalities:
        from ..models.swin3d import Swin3dTExtractor
        from ..models.video_extractors import WindowedVideoExtractor

        class VideoTower(nn.Module):
            @nn.compact
            def __call__(self, x, train: bool = False):
                freeze = getattr(cfg, "video_freeze", True)
                remat = getattr(cfg, "video_remat", True) and not freeze
                policy = getattr(cfg, "video_remat_policy", "none")
                return WindowedVideoExtractor(
                    # block-level remat inside the backbone (each SwinBlock3d
                    # checkpointed) — lower peak HBM than one outer segment
                    Swin3dTExtractor(
                        gelu=cfg.swin_gelu, remat=remat,
                        remat_policy=None if policy == "none" else policy),
                    window=cfg.video_window,
                    freeze=freeze,
                    name="windowed")(x, train=train)

        extractors["video"] = VideoTower()
        adaptor_sizes["video"] = (cfg.hidden_size, cfg.adaptor_out)
        feature_shapes["video"] = (cfg.video_frames // cfg.video_window,
                                   cfg.hidden_size)

    return PhysVerbModel(
        extractors=extractors,
        fusion=EqualSizedTransformerModalitiesFusion(
            cfg.fusion_layers, cfg.hidden_size, cfg.fusion_heads),
        classifier=PhysVerbClassifierConcatFeatures(
            class_num=2, adaptor_sizes=adaptor_sizes),
        feature_shapes=feature_shapes,
        modalities=tuple(sorted(modalities)),
    )


def make_loaders(cfg, df, split, modalities):
    from ..data import AggrBatchSampler, MultimodalSource, split_by_clusters
    from ..data.pipeline import BatchLoader
    from ..data.transforms import pad_audio, pad_text, pad_video

    transforms = {"text": pad_text(cfg.text_tokens),
                  "audio": pad_audio(cfg.audio_samples),
                  "video": pad_video(cfg.video_frames)}
    loaders = []
    for clusters, shuffle in ((split["train"], True), (split["test"], False)):
        d = split_by_clusters(df, clusters)
        src = MultimodalSource(d, cfg.dataset_root, modalities,
                               transforms=transforms)
        sampler = AggrBatchSampler(d["aggr_type"].to_numpy(), cfg.batch_size,
                                   shuffle=shuffle, seed=cfg.seed)
        loaders.append(BatchLoader(src, sampler, pad_to=cfg.batch_size,
                                   num_threads=cfg.num_threads))
    return loaders


def main(argv=None):
    from ..train import LossSpec

    cfg = parse_config(MultimodalConfig, argv)
    modalities = tuple(cfg.modalities.split(","))
    df, split = ensure_dataset(cfg)
    train_loader, test_loader = make_loaders(cfg, df, split, modalities)
    model = build_model(cfg, modalities)
    loss_specs = {
        "phys": LossSpec("focal",
                         class_weights=class_weights_from_df(df, "phys_aggr_label"),
                         gamma=cfg.focal_gamma),
        "verb": LossSpec("ce"),
    }
    trainer = build_trainer(cfg, model, loss_specs, train_loader, test_loader)
    run_training(cfg, trainer, train_loader)
    return trainer


if __name__ == "__main__":
    main()
