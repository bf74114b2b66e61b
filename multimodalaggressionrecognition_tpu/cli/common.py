"""Shared CLI config machinery.

Dataclass configs with auto-generated argparse — fixing the reference's
config quirk where every script passed a hard-coded `sample_args` list to
`parse_args`, silently ignoring the real command line (reference
train_multimodal.py:51-74 and every other train_* script).  Here real CLI
flags override dataclass defaults; `--synthetic` provisions the synthetic
AVABOS fixture when no dataset exists (the real AVABOS corpus is private).
"""

import argparse
import dataclasses
import os
from dataclasses import dataclass, field


@dataclass
class TrainConfig:
    dataset_root: str = "data/avabos"
    saving_dir: str = "runs"
    model_name: str = ""
    batch_size: int = 16
    epoch_num: int = 50
    learning_rate: float = 1e-3  # torch.optim.Adam default, as the reference
    seed: int = 0
    checkpoint_criterion: str = "UAR"
    resume_training: bool = False
    path_to_checkpoint: str = ""
    synthetic: bool = False
    num_threads: int = 4
    log_console: bool = True
    lr_schedule: str = "constant"   # constant | cosine | exponential
    lr_decay_steps: int = 10000
    lr_decay_rate: float = 0.95
    # 'float32' (default, reference-exact) or 'bfloat16' (MXU-native mixed
    # precision: f32 master params/losses/BN stats, bf16 matmuls/convs)
    compute_dtype: str = "float32"


def parse_config(cls, argv=None, **overrides):
    parser = argparse.ArgumentParser(description=cls.__doc__)
    for f in dataclasses.fields(cls):
        default = overrides.get(f.name, f.default)
        arg = f"--{f.name}"
        if f.type in (bool, "bool") or isinstance(default, bool):
            parser.add_argument(arg, action="store_true" if not default
                                else "store_false", default=default)
        else:
            typ = type(default) if default is not None else str
            parser.add_argument(arg, type=typ, default=default)
    ns = parser.parse_args(argv)
    return cls(**vars(ns))


def ensure_dataset(cfg: TrainConfig, **synth_kwargs):
    """Generate the synthetic AVABOS tree when requested/missing."""
    import pandas as pd

    csv = os.path.join(cfg.dataset_root, "time_intervals.csv")
    if cfg.synthetic and not os.path.exists(csv):
        from ..data.synthetic import generate_synthetic_avabos

        generate_synthetic_avabos(cfg.dataset_root, **synth_kwargs)
    if not os.path.exists(csv):
        raise FileNotFoundError(
            f"{csv} not found; pass --synthetic to generate a fixture")
    from ..data.avabos import load_cluster_split

    df = pd.read_csv(csv)
    split = load_cluster_split(
        os.path.join(cfg.dataset_root, "train_test_split.json"))
    return df, split


def make_optimizer(cfg: TrainConfig):
    """Adam with an optional LR schedule (the reference's lr_schedulers slot,
    trainer.py:370-373; its live scripts used plain Adam)."""
    import optax

    if cfg.lr_schedule == "cosine":
        lr = optax.cosine_decay_schedule(cfg.learning_rate, cfg.lr_decay_steps)
    elif cfg.lr_schedule == "exponential":
        lr = optax.exponential_decay(cfg.learning_rate, cfg.lr_decay_steps,
                                     cfg.lr_decay_rate)
    else:
        lr = cfg.learning_rate
    return optax.adam(lr)


def build_trainer(cfg: TrainConfig, model, loss_specs, train_loader,
                  test_loader, num_classes=2, on_epoch_start=None):
    from ..train import Trainer

    return Trainer(
        model, loss_specs, make_optimizer(cfg), train_loader,
        test_loader, num_classes=num_classes, saving_dir=cfg.saving_dir,
        model_name=cfg.model_name, checkpoint_criterion=cfg.checkpoint_criterion,
        seed=cfg.seed, log_console=cfg.log_console,
        on_epoch_start=on_epoch_start,
        compute_dtype=getattr(cfg, "compute_dtype", None))


def run_training(cfg: TrainConfig, trainer, train_loader):
    if cfg.resume_training and cfg.path_to_checkpoint:
        first = next(iter(train_loader))
        trainer.init_state(first)
        trainer.load_checkpoint(cfg.path_to_checkpoint)
    trainer.fit(cfg.epoch_num)
    trainer.plot_logs()
    return trainer
