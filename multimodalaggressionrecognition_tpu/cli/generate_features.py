"""Dump fused multimodal embeddings from a trained checkpoint
(reference generate_features.ipynb equivalent: `PhysVerbModelFeat` +
`MultimodalFeatureGenDataset`).

Runs the PhysVerb model up to the fusion output for every row of the
intervals table and saves one .npy per sample (named by clip id) containing
the per-modality fused token sequences, plus a manifest CSV with labels.
"""

import os
from dataclasses import dataclass

import numpy as np

from .common import ensure_dataset, parse_config
from .train_multimodal import MultimodalConfig, build_model, make_loaders


@dataclass
class GenFeaturesConfig(MultimodalConfig):
    path_to_checkpoint: str = ""
    out_dir: str = "fused_features"


def main(argv=None):
    import optax

    from ..train import LossSpec, Trainer

    cfg = parse_config(GenFeaturesConfig, argv)
    modalities = tuple(cfg.modalities.split(","))
    df, split = ensure_dataset(cfg)
    train_loader, test_loader = make_loaders(cfg, df, split, modalities)
    model = build_model(cfg, modalities)

    trainer = Trainer(model, {"verb": LossSpec("ce")}, optax.adam(1e-3),
                      train_loader, test_loader, num_classes=2,
                      saving_dir=cfg.saving_dir, model_name="genfeat",
                      log_console=False)
    first = next(iter(test_loader))
    trainer.init_state(first)
    if cfg.path_to_checkpoint:
        trainer.load_checkpoint(cfg.path_to_checkpoint)

    variables = {"params": trainer.state.eval_params, **trainer.state.model_state}

    import jax
    from collections import deque

    # jit ONCE (outside the loop): the eager apply executed the full
    # fusion forward op-by-op per batch; jitted it compiles per presence
    # pattern (static under AggrBatchSampler homogeneity) and dispatches
    # as one program
    fused_forward = jax.jit(
        lambda v, m: model.apply(v, m,
                                 method=lambda mod, b, train=False:
                                 mod.fusion(mod.extract_features(b, train),
                                            train)
                                 if mod.fusion is not None
                                 else mod.extract_features(b, train)))

    os.makedirs(cfg.out_dir, exist_ok=True)
    manifest = []
    count = 0

    def save(batch, split_name, feats):
        nonlocal count
        feats = {k: np.asarray(v) for k, v in feats.items()}  # D2H
        bsz = int(batch["sample_mask"].sum())
        for i in range(bsz):
            name = f"{split_name}_{count:06d}"
            np.save(os.path.join(cfg.out_dir, f"{name}.npy"),
                    {k: v[i] for k, v in feats.items()},
                    allow_pickle=True)
            row = {"name": name, "split": split_name}
            for head in ("phys", "verb"):
                if head in batch["labels"]:
                    row[head] = int(batch["labels"][head][i])
                    row[f"{head}_mask"] = float(batch["label_mask"][head][i])
            manifest.append(row)
            count += 1

    # lag-1 pipeline (see cli/extract_features.py): read batch N-1 back
    # while the device computes batch N
    pending = deque()
    for loader, split_name in ((train_loader, "train"), (test_loader, "test")):
        for batch in loader:
            pending.append((batch, split_name,
                            fused_forward(variables, batch["modalities"])))
            if len(pending) > 1:
                save(*pending.popleft())
    while pending:
        save(*pending.popleft())
    import pandas as pd

    pd.DataFrame(manifest).to_csv(os.path.join(cfg.out_dir, "manifest.csv"),
                                  index=False)
    print(f"wrote {count} fused feature files to {cfg.out_dir}")


if __name__ == "__main__":
    main()
