"""Evaluate a multimodal checkpoint on the test split.

Loads a Trainer checkpoint (checkpoint_current / checkpoint_best_<head>),
runs the test clusters of the intervals table through the PhysVerb model,
and prints the reference's metric set per head (accuracy, per-class P/R/F1,
UAR/UAP/UAF1) — the role of the reference's show_results.ipynb best-epoch
readout, computed live instead of from CSV archaeology.
"""

import json
from dataclasses import dataclass

from .common import ensure_dataset, parse_config
from .train_multimodal import MultimodalConfig, build_model, make_loaders


@dataclass
class EvalConfig(MultimodalConfig):
    path_to_checkpoint: str = ""


def main(argv=None):
    import numpy as np

    from ..train import LossSpec, Trainer
    from .train_multimodal import class_weights_from_df

    cfg = parse_config(EvalConfig, argv)
    modalities = tuple(cfg.modalities.split(","))
    df, split = ensure_dataset(cfg)
    train_loader, test_loader = make_loaders(cfg, df, split, modalities)
    model = build_model(cfg, modalities)
    loss_specs = {"phys": LossSpec("focal",
                                   class_weights=class_weights_from_df(
                                       df, "phys_aggr_label")),
                  "verb": LossSpec("ce")}
    import optax

    trainer = Trainer(model, loss_specs, optax.adam(1e-3), train_loader,
                      test_loader, num_classes=2, saving_dir=cfg.saving_dir,
                      model_name="evaluate", log_console=False)
    trainer.init_state(next(iter(test_loader)))
    if cfg.path_to_checkpoint:
        trainer.load_checkpoint(cfg.path_to_checkpoint)
    results = trainer.eval_epoch()
    printable = {
        head: {k: (v.tolist() if isinstance(v, np.ndarray) else float(v))
               for k, v in m.items()}
        for head, m in results.items()}
    print(json.dumps(printable, indent=2))
    return results


if __name__ == "__main__":
    main()
