"""Evaluate a multimodal checkpoint on the test split.

Loads a Trainer checkpoint (checkpoint_current / checkpoint_best_<head>),
runs the test clusters of the intervals table through the PhysVerb model,
and prints the reference's metric set per head (accuracy, per-class P/R/F1,
UAR/UAP/UAF1) — the role of the reference's show_results.ipynb best-epoch
readout, computed live instead of from CSV archaeology.

`--exported <dir>` evaluates a jax.export serving artifact instead (no
model code or checkpoint load): batches missing one of the artifact's
modalities are scored with zero stubs + present=0 rows, which the model
treats identically to the training-time EMPTY protocol (the mask==absent
equivalence property, tests/test_multimodal.py).
"""

import json
from dataclasses import dataclass

from .common import ensure_dataset, parse_config
from .train_multimodal import MultimodalConfig, build_model, make_loaders


@dataclass
class EvalConfig(MultimodalConfig):
    path_to_checkpoint: str = ""
    exported: str = ""  # jax.export artifact dir (cli/export_model.py)


def _print_results(results):
    import numpy as np

    printable = {
        head: {k: (v.tolist() if isinstance(v, np.ndarray) else float(v))
               for k, v in m.items()}
        for head, m in results.items()}
    print(json.dumps(printable, indent=2))


def _eval_exported(cfg):
    """Score the test split through an exported artifact and derive the
    same per-head confusion-matrix metrics as the Trainer eval path
    (no loss column — the artifact carries logits only)."""
    import jax.numpy as jnp
    import numpy as np

    from ..io.export import ExportedPredictor
    from ..ops.metrics import confusion_matrix, metrics_from_confusion

    if cfg.path_to_checkpoint:
        raise SystemExit(
            "--exported conflicts with --path_to_checkpoint: the artifact's "
            "weights were baked in at export time")
    exported = ExportedPredictor(cfg.exported)
    # the artifact fixes batch and clip shapes: the loader must pad to them
    cfg.batch_size = exported.batch_size
    cfg.modalities = ",".join(exported.modalities)
    shapes = exported.clip_shapes
    if "audio" in shapes:
        cfg.audio_samples = shapes["audio"][0]
    if "text" in shapes:
        cfg.text_tokens = shapes["text"][0]
    if "video" in shapes:
        # the loader pads the frame axis only; spatial dims come from the
        # stored clips and are validated against the artifact per batch
        cfg.video_frames = shapes["video"][0]

    df, split = ensure_dataset(cfg)
    _, test_loader = make_loaders(cfg, df, split, tuple(exported.modalities))

    def _check_shapes(request):
        for m, leaf in request.items():
            got = tuple(leaf["data"].shape[1:])
            if got != shapes[m]:
                raise SystemExit(
                    f"dataset {m} clips are shaped {got} but the artifact "
                    f"was exported for {shapes[m]}; re-export at the "
                    "dataset's shapes (or re-prepare the dataset)")
    zeros = {m: {"data": jnp.zeros((exported.batch_size, *shapes[m]),
                                   jnp.float32),
                 "present": jnp.zeros((exported.batch_size,), jnp.float32)}
             for m in exported.modalities}
    acc = {}
    for batch in test_loader:
        request = {m: ({"data": jnp.asarray(batch["modalities"][m]["data"]),
                        "present": jnp.asarray(
                            batch["modalities"][m]["present"])}
                       if m in batch["modalities"] else zeros[m])
                   for m in exported.modalities}
        _check_shapes(request)
        outputs = exported._forward(None, request)
        for head, logits in outputs.items():
            if head not in batch["labels"]:
                continue
            preds = jnp.argmax(logits.astype(jnp.float32), axis=-1)
            cm = confusion_matrix(preds, jnp.asarray(batch["labels"][head]),
                                  exported.head_classes[head],
                                  row_mask=jnp.asarray(
                                      batch["label_mask"][head]))
            # accumulate ON DEVICE: np.asarray here would block each batch
            # on a D2H readback (same per-step sync train/loop.py dropped)
            acc[head] = acc.get(head, 0.0) + cm
    results = {head: metrics_from_confusion(np.asarray(cm))
               for head, cm in acc.items()}
    _print_results(results)
    return results


def main(argv=None):
    from ..train import LossSpec, Trainer
    from .train_multimodal import class_weights_from_df

    cfg = parse_config(EvalConfig, argv)
    if getattr(cfg, "exported", ""):
        return _eval_exported(cfg)
    modalities = tuple(cfg.modalities.split(","))
    df, split = ensure_dataset(cfg)
    train_loader, test_loader = make_loaders(cfg, df, split, modalities)
    model = build_model(cfg, modalities)
    loss_specs = {"phys": LossSpec("focal",
                                   class_weights=class_weights_from_df(
                                       df, "phys_aggr_label")),
                  "verb": LossSpec("ce")}
    import optax

    from .common import make_parallelism

    # --data_parallel / --model_parallelism shard the eval batches (and
    # Megatron-shard the kernels) exactly as in training
    sharding, placement = make_parallelism(cfg)
    trainer = Trainer(model, loss_specs, optax.adam(1e-3), train_loader,
                      test_loader, num_classes=2, saving_dir=cfg.saving_dir,
                      model_name="evaluate", log_console=False,
                      sharding=sharding, param_placement=placement)
    trainer.init_state(next(iter(test_loader)))
    if cfg.path_to_checkpoint:
        trainer.load_checkpoint(cfg.path_to_checkpoint)
    results = trainer.eval_epoch()
    _print_results(results)
    return results


if __name__ == "__main__":
    main()
