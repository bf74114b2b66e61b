"""Export a trained checkpoint to a self-contained serving artifact.

Serializes the compiled forward (weights baked in as StableHLO constants,
jax.export) so a serving process needs NO model code, checkpoint restore,
or weight conversion — just `io.export.ExportedPredictor` and the artifact
directory.  The serving daemon consumes it directly via
`cli.serve --exported <dir>`.  The reference's deployment unit was a
pickled trainer requiring the exact Python class tree to unpickle
(reference trainer.py:330-338); this replaces it with a portable,
code-free, cross-platform (cpu+tpu) artifact.

  python -m multimodalaggressionrecognition_tpu.cli.export_model \
      --from_run runs/<run> \
      --path_to_checkpoint runs/<run>/checkpoint_best_verb \
      --output_dir exported/verb_model

EVERY model family is exportable: `--entry` selects which train CLI's
model to build (default train_multimodal), and the remaining flags are
that entry's own config (so `--entry train_text_transformer --num_layers 2`
works, as does `--from_run` on one of its runs).  Each entry declares its
per-modality clip shapes via `export_spec(cfg)`; the artifact's meta
carries them, so serve/predict/evaluate need no per-family code.

`--quantize int8` exports the weight-only-quantized forward: int8 kernels
plus their on-device dequantization are baked in, ~4x smaller artifact.

Auto-mode Pallas kernels export their XLA lowerings (utils/kernels.py
force_xla — Mosaic custom calls are not a stable serialization target);
pass `--pallas_stem on` only if you accept that jax.export will reject the
resulting custom call.  `--native true --platforms tpu` flips that trade:
the artifact keeps the production Pallas kernels (live-TPU throughput,
io/export.py waives the custom-call check) but only loads on TPU and is
tied to the exporting libtpu's Mosaic serialization.
"""

import dataclasses
import importlib
import json
import os

import numpy as np

_ENTRIES = ("train_multimodal", "train_text_transformer", "train_audio_rnn",
            "train_audio_transformer", "train_video_transformer",
            "train_video_rnn", "train_audio_text", "train3dcnn")

_EXPORT_FIELDS = [
    ("output_dir", str, "exported_model"),
    ("platforms", str, "cpu,tpu"),   # comma-separated jax.export targets
    # keep Pallas (Mosaic) kernels in the artifact: live-TPU throughput,
    # requires --platforms tpu, ties the artifact to the libtpu generation
    ("native", bool, False),
    ("quantize", str, ""),           # '', 'int8' (weight-only), 'w8a8'
    # explicit opt-in for exporting untrained weights (smoke tests only)
    ("allow_random_weights", bool, False),
]


def _entry_config_cls(mod):
    """The entry CLI's single TrainConfig dataclass (by convention each
    train CLI defines exactly one).  Base classes imported from .common
    (TrainConfig itself, NamesPinConfig, ...) also live in the module
    namespace — only classes DEFINED in the entry module count."""
    from .common import TrainConfig

    found = [v for v in vars(mod).values()
             if isinstance(v, type) and dataclasses.is_dataclass(v)
             and issubclass(v, TrainConfig) and v is not TrainConfig
             and v.__module__ == mod.__name__]
    assert len(found) == 1, (mod.__name__, found)
    return found[0]


def _build_model_and_spec(entry_name, mod, cfg):
    if hasattr(mod, "build_model"):  # train_multimodal: modality-driven
        from .common import clip_shapes_from_config

        modalities = tuple(sorted(cfg.modalities.split(",")))
        return (mod.build_model(cfg, modalities),
                clip_shapes_from_config(cfg, modalities))
    return mod.make_model(cfg), mod.export_spec(cfg)


def main(argv=None):
    import jax

    from ..io import checkpoint as ckpt_io
    from ..io.export import export_predictor
    from ..serve import Predictor
    from .common import apply_runtime_config, flag_value, parse_config

    entry_name = flag_value(argv, "entry", "train_multimodal")
    if entry_name not in _ENTRIES:
        raise SystemExit(f"--entry must be one of {_ENTRIES} "
                         f"(got {entry_name!r})")
    mod = importlib.import_module(f".{entry_name}", package=__package__)
    cfg_cls = dataclasses.make_dataclass(
        "ExportConfig",
        [("entry", str, dataclasses.field(default=entry_name))]
        + [(n, t, dataclasses.field(default=d)) for n, t, d in _EXPORT_FIELDS],
        bases=(_entry_config_cls(mod),))
    cfg = parse_config(cfg_cls, argv)
    apply_runtime_config(cfg)

    model, spec = _build_model_and_spec(entry_name, mod, cfg)
    example = {m: np.zeros((1,) + tuple(shape), np.float32)
               for m, shape in spec.items()}

    if cfg.path_to_checkpoint:
        variables, _ = ckpt_io.restore_variables(cfg.path_to_checkpoint)
    elif cfg.allow_random_weights:
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(cfg.seed),
            {m: {"data": v, "present": np.ones((1,), np.float32)}
             for m, v in example.items()})
    else:
        raise SystemExit(
            "--path_to_checkpoint is required: exporting freshly "
            "initialized weights produces a garbage-scoring artifact "
            "(pass --allow_random_weights true for smoke tests)")

    predictor = Predictor(model, variables, batch_size=cfg.batch_size,
                          compute_dtype=getattr(cfg, "compute_dtype", None),
                          quantize=cfg.quantize or None)
    meta = export_predictor(
        predictor, example, cfg.output_dir,
        platforms=tuple(p for p in cfg.platforms.split(",") if p),
        native=cfg.native)
    artifact = os.path.join(cfg.output_dir, "model.jaxexport")
    print(json.dumps({"exported": cfg.output_dir, "entry": entry_name,
                      "artifact_bytes": os.path.getsize(artifact),
                      **meta}), flush=True)
    return meta


if __name__ == "__main__":
    main()
