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

`--quantize int8` exports the weight-only-quantized forward: int8 kernels
plus their on-device dequantization are baked in, ~4x smaller artifact.

Auto-mode Pallas kernels export their XLA lowerings (utils/kernels.py
force_xla — Mosaic custom calls are not a stable serialization target);
pass `--pallas_stem on` only if you accept that jax.export will reject the
resulting custom call.
"""

import json
import os
from dataclasses import dataclass

import numpy as np

from .common import clip_shapes_from_config, parse_config
from .train_multimodal import MultimodalConfig, build_model


@dataclass
class ExportConfig(MultimodalConfig):
    path_to_checkpoint: str = ""
    output_dir: str = "exported_model"
    batch_size: int = 32
    platforms: str = "cpu,tpu"  # comma-separated jax.export lowering targets
    quantize: str = ""          # '' or 'int8' (weight-only)
    # explicit opt-in for exporting untrained weights (smoke tests only)
    allow_random_weights: bool = False


def main(argv=None):
    import jax

    from ..io import checkpoint as ckpt_io
    from ..io.export import export_predictor
    from ..serve import Predictor
    from .common import apply_runtime_config

    cfg = parse_config(ExportConfig, argv)
    apply_runtime_config(cfg)
    modalities = tuple(sorted(cfg.modalities.split(",")))
    model = build_model(cfg, modalities)
    example = {m: np.zeros((1,) + shape, np.float32)
               for m, shape in clip_shapes_from_config(cfg,
                                                       modalities).items()}

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
        platforms=tuple(p for p in cfg.platforms.split(",") if p))
    artifact = os.path.join(cfg.output_dir, "model.jaxexport")
    print(json.dumps({"exported": cfg.output_dir,
                      "artifact_bytes": os.path.getsize(artifact),
                      **meta}), flush=True)
    return meta


if __name__ == "__main__":
    main()
