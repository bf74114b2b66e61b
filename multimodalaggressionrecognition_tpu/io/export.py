"""AOT model export: a self-contained serving artifact via jax.export.

The reference's only deployment unit was a pickled trainer whose unpickle
requires the exact Python class tree (reference trainer.py:330-338) — the
serving process must ship the full model code.  Here `export_predictor`
serializes the Predictor's COMPILED forward to portable StableHLO with the
trained weights baked in as constants (jax.export), so a serving process
needs only this loader + the artifact: no model classes, no checkpoint
restore, no weight conversion.  Everything the Predictor's compiled
function does is captured — padding-invariant presence masks, compute-dtype
casts, and weight-only int8 dequantization (an int8-quantized Predictor
exports a ~4x smaller artifact).

Artifacts are cross-platform: exported once (default platforms cpu+tpu),
the same file scores on a CPU host for tests and on TPU in production.
Format: a directory holding `model.jaxexport` (serialized StableHLO) and
`meta.json` (batch size, per-modality clip shapes, head -> class counts).
"""

import json
import os
from typing import Dict

import numpy as np

FORMAT = "mar-export-v1"
_ARTIFACT = "model.jaxexport"
_META = "meta.json"


def export_predictor(predictor, example_modalities: Dict[str, np.ndarray],
                     out_dir: str, platforms=("cpu", "tpu"),
                     native: bool = False) -> dict:
    """Serialize `predictor`'s compiled forward (weights baked in) under
    `out_dir`.  `example_modalities`: {name: (1, *clip_shape)} arrays or
    shapes, exactly what `Predictor.warmup` takes.  Returns the meta dict.

    `native=True` keeps the production Pallas kernels (Mosaic
    `tpu_custom_call`s) in the artifact instead of tracing their portable
    XLA lowerings — the artifact then matches the live Predictor's TPU
    throughput, at the cost of portability: it requires
    `platforms=("tpu",)` and ties the artifact to the exporting libtpu's
    Mosaic serialization (re-export after major runtime upgrades).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    clip_shapes = {name: tuple(int(d) for d in np.shape(arr)[1:])
                   for name, arr in example_modalities.items()}
    spec = {name: {"data": jax.ShapeDtypeStruct(
                       (predictor.batch_size, *shape), jnp.float32),
                   "present": jax.ShapeDtypeStruct(
                       (predictor.batch_size,), jnp.float32)}
            for name, shape in clip_shapes.items()}

    variables = predictor.variables
    # a FRESH jitted forward (not predictor._forward): jit's trace cache is
    # keyed on function identity, so reusing the live forward under
    # force_xla() could hit a cached Pallas-containing trace from warmup —
    # or poison the live predictor's later TPU traces with the XLA path
    forward = predictor._make_forward()

    def fwd(batch):
        return forward(variables, batch)

    if native:
        # TPU-native artifact: keep auto-selected Pallas kernels.  Mosaic
        # custom calls only lower for tpu, and jax.export treats them as a
        # non-stable target unless explicitly waived.
        if tuple(platforms) != ("tpu",):
            raise ValueError(
                "native=True keeps Mosaic (Pallas) custom calls, which "
                f"only lower for platforms=('tpu',); got {tuple(platforms)}")
        exported = jax_export.export(
            jax.jit(fwd), platforms=("tpu",),
            disabled_checks=[
                jax_export.DisabledSafetyCheck.custom_call(
                    "tpu_custom_call")])(spec)
    else:
        from ..utils.kernels import force_xla

        # Auto-mode Pallas kernels trace their XLA lowering under
        # force_xla(): Mosaic tpu_custom_calls are not a stable
        # serialization target and could not lower for the cpu platform of
        # a multi-platform artifact.  Explicitly-requested Pallas (e.g.
        # pallas_stem=True) is kept and makes jax.export raise its
        # custom-call error instead of silently diverging.
        with force_xla():
            exported = jax_export.export(jax.jit(fwd),
                                         platforms=tuple(platforms))(spec)
    import jax.tree_util as jtu

    out_shapes = jtu.tree_unflatten(exported.out_tree,
                                    list(exported.out_avals))
    heads = {head: int(s.shape[-1]) for head, s in out_shapes.items()}
    meta = {"format": FORMAT,
            "batch_size": int(predictor.batch_size),
            "platforms": list(exported.platforms),
            "native": bool(native),
            "clip_shapes": {k: list(v) for k, v in clip_shapes.items()},
            "heads": heads}
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _ARTIFACT), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


from ..serve import ScorerBase


class ExportedPredictor(ScorerBase):
    """Score an exported artifact — same surface as `serve.Predictor`
    (predict / batch_size / heads / modalities) so `MicroBatcher` and the
    serving daemon run unchanged on top of it, with zero model code
    loaded."""

    def __init__(self, path: str, sharding=None):
        """`sharding`: optional leading-axis NamedSharding — scoring
        batches are sharded across the mesh exactly like
        `Predictor(sharding=...)` (the baked-in weights are jaxpr
        constants; XLA replicates them under the sharded-input jit)."""
        import jax
        from jax import export as jax_export

        with open(os.path.join(path, _META)) as f:
            meta = json.load(f)
        if meta.get("format") != FORMAT:
            raise ValueError(
                f"{path!r} is not a {FORMAT} artifact "
                f"(format={meta.get('format')!r})")
        backend = jax.default_backend()
        if backend not in meta["platforms"]:
            raise ValueError(
                f"artifact was exported for platforms {meta['platforms']}, "
                f"but the current backend is {backend!r}; re-export with "
                f"--platforms {backend}")
        with open(os.path.join(path, _ARTIFACT), "rb") as f:
            exported = jax_export.deserialize(f.read())
        self._call = jax.jit(exported.call)  # cache the executable

        self.meta = meta
        self.batch_size = int(meta["batch_size"])
        if sharding is not None:
            from ..serve import _check_batch_divides

            _check_batch_divides(self.batch_size, sharding)
        self.sharding = sharding  # consumed by ScorerBase._pad_batch
        self.heads = sorted(meta["heads"])
        self.head_classes = {k: int(v) for k, v in meta["heads"].items()}
        self.modalities = sorted(meta["clip_shapes"])
        self.clip_shapes = {k: tuple(v)
                            for k, v in meta["clip_shapes"].items()}
        self.variables = None  # baked into the artifact

    def _forward(self, _variables, batch):
        return self._call(batch)

    def warmup(self):
        """Compile once with zeros so the first real request does not pay
        the device compile behind an already-listening server."""
        self.predict({m: np.zeros((1, *self.clip_shapes[m]), np.float32)
                      for m in self.modalities})
        return self
