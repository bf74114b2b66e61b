"""Score raw clips with a trained multimodal checkpoint.

The complete inference story (decode -> resample/pad -> model -> per-head
probabilities), one clip or a directory:

  python -m multimodalaggressionrecognition_tpu.cli.predict \
      --path_to_checkpoint runs/<run>/checkpoint_best_verb \
      --audio clip.wav --text clip_embeddings.npy

Accepts .wav (host decode + 16 kHz resample), .pt waveforms, .npy text
embeddings; missing modalities follow the EMPTY protocol (zero stubs).
Prints one JSON line per clip.  `--exported <dir>` scores a jax.export
artifact (cli/export_model.py) instead — no model code or checkpoint load.
"""

import json
import os
from dataclasses import dataclass

import numpy as np

from .common import parse_config
from .train_multimodal import MultimodalConfig, build_model


@dataclass
class PredictConfig(MultimodalConfig):
    path_to_checkpoint: str = ""
    # score a jax.export artifact (cli/export_model.py) instead of building
    # the model: no model code or checkpoint load; clip shapes come from
    # the artifact meta.  The artifact's input signature is fixed — files
    # for every exported modality must be supplied.
    exported: str = ""
    audio: str = ""     # file or directory of .wav/.pt
    text: str = ""      # file or directory of .npy
    batch_size: int = 8
    quantize: str = ""  # '' or 'int8' (weight-only serving quantization)


def _gather(path, exts):
    if not path:
        return []
    if os.path.isdir(path):
        return sorted(os.path.join(path, f) for f in os.listdir(path)
                      if os.path.splitext(f)[1] in exts)
    return [path]


def _load_audio(path, target_rate, target_len):
    from ..data.files import _load_pt, _load_wav
    from ..data.transforms import pad_audio

    if path.endswith(".wav"):
        x = _load_wav(path, target_rate)
    else:
        x = _load_pt(path).reshape(-1)
    return pad_audio(target_len)(x)


def main(argv=None):
    import jax

    from ..serve import Predictor
    from ..data.transforms import pad_text
    from .common import apply_runtime_config

    cfg = parse_config(PredictConfig, argv)
    apply_runtime_config(cfg)  # --compilation_cache_dir

    exported = None
    audio_len, text_tokens = cfg.audio_samples, cfg.text_tokens
    if getattr(cfg, "exported", ""):
        from ..io.export import ExportedPredictor

        if cfg.path_to_checkpoint or cfg.quantize:
            raise SystemExit(
                "--exported conflicts with --path_to_checkpoint/--quantize:"
                " the artifact's weights (and any int8 quantization) were "
                "baked in at export time — re-export to change them")
        exported = ExportedPredictor(cfg.exported)
        # pad/truncate to the artifact's compiled clip shapes, not the flags
        audio_len = exported.clip_shapes.get("audio", (audio_len,))[0]
        text_tokens = exported.clip_shapes.get("text", (text_tokens,))[0]

    audio_files = _gather(cfg.audio, {".wav", ".pt"})
    text_files = _gather(cfg.text, {".npy"})
    n = max(len(audio_files), len(text_files))
    if n == 0:
        raise SystemExit("nothing to score: pass --audio and/or --text")
    if audio_files and text_files and len(audio_files) != len(text_files):
        raise SystemExit(
            f"--audio has {len(audio_files)} files but --text has "
            f"{len(text_files)}; paired scoring needs matching counts "
            "(score one modality at a time otherwise)")

    request = {}
    if audio_files:
        request["audio"] = np.stack([
            _load_audio(p, 16000, audio_len) for p in audio_files])
    if text_files:
        request["text"] = np.stack([
            pad_text(text_tokens)(np.load(p).astype(np.float32))
            for p in text_files])

    if exported is not None:
        if sorted(request) != exported.modalities:
            raise SystemExit(
                f"artifact {cfg.exported!r} has the fixed input signature "
                f"{exported.modalities} (jax.export compiles one input "
                f"tree); got files for {sorted(request)} — supply every "
                "exported modality, or export a single-modality artifact")
        predictor = exported
    else:
        model = build_model(cfg, tuple(cfg.modalities.split(",")))
        # init variables via one example; restore checkpoint if given
        example = {k: v[:1] for k, v in request.items()}
        variables = model.init(
            jax.random.PRNGKey(0),
            {k: {"data": v, "present": np.ones((1,), np.float32)}
             for k, v in example.items()})
        if cfg.path_to_checkpoint:
            from ..io import checkpoint as ckpt_io

            # template-free inference restore: serves the EMA shadow when
            # the run tracked one, and is independent of the training
            # optimizer's state structure (schedules, accumulation, ...)
            variables, _ = ckpt_io.restore_variables(cfg.path_to_checkpoint)

        predictor = Predictor(model, variables,
                              batch_size=min(cfg.batch_size, max(n, 1)),
                              compute_dtype=getattr(cfg, "compute_dtype",
                                                    None),
                              quantize=cfg.quantize or None)
    names = [os.path.basename(p) for p in (audio_files or text_files)]
    for start in range(0, n, predictor.batch_size):
        chunk = {k: v[start:start + predictor.batch_size]
                 for k, v in request.items()}
        probs = predictor.predict(chunk)
        for i in range(next(iter(chunk.values())).shape[0]):
            row = {"clip": names[start + i]}
            for head, p in probs.items():
                row[f"{head}_prob_aggr"] = round(float(p[i, 1]), 4)
            print(json.dumps(row, ensure_ascii=False))


if __name__ == "__main__":
    main()
