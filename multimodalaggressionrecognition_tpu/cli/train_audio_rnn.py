"""Audio RNN multi-head training (reference train_audio_rnn.py equivalent).

16 kHz waveforms -> frozen audio feature extractor (wav2vec-1-style conv
encoder by default; wav2vec2 conv stack or trainable CNN1D optional) ->
three parallel heads {LSTM_1_layer, GRU_1_layer, Avg} trained jointly
(multi-CE), per-head CSV logs and best-UAR checkpoints.

Note: the reference's wav2vec-1 TorchScript artifact is missing upstream
(.MISSING_LARGE_BLOBS); the conv encoder here is the public architecture,
randomly initialized unless a converted checkpoint is loaded.
"""

from dataclasses import dataclass

from .common import (NamesPinConfig, build_trainer, parse_config,
                     pinned_files, resolve_pallas_stem, run_training)


@dataclass
class AudioRnnConfig(NamesPinConfig):
    model_name: str = "audio_rnn"
    files_root: str = ""               # dir with train/ and test/ wav|pt files
    extractor: str = "wav2vec1"        # wav2vec1 | wav2vec2_conv | cnn1d
    hidden_size: int = 512
    audio_seconds: int = 10
    sample_rate: int = 16000
    synthetic_wav: bool = False        # generate a flat synthetic wav tree
    synthetic_files: int = 32          # train wavs in the fixture (test n/4)
    # class-coded tones instead of DC-shifted noise: a +/-DC shift is
    # sign-symmetric, so it vanishes under a magnitude spectrogram and is
    # normalized away by wav2vec group norms — tones keep the classes
    # separable through BOTH audio paths (convergence suite fixture)
    synthetic_tones: bool = False
    # Pallas CNN1D stem kernel: auto (on for TPU) | on | off
    pallas_stem: str = "auto"


def make_model(cfg):
    from ..models.cnn1d import CNN1DExtractor
    from ..models.heads import FeatureSequenceProcessing, MultiHeadModel
    from ..models.wav2vec import ConvFeatureEncoder, Wav2Vec1ConvEncoder
    import flax.linen as nn

    if cfg.extractor == "wav2vec1":
        extractor = Wav2Vec1ConvEncoder()
    elif cfg.extractor == "wav2vec2_conv":
        extractor = ConvFeatureEncoder()
    elif cfg.extractor == "wav2vec2":
        # full wav2vec2 (conv encoder + transformer), last-layer features —
        # the reference's torchaudio-bundle path (train_audio_rnn.py:106-115);
        # load converted weights via io.torch_import.wav2vec2
        from ..models.wav2vec import WAV2VEC2_BASE, Wav2Vec2Model

        extractor = Wav2Vec2Model(WAV2VEC2_BASE)
    elif cfg.extractor == "cnn1d":
        extractor = CNN1DExtractor(
            pallas_stem=resolve_pallas_stem(cfg))
    else:
        raise ValueError(cfg.extractor)

    heads = {
        "LSTM_1_layer": FeatureSequenceProcessing(2, cfg.hidden_size, "lstm"),
        "GRU_1_layer": FeatureSequenceProcessing(2, cfg.hidden_size, "gru"),
        "Avg": FeatureSequenceProcessing(2, 512, "avg"),
    }
    class Adapter(nn.Module):
        inner: nn.Module

        @nn.compact
        def __call__(self, modalities, train: bool = False):
            return self.inner(modalities["audio"]["data"], train=train)

    return Adapter(MultiHeadModel(heads=heads, extractor=extractor,
                                  freeze_extractor=True))


def make_loaders(cfg):
    import os

    from ..data.files import FilenameLabelSource, RandomBatchSampler
    from ..data.pipeline import BatchLoader
    from ..data.transforms import pad_audio

    target = cfg.sample_rate * cfg.audio_seconds
    if cfg.synthetic_wav and not os.path.isdir(os.path.join(cfg.files_root, "train")):
        n = int(getattr(cfg, "synthetic_files", 32))
        _make_synthetic_wavs(cfg.files_root, cfg.sample_rate,
                             n_train=n, n_test=max(2, n // 4),
                             tones=getattr(cfg, "synthetic_tones", False))
    loaders = []
    heads = ("LSTM_1_layer", "GRU_1_layer", "Avg")
    for sub, shuffle in (("train", True), ("test", False)):
        src = FilenameLabelSource(os.path.join(cfg.files_root, sub), "audio",
                                  transform=pad_audio(target),
                                  target_rate=cfg.sample_rate, heads=heads,
                                  files=pinned_files(cfg, sub))
        sampler = RandomBatchSampler(len(src), cfg.batch_size, shuffle, cfg.seed)
        loaders.append(BatchLoader(src, sampler, pad_to=cfg.batch_size,
                                   num_threads=cfg.num_threads))
    return loaders


def _make_synthetic_wavs(root, rate, n_train=32, n_test=8, seed=0,
                         tones=False):
    import os

    import numpy as np
    from scipy.io import wavfile

    rng = np.random.default_rng(seed)
    t = np.arange(rate * 2, dtype=np.float32) / rate
    for sub, n in (("train", n_train), ("test", n_test)):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
        for i in range(n):
            label = "AGGR" if i % 2 else "NOAGGR"
            if tones:
                # class-coded carrier frequency (AGGR high, NOAGGR low):
                # separable in magnitude spectrograms AND after the
                # mean-removing norms inside wav2vec-style encoders
                freq = 3000.0 if label == "AGGR" else 440.0
                phase = rng.uniform(0, 2 * np.pi)
                wav = (0.4 * np.sin(2 * np.pi * freq * t + phase)
                       + rng.standard_normal(rate * 2).astype(np.float32) * 0.05)
            else:
                shift = 0.02 if label == "AGGR" else -0.02
                wav = (rng.standard_normal(rate * 2).astype(np.float32) * 0.1
                       + shift)
            wavfile.write(os.path.join(root, sub, f"clip{i}_{label}.wav"),
                          rate, (wav * 32767).astype(np.int16))


def main(argv=None):
    from ..train import LossSpec

    cfg = parse_config(AudioRnnConfig, argv)
    train_loader, test_loader = make_loaders(cfg)
    specs = {name: LossSpec("ce")
             for name in ("LSTM_1_layer", "GRU_1_layer", "Avg")}
    trainer = build_trainer(cfg, make_model(cfg), specs, train_loader,
                            test_loader)
    run_training(cfg, trainer, train_loader)
    return trainer



def export_spec(cfg):
    """Per-modality clip shapes for AOT export (cli/export_model.py)."""
    return {"audio": (cfg.sample_rate * cfg.audio_seconds,)}

if __name__ == "__main__":
    main()
