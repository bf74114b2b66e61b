"""Audio spectrogram / transformer training (reference train_audio_transformer.py).

Default (the reference's live path): waveform -> on-device power spectrogram
(n_fft=512) with train-time frequency/time masking -> 3-channel stack ->
VGG11-BN classifier.  `--arch transformer` selects the commented-out
reference alternative: wav2vec conv features -> transformer encoder head.
The spectrogram runs inside the jitted model, so decode->STFT->VGG is one
fused XLA program per step.
"""

from dataclasses import dataclass

from .common import (NamesPinConfig, build_trainer, parse_config,
                     pinned_files, run_training)


@dataclass
class AudioTransformerConfig(NamesPinConfig):
    model_name: str = "audio_vgg"
    files_root: str = ""
    arch: str = "vgg"              # vgg | transformer
    audio_seconds: int = 5
    sample_rate: int = 16000
    n_fft: int = 512
    freq_mask: int = 80
    time_mask: int = 80
    hidden_size: int = 512
    synthetic_wav: bool = False
    synthetic_files: int = 32          # train wavs in the fixture (test n/4)
    synthetic_tones: bool = False      # class-coded tones (see train_audio_rnn)


def make_model(cfg):
    import flax.linen as nn
    import jax.numpy as jnp

    from ..ops.stft import freq_mask, spectrogram, time_mask

    if cfg.arch == "vgg":
        from ..models.vgg import VGG11BN

        class SpectrogramVGG(nn.Module):
            @nn.compact
            def __call__(self, modalities, train: bool = False):
                wav = modalities["audio"]["data"]
                spec = spectrogram(wav, n_fft=cfg.n_fft)  # (B, F, T)
                if train:
                    rng = self.make_rng("dropout")
                    import jax

                    k1, k2 = jax.random.split(rng)
                    spec = freq_mask(k1, spec, cfg.freq_mask)
                    spec = time_mask(k2, spec, cfg.time_mask)
                img = jnp.repeat(spec[..., None], 3, axis=-1)  # (B, F, T, 3)
                logits = VGG11BN(class_num=2, name="vgg")(img, train=train)
                return {"main": logits}

        return SpectrogramVGG()

    from ..models.heads import TransformerSequenceClassifier
    from ..models.wav2vec import Wav2Vec1ConvEncoder

    class W2VTransformer(nn.Module):
        @nn.compact
        def __call__(self, modalities, train: bool = False):
            import jax

            feats = Wav2Vec1ConvEncoder(name="extractor")(
                modalities["audio"]["data"])
            feats = jax.lax.stop_gradient(feats)
            logits = TransformerSequenceClassifier(
                class_num=2, hidden_size=cfg.hidden_size, num_layers=2,
                num_heads=8, name="head")(feats, train=train)
            return {"main": logits}

    return W2VTransformer()


def make_loaders(cfg):
    import os

    from ..data.files import FilenameLabelSource, RandomBatchSampler
    from ..data.pipeline import BatchLoader
    from ..data.transforms import pad_audio

    if cfg.synthetic_wav and not os.path.isdir(os.path.join(cfg.files_root, "train")):
        from .train_audio_rnn import _make_synthetic_wavs

        n = int(getattr(cfg, "synthetic_files", 32))
        _make_synthetic_wavs(cfg.files_root, cfg.sample_rate,
                             n_train=n, n_test=max(2, n // 4),
                             tones=getattr(cfg, "synthetic_tones", False))
    target = cfg.sample_rate * cfg.audio_seconds
    loaders = []
    for sub, shuffle in (("train", True), ("test", False)):
        src = FilenameLabelSource(os.path.join(cfg.files_root, sub), "audio",
                                  transform=pad_audio(target),
                                  target_rate=cfg.sample_rate,
                                  files=pinned_files(cfg, sub))
        sampler = RandomBatchSampler(len(src), cfg.batch_size, shuffle, cfg.seed)
        loaders.append(BatchLoader(src, sampler, pad_to=cfg.batch_size,
                                   num_threads=cfg.num_threads))
    return loaders


def main(argv=None):
    from ..train import LossSpec

    cfg = parse_config(AudioTransformerConfig, argv)
    train_loader, test_loader = make_loaders(cfg)
    trainer = build_trainer(cfg, make_model(cfg), {"main": LossSpec("ce")},
                            train_loader, test_loader)
    run_training(cfg, trainer, train_loader)
    return trainer



def export_spec(cfg):
    """Per-modality clip shapes for AOT export (cli/export_model.py)."""
    return {"audio": (cfg.sample_rate * cfg.audio_seconds,)}

if __name__ == "__main__":
    main()
