"""Audio+text two-tower training (reference train_audio_text.py).

Paired waveform .pt + RuBERT embedding .npy rows of the intervals table ->
AudioTextualModel: CNN1D+Linear(512->768) audio tower, 2-layer transformer
text tower, mean-pool + concat + MLP fusion -> CE, best-UAR.  (The committed
reference script called a stale MultimodalDataset API and could not run;
this is the working equivalent of its intent.)
"""

from dataclasses import dataclass

from .common import resolve_pallas_stem, TrainConfig, build_trainer, ensure_dataset, parse_config, run_training


@dataclass
class AudioTextConfig(TrainConfig):
    model_name: str = "audio_text"
    hidden_size: int = 768
    audio_samples: int = 80000
    text_tokens: int = 48
    # Pallas CNN1D stem kernel: auto (on for TPU) | on | off
    pallas_stem: str = "auto"


def make_model(cfg):
    import flax.linen as nn

    from ..models.audiotext import AudioTextualModel
    from ..models.cnn1d import AudioCnn1DExtractorWrapper
    from ..models.heads import TransformerSequenceClassifier

    class TextFeatures(nn.Module):
        hidden: int

        @nn.compact
        def __call__(self, x, train: bool = False):
            return TransformerSequenceClassifier(
                class_num=2, hidden_size=self.hidden, num_layers=2,
                num_heads=8, name="inner")(x, train=train,
                                           return_type="features")

    class Adapter(nn.Module):
        inner: nn.Module

        @nn.compact
        def __call__(self, modalities, train: bool = False):
            return {"main": self.inner(modalities, train=train)}

    return Adapter(AudioTextualModel(
        audio_extractor=AudioCnn1DExtractorWrapper(
            cfg.hidden_size,
            pallas_stem=resolve_pallas_stem(cfg)),
        text_extractor=TextFeatures(cfg.hidden_size),
        hidden_size=cfg.hidden_size, class_num=2))


def make_loaders(cfg):
    from ..data import AggrBatchSampler, MultimodalSource, split_by_clusters
    from ..data.pipeline import BatchLoader
    from ..data.transforms import pad_audio, pad_text

    df, split = ensure_dataset(cfg)
    # rows with both verbal modalities present
    df = df[df["aggr_type"].isin(["verb", "phys&verb"])]

    class PairSource(MultimodalSource):
        def build_batch(self, indices, pad_to=None):
            b = super().build_batch(indices, pad_to)
            if b is None or "audio" not in b["modalities"] \
                    or "text" not in b["modalities"]:
                return None
            b["labels"] = {"main": b["labels"]["verb"]}
            b["label_mask"] = {"main": b["label_mask"]["verb"]}
            return b

        def batch_is_empty(self, indices):
            # Must stay equivalent to build_batch -> None above (resume's
            # decode-free skip counts on it): EITHER modality absent drops
            # the whole batch, not just both.
            from ..data.avabos import AGGR_PRESENCE

            row = self.df.iloc[indices[0]]
            present = (set(AGGR_PRESENCE[row["aggr_type"]])
                       & set(self.modalities))
            return not {"audio", "text"} <= present

    loaders = []
    for clusters, shuffle in ((split["train"], True), (split["test"], False)):
        d = split_by_clusters(df, clusters)
        src = PairSource(d, cfg.dataset_root, ("audio", "text"),
                         transforms={"audio": pad_audio(cfg.audio_samples),
                                     "text": pad_text(cfg.text_tokens)})
        sampler = AggrBatchSampler(d["aggr_type"].to_numpy(), cfg.batch_size,
                                   shuffle=shuffle, seed=cfg.seed)
        loaders.append(BatchLoader(src, sampler, pad_to=cfg.batch_size,
                                   num_threads=cfg.num_threads))
    return loaders


def main(argv=None):
    from ..train import LossSpec

    cfg = parse_config(AudioTextConfig, argv)
    train_loader, test_loader = make_loaders(cfg)
    trainer = build_trainer(cfg, make_model(cfg), {"main": LossSpec("ce")},
                            train_loader, test_loader)
    run_training(cfg, trainer, train_loader)
    return trainer



def export_spec(cfg):
    """Per-modality clip shapes for AOT export (cli/export_model.py)."""
    return {"audio": (cfg.audio_samples,),
            "text": (cfg.text_tokens, cfg.hidden_size)}

if __name__ == "__main__":
    main()
