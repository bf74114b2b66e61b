"""Text transformer training (reference train_text_transformer.py equivalent).

RuBERT token-embedding .npy sequences (pad 48x768) -> 2-layer transformer
encoder -> mean-pool classifier -> CE, best-UAR checkpointing.  Reads either
a flat directory of `*_LABEL.npy` files (`--files_root`) or the intervals
table (verb-labeled rows), like the reference's PtTextDataset path.
"""

from dataclasses import dataclass

from .common import (NamesPinConfig, build_trainer, ensure_dataset,
                     parse_config, pinned_files, run_training)


@dataclass
class TextConfig(NamesPinConfig):
    model_name: str = "ConversationalRuBERT"
    files_root: str = ""               # optional flat-directory mode
    hidden_size: int = 768
    num_layers: int = 2
    num_heads: int = 8
    text_tokens: int = 48


def make_model(cfg):
    from ..models.heads import TransformerSequenceClassifier
    from ..train import SingleHeadAdapter

    return SingleHeadAdapter(
        inner=TransformerSequenceClassifier(
            class_num=2, hidden_size=cfg.hidden_size,
            num_layers=cfg.num_layers, num_heads=cfg.num_heads),
        modality="text", head="main")


def make_loaders(cfg):
    from ..data.pipeline import BatchLoader
    from ..data.transforms import pad_text

    if cfg.files_root:
        import os

        from ..data.files import FilenameLabelSource, RandomBatchSampler

        loaders = []
        for sub, shuffle in (("train", True), ("test", False)):
            root = os.path.join(cfg.files_root, sub)
            src = FilenameLabelSource(root, "text", transform=pad_text(cfg.text_tokens),
                                      files=pinned_files(cfg, sub))
            sampler = RandomBatchSampler(len(src), cfg.batch_size, shuffle, cfg.seed)
            loaders.append(BatchLoader(src, sampler, pad_to=cfg.batch_size,
                                       num_threads=cfg.num_threads))
        return loaders

    from ..data import AggrBatchSampler, MultimodalSource, split_by_clusters

    df, split = ensure_dataset(cfg)
    df = df[df["aggr_type"].isin(["verb", "phys&verb"])]
    loaders = []
    for clusters, shuffle in ((split["train"], True), (split["test"], False)):
        d = split_by_clusters(df, clusters)

        class TextOnlySource(MultimodalSource):
            def build_batch(self, indices, pad_to=None):
                b = super().build_batch(indices, pad_to)
                if b is None:
                    return None
                b["labels"] = {"main": b["labels"]["verb"]}
                b["label_mask"] = {"main": b["label_mask"]["verb"]}
                return b

        src = TextOnlySource(d, cfg.dataset_root, ("text",),
                             transforms={"text": pad_text(cfg.text_tokens)})
        sampler = AggrBatchSampler(d["aggr_type"].to_numpy(), cfg.batch_size,
                                   shuffle=shuffle, seed=cfg.seed)
        loaders.append(BatchLoader(src, sampler, pad_to=cfg.batch_size,
                                   num_threads=cfg.num_threads))
    return loaders


def main(argv=None):
    from ..train import LossSpec

    cfg = parse_config(TextConfig, argv)
    train_loader, test_loader = make_loaders(cfg)
    trainer = build_trainer(cfg, make_model(cfg), {"main": LossSpec("ce")},
                            train_loader, test_loader)
    run_training(cfg, trainer, train_loader)
    return trainer



def export_spec(cfg):
    """Per-modality clip shapes for AOT export (cli/export_model.py)."""
    return {"text": (cfg.text_tokens, cfg.hidden_size)}

if __name__ == "__main__":
    main()
