"""End-to-end training: synthetic data -> jit'd steps -> CSV logs -> resume.

Integration equivalents of the reference entry scripts (SURVEY.md §2.5), run
2 epochs on the virtual 8-device CPU backend with data-parallel sharding.
"""

import glob
import os

import jax
import numpy as np
import optax
import pytest

from multimodalaggressionrecognition_tpu.data import (
    AggrBatchSampler, MultimodalSource, generate_synthetic_avabos,
    load_cluster_split, split_by_clusters)
from multimodalaggressionrecognition_tpu.data.pipeline import BatchLoader
from multimodalaggressionrecognition_tpu.data.transforms import pad_audio, pad_text
from multimodalaggressionrecognition_tpu.models.cnn1d import AudioCnn1DExtractorWrapper
from multimodalaggressionrecognition_tpu.models.fusion import (
    EqualSizedTransformerModalitiesFusion)
from multimodalaggressionrecognition_tpu.models.heads import TransformerSequenceClassifier
from multimodalaggressionrecognition_tpu.models.physverb import (
    IdentityExtractor, PhysVerbClassifierConcatFeatures, PhysVerbModel)
from multimodalaggressionrecognition_tpu.parallel import data_sharding, make_mesh
from multimodalaggressionrecognition_tpu.train import (
    LossSpec, SingleHeadAdapter, Trainer)

pytestmark = pytest.mark.slow  # full training-loop e2e runs


@pytest.fixture(scope="module")
def avabos(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("avabos_e2e"))
    df, split = generate_synthetic_avabos(root, num_clusters=3,
                                          samples_per_cluster=16, seed=2)
    return root, df, split


def _loaders(root, df, split, modalities, batch=8):
    train_df = split_by_clusters(df, split["train"])
    test_df = split_by_clusters(df, split["test"])
    transforms = {"text": pad_text(48), "audio": pad_audio(48000)}
    loaders = []
    for d, shuffle in ((train_df, True), (test_df, False)):
        if modalities != ("text",):
            d = d.reset_index(drop=True)
        src = MultimodalSource(d, root, modalities, transforms=transforms)
        sampler = AggrBatchSampler(d["aggr_type"].to_numpy(), batch,
                                   shuffle=shuffle, seed=0)
        loaders.append(BatchLoader(src, sampler, pad_to=batch, num_threads=2))
    return loaders


def test_text_transformer_e2e(avabos, tmp_path):
    """The minimum end-to-end slice (SURVEY.md §7 step 2)."""
    root, df, split = avabos
    text_df = df[df["aggr_type"].isin(["verb", "phys&verb"])]
    train_loader, test_loader = _loaders(root, text_df, split, ("text",))
    model = SingleHeadAdapter(
        inner=TransformerSequenceClassifier(class_num=2, hidden_size=768,
                                            num_layers=1, num_heads=8),
        modality="text", head="verb")
    mesh = make_mesh()
    trainer = Trainer(
        model, {"verb": LossSpec("ce")}, optax.adam(1e-4),
        train_loader, test_loader, num_classes=2,
        saving_dir=str(tmp_path), model_name="text_transformer",
        sharding=data_sharding(mesh), log_console=False)
    trainer.fit(2)

    logs = glob.glob(os.path.join(trainer.run_dir, "*_log.csv"))
    assert any("verb_train_log.csv" in p for p in logs)
    assert any("verb_test_log.csv" in p for p in logs)
    import pandas as pd
    log = pd.read_csv(os.path.join(trainer.run_dir, "verb_train_log.csv"))
    assert len(log) == 2 and {"loss", "accuracy", "UAR"} <= set(log.columns)
    # synthetic data is separable: loss must drop
    assert log["loss"].iloc[-1] < log["loss"].iloc[0]
    assert os.path.isdir(os.path.join(trainer.run_dir, "checkpoint_current"))


def test_checkpoint_resume_roundtrip(avabos, tmp_path):
    root, df, split = avabos
    text_df = df[df["aggr_type"].isin(["verb", "phys&verb"])]
    train_loader, test_loader = _loaders(root, text_df, split, ("text",))

    def make_trainer(run_dir=None):
        model = SingleHeadAdapter(
            inner=TransformerSequenceClassifier(class_num=2, hidden_size=768,
                                                num_layers=1, num_heads=8),
            modality="text", head="verb")
        return Trainer(model, {"verb": LossSpec("ce")}, optax.adam(1e-4),
                       train_loader, test_loader, num_classes=2,
                       saving_dir=str(tmp_path), model_name="resume_test",
                       log_console=False, run_dir=run_dir)

    t1 = make_trainer()
    t1.fit(1)
    step_after_1 = int(t1.state.step)

    t2 = make_trainer(run_dir=t1.run_dir + "_resumed")
    first_batch = next(iter(train_loader))
    t2.init_state(first_batch)
    meta = t2.load_checkpoint(os.path.join(t1.run_dir, "checkpoint_current"))
    assert t2.start_epoch == 1
    assert int(t2.state.step) == step_after_1
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(t2.state.params)[0]),
        np.asarray(jax.tree.leaves(t1.state.params)[0]))


def test_exact_resume_matches_uninterrupted(avabos, tmp_path):
    """Resume determinism (SURVEY.md §5.3/§5.4): epoch-keyed RNG streams +
    sampler.set_epoch make {1 epoch, crash, resume to 3} bit-identical to an
    uninterrupted 3-epoch run — same batch order, same dropout draws."""
    root, df, split = avabos
    text_df = df[df["aggr_type"].isin(["verb", "phys&verb"])]

    def make_trainer(run_dir):
        train_loader, test_loader = _loaders(root, text_df, split, ("text",))
        model = SingleHeadAdapter(
            inner=TransformerSequenceClassifier(class_num=2, hidden_size=768,
                                                num_layers=1, num_heads=8),
            modality="text", head="verb")
        return Trainer(model, {"verb": LossSpec("ce")}, optax.adam(1e-4),
                       train_loader, test_loader, num_classes=2,
                       saving_dir=str(tmp_path), model_name="exact_resume",
                       log_console=False, run_dir=str(tmp_path / run_dir))

    straight = make_trainer("straight").fit(3)

    make_trainer("interrupted").fit(1)
    resumed = make_trainer("interrupted")  # fresh process equivalent
    assert resumed.resume_latest() is not None
    assert resumed.start_epoch == 1
    resumed.fit(3)

    for a, b in zip(jax.tree.leaves(straight.state.params),
                    jax.tree.leaves(resumed.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multimodal_physverb_e2e(avabos, tmp_path):
    """Full multimodal path: audio CNN1D tower + identity text + video stub,
    fusion transformer, per-aggr-type focal/CE heads, EMPTY batches."""
    root, df, split = avabos
    train_loader, test_loader = _loaders(root, df, split, ("audio", "text"),
                                         batch=8)
    model = PhysVerbModel(
        extractors={"audio": AudioCnn1DExtractorWrapper(hidden_size=768),
                    "text": IdentityExtractor()},
        fusion=EqualSizedTransformerModalitiesFusion(1, 768, 8),
        classifier=PhysVerbClassifierConcatFeatures(
            class_num=2,
            adaptor_sizes={"audio": (768, 256), "text": (768, 256)}),
        feature_shapes={},
        modalities=("audio", "text"),
    )
    trainer = Trainer(
        model,
        {"phys": LossSpec("focal", class_weights=(0.5, 0.5), gamma=2.0),
         "verb": LossSpec("ce")},
        optax.adam(1e-4), train_loader, test_loader, num_classes=2,
        saving_dir=str(tmp_path), model_name="multimodal", log_console=False)
    trainer.fit(2)
    import pandas as pd
    log = pd.read_csv(os.path.join(trainer.run_dir, "verb_train_log.csv"))
    assert len(log) == 2
    assert np.isfinite(log["loss"]).all()
    # best checkpoints saved per head present in the data
    bests = glob.glob(os.path.join(trainer.run_dir, "checkpoint_best_*"))
    assert bests
