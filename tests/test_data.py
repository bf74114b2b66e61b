"""Data layer: synthetic AVABOS tree, EMPTY protocol, homogeneous batches."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from multimodalaggressionrecognition_tpu.data import (
    AGGR_PRESENCE, AggrBatchSampler, MultimodalSource, clip_name,
    generate_synthetic_avabos, load_cluster_split, split_by_clusters)
from multimodalaggressionrecognition_tpu.data.pipeline import BatchLoader
from multimodalaggressionrecognition_tpu.data.transforms import (
    pad_audio, pad_text, pad_video)


@pytest.fixture(scope="module")
def avabos(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("avabos"))
    df, split = generate_synthetic_avabos(root, num_clusters=3,
                                          samples_per_cluster=8, seed=1)
    return root, df, split


def _source(root, df, modalities=("audio", "text", "video")):
    return MultimodalSource(
        df, root, modalities,
        transforms={"text": pad_text(48), "audio": pad_audio(48000),
                    "video": pad_video(32)})


def test_artifact_tree_and_split(avabos):
    root, df, split = avabos
    assert os.path.exists(os.path.join(root, "time_intervals.csv"))
    loaded = load_cluster_split(os.path.join(root, "train_test_split.json"))
    assert set(loaded) == {"train", "test"}
    train_df = split_by_clusters(df, loaded["train"])
    test_df = split_by_clusters(df, loaded["test"])
    assert len(train_df) + len(test_df) == len(df)
    assert set(train_df["cluster_id"]).isdisjoint(set(test_df["cluster_id"]))


def test_presence_follows_aggr_type(avabos):
    root, df, _ = avabos
    src = _source(root, df)
    for i in range(len(src)):
        data, present, labels, label_mask = src.load_sample(i)
        aggr = df.iloc[i]["aggr_type"]
        expected = set(AGGR_PRESENCE[aggr])
        got = {m for m, p in present.items() if p == 1.0}
        assert got == expected
        if "video" in expected:
            assert labels["phys"] in (0, 1) and label_mask["phys"] == 1.0
        else:
            assert labels["phys"] == -1 and label_mask["phys"] == 0.0


def test_fixed_shapes(avabos):
    root, df, _ = avabos
    src = _source(root, df)
    for i in range(len(src)):
        data, present, _, _ = src.load_sample(i)
        if data["text"] is not None:
            assert data["text"].shape == (48, 768)
        if data["audio"] is not None:
            assert data["audio"].shape == (48000,)
        if data["video"] is not None:
            assert data["video"].shape == (32, 64, 64, 3)


def test_sampler_homogeneous_batches(avabos):
    root, df, _ = avabos
    sampler = AggrBatchSampler(df["aggr_type"].to_numpy(), batch_size=4,
                               shuffle=True, seed=0)
    all_idx = []
    for batch in sampler:
        types = df.iloc[batch]["aggr_type"].unique()
        assert len(types) == 1
        all_idx.extend(batch)
    assert sorted(all_idx) == list(range(len(df)))
    # epoch advance reshuffles deterministically
    second = [b for b in sampler]
    assert sorted(x for b in second for x in b) == list(range(len(df)))


def test_build_batch_padding(avabos):
    root, df, _ = avabos
    src = _source(root, df)
    verb_idx = df.index[df["aggr_type"] == "verb"].tolist()[:3]
    batch = src.build_batch(verb_idx, pad_to=4)
    assert batch["sample_mask"].tolist() == [1, 1, 1, 0]
    assert "video" not in batch["modalities"]  # EMPTY for verb batches
    assert batch["modalities"]["audio"]["data"].shape[0] == 4
    assert batch["modalities"]["audio"]["present"].tolist() == [1, 1, 1, 0]
    assert set(batch["labels"]) == {"verb"}
    assert batch["label_mask"]["verb"].tolist() == [1, 1, 1, 0]


def test_batch_loader(avabos):
    root, df, _ = avabos
    src = _source(root, df)
    sampler = AggrBatchSampler(df["aggr_type"].to_numpy(), 4, shuffle=False)
    loader = BatchLoader(src, sampler, pad_to=4)
    batches = list(loader)
    assert len(batches) == len(sampler)
    total = sum(int(b["sample_mask"].sum()) for b in batches)
    assert total == len(df)
