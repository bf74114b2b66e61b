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


def test_batch_is_empty_matches_build_batch(avabos):
    """batch_is_empty (table-only, no decode) must agree exactly with
    build_batch returning None — it drives resume's decode-free skip
    (BatchLoader.iter_skipping).  Restricting the source to video-only
    makes every verb-type batch all-EMPTY."""
    root, df, _ = avabos
    src = _source(root, df, modalities=("video",))
    sampler = AggrBatchSampler(df["aggr_type"].to_numpy(), 4, shuffle=False)
    seen_empty = seen_full = False
    for idx in sampler:
        empty = src.batch_is_empty(idx)
        assert empty == (src.build_batch(idx, pad_to=4) is None)
        seen_empty |= empty
        seen_full |= not empty
    assert seen_empty and seen_full  # both branches exercised


def test_batchloader_iter_skipping_skips_builds():
    """Mid-epoch resume advances the batch stream WITHOUT building the
    skipped prefix: build_batch runs only for the remainder, all-EMPTY
    batches (never yielded) don't count toward the skip, and the yielded
    suffix equals the full iteration's suffix."""

    class Source:
        def __init__(self):
            self.built = []

        def batch_is_empty(self, idx):
            return idx[0] == 2  # the sampler batch starting at 2 is EMPTY

        def build_batch(self, idx, pad_to=None):
            self.built.append(tuple(idx))
            if self.batch_is_empty(idx):
                return None
            return {"i": np.asarray(idx)}

    sampler = [[0], [1], [2], [3], [4]]
    full_src = Source()
    full = list(BatchLoader(full_src, sampler, num_threads=1))
    assert [int(b["i"][0]) for b in full] == [0, 1, 3, 4]

    src = Source()
    got = list(BatchLoader(src, sampler, num_threads=1).iter_skipping(3))
    assert [int(b["i"][0]) for b in got] == [4]  # skipped 0, 1, 3
    assert src.built == [(4,)]  # the skipped prefix was never decoded

    # threaded path takes the same route; the EMPTY batch now sits in the
    # REMAINDER, so it is built (and filtered) exactly as in normal
    # iteration — only the skipped prefix avoids decode
    src2 = Source()
    got2 = list(BatchLoader(src2, sampler, num_threads=4).iter_skipping(2))
    assert [int(b["i"][0]) for b in got2] == [3, 4]
    # append order across pool workers is nondeterministic; compare as a set
    assert sorted(src2.built) == [(2,), (3,), (4,)]

    with pytest.raises(ValueError, match="cannot skip"):
        list(BatchLoader(Source(), sampler, num_threads=1).iter_skipping(5))


def test_pair_source_batch_is_empty_contract(avabos):
    """train_audio_text's PairSource drops a batch when EITHER audio or
    text is absent (stricter than MultimodalSource); its batch_is_empty
    override must agree with build_batch returning None — resume's
    decode-free skip counts on that equivalence."""
    from types import SimpleNamespace

    from multimodalaggressionrecognition_tpu.cli.train_audio_text import (
        make_loaders)

    root, df, _ = avabos
    cfg = SimpleNamespace(dataset_root=root, synthetic=False,
                          audio_samples=48000, text_tokens=48, batch_size=4,
                          seed=0, num_threads=0)
    train_loader, _ = make_loaders(cfg)
    src = train_loader.source
    for idx in train_loader.sampler:
        assert src.batch_is_empty(idx) == (src.build_batch(idx) is None)

    # audio and text always co-occur in AGGR_PRESENCE, so the asymmetric
    # case (one of the pair present, the other not) needs a different
    # modality selection: with ("audio", "video") a 'verb' batch carries
    # audio but can never carry text — the base class would call it
    # non-empty, PairSource must call it empty (build_batch returns None)
    asym = type(src)(df, root, ("audio", "video"),
                     transforms=src.transforms)
    verb_idx = df.index[df["aggr_type"] == "verb"].tolist()[:2]
    assert MultimodalSource.batch_is_empty(asym, verb_idx) is False
    assert asym.build_batch(verb_idx) is None
    assert asym.batch_is_empty(verb_idx)
