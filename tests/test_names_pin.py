"""--train_names/--test_names: the reference's train_names.txt order pin
(extract_video_features.py:31-42, extract_audio_features.py:33-44) is
reachable from every flat filename-labeled CLI, fixing a split's membership
AND iteration order instead of the framework's sorted-listing default
(DIVERGENCES.md)."""

import os

import numpy as np
import pytest


def _write_npys(root, names, shape=(5, 8)):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    for n in names:
        np.save(os.path.join(root, n),
                rng.standard_normal(shape).astype(np.float32))


def test_read_names_file_drops_blanks_keeps_order(tmp_path):
    """Names are byte-verbatim (the reference reads with
    fd.read().split('\\n') — extract_video_features.py:31-33 — so a name
    with genuine surrounding spaces must survive); only blank lines and
    Windows \\r line endings are dropped."""
    from multimodalaggressionrecognition_tpu.data.files import read_names_file

    p = tmp_path / "train_names.txt"
    p.write_text("b_AGGR.npy\r\n\n  a_NOAGGR.npy  \nc_AGGR.npy\n\n",
                 encoding="utf-8")
    assert read_names_file(str(p)) == ["b_AGGR.npy", "  a_NOAGGR.npy  ",
                                       "c_AGGR.npy"]


def test_pinned_source_order_and_missing_name(tmp_path):
    from multimodalaggressionrecognition_tpu.data.files import FilenameLabelSource

    names = ["a_NOAGGR.npy", "b_AGGR.npy", "c_AGGR.npy"]
    _write_npys(str(tmp_path), names)
    pinned = ["c_AGGR.npy", "a_NOAGGR.npy"]  # subset, non-sorted order
    src = FilenameLabelSource(str(tmp_path), "text", files=pinned)
    assert src.files == pinned
    assert list(src.labels()) == [1, 0]
    with pytest.raises(FileNotFoundError):
        FilenameLabelSource(str(tmp_path), "text", files=["nope_AGGR.npy"])


def test_pinned_source_rejects_unsupported_extension(tmp_path):
    """A names file listing pre-conversion artifacts (.mp4) must fail at
    construction, not mid-epoch in load() (ADVICE r4)."""
    from multimodalaggressionrecognition_tpu.data.files import FilenameLabelSource

    _write_npys(str(tmp_path), ["a_NOAGGR.npy"])
    (tmp_path / "b_AGGR.mp4").write_bytes(b"\x00")
    with pytest.raises(ValueError, match="unsupported extension"):
        FilenameLabelSource(str(tmp_path), "video",
                            files=["a_NOAGGR.npy", "b_AGGR.mp4"])


def test_pinned_source_set_root_revalidates(tmp_path):
    """Per-epoch dir repointing (train_video_rnn --epoch_dirs) re-checks the
    pin against the NEW dir so a missing name fails at the epoch boundary,
    not mid-batch (ADVICE r4); an unpinned source repoints freely."""
    from multimodalaggressionrecognition_tpu.data.files import FilenameLabelSource

    names = ["a_NOAGGR.npy", "b_AGGR.npy"]
    _write_npys(str(tmp_path / "ep0"), names)
    _write_npys(str(tmp_path / "ep1"), names[:1])  # b_AGGR missing

    src = FilenameLabelSource(str(tmp_path / "ep0"), "video", files=names)
    with pytest.raises(FileNotFoundError):
        src.set_root(str(tmp_path / "ep1"))
    assert src.root == str(tmp_path / "ep0")  # unchanged on failure

    free = FilenameLabelSource(str(tmp_path / "ep0"), "video")
    free.set_root(str(tmp_path / "ep1"))
    assert free.root == str(tmp_path / "ep1")


def test_text_cli_loaders_honor_names_pin(tmp_path):
    """The --train_names flag reaches FilenameLabelSource through argparse;
    the unpinned split keeps the sorted-listing default."""
    from multimodalaggressionrecognition_tpu.cli.train_text_transformer import (
        TextConfig, make_loaders)
    from multimodalaggressionrecognition_tpu.cli.common import parse_config

    train_names = ["d_AGGR.npy", "c_NOAGGR.npy", "b_AGGR.npy", "a_NOAGGR.npy"]
    test_names = ["t0_NOAGGR.npy", "t1_AGGR.npy"]
    _write_npys(str(tmp_path / "flat" / "train"), train_names)
    _write_npys(str(tmp_path / "flat" / "test"), test_names)
    pin = tmp_path / "train_names.txt"
    pinned = ["c_NOAGGR.npy", "a_NOAGGR.npy", "d_AGGR.npy"]
    pin.write_text("\n".join(pinned) + "\n", encoding="utf-8")

    cfg = parse_config(TextConfig, [
        "--files_root", str(tmp_path / "flat"),
        "--train_names", str(pin), "--batch_size", "2"])
    train_loader, test_loader = make_loaders(cfg)
    assert train_loader.source.files == pinned
    assert test_loader.source.files == sorted(test_names)


@pytest.mark.slow
def test_extract_features_names_pin(tmp_path):
    """extract_features honors the pin end-to-end: only the pinned train
    clips are extracted (reference extract_video_features.py:31-42)."""
    from multimodalaggressionrecognition_tpu.cli import extract_features
    from multimodalaggressionrecognition_tpu.cli.train_video_transformer import (
        _make_synthetic_videos)

    vids = str(tmp_path / "vids")
    _make_synthetic_videos(vids, n_train=4, n_test=2, frames=8, hw=32)
    all_train = sorted(os.listdir(os.path.join(vids, "train")))
    pinned = [all_train[2], all_train[0]]
    pin = tmp_path / "train_names.txt"
    pin.write_text("\n".join(pinned), encoding="utf-8")

    feats = str(tmp_path / "feats")
    extract_features.main([
        "--files_root", vids, "--out_root", feats, "--backbone", "r3d18",
        "--frame_num", "8", "--window", "4", "--batch_size", "2",
        "--train_names", str(pin)])
    got = sorted(os.listdir(os.path.join(feats, "train", "0")))
    want = sorted(os.path.splitext(n)[0] + ".npy" for n in pinned)
    assert got == want
    # the unpinned test split still extracts everything
    assert len(os.listdir(os.path.join(feats, "test"))) == 2
