"""Aux tooling: show_results, generate_features, prepare_data, profiling."""

import os

import numpy as np
import pandas as pd
import pytest


def test_show_results_best_epoch(tmp_path):
    from multimodalaggressionrecognition_tpu.cli.show_results import best_rows

    run = tmp_path / "01.01.2026, 00-00-00 (m)"
    run.mkdir(parents=True)
    pd.DataFrame({
        "epoch": [0, 1, 2], "loss": [1.0, 0.5, 0.6],
        "accuracy": [0.5, 0.7, 0.65], "UAR": [0.5, 0.8, 0.75],
    }).to_csv(run / "verb_test_log.csv", index=False)
    table = best_rows(str(tmp_path))
    assert len(table) == 1
    assert table.iloc[0]["best_epoch"] == 1
    assert table.iloc[0]["UAR"] == pytest.approx(0.8)


@pytest.mark.slow
def test_generate_features(tmp_path):
    from multimodalaggressionrecognition_tpu.cli import generate_features
    from multimodalaggressionrecognition_tpu.data import generate_synthetic_avabos

    root = str(tmp_path / "avabos")
    generate_synthetic_avabos(root, num_clusters=2, samples_per_cluster=4,
                              seed=5, audio_len=24000, video_frames=8,
                              video_hw=32)
    out = str(tmp_path / "fused")
    generate_features.main([
        "--dataset_root", root, "--out_dir", out, "--batch_size", "4",
        "--audio_samples", "24000", "--saving_dir", str(tmp_path / "runs")])
    assert os.path.exists(os.path.join(out, "manifest.csv"))
    manifest = pd.read_csv(os.path.join(out, "manifest.csv"))
    assert len(manifest) > 0
    sample = np.load(os.path.join(out, manifest.iloc[0]["name"] + ".npy"),
                     allow_pickle=True).item()
    assert "audio" in sample and "text" in sample


def test_prepare_data_resample_and_split(tmp_path):
    from scipy.io import wavfile

    from multimodalaggressionrecognition_tpu.cli import prepare_data

    src = tmp_path / "wavs"
    src.mkdir()
    rng = np.random.default_rng(0)
    wavfile.write(str(src / "c-0_a_0_0.0-1.0_AGGR.wav"), 44100,
                  (rng.standard_normal(44100) * 0.1 * 32767).astype(np.int16))
    dst = tmp_path / "pt"
    prepare_data.main(["resample-audio", str(src), str(dst)])
    import torch

    wav = torch.load(dst / "c-0_a_0_0.0-1.0_AGGR.pt", weights_only=False)
    assert wav.shape[0] == 1 and wav.shape[1] == 16000

    # split: artifacts under verbal/ keyed by cluster prefix
    root = tmp_path / "ds"
    (root / "verbal" / "pt_waveform").mkdir(parents=True)
    for c in (0, 1):
        np.save(root / "verbal" / "pt_waveform" / f"c-{c}_x_0_0.0-1.0_AGGR.npy",
                np.zeros(3))
    import json

    split_json = root / "split.json"
    split_json.write_text(json.dumps({"train": [0], "test": [1]}))
    prepare_data.main(["split", str(root), str(split_json)])
    assert (root / "train" / "verbal" / "pt_waveform"
            / "c-0_x_0_0.0-1.0_AGGR.npy").exists()
    assert (root / "test" / "verbal" / "pt_waveform"
            / "c-1_x_0_0.0-1.0_AGGR.npy").exists()


def test_step_timer():
    from multimodalaggressionrecognition_tpu.utils.profiling import StepTimer

    t = StepTimer()
    with t.section("a"):
        pass
    with t.section("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.summary()


def test_doctor_cli(capsys):
    """cli.doctor emits a JSON environment report with the triage fields."""
    import json

    from multimodalaggressionrecognition_tpu.cli import doctor

    doctor.main(["--smoke"])
    report = json.loads(capsys.readouterr().out)
    assert report["backend"] == "cpu"  # conftest pins the test backend
    assert "jax" in report["versions"]
    assert set(report["native"]) >= {"libmarhost_wav_decode",
                                     "libmarvideo_mp4_decode"}
    assert "cached_run_roundtrip_s" in report["smoke"]

def test_prepare_data_make_split_from_combinations_table(tmp_path):
    """The partition-row selection step of the reference ETL
    (reference split_dataset.py:17-28): pick row `partition_idx` of
    !combinations_info_table.csv, train clusters from
    cluster__indices_combination, test from rest_indices_combination."""
    import json

    import numpy as np
    import pandas as pd

    from multimodalaggressionrecognition_tpu.cli import prepare_data

    table = pd.DataFrame({
        "cluster__indices_combination": ["(0, 2)", "(1,)", "[0, 1]"],
        "rest_indices_combination": ["(1, 3)", "(0, 2, 3)", "(2, 3)"],
    })
    csv = tmp_path / "!combinations_info_table.csv"
    table.to_csv(csv, index=False)

    out_json = tmp_path / "split.json"
    prepare_data.main(["make-split", str(csv), str(out_json),
                       "--partition_idx", "1"])
    split = json.loads(out_json.read_text())
    assert split == {"train": [1], "test": [0, 2, 3]}

    # One-shot: split a tree directly from the table row.
    root = tmp_path / "ds"
    (root / "verbal" / "pt_waveform").mkdir(parents=True)
    for c in range(4):
        np.save(root / "verbal" / "pt_waveform" / f"c-{c}_x_0_0.0-1.0_AGGR.npy",
                np.zeros(3))
    prepare_data.main(["split", str(root),
                       "--combinations_csv", str(csv),
                       "--partition_idx", "0"])
    for c, part in [(0, "train"), (2, "train"), (1, "test"), (3, "test")]:
        assert (root / part / "verbal" / "pt_waveform"
                / f"c-{c}_x_0_0.0-1.0_AGGR.npy").exists()
