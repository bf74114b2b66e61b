import numpy as np


def test_evaluate_cli_runs(tmp_path):
    from multimodalaggressionrecognition_tpu.cli import evaluate
    from multimodalaggressionrecognition_tpu.data import generate_synthetic_avabos

    root = str(tmp_path / "avabos")
    generate_synthetic_avabos(root, num_clusters=2, samples_per_cluster=4,
                              seed=9, audio_len=24000, video_frames=8,
                              video_hw=32)
    results = evaluate.main([
        "--dataset_root", root, "--batch_size", "4",
        "--audio_samples", "24000", "--saving_dir", str(tmp_path / "runs")])
    assert "verb" in results
    assert np.isfinite(results["verb"]["loss"])
    assert 0.0 <= results["verb"]["UAR"] <= 1.0
