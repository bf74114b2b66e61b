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


def test_evaluate_exported_matches_live(tmp_path):
    """Evaluating a jax.export artifact reproduces the live checkpoint
    evaluation's confusion metrics exactly — including EMPTY batches scored
    via zero stubs + present=0 (mask==absent equivalence)."""
    import os

    from multimodalaggressionrecognition_tpu.cli import (evaluate,
                                                         export_model,
                                                         train_multimodal)
    from multimodalaggressionrecognition_tpu.data import (
        generate_synthetic_avabos)

    root = str(tmp_path / "avabos")
    generate_synthetic_avabos(root, num_clusters=2, samples_per_cluster=4,
                              seed=9, audio_len=24000, video_frames=8,
                              video_hw=32)
    saving = str(tmp_path / "runs")
    train_multimodal.main([
        "--dataset_root", root, "--batch_size", "4", "--epoch_num", "1",
        "--audio_samples", "24000", "--modalities", "audio,text",
        "--saving_dir", saving, "--run_name", "m", "--log_console"])
    run_dir = os.path.join(saving, "m")
    ckpt = os.path.join(run_dir, "checkpoint_current")

    live = evaluate.main(["--from_run", run_dir,
                          "--path_to_checkpoint", ckpt,
                          "--saving_dir", str(tmp_path / "eval_live")])

    art = str(tmp_path / "artifact")
    export_model.main(["--from_run", run_dir, "--path_to_checkpoint", ckpt,
                       "--batch_size", "4", "--platforms", "cpu",
                       "--output_dir", art])
    got = evaluate.main(["--exported", art, "--dataset_root", root])

    for head in live:
        assert head in got
        for metric in ("accuracy", "UAR", "UAP", "UAF1"):
            np.testing.assert_allclose(got[head][metric],
                                       live[head][metric], atol=1e-6)
        assert "loss" not in got[head]  # artifact carries logits only


def test_evaluate_from_run_inherits_config(tmp_path):
    """--from_run: evaluate a checkpoint without re-matching architecture
    flags by hand — the run's saved config.json supplies them."""
    import json
    import os

    import pytest

    from multimodalaggressionrecognition_tpu.cli import (evaluate,
                                                         train_multimodal)
    from multimodalaggressionrecognition_tpu.data import (
        generate_synthetic_avabos)

    root = str(tmp_path / "avabos")
    generate_synthetic_avabos(root, num_clusters=2, samples_per_cluster=4,
                              seed=9, audio_len=24000, video_frames=8,
                              video_hw=32)
    saving = str(tmp_path / "runs")
    # non-default architecture: evaluate would crash on restore unless the
    # saved config is actually applied
    train_multimodal.main([
        "--dataset_root", root, "--batch_size", "4", "--epoch_num", "1",
        "--audio_samples", "24000", "--fusion_layers", "2",
        "--adaptor_out", "64", "--modalities", "audio,text",
        "--saving_dir", saving, "--run_name", "m", "--log_console"])
    run_dir = os.path.join(saving, "m")
    cfg = json.load(open(os.path.join(run_dir, "config.json")))
    assert cfg["fusion_layers"] == 2 and cfg["run_name"] == "m"

    results = evaluate.main([
        "--from_run", run_dir,
        "--path_to_checkpoint", os.path.join(run_dir, "checkpoint_current"),
        "--saving_dir", str(tmp_path / "eval_runs")])
    assert "verb" in results

    # and without config inheritance the default (1-fusion-layer) model
    # must refuse the 2-layer checkpoint rather than silently mis-restore
    with pytest.raises(Exception):
        evaluate.main([
            "--dataset_root", root, "--audio_samples", "24000",
            "--path_to_checkpoint", os.path.join(run_dir,
                                                 "checkpoint_current"),
            "--saving_dir", str(tmp_path / "eval_runs2")])
