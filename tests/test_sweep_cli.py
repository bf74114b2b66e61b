"""Sweep driver (cli/sweep.py): grid expansion, per-point stable run dirs,
ranked summary, and idempotent re-invocation (finished points skipped)."""

import os

import pandas as pd
import pytest

from multimodalaggressionrecognition_tpu.cli.sweep import (grid_points,
                                                           parse_grid)

pytestmark = pytest.mark.slow


def test_grid_expansion():
    grid = parse_grid(["learning_rate=1e-3,3e-4", "num_layers=1,2"])
    pts = grid_points(grid)
    assert len(pts) == 4
    slugs = [s for s, _ in pts]
    assert "learning_rate-1e-3_num_layers-1" in slugs
    assert all(len(kv) == 2 for _, kv in pts)


def test_sweep_end_to_end(tmp_path, capsys):
    from multimodalaggressionrecognition_tpu.cli import sweep
    from multimodalaggressionrecognition_tpu.data import (
        generate_synthetic_avabos)

    root = str(tmp_path / "avabos")
    generate_synthetic_avabos(root, num_clusters=3, samples_per_cluster=6,
                              seed=3, audio_len=24000, video_frames=8,
                              video_hw=32)
    saving = str(tmp_path / "runs")
    argv = ["--entry", "train_text_transformer",
            "--grid", "learning_rate=1e-3,1e-5",
            "--",
            "--dataset_root", root, "--epoch_num", "1", "--batch_size", "4",
            "--num_layers", "1", "--saving_dir", saving]
    table = sweep.main(argv)

    assert len(table) == 2
    # both grid points landed in their own stable dirs
    for slug in ("learning_rate-1e-3", "learning_rate-1e-5"):
        assert os.path.isdir(os.path.join(saving, slug, "checkpoint_current"))
    # ranked by the metric, summary persisted
    assert table.iloc[0]["UAR"] >= table.iloc[1]["UAR"]
    summary = pd.read_csv(os.path.join(saving, "sweep_summary.csv"))
    assert len(summary) == 2

    # idempotent: a rerun skips both finished points (no retraining)
    capsys.readouterr()
    sweep.main(argv)
    out = capsys.readouterr().out
    assert out.count("already done") == 2


def test_sweep_stops_on_preemption(tmp_path, monkeypatch, capsys):
    """A preempted point must NOT be marked finished (a relaunch resumes
    it), and the grid loop must stop — the grace window is for exiting,
    not for starting the next point."""
    from multimodalaggressionrecognition_tpu.cli import (sweep,
                                                         train_text_transformer)

    saving = str(tmp_path / "runs")
    launched = []

    def fake_main(args):
        # the Trainer returns cleanly after its partial preempt checkpoint
        slug = args[args.index("--run_name") + 1]
        launched.append(slug)
        os.makedirs(os.path.join(saving, slug, "checkpoint_preempt"),
                    exist_ok=True)

    monkeypatch.setattr(train_text_transformer, "main", fake_main)
    result = sweep.main(["--entry", "train_text_transformer",
                         "--grid", "learning_rate=1e-3,1e-5",
                         "--", "--saving_dir", saving])
    assert launched == ["learning_rate-1e-3"]  # second point never started
    assert result is None
    assert not os.path.exists(os.path.join(
        saving, "learning_rate-1e-3", "sweep_done.json"))
    assert '"preempted"' in capsys.readouterr().out
