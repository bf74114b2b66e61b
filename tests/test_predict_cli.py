import json

import numpy as np
from scipy.io import wavfile


def test_predict_cli_end_to_end(tmp_path, rng, capsys):
    from multimodalaggressionrecognition_tpu.cli import predict

    wavs = tmp_path / "wavs"
    texts = tmp_path / "texts"
    wavs.mkdir(), texts.mkdir()
    for i in range(3):
        wavfile.write(str(wavs / f"clip{i}.wav"), 44100,
                      (rng.standard_normal(44100) * 0.1 * 32767).astype(np.int16))
        np.save(str(texts / f"clip{i}.npy"),
                rng.standard_normal((20, 768)).astype(np.float32))

    predict.main(["--audio", str(wavs), "--text", str(texts),
                  "--audio_samples", "24000", "--batch_size", "3"])
    lines = [json.loads(line) for line in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 3
    for row in lines:
        assert 0.0 <= row["verb_prob_aggr"] <= 1.0
        assert 0.0 <= row["phys_prob_aggr"] <= 1.0


def test_predict_cli_video_modality(tmp_path, rng, capsys):
    """--video scores clips through the windowed Swin tower (npy/pt input,
    spatial resize + frame pad on host); files for a modality missing from
    --modalities are rejected with the fix-it flag."""
    import pytest

    from multimodalaggressionrecognition_tpu.cli import predict

    vids = tmp_path / "vids"
    vids.mkdir()
    # 48x48 uint8-range clips: exercises the /255 + resize-to-32 path
    np.save(str(vids / "clip0.npy"),
            (rng.random((4, 48, 48, 3)) * 255).astype(np.float32))
    # reference-prep layout (T, C, H, W): exercises the channels-first
    # transpose the training pipeline applies (data/avabos.py)
    np.save(str(vids / "clip1.npy"),
            (rng.random((4, 3, 48, 48)) * 255).astype(np.float32))

    with pytest.raises(SystemExit, match="--modalities"):
        predict.main(["--video", str(vids)])  # default modalities audio,text

    predict.main(["--video", str(vids), "--modalities", "video",
                  "--video_frames", "8", "--video_size", "32",
                  "--batch_size", "2"])
    lines = [json.loads(line) for line in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 2
    for row in lines:
        assert 0.0 <= row["phys_prob_aggr"] <= 1.0


def test_predict_cli_exported_artifact(tmp_path, rng, capsys):
    """--exported scores a jax.export artifact: clip shapes come from the
    artifact meta (flags left at defaults), and a request missing one of
    the artifact's modalities is rejected with a clear error."""
    import pytest

    from multimodalaggressionrecognition_tpu.cli import export_model, predict

    art = str(tmp_path / "artifact")
    export_model.main(["--allow_random_weights", "true",
                       "--modalities", "audio,text",
                       "--audio_samples", "24000",
                       "--batch_size", "2", "--platforms", "cpu",
                       "--output_dir", art])
    capsys.readouterr()

    wavs = tmp_path / "wavs"
    texts = tmp_path / "texts"
    wavs.mkdir(), texts.mkdir()
    for i in range(3):
        wavfile.write(str(wavs / f"clip{i}.wav"), 44100,
                      (rng.standard_normal(44100) * 0.1 * 32767).astype(np.int16))
        np.save(str(texts / f"clip{i}.npy"),
                rng.standard_normal((20, 768)).astype(np.float32))

    predict.main(["--exported", art,
                  "--audio", str(wavs), "--text", str(texts)])
    lines = [json.loads(line) for line in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 3  # chunked across the compiled batch of 2
    for row in lines:
        assert 0.0 <= row["verb_prob_aggr"] <= 1.0

    with pytest.raises(SystemExit, match="fixed input signature"):
        predict.main(["--exported", art, "--audio", str(wavs)])


def test_predict_cli_exported_video_features(tmp_path, rng, capsys):
    """A feature-sequence video artifact (--entry train_video_rnn, clip
    shape (T, D)) scores (T, D) .npy feature files through --exported —
    the pixel-clip loader must not reject them, and a wrong feature dim
    gets a clear error naming the expected shape."""
    import pytest

    from multimodalaggressionrecognition_tpu.cli import export_model, predict

    art = str(tmp_path / "artifact")
    export_model.main(["--entry", "train_video_rnn",
                       "--allow_random_weights", "true",
                       "--sequence_len", "7", "--feature_dim", "32",
                       "--hidden_size", "16",
                       "--batch_size", "2", "--platforms", "cpu",
                       "--output_dir", art])
    capsys.readouterr()

    feats = tmp_path / "feats"
    feats.mkdir()
    np.save(str(feats / "clip0.npy"),
            rng.standard_normal((5, 32)).astype(np.float32))  # padded to 7
    np.save(str(feats / "clip1.npy"),
            rng.standard_normal((9, 32)).astype(np.float32))  # truncated

    predict.main(["--exported", art, "--video", str(feats)])
    lines = [json.loads(line) for line in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 2
    for row in lines:
        for key, v in row.items():
            if key.endswith("_prob_aggr"):
                assert 0.0 <= v <= 1.0

    np.save(str(feats / "clip0.npy"),
            rng.standard_normal((5, 8)).astype(np.float32))
    with pytest.raises(SystemExit, match=r"\(T, 32\) video FEATURE"):
        predict.main(["--exported", art, "--video", str(feats)])
