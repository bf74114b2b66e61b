"""CLI entry-point smoke tests: every reference script equivalent runs
1 epoch end-to-end on tiny synthetic data (CPU backend)."""

import glob
import os

import pandas as pd
import pytest

pytestmark = pytest.mark.slow  # CLI end-to-end smokes (each compiles a full model)


def _args(tmp_path, **kw):
    args = ["--epoch_num", "1", "--log_console",
            "--saving_dir", str(tmp_path / "runs")]
    for k, v in kw.items():
        args += [f"--{k}", str(v)]
    return args


@pytest.fixture()
def avabos_root(tmp_path):
    from multimodalaggressionrecognition_tpu.data import generate_synthetic_avabos

    root = str(tmp_path / "avabos")
    generate_synthetic_avabos(root, num_clusters=3, samples_per_cluster=6,
                              seed=3, audio_len=24000, video_frames=8,
                              video_hw=32)
    return root


def _assert_run_logs(tmp_path, head):
    logs = glob.glob(str(tmp_path / "runs" / "*" / f"{head}_train_log.csv"))
    assert logs, f"no {head} train log found"
    assert len(pd.read_csv(logs[0])) == 1


def test_cli_text_transformer(tmp_path, avabos_root):
    from multimodalaggressionrecognition_tpu.cli import train_text_transformer

    train_text_transformer.main(_args(
        tmp_path, dataset_root=avabos_root, batch_size=4, num_layers=1,
        profile_dir=str(tmp_path / "trace")))
    _assert_run_logs(tmp_path, "main")
    # --profile_dir traces one training epoch (SURVEY.md §5.1): an xplane
    # file viewable in TensorBoard/Perfetto must exist
    assert glob.glob(str(tmp_path / "trace" / "**" / "*.xplane.pb"),
                     recursive=True)


def test_cli_multimodal(tmp_path, avabos_root):
    from multimodalaggressionrecognition_tpu.cli import train_multimodal

    train_multimodal.main(_args(
        tmp_path, dataset_root=avabos_root, batch_size=4,
        audio_samples=24000, modalities="audio,text"))
    # with video disabled only 'verb' carries labels (reference parity:
    # the phys head exists but receives no signal without the video modality)
    _assert_run_logs(tmp_path, "verb")


def test_cli_audio_text(tmp_path, avabos_root):
    from multimodalaggressionrecognition_tpu.cli import train_audio_text

    train_audio_text.main(_args(
        tmp_path, dataset_root=avabos_root, batch_size=4,
        audio_samples=24000))
    _assert_run_logs(tmp_path, "main")


def test_cli_audio_rnn(tmp_path):
    from multimodalaggressionrecognition_tpu.cli import train_audio_rnn

    # 12 train wavs (3 steps at b4): the frozen wav2vec conv encoder on CPU
    # dominates; 3 steps cover the multi-head path as well as 8 did
    args = _args(tmp_path, files_root=str(tmp_path / "wavs"), batch_size=4,
                 audio_seconds=2, extractor="wav2vec1",
                 synthetic_files=12) + ["--synthetic_wav"]
    train_audio_rnn.main(args)
    _assert_run_logs(tmp_path, "GRU_1_layer")
    _assert_run_logs(tmp_path, "LSTM_1_layer")


def test_cli_video_rnn(tmp_path):
    from multimodalaggressionrecognition_tpu.cli import train_video_rnn

    args = _args(tmp_path, files_root=str(tmp_path / "feats"), batch_size=4,
                 feature_dim=64, hidden_size=32) + ["--synthetic_features"]
    train_video_rnn.main(args)
    _assert_run_logs(tmp_path, "Avg")


def test_cli_audio_transformer_vgg(tmp_path):
    from multimodalaggressionrecognition_tpu.cli import train_audio_transformer

    # 4 train wavs (2 VGG steps at b2) on a 129-bin spectrogram: full CPU
    # VGG11 steps dominate this test's wall time; 2 steps exercise the
    # spectrogram->VGG->ckpt path as well as 16 steps at 257 bins did
    args = _args(tmp_path, files_root=str(tmp_path / "wavs"), batch_size=2,
                 audio_seconds=1, synthetic_files=4,
                 n_fft=256) + ["--synthetic_wav"]
    train_audio_transformer.main(args)
    _assert_run_logs(tmp_path, "main")


def test_cli_3dcnn(tmp_path):
    from multimodalaggressionrecognition_tpu.cli import train3dcnn

    args = _args(tmp_path, files_root=str(tmp_path / "clips"), batch_size=2,
                 frame_num=8, video_size=32) + ["--synthetic_clips"]
    train3dcnn.main(args)
    _assert_run_logs(tmp_path, "main")


def test_cli_extract_and_video_rnn_roundtrip(tmp_path):
    """extract_features -> features consumed by train_video_rnn."""
    from multimodalaggressionrecognition_tpu.cli import (extract_features,
                                                         train_video_rnn)
    from multimodalaggressionrecognition_tpu.cli.train_video_transformer import (
        _make_synthetic_videos)

    vids = str(tmp_path / "vids")
    _make_synthetic_videos(vids, n_train=4, n_test=2, frames=8, hw=32)
    feats = str(tmp_path / "feats")
    extract_features.main([
        "--files_root", vids, "--out_root", feats, "--backbone", "r3d18",
        "--frame_num", "8", "--window", "4", "--batch_size", "2",
        "--num_epochs", "1"])
    assert glob.glob(os.path.join(feats, "test", "*.npy"))
    assert glob.glob(os.path.join(feats, "train", "0", "*.npy"))
    assert glob.glob(os.path.join(feats, "train", "1", "*.npy"))

    args = _args(tmp_path, files_root=feats, batch_size=2,
                 feature_dim=512, hidden_size=32) + ["--epoch_dirs"]
    train_video_rnn.main(args)
    _assert_run_logs(tmp_path, "GRU_1_layer")


def test_cli_extract_bf16_close_to_f32(tmp_path):
    """--compute_dtype bfloat16 extraction (the +56% serving config) stays
    close to f32 features and saves f32 .npy files."""
    import numpy as np

    from multimodalaggressionrecognition_tpu.cli import extract_features
    from multimodalaggressionrecognition_tpu.cli.train_video_transformer import (
        _make_synthetic_videos)

    vids = str(tmp_path / "vids")
    _make_synthetic_videos(vids, n_train=2, n_test=1, frames=8, hw=32)
    base = ["--files_root", vids, "--backbone", "r3d18", "--frame_num", "8",
            "--window", "4", "--batch_size", "2", "--seed", "0"]
    extract_features.main(base + ["--out_root", str(tmp_path / "f32")])
    extract_features.main(base + ["--out_root", str(tmp_path / "bf16"),
                                  "--compute_dtype", "bfloat16"])
    for name in os.listdir(tmp_path / "f32" / "test"):
        a = np.load(tmp_path / "f32" / "test" / name)
        b = np.load(tmp_path / "bf16" / "test" / name)
        assert b.dtype == np.float32
        scale = max(np.abs(a).max(), 1e-6)
        assert np.max(np.abs(a - b)) / scale < 0.05


def test_config_validation_rejects_bad_values():
    """Typos in bool/choice flags fail loudly instead of silently flipping
    configuration (review finding: 'treu' used to parse as False)."""
    import pytest

    from multimodalaggressionrecognition_tpu.cli.common import (
        TrainConfig, parse_config, resolve_pallas_stem)

    with pytest.raises(SystemExit):
        parse_config(TrainConfig, ["--synthetic", "treu"])
    assert parse_config(TrainConfig, ["--synthetic", "false"]).synthetic is False
    assert parse_config(TrainConfig, ["--synthetic", "On"]).synthetic is True

    class _Cfg:
        pallas_stem = "On "
    assert resolve_pallas_stem(_Cfg) is True  # case/space tolerant
    _Cfg.pallas_stem = "bogus"
    with pytest.raises(SystemExit):
        resolve_pallas_stem(_Cfg)


def test_swin_gelu_mode_validated():
    import jax
    import jax.numpy as jnp
    import pytest

    from multimodalaggressionrecognition_tpu.models.swin3d import (
        SwinTransformer3d)

    bad = SwinTransformer3d(embed_dim=8, depths=(1,), num_heads=(2,),
                            gelu="ploy")
    with pytest.raises(ValueError, match="gelu"):
        bad.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 8, 3)))


def test_cli_run_name_auto_resume(tmp_path, avabos_root):
    """--run_name pins the run directory and a relaunch with identical
    args auto-resumes from its latest checkpoint (the scheduler-restart
    story for preemption-safe training)."""
    from multimodalaggressionrecognition_tpu.cli import train_text_transformer

    kw = dict(dataset_root=avabos_root, batch_size=4, num_layers=1,
              run_name="stable")
    train_text_transformer.main(_args(tmp_path, **kw))
    run_dir = tmp_path / "runs" / "stable"
    assert (run_dir / "checkpoint_current").is_dir()

    # relaunch with a higher budget: must continue at epoch 1 in the SAME
    # dir, appending to (not overwriting) the epoch-0 log row
    train_text_transformer.main(_args(tmp_path, **kw, epoch_num=2))
    df = pd.read_csv(run_dir / "main_train_log.csv")
    assert list(df["epoch"]) == [0, 1]
