"""AOT serving artifacts (io/export.py, cli/export_model.py): jax.export
round-trip parity vs the live Predictor, int8 artifacts, and the serving
daemon's code-free --exported path."""

import os

import jax
import numpy as np
import pytest

from multimodalaggressionrecognition_tpu.io.export import (ExportedPredictor,
                                                           export_predictor)
from multimodalaggressionrecognition_tpu.serve import MicroBatcher, Predictor


def _predictor(rng, batch_size=4, quantize=None):
    from tests.test_serve import _model_and_vars

    model, variables = _model_and_vars(rng)
    pred = Predictor(model, variables, batch_size=batch_size,
                     quantize=quantize)
    example = {"audio": np.zeros((1, 16000), np.float32),
               "text": np.zeros((1, 8, 64), np.float32)}
    pred.warmup(example)
    return pred, example


def _request(rng, n=3):
    return {"audio": rng.standard_normal((n, 16000)).astype(np.float32) * 0.1,
            "text": rng.standard_normal((n, 8, 64)).astype(np.float32)}


def test_export_roundtrip_parity(rng, tmp_path):
    pred, example = _predictor(rng)
    meta = export_predictor(pred, example, str(tmp_path / "art"))
    assert meta["format"] == "mar-export-v1"
    assert set(meta["heads"]) == {"phys", "verb"}

    exported = ExportedPredictor(str(tmp_path / "art"))
    assert exported.batch_size == pred.batch_size
    assert exported.modalities == ["audio", "text"]
    assert exported.clip_shapes["audio"] == (16000,)

    req = _request(rng)
    want = pred.predict(req)
    got = exported.predict(req)
    for head in want:
        np.testing.assert_allclose(got[head], want[head], atol=1e-6)
    # padding invariance holds through the artifact too
    one = exported.predict({k: v[:1] for k, v in req.items()})
    np.testing.assert_allclose(one["verb"][0], want["verb"][0], atol=1e-6)


def test_export_int8_artifact(rng, tmp_path):
    """An int8-quantized Predictor exports int8 kernels + dequant baked in:
    smaller artifact, scores match the live int8 predictor exactly."""
    pred_f32, example = _predictor(rng)
    pred_int8, _ = _predictor(rng, quantize="int8")
    export_predictor(pred_f32, example, str(tmp_path / "f32"))
    export_predictor(pred_int8, example, str(tmp_path / "int8"))
    size = {k: os.path.getsize(str(tmp_path / k / "model.jaxexport"))
            for k in ("f32", "int8")}
    assert size["int8"] < 0.5 * size["f32"], size

    req = _request(rng)
    got = ExportedPredictor(str(tmp_path / "int8")).predict(req)
    want = pred_int8.predict(req)
    for head in want:
        np.testing.assert_allclose(got[head], want[head], atol=1e-6)


def test_export_w8a8_artifact(rng, tmp_path):
    """A w8a8 Predictor (int8 MXU matmuls + dynamic activation quant) exports
    cleanly — int8 kernels baked as constants, the quantize-dot-rescale
    graph in StableHLO — and the artifact matches the live w8a8 scores."""
    pred, example = _predictor(rng, quantize="w8a8")
    export_predictor(pred, example, str(tmp_path / "w8a8"))
    req = _request(rng)
    got = ExportedPredictor(str(tmp_path / "w8a8")).predict(req)
    want = pred.predict(req)
    for head in want:
        np.testing.assert_allclose(got[head], want[head], atol=1e-6)


def test_exported_predictor_behind_microbatcher(rng, tmp_path):
    pred, example = _predictor(rng)
    export_predictor(pred, example, str(tmp_path / "art"))
    exported = ExportedPredictor(str(tmp_path / "art"))
    direct = pred.predict(_request(rng, n=2))

    mb = MicroBatcher(exported, max_delay_ms=20.0)
    try:
        req = _request(rng, n=2)
        futs = [mb.submit({k: v[i:i + 1] for k, v in req.items()})
                for i in range(2)]
        for f in futs:
            assert f.result(timeout=30)["verb"].shape == (1, 2)
    finally:
        mb.close()
    assert set(direct) == {"phys", "verb"}


def test_exported_predictor_data_parallel(rng, tmp_path):
    """ExportedPredictor(sharding=...) scores batches sharded over the
    8-device mesh (baked-in weights replicated by XLA) with single-device
    parity."""
    from multimodalaggressionrecognition_tpu.parallel.mesh import (
        data_sharding, make_mesh)

    pred, example = _predictor(rng, batch_size=8)
    export_predictor(pred, example, str(tmp_path / "art"))
    single = ExportedPredictor(str(tmp_path / "art"))
    dp = ExportedPredictor(str(tmp_path / "art"),
                           sharding=data_sharding(make_mesh(jax.devices()))
                           ).warmup()
    req = _request(rng)
    want = single.predict(req)
    got = dp.predict(req)
    for head in want:
        np.testing.assert_allclose(got[head], want[head], atol=1e-5)


def test_export_cli_and_serve_exported(tmp_path, capsys):
    """cli.export_model writes the artifact; cli.serve --exported builds the
    daemon from its meta alone (modalities, clip shapes, batch size)."""
    from multimodalaggressionrecognition_tpu.cli import export_model
    from multimodalaggressionrecognition_tpu.cli.serve import (ServeConfig,
                                                               build_server)

    out = str(tmp_path / "artifact")
    export_model.main(["--allow_random_weights", "true",
                       "--modalities", "audio,text",
                       "--hidden_size", "64", "--fusion_heads", "4",
                       "--audio_samples", "16000", "--text_tokens", "8",
                       "--batch_size", "4", "--platforms", "cpu",
                       "--output_dir", out])
    assert os.path.isfile(os.path.join(out, "model.jaxexport"))
    assert os.path.isfile(os.path.join(out, "meta.json"))

    # the daemon reads every shape from the artifact: config shape flags
    # are left at defaults and must not matter
    cfg = ServeConfig(exported=out, port=0)
    srv = build_server(cfg)
    try:
        assert srv.modalities == {"audio", "text"}
        assert srv.batch_size == 4
        assert set(srv.heads) == {"phys", "verb"}
        # pads come from the artifact's clip shapes (16000/8), not the
        # ServeConfig defaults (80000/48)
        assert srv.pads["audio"](np.zeros(999, np.float32)).shape == (16000,)
        assert srv.pads["text"](
            np.zeros((3, 64), np.float32)).shape == (8, 64)
        scores = srv.batcher.submit(
            {"audio": np.zeros((1, 16000), np.float32),
             "text": np.zeros((1, 8, 64), np.float32)}).result(timeout=60)
        assert scores["verb"].shape == (1, 2)
    finally:
        srv.server_close()
        srv.batcher.close()

    # weights/quantization are baked at export time: conflicting flags
    # must be rejected, not silently ignored
    with pytest.raises(SystemExit, match="conflicts"):
        build_server(ServeConfig(exported=out, quantize="int8", port=0))
    # duplicate model names would silently serve only the last artifact
    with pytest.raises(SystemExit, match="duplicate model names"):
        build_server(ServeConfig(exported=f"a={out},a={out}", port=0))


def test_export_entry_families(tmp_path, capsys):
    """--entry exports any train CLI's model; the artifact meta alone
    drives serving — including 2-d feature-sequence "video" clips
    (train_video_rnn), which validate via shape-derived ndims instead of
    the raw-clip assumption."""
    import json
    import threading
    import urllib.request

    from multimodalaggressionrecognition_tpu.cli import export_model
    from multimodalaggressionrecognition_tpu.cli.serve import (ServeConfig,
                                                               build_server)

    text_art = str(tmp_path / "text_art")
    export_model.main(["--entry", "train_text_transformer",
                       "--allow_random_weights", "true",
                       "--num_layers", "1", "--text_tokens", "8",
                       "--hidden_size", "64", "--batch_size", "2",
                       "--platforms", "cpu", "--output_dir", text_art])
    pred = ExportedPredictor(text_art)
    assert pred.modalities == ["text"] and pred.heads == ["main"]
    out = pred.predict({"text": np.zeros((1, 8, 64), np.float32)})
    assert out["main"].shape == (1, 2)

    rnn_art = str(tmp_path / "rnn_art")
    export_model.main(["--entry", "train_video_rnn",
                       "--allow_random_weights", "true",
                       "--feature_dim", "32", "--hidden_size", "32",
                       "--sequence_len", "5", "--batch_size", "2",
                       "--platforms", "cpu", "--output_dir", rnn_art])
    srv = build_server(ServeConfig(exported=rnn_art, port=0,
                                   max_delay_ms=5.0))
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    host, port = srv.server_address[:2]
    try:
        assert srv.modalities == {"video"}
        # a (T, D) feature-sequence clip over HTTP: 3 tokens padded to the
        # compiled 5 by the daemon (leading-axis pad from the artifact meta)
        body = json.dumps({"video": np.zeros((3, 32)).tolist()}).encode()
        req = urllib.request.Request(
            f"http://{host}:{port}/score", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            scores = json.loads(r.read())
        assert set(scores) == {"LSTM_1_layer", "GRU_1_layer", "Avg"}
    finally:
        srv.shutdown()
        srv.server_close()
        srv.batcher.close()
        thread.join(timeout=10)


def test_serve_multi_model_routing(rng, tmp_path):
    """One daemon hosting several artifacts: /score/<name> routes, /score
    404s with the model list, healthz enumerates every model."""
    import json
    import threading
    import urllib.error
    import urllib.request

    from multimodalaggressionrecognition_tpu.cli.serve import (ServeConfig,
                                                               build_server)

    pred_a, example = _predictor(rng)
    pred_b, _ = _predictor(rng, quantize="int8")
    export_predictor(pred_a, example, str(tmp_path / "a"))
    export_predictor(pred_b, example, str(tmp_path / "b"))

    cfg = ServeConfig(exported=f"a={tmp_path / 'a'},b={tmp_path / 'b'}",
                      port=0, max_delay_ms=5.0)
    srv = build_server(cfg)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    host, port = srv.server_address[:2]

    def post(path, body):
        req = urllib.request.Request(
            f"http://{host}:{port}{path}", data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            return json.loads(r.read())

    try:
        with urllib.request.urlopen(f"http://{host}:{port}/healthz",
                                    timeout=30) as r:
            health = json.loads(r.read())
        assert set(health["models"]) == {"a", "b"}

        body = {"audio": np.zeros(16000).tolist(),
                "text": np.zeros((8, 64)).tolist()}
        for name in ("a", "b"):
            scores = post(f"/score/{name}", body)
            assert len(scores["verb"][0]) == 2
        # /score is ambiguous with several models; unknown names 404
        for path in ("/score", "/score/zzz"):
            with pytest.raises(urllib.error.HTTPError) as err:
                post(path, body)
            assert err.value.code == 404
    finally:
        srv.shutdown()
        srv.server_close()
        for ep in srv.endpoints.values():
            ep.batcher.close()
        thread.join(timeout=10)


def test_force_xla_pins_auto_kernel_selection(monkeypatch):
    """Auto-mode kernels must trace their XLA path under force_xla() (used
    by export) even on the TPU backend; explicit requests are untouched."""
    import jax

    from multimodalaggressionrecognition_tpu.utils.kernels import (force_xla,
                                                                   pallas_auto)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert pallas_auto() is True
    with force_xla():
        assert pallas_auto() is False
        with force_xla():  # reentrant
            assert pallas_auto() is False
        assert pallas_auto() is False
    assert pallas_auto() is True


def test_exported_rejects_wrong_platform(rng, tmp_path):
    pred, example = _predictor(rng)
    export_predictor(pred, example, str(tmp_path / "art"),
                     platforms=("tpu",))
    with pytest.raises(ValueError, match="platforms"):
        ExportedPredictor(str(tmp_path / "art"))  # tests run on CPU


def test_export_native_tpu_only(rng, tmp_path):
    """--native keeps Mosaic custom calls, so it must refuse any platform
    list other than ('tpu',); a tpu-only native export from a CPU process
    still serializes (cross-platform lowering; auto kernels pick the XLA
    path off-TPU) and records the flag in meta.  The Pallas-containing
    native path itself is exercised by bench_exported_artifact on real
    TPU."""
    pred, example = _predictor(rng)
    with pytest.raises(ValueError, match="native"):
        export_predictor(pred, example, str(tmp_path / "bad"),
                         platforms=("cpu", "tpu"), native=True)
    meta = export_predictor(pred, example, str(tmp_path / "art"),
                            platforms=("tpu",), native=True)
    assert meta["native"] is True and meta["platforms"] == ["tpu"]
