"""HTTP serving daemon (cli/serve.py): request parsing, micro-batched
scoring parity vs direct Predictor calls, chunking, error paths."""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from multimodalaggressionrecognition_tpu.cli.serve import (ServeConfig,
                                                           build_server)


@pytest.fixture(scope="module")
def server():
    cfg = ServeConfig(modalities="audio,text", hidden_size=64,
                      fusion_heads=4, audio_samples=16000, text_tokens=8,
                      batch_size=4, max_delay_ms=30.0, port=0,
                      allow_random_weights=True)
    srv = build_server(cfg)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv
    srv.shutdown()
    srv.server_close()  # join handlers while the batcher is still alive
    srv.batcher.close()
    thread.join(timeout=10)


def _url(srv, path):
    host, port = srv.server_address[:2]
    return f"http://{host}:{port}{path}"


def _post(srv, body, ctype="application/json"):
    req = urllib.request.Request(_url(srv, "/score"), data=body,
                                 headers={"Content-Type": ctype},
                                 method="POST")
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    with urllib.request.urlopen(_url(server, "/healthz"), timeout=30) as r:
        got = json.loads(r.read())
    info = {"modalities": ["audio", "text"], "heads": ["phys", "verb"],
            "batch_size": 4}
    # flat legacy fields for the single-model case + the models map
    assert got == {"ok": True, "models": {"model": info}, **info}


def test_statz_counters(server):
    """/statz reports per-model request/clip/dispatch totals and recent
    latency percentiles after scoring traffic."""
    body = json.dumps({"audio": np.zeros(16000).tolist(),
                       "text": np.zeros((8, 64)).tolist()}).encode()
    for _ in range(3):
        status, _ = _post(server, body)
        assert status == 200
    with urllib.request.urlopen(_url(server, "/statz"), timeout=30) as r:
        stats = json.loads(r.read())["model"]
    assert stats["requests"] >= 3
    assert stats["clips"] >= 3
    assert stats["dispatches"] >= 1
    assert stats["mean_group_size"] >= 1.0
    assert stats["recent_latency_ms"]["p50"] > 0


def test_score_single_clip_json_pads_variable_lengths(server):
    # short audio (padded to 16000) + 3 text tokens (padded to 8)
    body = json.dumps({"audio": [0.1] * 1000,
                       "text": [[0.2] * 64] * 3}).encode()
    code, got = _post(server, body)
    assert code == 200
    for head in ("phys", "verb"):
        (row,) = got[head]
        assert len(row) == 2
        assert abs(sum(row) - 1.0) < 1e-2  # softmax row (rounded to 4dp)


def test_score_npz_batch_chunks_and_matches_predictor(server):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((9, 16000)) * 0.1).astype(np.float32)
    text = rng.standard_normal((9, 8, 64)).astype(np.float32)
    buf = io.BytesIO()
    np.savez(buf, audio=audio, text=text)
    code, got = _post(server, buf.getvalue(), ctype="application/x-npz")
    assert code == 200
    assert len(got["verb"]) == 9  # 9 clips through batch-4 chunks
    direct = [server.predictor.predict(
        {"audio": audio[s:s + 4], "text": text[s:s + 4]})
        for s in range(0, 9, 4)]
    want = np.concatenate([d["verb"] for d in direct])
    np.testing.assert_allclose(np.asarray(got["verb"]), want, atol=1e-3)


def test_concurrent_requests_coalesce_and_match(server):
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal((4, 16000)) * 0.1).astype(np.float32)
    text = rng.standard_normal((4, 8, 64)).astype(np.float32)
    direct = server.predictor.predict({"audio": audio, "text": text})
    results = {}

    def hit(i):
        body = json.dumps({"audio": audio[i].tolist(),
                           "text": text[i].tolist()}).encode()
        results[i] = _post(server, body)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for i in range(4):
        code, got = results[i]
        assert code == 200
        np.testing.assert_allclose(got["verb"][0], direct["verb"][i],
                                   atol=1e-3)


def test_bad_requests_get_400(server):
    # missing modality
    code, got = _post(server, json.dumps(
        {"audio": [0.0] * 100}).encode())
    assert code == 400 and "presence pattern" in got["error"]
    # wrong rank
    code, got = _post(server, json.dumps(
        {"audio": [[[0.0] * 4] * 4] * 4, "text": [[0.0] * 64] * 3}).encode())
    assert code == 400 and "audio" in got["error"]
    # modalities disagree on batch size
    code, got = _post(server, json.dumps(
        {"audio": [[0.1] * 100] * 2,
         "text": [[[0.2] * 64] * 3] * 3}).encode())
    assert code == 400 and "disagree" in got["error"]
    # unknown path
    code, got = _post_path(server, "/nope")
    assert code == 404


def _post_path(srv, path):
    req = urllib.request.Request(_url(srv, path), data=b"{}",
                                 headers={"Content-Type": "application/json"},
                                 method="POST")
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.mark.slow
def test_sigterm_drains_and_exits_cleanly(tmp_path):
    """cli.serve main(): SIGTERM stops accepting, drains in-flight work,
    exits 0 — the serving counterpart of trainer preemption handling."""
    import os
    import signal
    import subprocess
    import sys
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    child = subprocess.Popen(
        [sys.executable, "-u", "-c",
         "from multimodalaggressionrecognition_tpu.utils.compile_cache "
         "import enable_test_cache; enable_test_cache(); "
         "from multimodalaggressionrecognition_tpu.cli.serve import main; "
         "main()",
         "--modalities", "audio,text", "--hidden_size", "64",
         "--fusion_heads", "4", "--audio_samples", "16000",
         "--text_tokens", "8", "--batch_size", "4", "--port", "0",
         "--allow_random_weights", "true"],
        env=env, cwd=repo, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    try:
        deadline = time.time() + 300
        port = None
        while time.time() < deadline:
            line = child.stdout.readline()
            if line == "" and child.poll() is not None:
                break  # child died: fall through to the assert
            if '"serving"' in line:
                port = int(json.loads(line)["serving"].rsplit(":", 1)[1])
                break
        assert port, f"server never came up (rc={child.poll()})"
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.loads(r.read())["ok"]
        child.send_signal(signal.SIGTERM)
        out, _ = child.communicate(timeout=60)
    finally:
        if child.poll() is None:
            child.kill()
    assert child.returncode == 0, out[-2000:]
    assert '"draining"' in out
