import jax
import numpy as np
import pytest

from multimodalaggressionrecognition_tpu.serve import MicroBatcher, Predictor


def _model_and_vars(rng):
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _batch, _flagship

    model = _flagship(hidden=64, audio_len=16000, text_len=8)
    batch = _batch(2, 16000, 8, 64)
    # jitted init: hits the persistent test compile cache (CLAUDE.md)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    return model, variables


def test_predictor_pads_and_scores(rng):
    model, variables = _model_and_vars(rng)
    pred = Predictor(model, variables, batch_size=4)
    req = {
        "audio": rng.standard_normal((3, 16000)).astype(np.float32) * 0.1,
        "text": rng.standard_normal((3, 8, 64)).astype(np.float32),
    }
    pred.warmup({k: v[:1] for k, v in req.items()})
    out = pred.predict(req)
    assert set(out) == {"phys", "verb"}
    assert out["verb"].shape == (3, 2)
    np.testing.assert_allclose(out["verb"].sum(axis=1), 1.0, atol=1e-5)

    # padding must not change real rows' scores
    out1 = pred.predict({k: v[:1] for k, v in req.items()})
    np.testing.assert_allclose(out1["verb"][0], out["verb"][0], atol=1e-5)


def test_predictor_data_parallel_mesh_matches_single_device(rng):
    """Predictor(sharding=...) shards the batch over the device mesh
    (8 virtual CPU devices from conftest) with replicated params — a pure
    layout change: scores must match the single-device predictor."""
    import jax

    from multimodalaggressionrecognition_tpu.parallel.mesh import (
        data_sharding, make_mesh)

    model, variables = _model_and_vars(rng)
    mesh = make_mesh(jax.devices())
    assert mesh.devices.size == 8
    req = {"audio": rng.standard_normal((5, 16000)).astype(np.float32) * 0.1,
           "text": rng.standard_normal((5, 8, 64)).astype(np.float32)}
    example = {k: v[:1] for k, v in req.items()}

    single = Predictor(model, variables, batch_size=8).warmup(example)
    dp = Predictor(model, variables, batch_size=8,
                   sharding=data_sharding(mesh)).warmup(example)
    want, got = single.predict(req), dp.predict(req)
    for head in want:
        np.testing.assert_allclose(got[head], want[head], atol=1e-5)

    with pytest.raises(ValueError, match="divide across"):
        Predictor(model, variables, batch_size=6,
                  sharding=data_sharding(mesh))


def test_microbatcher_coalesces_and_matches_direct(rng):
    model, variables = _model_and_vars(rng)
    pred = Predictor(model, variables, batch_size=8)
    clips = {
        "audio": rng.standard_normal((6, 16000)).astype(np.float32) * 0.1,
        "text": rng.standard_normal((6, 8, 64)).astype(np.float32),
    }
    pred.warmup({k: v[:1] for k, v in clips.items()})
    direct = pred.predict(clips)

    mb = MicroBatcher(pred, max_delay_ms=50.0)
    try:
        futs = [mb.submit({k: v[i:i + 1] for k, v in clips.items()})
                for i in range(6)]
        for i, f in enumerate(futs):
            got = f.result(timeout=30)
            assert set(got) == {"phys", "verb"}
            # coalesced single-clip scores == the one-shot batched scores
            np.testing.assert_allclose(got["verb"][0], direct["verb"][i],
                                       atol=1e-5)
    finally:
        mb.close()


def test_microbatcher_bad_request_fails_only_itself(rng):
    model, variables = _model_and_vars(rng)
    pred = Predictor(model, variables, batch_size=4)
    good = {"audio": np.zeros((1, 16000), np.float32),
            "text": np.zeros((1, 8, 64), np.float32)}
    pred.warmup(good)
    mb = MicroBatcher(pred, max_delay_ms=20.0)
    try:
        # validation anchors on the SERVED modality set, not submit order:
        # a malformed request first in the group must not fail the
        # well-formed ones coalesced behind it
        f_bad0 = mb.submit({"audio": good["audio"]})  # missing modality
        f_good = mb.submit(good)
        f_bad = mb.submit({"audio": good["audio"]})
        with pytest.raises(ValueError, match="presence pattern"):
            f_bad0.result(timeout=30)
        with pytest.raises(ValueError, match="presence pattern"):
            f_bad.result(timeout=30)
        assert f_good.result(timeout=30)["verb"].shape == (1, 2)
    finally:
        mb.close()


def test_microbatcher_rejects_misaligned_batch_sizes(rng):
    """A request whose modalities disagree on batch size would shift OTHER
    callers' rows in the merged group — it must be rejected at submit()."""
    model, variables = _model_and_vars(rng)
    pred = Predictor(model, variables, batch_size=4)
    good = {"audio": np.zeros((1, 16000), np.float32),
            "text": np.zeros((1, 8, 64), np.float32)}
    pred.warmup(good)
    mb = MicroBatcher(pred, max_delay_ms=20.0)
    try:
        with pytest.raises(ValueError, match="disagree on batch size"):
            mb.submit({"audio": np.zeros((2, 16000), np.float32),
                       "text": good["text"]})
        assert mb.submit(good).result(timeout=30)["verb"].shape == (1, 2)
    finally:
        mb.close()


def test_microbatcher_counts_scoring_failures(rng):
    """/statz failure signal: a predictor exception must move the
    failed_requests counter, not just fail the Futures."""
    model, variables = _model_and_vars(rng)
    pred = Predictor(model, variables, batch_size=4)
    good = {"audio": np.zeros((1, 16000), np.float32),
            "text": np.zeros((1, 8, 64), np.float32)}
    pred.warmup(good)
    pred.predict = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("device fell over"))
    mb = MicroBatcher(pred, max_delay_ms=5.0)
    try:
        with pytest.raises(RuntimeError, match="fell over"):
            mb.submit(good).result(timeout=30)
        assert mb.stats["failed_requests"] == 1
        assert mb.stats["dispatches"] == 0
    finally:
        mb.close()


def test_microbatcher_close_drains(rng):
    model, variables = _model_and_vars(rng)
    pred = Predictor(model, variables, batch_size=4)
    good = {"audio": np.zeros((1, 16000), np.float32),
            "text": np.zeros((1, 8, 64), np.float32)}
    pred.warmup(good)
    mb = MicroBatcher(pred, max_delay_ms=1000.0)  # long window: close first
    futs = [mb.submit(good) for _ in range(7)]  # spans two groups at cap 4
    mb.close()
    for f in futs:
        assert f.result(timeout=1)["verb"].shape == (1, 2)
    with pytest.raises(RuntimeError):
        mb.submit(good)
