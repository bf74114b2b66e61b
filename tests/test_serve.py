import jax
import numpy as np

from multimodalaggressionrecognition_tpu.serve import Predictor


def _model_and_vars(rng):
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _batch, _flagship

    model = _flagship(hidden=64, audio_len=16000, text_len=8)
    batch = _batch(2, 16000, 8, 64)
    variables = model.init(jax.random.PRNGKey(0), batch)
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
