"""Int8 weight-only quantization: round-trip error bounds, tree selection
rules, footprint, and flagship serving parity (utils/quantize.py, serve.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalaggressionrecognition_tpu.utils.quantize import (
    dequantize_params, quantize_params, tree_nbytes)


def test_roundtrip_error_bounded_per_channel():
    rng = np.random.default_rng(0)
    # channels with very different magnitudes: per-channel scales keep the
    # relative error ~1/254 of each channel's own range
    w = rng.standard_normal((64, 16)).astype(np.float32)
    w *= np.logspace(-2, 2, 16, dtype=np.float32)
    q = quantize_params(jnp.asarray(w), min_size=1)
    back = np.asarray(dequantize_params(q))
    per_ch_amp = np.abs(w).max(axis=0)
    err = np.abs(back - w).max(axis=0)
    assert np.all(err <= per_ch_amp / 127.0 + 1e-9)


def test_selection_rules():
    params = {
        "dense": {"kernel": jnp.ones((64, 64)), "bias": jnp.ones((64,))},
        "bn": {"scale": jnp.ones((512,)), "mean": jnp.ones((512,))},
        "tiny": {"kernel": jnp.ones((2, 2))},
        "step": jnp.asarray(3, jnp.int32),
    }
    q = quantize_params(params, min_size=1024)
    assert q["dense"]["kernel"]["q"].dtype == jnp.int8     # quantized
    assert q["dense"]["bias"].dtype == jnp.float32          # 1-D kept
    assert q["bn"]["scale"].dtype == jnp.float32            # 1-D kept
    assert q["tiny"]["kernel"].dtype == jnp.float32         # below min_size
    assert q["step"].dtype == jnp.int32                     # non-float kept

    back = dequantize_params(q)
    assert back["dense"]["kernel"].shape == (64, 64)
    assert back["step"] == 3

    # footprint: the 64x64 kernel drops 4x (minus the per-channel scales)
    assert tree_nbytes(q) < tree_nbytes(params) * 0.45


def test_conv_kernel_last_axis_scales():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((3, 3, 3, 16, 32)).astype(np.float32)  # conv3d
    q = quantize_params(jnp.asarray(w), min_size=1)
    assert q["scale"].shape == (1, 1, 1, 1, 32)
    back = np.asarray(dequantize_params(q))
    assert np.abs(back - w).max() <= np.abs(w).max() / 127.0 + 1e-9


@pytest.mark.slow
def test_flagship_int8_serving_parity():
    from __graft_entry__ import _batch, _flagship
    from multimodalaggressionrecognition_tpu.serve import Predictor

    model = _flagship(hidden=128, audio_len=16000, text_len=12)
    host = _batch(6, 16000, 12, 128, seed=3)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), host)

    request = {"audio": host["audio"]["data"], "text": host["text"]["data"]}
    p32 = Predictor(model, variables, batch_size=8)
    pq = Predictor(model, variables, batch_size=8, quantize="int8")

    # the quantized predictor's kernels really are int8 on device
    from multimodalaggressionrecognition_tpu.utils.quantize import tree_nbytes

    assert (tree_nbytes(pq.variables["params"])
            < tree_nbytes(variables["params"]) * 0.5)

    out32 = p32.predict(request)
    outq = pq.predict(request)
    for head in out32:
        np.testing.assert_allclose(outq[head], out32[head], atol=0.05)
        assert np.array_equal(np.argmax(outq[head], -1),
                              np.argmax(out32[head], -1))


def test_bias_table_not_quantized():
    """Shape-heuristic guard (ADVICE r2): lookup/bias tables that look like
    kernels (ndim>=2, size>=1024) must stay float — e.g. Swin's
    relative_position_bias_table is added to attention scores directly."""
    params = {
        "attn": {
            "relative_position_bias_table": jnp.ones((2535, 3)),
            "qkv": {"kernel": jnp.ones((96, 288))},
        },
        "tok_embedding": jnp.ones((1000, 64)),
    }
    q = quantize_params(params, min_size=1024)
    assert q["attn"]["relative_position_bias_table"].dtype == jnp.float32
    assert q["tok_embedding"].dtype == jnp.float32
    assert q["attn"]["qkv"]["kernel"]["q"].dtype == jnp.int8


def test_int8_matmul_error_bounded(rng):
    """w8a8 dot (dynamic per-row activation quant + int8 MXU accumulation)
    stays within the combined quantization error bound of a float matmul."""
    from multimodalaggressionrecognition_tpu.utils.quantize import (
        _quantize_array, int8_matmul)

    x = jnp.asarray(rng.standard_normal((4, 7, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    qd = _quantize_array(w)
    got = np.asarray(int8_matmul(x, qd["q"], qd["scale"].reshape(-1)))
    ref = np.asarray(x @ w)
    # error budget: |dx| <= max|x|/254 per element, |dw| <= max|w_col|/254;
    # K=64 contraction accumulates ~sqrt(K) of it — bound loosely
    amp = np.abs(np.asarray(x)).max() * np.abs(np.asarray(w)).max()
    assert np.abs(got - ref).max() < amp * 64 / 127.0 * 0.2
    assert got.shape == ref.shape


def test_split_w8a8_selection():
    """Only 2-D matmul kernels consumed by quant-aware modules split into
    bare int8 + quant-collection scale; everything else keeps the
    weight-only marker-dict form."""
    from multimodalaggressionrecognition_tpu.utils.quantize import split_w8a8

    params = {
        "linear1": {"kernel": jnp.ones((64, 64)), "bias": jnp.ones((64,))},
        "self_attn": {"in_proj_kernel": jnp.ones((32, 96)),
                      "out_proj_kernel": jnp.ones((32, 32)),
                      "in_proj_bias": jnp.ones((96,))},
        "gru": {"kernel_ih": jnp.ones((64, 192))},
        "conv3d": {"kernel": jnp.ones((3, 3, 3, 8, 16))},
    }
    p, quant = split_w8a8(quantize_params(params, min_size=1))
    assert p["linear1"]["kernel"].dtype == jnp.int8
    assert quant["linear1"]["kernel_scale"].shape == (64,)
    assert p["self_attn"]["in_proj_kernel"].dtype == jnp.int8
    assert quant["self_attn"]["out_proj_kernel_scale"].shape == (32,)
    # RNN gate kernels: weight-only marker dict (inside lax.scan)
    assert isinstance(p["gru"]["kernel_ih"], dict)
    assert "gru" not in quant
    # conv3d kernel is 5-D: weight-only marker dict
    assert isinstance(p["conv3d"]["kernel"], dict)
    assert p["linear1"]["bias"].dtype == jnp.float32


def test_w8a8_encoder_parity(rng):
    """A post-LN transformer encoder scored through the w8a8 path (int8
    kernels + quant scales collection) stays close to the float forward."""
    from multimodalaggressionrecognition_tpu.models.layers import (
        TransformerEncoder)
    from multimodalaggressionrecognition_tpu.utils.quantize import (
        dequantize_params, split_w8a8)

    m = TransformerEncoder(d_model=64, nhead=4, num_layers=2,
                           dim_feedforward=128, dropout=0.0)
    x = jnp.asarray(rng.standard_normal((3, 10, 64)).astype(np.float32))
    variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    ref = np.asarray(jax.jit(m.apply)(variables, x))

    p, quant = split_w8a8(quantize_params(variables["params"], min_size=1))
    assert p["layers_0"]["linear1"]["kernel"].dtype == jnp.int8
    got = np.asarray(jax.jit(m.apply)(
        {"params": dequantize_params(p), "quant": quant}, x))
    np.testing.assert_allclose(got, ref, atol=0.15)


def test_w8a8_conv1d_dequant_path(rng):
    """Conv1d kernels are 2-D (K*C_in, F) so split_w8a8 turns them into bare
    int8 arrays too; Conv1d must dequantize inline (weight-only) and stay
    close to the float forward."""
    from multimodalaggressionrecognition_tpu.models.cnn1d import CNN1D
    from multimodalaggressionrecognition_tpu.utils.quantize import (
        dequantize_params, split_w8a8)

    m = CNN1D(class_num=4)
    x = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32) * 0.1)
    variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    ref = np.asarray(jax.jit(m.apply)(variables, x))

    p, quant = split_w8a8(quantize_params(variables["params"]))
    # at least one conv kernel took the int8+scale form
    assert any(getattr(a, "dtype", None) == jnp.int8
               for a in jax.tree.leaves(p))
    got = np.asarray(jax.jit(m.apply)(
        dict(variables, params=dequantize_params(p), quant=quant), x))
    np.testing.assert_allclose(got, ref, atol=0.1)
    assert np.array_equal(np.argmax(got, -1), np.argmax(ref, -1))


@pytest.mark.slow
def test_flagship_w8a8_serving_parity():
    """End-to-end: Predictor(quantize='w8a8') — int8 MXU matmuls — keeps
    flagship logits close and argmax decisions unchanged."""
    from __graft_entry__ import _batch, _flagship
    from multimodalaggressionrecognition_tpu.serve import Predictor

    model = _flagship(hidden=128, audio_len=16000, text_len=12)
    host = _batch(6, 16000, 12, 128, seed=3)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), host)

    request = {"audio": host["audio"]["data"], "text": host["text"]["data"]}
    p32 = Predictor(model, variables, batch_size=8)
    pq = Predictor(model, variables, batch_size=8, quantize="w8a8")
    # matmul kernels really are int8 arrays in the serving tree
    flat = jax.tree.leaves(pq.variables["params"])
    assert any(a.dtype == jnp.int8 for a in flat if hasattr(a, "dtype"))
    assert pq.variables["quant"]

    out32 = p32.predict(request)
    outq = pq.predict(request)
    for head in out32:
        np.testing.assert_allclose(outq[head], out32[head], atol=0.2)
        assert np.array_equal(np.argmax(outq[head], -1),
                              np.argmax(out32[head], -1))


@pytest.mark.slow
def test_trimodal_int8_video_tower_parity(rng):
    """int8 parity through a model WITH a video (Swin) tower — the flagship
    int8 test has no video tower, so the bias-table skip path was
    accuracy-untested (ADVICE r2)."""
    import flax.linen as nn

    from multimodalaggressionrecognition_tpu.models.swin3d import (
        SwinTransformer3d)
    from multimodalaggressionrecognition_tpu.models.layers import TorchLinear

    class SmallSwinClassifier(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            h = SwinTransformer3d(embed_dim=32, depths=(2,), num_heads=(2,),
                                  window=(8, 7, 7), name="backbone")(
                x, train=train)
            return TorchLinear(2, name="head")(jnp.mean(h, axis=(1, 2, 3)))

    x = jnp.asarray(rng.standard_normal((2, 8, 28, 28, 3)).astype(np.float32))
    model = SmallSwinClassifier()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    # full-window bias table: (15*13*13=2535, heads) — would be int8 under
    # the bare shape heuristic
    table = variables["params"]["backbone"]["stage0_block0"]["attn"][
        "relative_position_bias_table"]
    assert table.shape[0] == 2535

    ref = np.asarray(jax.jit(model.apply)(variables, x))
    qparams = quantize_params(variables["params"])
    qt = qparams["backbone"]["stage0_block0"]["attn"][
        "relative_position_bias_table"]
    assert not isinstance(qt, dict)  # skipped by name
    got = np.asarray(jax.jit(model.apply)(
        dict(variables, params=dequantize_params(qparams)), x))
    assert np.argmax(got, -1).tolist() == np.argmax(ref, -1).tolist()
    np.testing.assert_allclose(got, ref, atol=0.05)


def test_skip_names_exempt_leaves_not_subtrees():
    """_SKIP_NAMES matches array LEAVES only: a MODULE whose name contains
    'embedding' must still have its interior matmul kernels quantized, while
    a leaf named e.g. pos_embed stays float."""
    params = {
        "text_embedding": {"kernel": jnp.ones((64, 64)),
                           "pos_embed": jnp.ones((64, 64))},
    }
    q = quantize_params(params, min_size=1)
    assert q["text_embedding"]["kernel"]["q"].dtype == jnp.int8
    assert q["text_embedding"]["pos_embed"].dtype == jnp.float32
