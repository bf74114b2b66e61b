"""Golden parity tests: Flax layers vs torch CPU modules."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from multimodalaggressionrecognition_tpu.models import (
    GRU, LSTM, MultiheadSelfAttention, TorchLayerNorm, TorchLinear,
    TransformerEncoder, TransformerEncoderLayer,
)


def _np(x):
    return x.detach().numpy()


def test_linear_parity(rng):
    x = rng.standard_normal((4, 10)).astype(np.float32)
    tl = torch.nn.Linear(10, 7)
    m = TorchLinear(7)
    params = {"params": {"kernel": _np(tl.weight).T, "bias": _np(tl.bias)}}
    y = m.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), _np(tl(torch.from_numpy(x))), atol=1e-5)


def test_layernorm_parity(rng):
    x = rng.standard_normal((4, 6, 16)).astype(np.float32)
    tl = torch.nn.LayerNorm(16)
    with torch.no_grad():
        tl.weight.mul_(1.3).add_(0.1)
        tl.bias.add_(0.2)
    m = TorchLayerNorm()
    params = {"params": {"scale": _np(tl.weight), "bias": _np(tl.bias)}}
    y = m.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), _np(tl(torch.from_numpy(x))), atol=1e-5)


def _mha_params(tmha):
    return {
        "in_proj_kernel": _np(tmha.in_proj_weight).T,
        "in_proj_bias": _np(tmha.in_proj_bias),
        "out_proj_kernel": _np(tmha.out_proj.weight).T,
        "out_proj_bias": _np(tmha.out_proj.bias),
    }


def test_mha_parity(rng):
    e, h = 32, 4
    x = rng.standard_normal((3, 9, e)).astype(np.float32)
    tmha = torch.nn.MultiheadAttention(e, h, batch_first=True)
    tmha.eval()
    mask = np.zeros((3, 9), bool)
    mask[0, 5:] = True
    mask[2, :3] = True
    tref, _ = tmha(torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x),
                   key_padding_mask=torch.from_numpy(mask))
    m = MultiheadSelfAttention(e, h)
    y = m.apply({"params": _mha_params(tmha)}, jnp.asarray(x),
                key_padding_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(y), _np(tref), atol=2e-5)


def _encoder_layer_params(tl):
    return {
        "self_attn": _mha_params(tl.self_attn),
        "norm1": {"scale": _np(tl.norm1.weight), "bias": _np(tl.norm1.bias)},
        "norm2": {"scale": _np(tl.norm2.weight), "bias": _np(tl.norm2.bias)},
        "linear1": {"kernel": _np(tl.linear1.weight).T, "bias": _np(tl.linear1.bias)},
        "linear2": {"kernel": _np(tl.linear2.weight).T, "bias": _np(tl.linear2.bias)},
    }


def test_transformer_encoder_parity(rng):
    """Full stack: 2 layers + final norm, with key padding mask (the reference
    fusion configuration, reference models.py:391-403)."""
    e, h, layers = 32, 4, 2
    x = rng.standard_normal((3, 11, e)).astype(np.float32)
    tlayer = torch.nn.TransformerEncoderLayer(d_model=e, nhead=h, batch_first=True)
    tenc = torch.nn.TransformerEncoder(tlayer, num_layers=layers,
                                       norm=torch.nn.LayerNorm(e))
    tenc.eval()
    mask = np.zeros((3, 11), bool)
    mask[1, 6:] = True
    with torch.no_grad():
        tref = tenc(torch.from_numpy(x), src_key_padding_mask=torch.from_numpy(mask))

    params = {f"layers_{i}": _encoder_layer_params(tenc.layers[i]) for i in range(layers)}
    params["norm"] = {"scale": _np(tenc.norm.weight), "bias": _np(tenc.norm.bias)}
    m = TransformerEncoder(d_model=e, nhead=h, num_layers=layers)
    # eval semantics (torch fast path zeroes masked rows)
    y = m.apply({"params": params}, jnp.asarray(x), key_padding_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(y), _np(tref), atol=1e-4)

    # training (slow-path) semantics: disable fast path via requires_grad
    xg = torch.from_numpy(x).requires_grad_(True)
    tref_slow = tenc(xg, src_key_padding_mask=torch.from_numpy(mask))
    m2 = TransformerEncoder(d_model=e, nhead=h, num_layers=layers,
                            zero_masked_on_eval=False)
    y2 = m2.apply({"params": params}, jnp.asarray(x), key_padding_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(y2), _np(tref_slow), atol=1e-4)


def test_gru_parity(rng):
    e, h_sz = 12, 20
    x = rng.standard_normal((4, 7, e)).astype(np.float32)
    tg = torch.nn.GRU(e, h_sz, batch_first=True)
    tg.eval()
    with torch.no_grad():
        tout, th = tg(torch.from_numpy(x))
    m = GRU(h_sz)
    params = {"params": {
        "kernel_ih": _np(tg.weight_ih_l0).T, "kernel_hh": _np(tg.weight_hh_l0).T,
        "bias_ih": _np(tg.bias_ih_l0), "bias_hh": _np(tg.bias_hh_l0),
    }}
    out, h_last = m.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), _np(tout), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), _np(th)[0], atol=1e-5)


def test_lstm_parity(rng):
    e, h_sz = 12, 20
    x = rng.standard_normal((4, 7, e)).astype(np.float32)
    tl = torch.nn.LSTM(e, h_sz, batch_first=True)
    tl.eval()
    with torch.no_grad():
        tout, (th, tc) = tl(torch.from_numpy(x))
    m = LSTM(h_sz)
    params = {"params": {
        "kernel_ih": _np(tl.weight_ih_l0).T, "kernel_hh": _np(tl.weight_hh_l0).T,
        "bias_ih": _np(tl.bias_ih_l0), "bias_hh": _np(tl.bias_hh_l0),
    }}
    out, (h_last, c_last) = m.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), _np(tout), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), _np(th)[0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_last), _np(tc)[0], atol=1e-5)


def test_fully_masked_rows_are_finite(rng):
    """Divergence-by-design: all-keys-masked rows give zeros, not NaN."""
    e, h = 16, 2
    x = rng.standard_normal((2, 5, e)).astype(np.float32)
    mask = np.zeros((2, 5), bool)
    mask[0, :] = True
    m = MultiheadSelfAttention(e, h)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = m.apply(params, jnp.asarray(x), key_padding_mask=jnp.asarray(mask))
    assert np.isfinite(np.asarray(y)).all()
