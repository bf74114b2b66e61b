"""Swin3D-T and S3D: structural + independent numerical checks.

torchvision is absent in this environment, so instead of replicas these
tests verify (a) end-to-end shapes of the published architectures,
(b) shifted-window attention against an independent numpy brute force that
computes attention region-by-region, and (c) the relative-position index
against the standard Swin formula computed a second way.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalaggressionrecognition_tpu.models.s3d import (
    S3DClassifier, S3DExtractor)
from multimodalaggressionrecognition_tpu.models.swin3d import (
    ShiftedWindowAttention3d, SwinTransformer3d, Swin3dTExtractor,
    _attention_mask, _relative_position_index)
from multimodalaggressionrecognition_tpu.models.video_extractors import (
    WindowedVideoExtractor)


def test_relative_position_index_formula():
    window = (2, 3, 3)
    idx = _relative_position_index(window)
    n = 2 * 3 * 3
    assert idx.shape == (n, n)
    # independent recomputation: direct offsets lookup
    wt, wh, ww = window
    coords = [(t, h, w) for t in range(wt) for h in range(wh) for w in range(ww)]
    for a in range(n):
        for b in range(n):
            dt = coords[a][0] - coords[b][0] + wt - 1
            dh = coords[a][1] - coords[b][1] + wh - 1
            dw = coords[a][2] - coords[b][2] + ww - 1
            expect = (dt * (2 * wh - 1) + dh) * (2 * ww - 1) + dw
            assert idx[a, b] == expect
    # diagonal is the center entry
    center = ((wt - 1) * (2 * wh - 1) + (wh - 1)) * (2 * ww - 1) + (ww - 1)
    assert (np.diag(idx) == center).all()


def _numpy_window_attention(x, params, window, shift, heads):
    """Brute-force shifted-window attention: roll, per-window dense attn."""
    b, t, h, w, c = x.shape
    d = c // heads
    qkv_k = np.asarray(params["qkv"]["kernel"])
    qkv_b = np.asarray(params["qkv"]["bias"])
    proj_k = np.asarray(params["proj"]["kernel"])
    proj_b = np.asarray(params["proj"]["bias"])
    table = np.asarray(params["relative_position_bias_table"])
    idx = _relative_position_index(window)
    bias = table[idx]  # (N, N, heads)

    xs = np.roll(x, (-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))
    wt, wh, ww = window
    out = np.zeros_like(xs)
    region = np.zeros((t, h, w), np.int32)
    cnt = 0
    for ts in ((0, t - wt), (t - wt, t - shift[0]), (t - shift[0], t)):
        for hs in ((0, h - wh), (h - wh, h - shift[1]), (h - shift[1], h)):
            for wsl in ((0, w - ww), (w - ww, w - shift[2]), (w - shift[2], w)):
                region[ts[0]:ts[1], hs[0]:hs[1], wsl[0]:wsl[1]] = cnt
                cnt += 1
    for bi in range(b):
        for t0 in range(0, t, wt):
            for h0 in range(0, h, wh):
                for w0 in range(0, w, ww):
                    win = xs[bi, t0:t0 + wt, h0:h0 + wh, w0:w0 + ww]
                    reg = region[t0:t0 + wt, h0:h0 + wh, w0:w0 + ww].reshape(-1)
                    tokens = win.reshape(-1, c)
                    qkv = tokens @ qkv_k + qkv_b
                    q, k, v = np.split(qkv, 3, axis=-1)
                    acc = np.zeros_like(tokens)
                    for hd in range(heads):
                        qh = q[:, hd * d:(hd + 1) * d] * (d ** -0.5)
                        kh = k[:, hd * d:(hd + 1) * d]
                        vh = v[:, hd * d:(hd + 1) * d]
                        scores = qh @ kh.T + bias[:, :, hd]
                        scores = scores + np.where(
                            reg[:, None] != reg[None, :], -100.0, 0.0)
                        e = np.exp(scores - scores.max(-1, keepdims=True))
                        attn = e / e.sum(-1, keepdims=True)
                        acc[:, hd * d:(hd + 1) * d] = attn @ vh
                    outw = acc @ proj_k + proj_b
                    out[bi, t0:t0 + wt, h0:h0 + wh, w0:w0 + ww] = outw.reshape(
                        wt, wh, ww, c)
    return np.roll(out, shift, axis=(1, 2, 3))


@pytest.mark.parametrize("shift", [(0, 0, 0), (1, 1, 1)])
def test_shifted_window_attention_vs_bruteforce(rng, shift):
    heads, c = 2, 8
    window = (2, 3, 3)
    x = rng.standard_normal((2, 4, 6, 6, c)).astype(np.float32)
    m = ShiftedWindowAttention3d(c, heads, window, shift)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = m.apply(variables, jnp.asarray(x))
    ref = _numpy_window_attention(x, variables["params"], window, shift, heads)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_attention_mask_zero_without_shift():
    assert _attention_mask(4, 6, 6, (2, 3, 3), (0, 0, 0)) is None
    m = _attention_mask(4, 6, 6, (2, 3, 3), (1, 1, 1))
    assert m.shape == (2 * 2 * 2, 18, 18)
    assert set(np.unique(m)) <= {0.0, -100.0}


@pytest.mark.slow
def test_swin3d_t_shapes(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 32, 32, 3)).astype(np.float32))
    m = Swin3dTExtractor()
    variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    y = jax.jit(m.apply)(variables, x)
    assert y.shape == (1, 768)
    # param sanity: stage dims double after each merge
    p = variables["params"]["backbone"]
    assert p["patch_embed"]["kernel"].shape == (2, 4, 4, 3, 96)
    assert p["stage3_block0"]["attn"]["qkv"]["kernel"].shape == (768, 2304)
    assert p["merge0"]["reduction"]["kernel"].shape == (384, 192)


@pytest.mark.slow
def test_s3d_shapes(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 64, 64, 3)).astype(np.float32))
    m = S3DExtractor()
    variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    y = jax.jit(m.apply)(variables, x)
    assert y.shape == (1, 1024)


def test_windowed_extractor_matches_per_window(rng):
    """Batched window folding == the reference's sequential per-window loop."""
    import flax.linen as nn

    class MeanBackbone(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            k = self.param("k", nn.initializers.ones, (3,))
            return jnp.mean(x, axis=(1, 2, 3)) * k

    x = jnp.asarray(rng.standard_normal((2, 16, 4, 4, 3)).astype(np.float32))
    m = WindowedVideoExtractor(MeanBackbone(), window=8)
    variables = m.init(jax.random.PRNGKey(0), x)
    got = m.apply(variables, x)
    assert got.shape == (2, 2, 3)
    for wi in range(2):
        ref = np.asarray(x[:, wi * 8:(wi + 1) * 8]).mean(axis=(1, 2, 3))
        np.testing.assert_allclose(np.asarray(got[:, wi]), ref, atol=1e-6)


def test_swin_gelu_tanh_option_close():
    """gelu_tanh=True (fast serving GELU, 1.5x on v5e) stays within ~1e-2
    of the parity-exact erf features on the same params."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodalaggressionrecognition_tpu.models.swin3d import (
        SwinTransformer3d)

    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((1, 4, 16, 16, 3)).astype(np.float32))
    exact = SwinTransformer3d(depths=(2, 2), num_heads=(3, 6))
    variables = jax.jit(exact.init)(jax.random.PRNGKey(0), x)
    fe = jax.jit(exact.apply)(variables, x)
    ff = jax.jit(SwinTransformer3d(depths=(2, 2), num_heads=(3, 6),
                                   gelu="tanh").apply)(variables, x)
    assert not np.allclose(np.asarray(fe), np.asarray(ff))  # really different path
    np.testing.assert_allclose(np.asarray(ff), np.asarray(fe), atol=1e-2)
