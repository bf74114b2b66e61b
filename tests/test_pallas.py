"""Pallas framed-conv kernel: forward parity + custom-VJP gradient parity.

On the CPU test backend the kernel auto-selects interpreter mode; the same
code compiles on TPU (verified on v5e, ~2x the XLA framed matmul).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalaggressionrecognition_tpu.ops.framing import framed_matmul
from multimodalaggressionrecognition_tpu.ops.pallas.framed_conv import (
    framed_conv1d, framed_conv1d_pallas)


@pytest.mark.parametrize("F,s,p,co", [(160, 40, 80, 64), (512, 256, 0, 128),
                                      (10, 5, 0, 512)])
def test_forward_parity(rng, F, s, p, co):
    x = rng.standard_normal((2, 8000)).astype(np.float32)
    w = rng.standard_normal((F, co)).astype(np.float32) * 0.05
    b = rng.standard_normal(co).astype(np.float32)
    ref = framed_matmul(jnp.asarray(x)[..., None], jnp.asarray(w),
                        jnp.asarray(b), F, s, pad=p)
    got = framed_conv1d_pallas(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                               F, s, pad=p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)


def test_fused_epilogue(rng):
    x = rng.standard_normal((1, 4000)).astype(np.float32)
    w = rng.standard_normal((160, 64)).astype(np.float32) * 0.05
    b = rng.standard_normal(64).astype(np.float32)
    scale = np.full(64, 1.7, np.float32)
    shift = np.full(64, -0.2, np.float32)
    base = framed_matmul(jnp.asarray(x)[..., None], jnp.asarray(w),
                         jnp.asarray(b), 160, 40, pad=80)
    ref = np.maximum(np.asarray(base) * 1.7 - 0.2, 0.0)
    got = framed_conv1d_pallas(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                               160, 40, pad=80, scale=jnp.asarray(scale),
                               shift=jnp.asarray(shift), relu=True)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-3)


def test_custom_vjp_matches_xla_grads(rng):
    x = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((160, 64)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.standard_normal(64).astype(np.float32))

    def loss_pallas(x, w, b):
        return jnp.sum(framed_conv1d(x, w, b, 160, 40, 80) ** 2)

    def loss_xla(x, w, b):
        return jnp.sum(framed_matmul(x[..., None], w, b, 160, 40, pad=80) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=2e-2, rtol=1e-4)


@pytest.mark.parametrize("group", [4, 16])
def test_grouped_forward_parity(rng, group):
    from multimodalaggressionrecognition_tpu.ops.pallas.framed_conv import (
        framed_conv1d_grouped)

    x = rng.standard_normal((2, 8000)).astype(np.float32)
    w = rng.standard_normal((160, 64)).astype(np.float32) * 0.05
    b = rng.standard_normal(64).astype(np.float32)
    ref = framed_matmul(jnp.asarray(x)[..., None], jnp.asarray(w),
                        jnp.asarray(b), 160, 40, pad=80)
    got = framed_conv1d_grouped(jnp.asarray(x), jnp.asarray(w),
                                jnp.asarray(b), 160, 40, pad=80, group=group)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)


def test_spectrogram_pallas_route(rng):
    from multimodalaggressionrecognition_tpu.ops.stft import spectrogram

    x = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32))
    ref = spectrogram(x, use_pallas=False)
    got = spectrogram(x, use_pallas=True)  # interpret mode on CPU
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-2, rtol=1e-4)


def test_resample_pallas_route(rng):
    from multimodalaggressionrecognition_tpu.ops.resample import resample_poly

    x = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
    ref = resample_poly(x, 44100, 16000, use_pallas=False)
    got = resample_poly(x, 44100, 16000, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_cnn1d_pallas_stem_matches(rng):
    from multimodalaggressionrecognition_tpu.models.cnn1d import CNN1DExtractor

    x = jnp.asarray(rng.standard_normal((1, 20000)).astype(np.float32) * 0.3)
    base = CNN1DExtractor()
    fast = CNN1DExtractor(pallas_stem=True)
    variables = base.init(jax.random.PRNGKey(0), x)
    y0 = base.apply(variables, x)
    y1 = fast.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-3)


# ---------------------------------------------------- fused window attention

def test_window_attention_kernel_parity(rng):
    """Fused Swin window attention (interpret mode off-TPU) == jnp reference,
    with and without shifted-window masks, including the custom-VJP grads."""
    from multimodalaggressionrecognition_tpu.ops.pallas.window_attention import (
        attention_core_ref, fused_window_attention)

    for (w, n, heads, d, nw) in [(8, 24, 3, 8, 4), (6, 49, 3, 32, 3),
                                 (4, 12, 2, 16, 0)]:
        c = heads * d
        qkv = jnp.asarray(rng.standard_normal((w, n, 3 * c)).astype(np.float32))
        bias = jnp.asarray(
            rng.standard_normal((heads, n, n)).astype(np.float32) * 0.1)
        mask = (jnp.asarray(np.where(rng.uniform(0, 1, (nw, n, n)) > 0.7,
                                     -100.0, 0.0).astype(np.float32))
                if nw else None)
        ref = attention_core_ref(qkv, bias, mask, heads)
        got = fused_window_attention(qkv, bias, mask, heads)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    w, n, heads, d = 6, 24, 3, 8
    c = heads * d
    qkv = jnp.asarray(rng.standard_normal((w, n, 3 * c)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((heads, n, n)).astype(np.float32))
    shift_mask = jnp.asarray(np.where(
        rng.uniform(0, 1, (3, n, n)) > 0.7, -100.0, 0.0).astype(np.float32))
    for mask in [None, shift_mask]:
        ga = jax.grad(lambda a, b: jnp.sum(
            fused_window_attention(a, b, mask, heads) ** 2),
            argnums=(0, 1))(qkv, bias)
        gb = jax.grad(lambda a, b: jnp.sum(
            attention_core_ref(a, b, mask, heads) ** 2),
            argnums=(0, 1))(qkv, bias)
        for x, y in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-4,
                                       err_msg=f"masked={mask is not None}")


def test_swin_attention_module_pallas_route(rng):
    """ShiftedWindowAttention3d with use_pallas=True (interpret off-TPU)
    matches the jnp path through the full module, shifted and unshifted."""
    from multimodalaggressionrecognition_tpu.models.swin3d import (
        ShiftedWindowAttention3d)

    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 24)).astype(np.float32))
    for shift in [(0, 0, 0), (2, 2, 2)]:
        mod_ref = ShiftedWindowAttention3d(24, 3, window=(4, 4, 4),
                                           shift=shift, use_pallas=False)
        variables = mod_ref.init(jax.random.PRNGKey(0), x)
        ref = mod_ref.apply(variables, x)
        got = ShiftedWindowAttention3d(24, 3, window=(4, 4, 4), shift=shift,
                                       use_pallas=True).apply(variables, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, err_msg=str(shift))
