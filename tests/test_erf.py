"""ops/erf.py: the fast polynomial erf/GELU must be float32-exact.

"Exact" bar: within a few f32 ulps of torch.erf / torch GELU(exact) —
orders of magnitude inside every golden-parity tolerance in this suite
(1e-4..2e-3) and ~2000x tighter than the opt-in tanh GELU (3e-3).
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from multimodalaggressionrecognition_tpu.ops.erf import erf_poly, gelu_exact


def test_erf_poly_matches_torch():
    x = np.concatenate([
        np.linspace(-9, 9, 40001),
        np.linspace(-0.01, 0.01, 1001),
        np.array([0.0, -0.0, 3.9, -3.9, 100.0, -100.0]),
    ]).astype(np.float32)
    got = np.asarray(erf_poly(jnp.asarray(x)))
    ref = torch.erf(torch.from_numpy(x)).numpy()
    assert np.max(np.abs(got - ref)) < 5e-7
    assert got[np.where(x == 0.0)[0][0]] == 0.0


def test_gelu_exact_matches_torch():
    x = np.linspace(-12, 12, 40001).astype(np.float32)
    got = np.asarray(gelu_exact(jnp.asarray(x)))
    ref = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    assert np.max(np.abs(got - ref)) < 3e-6


def test_erf_poly_gradient_is_analytic():
    x = jnp.asarray(np.linspace(-5, 5, 2001).astype(np.float32))
    g = jax.vmap(jax.grad(erf_poly))(x)
    expected = 2.0 / np.sqrt(np.pi) * np.exp(-np.asarray(x) ** 2)
    np.testing.assert_allclose(np.asarray(g), expected, atol=1e-6)


def test_gelu_exact_bf16_passthrough():
    x = jnp.asarray(np.linspace(-4, 4, 257), dtype=jnp.bfloat16)
    y = gelu_exact(x)
    assert y.dtype == jnp.bfloat16
    ref = torch.nn.functional.gelu(
        torch.from_numpy(np.asarray(x, np.float32))).numpy()
    np.testing.assert_allclose(np.asarray(y, np.float32), ref, atol=0.05)
