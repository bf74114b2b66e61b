"""Fast float32-exact erf / GELU for the VPU.

XLA's erf lowering on TPU costs ~6x a tanh evaluation (6.1 vs 1.0 ms per
swin3d_t stage0 MLP over 128 windows, benchmarks/profile_swin_parts.py):
it branches between a small-|x| polynomial and an erfc tail that needs
exp + divide, and XLA evaluates both sides of the select.  Exact-erf GELU
is ~25 ms of the 61 ms f32 Swin extractor — the single largest remaining
f32 cost after the fused window-attention kernel.

This module evaluates erf as a single odd Chebyshev-derived polynomial,
erf(t) ~= sign(t) * a * P(u),  a = min(|t|, 3.9),  u = 2*a^2/3.9^2 - 1,
with P a degree-14 polynomial in the normalized square (Horner, 14 FMAs,
no exp/divide/branch).  |t| >= 3.9 is clamped: erfc(3.9) = 3.5e-8 is below
half an f32 ulp of 1.0.  Measured accuracy (400k points on [-8, 8]):

    max |erf_poly - erf|   = 3.2e-7
    max |gelu_poly - gelu| = 1.3e-6

i.e. float32-exact for parity purposes (the golden-parity suite tolerances
are 1e-4..2e-3; the opt-in tanh GELU deviates 3e-3).  The gradient is the
closed form erf'(x) = 2/sqrt(pi) * exp(-x^2) via custom_jvp, matching the
analytic derivative rather than the polynomial's.

Used as the default GELU in models/swin3d.py (torchvision swin3d_t uses
exact-erf GELU; reference models.py:49-59 consumes it frozen).
"""

import math

import jax
import jax.numpy as jnp

_B = 3.9
_TWO_OVER_B2 = 2.0 / (_B * _B)
# Chebyshev interpolant of erf(sqrt(s))/sqrt(s) on s in [0, 3.9^2],
# converted to monomials in u = 2s/3.9^2 - 1 (ascending).  Fit script in
# the module docstring's measurement; rounded to f32.
_COEF = (
    0.3625839948654175, -0.18101176619529724, 0.1346902996301651,
    -0.10950687527656555, 0.09068235754966736, -0.07407806068658829,
    0.05783236026763916, -0.041475679725408554, 0.029343407601118088,
    -0.02272321656346321, 0.01327703706920147, -0.0029783567879348993,
    0.002125463215634227, -0.004210445564240217, 0.0018597767921164632,
)


@jax.custom_jvp
def erf_poly(x):
    """float32-exact erf; single polynomial, no exp/divide (see module doc)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    a = jnp.minimum(jnp.abs(xf), jnp.float32(_B))
    u = a * a * jnp.float32(_TWO_OVER_B2) - jnp.float32(1.0)
    acc = jnp.float32(_COEF[-1])
    for c in _COEF[-2::-1]:
        acc = acc * u + jnp.float32(c)
    return (jnp.sign(xf) * (a * acc)).astype(dtype)


@erf_poly.defjvp
def _erf_poly_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = erf_poly(x)
    xf = x.astype(jnp.float32)
    d = jnp.float32(2.0 / math.sqrt(math.pi)) * jnp.exp(-xf * xf)
    return y, (d.astype(x.dtype) * dx)


_INV_SQRT2 = 0.7071067811865476


def gelu_exact(x):
    """GELU with float32-exact polynomial erf (max deviation 1.3e-6)."""
    xf = x.astype(jnp.float32)
    y = jnp.float32(0.5) * xf * (jnp.float32(1.0)
                                 + erf_poly(xf * jnp.float32(_INV_SQRT2)))
    return y.astype(x.dtype)
