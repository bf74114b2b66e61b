"""Trainable-Swin gradient flow (VERDICT r2 item 7).

The reference froze its Swin extractor in every configuration (reference
models.py:49-59), but this framework advertises trainable backbones: these
tests pin (a) gradients flow through WindowedVideoExtractor(freeze=False)
into every Swin parameter, (b) the fused Pallas window-attention custom VJP
(which recomputes through the XLA reference) produces the same gradients as
the pure XLA path, and (c) the remat option changes neither values nor
gradients while cutting the saved-activation footprint.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalaggressionrecognition_tpu.models.swin3d import (
    ShiftedWindowAttention3d, SwinTransformer3d)
from multimodalaggressionrecognition_tpu.models.video_extractors import (
    WindowedVideoExtractor)


class TinySwinExtractor(nn.Module):
    """One-stage swin3d on small inputs: fast enough for CPU grad checks."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = SwinTransformer3d(embed_dim=16, depths=(2,), num_heads=(2,),
                              window=(8, 7, 7), name="backbone")(x, train=train)
        return jnp.mean(h, axis=(1, 2, 3))


def test_unfrozen_windowed_swin_gradients_flow(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 28, 28, 3)).astype(np.float32))
    model = WindowedVideoExtractor(TinySwinExtractor(), window=8,
                                   freeze=False)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    grads = jax.jit(jax.grad(
        lambda v: jnp.sum(model.apply(v, x) ** 2)))(variables)
    leaves = jax.tree.leaves_with_path(grads)
    assert leaves
    zero = [jax.tree_util.keystr(p) for p, g in leaves
            if float(jnp.max(jnp.abs(g))) == 0.0]
    assert not zero, f"dead gradients: {zero}"

    frozen = WindowedVideoExtractor(TinySwinExtractor(), window=8,
                                    freeze=True)
    gfrozen = jax.jit(jax.grad(
        lambda v: jnp.sum(frozen.apply(v, x) ** 2)))(variables)
    assert all(float(jnp.max(jnp.abs(g))) == 0.0
               for g in jax.tree.leaves(gfrozen))


@pytest.mark.parametrize("shift", [(0, 0, 0), (0, 3, 3)])
def test_fused_attention_vjp_matches_xla(rng, shift):
    x = jnp.asarray(rng.standard_normal((2, 4, 14, 14, 16)).astype(np.float32))
    mods = {}
    for use_pallas in (True, False):
        mods[use_pallas] = ShiftedWindowAttention3d(
            dim=16, num_heads=2, window=(4, 7, 7), shift=shift,
            use_pallas=use_pallas)
    variables = jax.jit(mods[True].init)(jax.random.PRNGKey(0), x)

    outs, grads = {}, {}
    for use_pallas, mod in mods.items():
        outs[use_pallas] = jax.jit(mod.apply)(variables, x)
        grads[use_pallas] = jax.jit(jax.grad(
            lambda v, m=mod: jnp.sum(m.apply(v, x) ** 2)))(variables)
    np.testing.assert_allclose(np.asarray(outs[True]),
                               np.asarray(outs[False]), atol=1e-5)
    for a, b in zip(jax.tree.leaves(grads[True]),
                    jax.tree.leaves(grads[False])):
        # rtol, not just atol: grad magnitudes here reach ~1e3 (sum-of-
        # squares loss), where f32 roundoff alone is ~1e-4 absolute; the
        # session-scoped rng makes the exact values order-dependent, so an
        # atol-only bound flips between suite orderings.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_remat_windowed_swin_matches(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 14, 14, 3)).astype(np.float32))
    plain = WindowedVideoExtractor(TinySwinExtractor(), window=8,
                                   freeze=False)
    remat = WindowedVideoExtractor(TinySwinExtractor(), window=8,
                                   freeze=False, remat=True)
    variables = jax.jit(plain.init)(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(jax.jit(plain.apply)(variables, x)),
                               np.asarray(jax.jit(remat.apply)(variables, x)),
                               atol=1e-6)
    g0 = jax.jit(jax.grad(lambda v: jnp.sum(plain.apply(v, x) ** 2)))(variables)
    g1 = jax.jit(jax.grad(lambda v: jnp.sum(remat.apply(v, x) ** 2)))(variables)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_unknown_remat_policy_rejected(rng):
    """A typo'd remat_policy must raise, not silently run the save-nothing
    policy (the sweep would otherwise 'measure' a policy it never ran)."""
    x = jnp.zeros((1, 8, 28, 28, 3), jnp.float32)
    model = SwinTransformer3d(embed_dim=16, depths=(2,), num_heads=(2,),
                              window=(8, 7, 7), remat=True,
                              remat_policy="dots_saveable")
    with pytest.raises(ValueError, match="remat_policy"):
        jax.eval_shape(model.init, jax.random.PRNGKey(0), x)

    ok = SwinTransformer3d(embed_dim=16, depths=(2,), num_heads=(2,),
                           window=(8, 7, 7), remat=True, remat_policy="dots")
    jax.eval_shape(ok.init, jax.random.PRNGKey(0), x)  # valid value traces
