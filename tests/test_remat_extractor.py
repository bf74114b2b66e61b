import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multimodalaggressionrecognition_tpu.models.video_extractors import (
    WindowedVideoExtractor)


class TinyBackbone(nn.Module):
    dim: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        from multimodalaggressionrecognition_tpu.models.layers import TorchLinear

        h = jnp.mean(x, axis=(1, 2, 3))
        return TorchLinear(self.dim)(h)


def test_remat_extractor_same_values_and_grads(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 4, 4, 3)).astype(np.float32))
    plain = WindowedVideoExtractor(TinyBackbone(), window=8, freeze=False)
    remat = WindowedVideoExtractor(TinyBackbone(), window=8, freeze=False,
                                   remat=True)
    variables = plain.init(jax.random.PRNGKey(0), x)
    y0 = jax.jit(plain.apply)(variables, x)
    y1 = jax.jit(remat.apply)(variables, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)

    g0 = jax.jit(jax.grad(lambda p: jnp.sum(plain.apply(p, x) ** 2)))(variables)
    g1 = jax.jit(jax.grad(lambda p: jnp.sum(remat.apply(p, x) ** 2)))(variables)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_swin_block_level_remat_same_values_and_grads(rng):
    """SwinTransformer3d(remat=True) checkpoints each block: bit-identical
    forward and round-off-identical gradients, including the train-mode
    stochastic-depth path (deterministic is static under nn.remat)."""
    from multimodalaggressionrecognition_tpu.models.swin3d import (
        SwinTransformer3d)

    x = jnp.asarray(rng.standard_normal((2, 8, 24, 24, 3)).astype(np.float32))
    plain = SwinTransformer3d(embed_dim=8, depths=(2, 2), num_heads=(2, 4),
                              window=(4, 3, 3))
    remat = SwinTransformer3d(embed_dim=8, depths=(2, 2), num_heads=(2, 4),
                              window=(4, 3, 3), remat=True)
    dots = SwinTransformer3d(embed_dim=8, depths=(2, 2), num_heads=(2, 4),
                             window=(4, 3, 3), remat=True, remat_policy="dots")
    variables = plain.init(jax.random.PRNGKey(0), x)
    y_plain = jax.jit(plain.apply)(variables, x)
    np.testing.assert_array_equal(np.asarray(y_plain),
                                  np.asarray(jax.jit(remat.apply)(variables, x)))
    np.testing.assert_array_equal(np.asarray(y_plain),
                                  np.asarray(jax.jit(dots.apply)(variables, x)))
    g0 = jax.jit(jax.grad(lambda p: jnp.sum(plain.apply(p, x) ** 2)))(variables)
    g1 = jax.jit(jax.grad(lambda p: jnp.sum(remat.apply(p, x) ** 2)))(variables)
    g2 = jax.jit(jax.grad(lambda p: jnp.sum(dots.apply(p, x) ** 2)))(variables)
    for a, b, c in zip(jax.tree.leaves(g0), jax.tree.leaves(g1),
                       jax.tree.leaves(g2)):
        # jit fuses the plain and remat programs differently (remat was
        # bit-identical eager), and the dots policy changes what's saved
        # vs recomputed — both may reassociate reductions; allow float
        # round-off, nothing more
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-5, atol=2e-6)

    rngs = {"dropout": jax.random.PRNGKey(1)}
    out = remat.apply(variables, x, train=True, rngs=rngs)
    assert np.isfinite(np.asarray(out)).all()
