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
    y0 = plain.apply(variables, x)
    y1 = remat.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)

    g0 = jax.grad(lambda p: jnp.sum(plain.apply(p, x) ** 2))(variables)
    g1 = jax.grad(lambda p: jnp.sum(remat.apply(p, x) ** 2))(variables)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
