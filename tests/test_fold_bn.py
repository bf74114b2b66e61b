import jax
import jax.numpy as jnp
import numpy as np

from multimodalaggressionrecognition_tpu.models.cnn1d import CNN1DExtractor
from multimodalaggressionrecognition_tpu.utils.fold_bn import fold_cnn1d_variables


def test_folded_extractor_matches_eval(rng):
    x = jnp.asarray(rng.standard_normal((2, 20000)).astype(np.float32) * 0.3)
    base = CNN1DExtractor()
    variables = base.init(jax.random.PRNGKey(0), x)
    # non-trivial BN stats: run one train step's worth of stats updates
    _, updates = base.apply(variables, x, train=True, mutable=["batch_stats"],
                            rngs={"dropout": jax.random.PRNGKey(1)})
    variables = {"params": variables["params"],
                 "batch_stats": updates["batch_stats"]}
    ref = base.apply(variables, x)

    folded_vars = fold_cnn1d_variables(variables, path=())
    folded = CNN1DExtractor(folded=True)
    got = folded.apply(folded_vars, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)
