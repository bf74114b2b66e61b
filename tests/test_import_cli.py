import os

import jax
import jax.numpy as jnp
import numpy as np
import torch

from tests.test_cnn1d import _TorchCNN1D


def test_import_torch_checkpoint_cli(tmp_path, rng):
    from multimodalaggressionrecognition_tpu.cli import import_torch_checkpoint
    from multimodalaggressionrecognition_tpu.models.cnn1d import CNN1D

    tm = _TorchCNN1D(2).eval()
    pt = str(tmp_path / "model.pt")
    torch.save(tm.state_dict(), pt)
    out = str(tmp_path / "converted")
    import_torch_checkpoint.main([
        "--model", "cnn1d", "--torch_path", pt, "--out_dir", out])
    assert os.path.isdir(out)

    import orbax.checkpoint as ocp

    variables = ocp.StandardCheckpointer().restore(out)
    x = rng.standard_normal((1, 80000)).astype(np.float32) * 0.1
    got = CNN1D(2).apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(x))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x[:, None, :])).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3)
