"""Swin3D-T and S3D logit parity against torch replicas (see _replicas.py).

Closes the round-1 gap: these two backbones previously had only structural
tests. The replicas use torchvision state_dict key names, so the
io/torch_import converters are exercised end to end exactly as they would
be on real torchvision checkpoints (reference models.py:49-59, :61-71).

The full-config swin test uses an 8-frame 112x112 clip — the reference's
actual extractor window shape (train_multimodal.py:70-71: 128 frames in
8-frame windows at 112px) — which clamps the (8,7,7) attention window to
(4,7,7) (and (4,4,4) at stage 3), covering torchvision's sliced
relative-position-index semantics on the clamped path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from _replicas import _TS3D, _TSwin3dT
from multimodalaggressionrecognition_tpu.io import torch_import
from multimodalaggressionrecognition_tpu.models.s3d import (
    S3DClassifier, S3DExtractor)
from multimodalaggressionrecognition_tpu.models.swin3d import (
    SwinTransformer3d, Swin3dTExtractor)


def _sd(tm):
    return {k: v.numpy() for k, v in tm.state_dict().items()}


def _warm_bn(tm, fwd, x, rng):
    """Populate BN running stats with a train-mode pass so parity checks
    cover non-trivial statistics, as in test_video_models.py."""
    tm.train()
    with torch.no_grad():
        fwd(torch.from_numpy(
            rng.standard_normal(x.shape).astype(np.float32)))
    tm.eval()


def test_swin3d_small_parity_with_clamped_window(rng):
    """Small config where the window is clamped in t and (at stage 1) h/w:
    exercises the full-window-table + sliced-index path quickly."""
    torch.manual_seed(0)
    tm = _TSwin3dT(embed_dim=8, depths=(2, 2), heads=(2, 4),
                   window=(4, 3, 3)).eval()
    x = rng.standard_normal((2, 3, 4, 24, 24)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    variables = jax.tree.map(jnp.asarray, torch_import.swin3d_t(
        _sd(tm), depths=(2, 2)))
    model = SwinTransformer3d(embed_dim=8, depths=(2, 2), num_heads=(2, 4),
                              window=(4, 3, 3))
    feats = jax.jit(model.apply)(variables,
                                 jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    got = np.asarray(jnp.mean(feats, axis=(1, 2, 3)))
    np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.slow
def test_swin3d_t_full_logit_parity(rng):
    """Published swin3d_t config on the reference's (8, 112, 112) window."""
    torch.manual_seed(0)
    tm = _TSwin3dT().eval()
    x = rng.standard_normal((1, 3, 8, 112, 112)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    converted = torch_import.swin3d_t(_sd(tm))
    ext = Swin3dTExtractor()
    variables = {"params": {"backbone": jax.tree.map(
        jnp.asarray, converted["params"])}}
    got = np.asarray(jax.jit(ext.apply)(
        variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1))))
    assert got.shape == ref.shape == (1, 768)
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_s3d_extractor_feature_parity(rng):
    """Headless S3D (reference S3D_extractor semantics) on a small clip."""
    torch.manual_seed(0)
    tm = _TS3D(num_classes=7)
    x = rng.standard_normal((1, 3, 16, 64, 64)).astype(np.float32) * 0.5
    _warm_bn(tm, tm.features_pooled, x, rng)
    with torch.no_grad():
        ref = tm.features_pooled(torch.from_numpy(x)).numpy()
    variables = jax.tree.map(jnp.asarray, torch_import.s3d(_sd(tm)))
    ext_vars = {"params": {"features": variables["params"]["features"]},
                "batch_stats": variables["batch_stats"]}
    got = np.asarray(jax.jit(S3DExtractor().apply)(
        ext_vars, jnp.asarray(x.transpose(0, 2, 3, 4, 1))))
    assert got.shape == ref.shape == (1, 1024)
    np.testing.assert_allclose(got, ref, atol=2e-3)


@pytest.mark.slow
def test_s3d_classifier_logit_parity(rng):
    """Full torchvision S3D head (AvgPool3d(2,7,7) -> 1x1 conv -> mean):
    needs a 224px input so the feature map reaches (2, 7, 7)."""
    torch.manual_seed(0)
    tm = _TS3D(num_classes=5)
    x = rng.standard_normal((1, 3, 16, 224, 224)).astype(np.float32) * 0.5
    _warm_bn(tm, tm, x, rng)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    variables = jax.tree.map(jnp.asarray, torch_import.s3d(_sd(tm)))
    got = np.asarray(jax.jit(S3DClassifier(5).apply)(
        variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1))))
    np.testing.assert_allclose(got, ref, atol=2e-3)
