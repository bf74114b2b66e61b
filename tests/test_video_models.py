"""Video ops + R3D-18 + VGG11-BN parity against torch replicas.

The torch models below re-encode the published torchvision architectures
(golden specs for the reference's extractors, reference models.py:36-46,
307-342; train_audio_transformer.py:157) with torchvision-compatible
state_dict key names so io/torch_import converters are exercised end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn as tnn

from multimodalaggressionrecognition_tpu.io import torch_import
from multimodalaggressionrecognition_tpu.models.r3d import (
    R3D18Classifier, R3DWithBboxes)
from multimodalaggressionrecognition_tpu.models.vgg import VGG11BN
from multimodalaggressionrecognition_tpu.ops.video import (
    adaptive_avg_pool_2d, rasterize_boxes, resize_bilinear, window_frames)


def test_resize_bilinear_antialias_matches_torch(rng):
    x = rng.standard_normal((2, 3, 64, 48)).astype(np.float32)  # NCHW for torch
    ref = F.interpolate(torch.from_numpy(x), (112, 112), mode="bilinear",
                        antialias=True).numpy()
    got = resize_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), 112, 112,
                          antialias=True)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=2e-4)
    # downscale (where antialias actually differs)
    ref = F.interpolate(torch.from_numpy(x), (32, 24), mode="bilinear",
                        antialias=True).numpy()
    got = resize_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), 32, 24,
                          antialias=True)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=2e-4)


def test_resize_bilinear_no_antialias_matches_torch(rng):
    x = rng.standard_normal((2, 3, 20, 30)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), (9, 14), mode="bilinear").numpy()
    got = resize_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), 9, 14,
                          antialias=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=2e-4)


def test_adaptive_avg_pool_matches_torch(rng):
    for in_hw, out_hw in [((3, 3), (7, 7)), ((15, 9), (7, 7)), ((8, 8), (1, 1))]:
        x = rng.standard_normal((2, 4, *in_hw)).astype(np.float32)
        ref = F.adaptive_avg_pool2d(torch.from_numpy(x), out_hw).numpy()
        got = adaptive_avg_pool_2d(jnp.asarray(x.transpose(0, 2, 3, 1)), *out_hw)
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                                   atol=1e-5)


def test_rasterize_boxes(rng):
    boxes = jnp.asarray([[[2.0, 1.0, 5.0, 3.0]]])  # (B=1, T=1, 4)
    mask = rasterize_boxes(boxes, 6, 8)
    assert mask.shape == (1, 1, 6, 8)
    m = np.asarray(mask)[0, 0]
    assert m[1:4, 2:6].all() and m.sum() == 3 * 4


def test_window_frames_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 4, 4, 3)).astype(np.float32))
    wins, num = window_frames(x, 8)
    assert wins.shape == (4, 8, 4, 4, 3) and num == 2
    np.testing.assert_allclose(np.asarray(wins[0]), np.asarray(x[0, :8]))
    np.testing.assert_allclose(np.asarray(wins[1]), np.asarray(x[0, 8:16]))
    np.testing.assert_allclose(np.asarray(wins[2]), np.asarray(x[1, :8]))


# ---------------------------------------------------------------- torch replicas
class _TBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Sequential(
            tnn.Conv3d(cin, cout, 3, stride, 1, bias=False),
            tnn.BatchNorm3d(cout), tnn.ReLU())
        self.conv2 = tnn.Sequential(
            tnn.Conv3d(cout, cout, 3, 1, 1, bias=False), tnn.BatchNorm3d(cout))
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv3d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm3d(cout))
        self.relu = tnn.ReLU()

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        return self.relu(self.conv2(self.conv1(x)) + identity)


class _TR3D18(tnn.Module):
    def __init__(self, class_num=400):
        super().__init__()
        self.stem = tnn.Sequential(
            tnn.Conv3d(3, 64, (3, 7, 7), (1, 2, 2), (1, 3, 3), bias=False),
            tnn.BatchNorm3d(64), tnn.ReLU())
        self.layer1 = tnn.Sequential(_TBasicBlock(64, 64), _TBasicBlock(64, 64))
        self.layer2 = tnn.Sequential(_TBasicBlock(64, 128, 2), _TBasicBlock(128, 128))
        self.layer3 = tnn.Sequential(_TBasicBlock(128, 256, 2), _TBasicBlock(256, 256))
        self.layer4 = tnn.Sequential(_TBasicBlock(256, 512, 2), _TBasicBlock(512, 512))
        self.avgpool = tnn.AdaptiveAvgPool3d(1)
        self.fc = tnn.Linear(512, class_num)

    def forward(self, x):
        x = self.layer4(self.layer3(self.layer2(self.layer1(self.stem(x)))))
        return self.fc(torch.flatten(self.avgpool(x), 1))


def test_r3d18_logit_parity(rng):
    x = rng.standard_normal((1, 3, 8, 56, 56)).astype(np.float32) * 0.5
    tm = _TR3D18(10).eval()
    with torch.no_grad():
        tm.train()
        tm(torch.from_numpy(rng.standard_normal((2, 3, 8, 56, 56)).astype(np.float32)))
        tm.eval()
        ref = tm(torch.from_numpy(x)).numpy()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, torch_import.r3d18(sd))
    # NCTHW -> NTHWC
    got = R3D18Classifier(10).apply(variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-3)


def test_stem_space_to_depth_exact(rng):
    """The 2x2 space-to-depth stem rewrite (TPU lane-utilization fix,
    models/r3d.py _StemConvS2D) is numerically identical to the plain
    stride-2 conv, and odd spatial sizes fall back to the plain path."""
    from multimodalaggressionrecognition_tpu.models.r3d import R3DStem

    x = jnp.asarray(rng.standard_normal((2, 4, 16, 20, 3)).astype(np.float32))
    plain = R3DStem(space_to_depth=False)
    variables = plain.init(jax.random.PRNGKey(0), x)
    y0 = plain.apply(variables, x)
    y1 = R3DStem(space_to_depth=True).apply(variables, x)  # same param path
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)

    x_odd = jnp.asarray(rng.standard_normal((1, 2, 15, 15, 3)).astype(np.float32))
    v_odd = plain.init(jax.random.PRNGKey(0), x_odd)
    np.testing.assert_allclose(
        np.asarray(R3DStem(space_to_depth=True).apply(v_odd, x_odd)),
        np.asarray(plain.apply(v_odd, x_odd)), atol=1e-5)


def test_r3d_with_bboxes_forward(rng):
    frames = jnp.asarray(rng.standard_normal((2, 8, 32, 32, 3)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0, 16, (2, 8, 4)).astype(np.float32))
    boxes = boxes.at[..., 2:].add(8.0)
    mask = rasterize_boxes(boxes, 32, 32)[..., None]
    m = R3DWithBboxes(class_num=4)
    variables = m.init(jax.random.PRNGKey(0), frames, mask)
    out = m.apply(variables, frames, mask)
    assert out.shape == (2, 4)
    assert np.isfinite(np.asarray(out)).all()


class _TVGG11BN(tnn.Module):
    def __init__(self, class_num=10):
        super().__init__()
        cfg = [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"]
        layers, cin = [], 3
        for v in cfg:
            if v == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers += [tnn.Conv2d(cin, v, 3, padding=1), tnn.BatchNorm2d(v),
                           tnn.ReLU(True)]
                cin = v
        self.features = tnn.Sequential(*layers)
        self.avgpool = tnn.AdaptiveAvgPool2d((7, 7))
        self.classifier = tnn.Sequential(
            tnn.Linear(512 * 49, 4096), tnn.ReLU(True), tnn.Dropout(),
            tnn.Linear(4096, 4096), tnn.ReLU(True), tnn.Dropout(),
            tnn.Linear(4096, class_num))

    def forward(self, x):
        return self.classifier(torch.flatten(self.avgpool(self.features(x)), 1))


def test_vgg11_bn_logit_parity(rng):
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32) * 0.5
    tm = _TVGG11BN(10).eval()
    with torch.no_grad():
        tm.train()
        tm(torch.from_numpy(rng.standard_normal((2, 3, 64, 64)).astype(np.float32)))
        tm.eval()
        ref = tm(torch.from_numpy(x)).numpy()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, torch_import.vgg11_bn(sd))
    got = VGG11BN(10).apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-3)
