"""R3D-18 (3-D ResNet-18) video models, channels-last.

Architecture follows torchvision.models.video.r3d_18 (the reference's frozen
video extractor, reference models.py:36-46, and the trainable
`R3DWithBboxes` trunk, models.py:307-342):

  stem   Conv3d(3->64, k=(3,7,7), s=(1,2,2), p=(1,3,3), no bias) BN ReLU
  layer1 2 x BasicBlock(64)        layer2 2 x BasicBlock(128, s=2)
  layer3 2 x BasicBlock(256, s=2)  layer4 2 x BasicBlock(512, s=2)
  head   global avg pool -> fc

`R3DWithBboxes` blends a person-bbox mask pyramid into the frames before
every stage: mask is nearest-resized to the stage's (T, H, W) and
frames' = (1-alpha)*frames + alpha*mask (reference models.py:325-334).
"""

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import TorchLinear
from .nn3d import BatchNorm, Conv3d, global_avg_pool


class BasicBlock3d(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        h = Conv3d(self.features, 3, stride=self.stride, padding=1,
                   use_bias=False, name="conv1")(x)
        h = BatchNorm(name="bn1")(h, use_running_average=not train)
        h = nn.relu(h)
        h = Conv3d(self.features, 3, padding=1, use_bias=False, name="conv2")(h)
        h = BatchNorm(name="bn2")(h, use_running_average=not train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = Conv3d(self.features, 1, stride=self.stride,
                              use_bias=False, name="downsample_conv")(x)
            identity = BatchNorm(name="downsample_bn")(
                identity, use_running_average=not train)
        return nn.relu(h + identity)


class R3DStem(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        h = Conv3d(64, (3, 7, 7), stride=(1, 2, 2), padding=(1, 3, 3),
                   use_bias=False, name="conv")(x)
        h = BatchNorm(name="bn")(h, use_running_average=not train)
        return nn.relu(h)


_LAYERS: Tuple[Tuple[int, int], ...] = ((64, 1), (128, 2), (256, 2), (512, 2))


class R3D18Trunk(nn.Module):
    """(B, T, H, W, 3) -> (B, T', H', W', 512) feature volume."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = R3DStem(name="stem")(x, train=train)
        for i, (feats, stride) in enumerate(_LAYERS, start=1):
            h = BasicBlock3d(feats, stride, name=f"layer{i}_0")(h, train=train)
            h = BasicBlock3d(feats, 1, name=f"layer{i}_1")(h, train=train)
        return h


class R3D18Extractor(nn.Module):
    """Headless r3d_18: global-pooled 512-d features (frozen-extractor slot)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return global_avg_pool(R3D18Trunk(name="trunk")(x, train=train))


class R3D18Classifier(nn.Module):
    """Full r3d_18 with the Kinetics fc head (for weight-parity checks)."""

    class_num: int = 400

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = global_avg_pool(R3D18Trunk(name="trunk")(x, train=train))
        return TorchLinear(self.class_num, name="fc")(h)


def _resize_nearest_3d(mask, t: int, h: int, w: int):
    """torch F.interpolate(mode='nearest') on (B, T, H, W, C)."""
    def idx(out, inp):
        return (jnp.arange(out) * inp // out).astype(jnp.int32)

    m = mask
    m = jnp.take(m, idx(t, m.shape[1]), axis=1)
    m = jnp.take(m, idx(h, m.shape[2]), axis=2)
    m = jnp.take(m, idx(w, m.shape[3]), axis=3)
    return m


class R3DWithBboxes(nn.Module):
    """R3D-18 trunk with per-stage bbox-mask blending + small MLP head.

    inputs: frames (B, T, H, W, 3), mask (B, T, H, W, 1) in {0,1}.
    """

    class_num: int
    alpha: float = 0.4
    dropout: float = 0.4

    @nn.compact
    def __call__(self, frames, mask=None, train: bool = False):
        stages = [R3DStem(name="stem")]
        for i, (feats, stride) in enumerate(_LAYERS, start=1):
            stages.append((f"layer{i}", feats, stride))

        h = frames
        for stage in stages:
            if mask is not None:
                t, hh, ww = h.shape[1:4]
                if mask.shape[1:4] != (t, hh, ww):
                    mask = _resize_nearest_3d(mask, t, hh, ww)
                h = (1.0 - self.alpha) * h + self.alpha * mask
            if isinstance(stage, R3DStem):
                h = stage(h, train=train)
            else:
                name, feats, stride = stage
                h = BasicBlock3d(feats, stride, name=f"{name}_0")(h, train=train)
                h = BasicBlock3d(feats, 1, name=f"{name}_1")(h, train=train)

        h = global_avg_pool(h)
        h = TorchLinear(128, name="fc1")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return TorchLinear(self.class_num, name="fc2")(h)


class R3D(R3DWithBboxes):
    """Mask-free variant (reference models.py:336-342)."""

    @nn.compact
    def __call__(self, frames, mask=None, train: bool = False):
        return super().__call__(frames, mask=None, train=train)
