"""S3D (separable 3-D Inception) video network, channels-last.

Follows torchvision.models.video.s3d — the reference's third frozen video
extractor option (reference models.py:61-71, which keeps `features` +
AdaptiveAvgPool3d -> 1024-d).  Every spatial/temporal factorized conv pair is
a Conv3dNormActivation (conv no-bias + BN + ReLU).
"""

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .nn3d import BatchNorm, Conv3d, global_avg_pool, max_pool_nd


class ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (0, 0, 0)
    eps: float = 0.001  # torchvision s3d uses BN eps=0.001

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = Conv3d(self.features, self.kernel, stride=self.stride,
                   padding=self.padding, use_bias=False, name="conv")(x)
        h = BatchNorm(eps=self.eps, name="bn")(h, use_running_average=not train)
        return nn.relu(h)


class TemporalSeparableConv(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, s, p = self.kernel, self.stride, self.padding
        h = ConvBN(self.features, (1, k, k), (1, s, s), (0, p, p),
                   name="spatial")(x, train=train)
        return ConvBN(self.features, (k, 1, 1), (s, 1, 1), (p, 0, 0),
                      name="temporal")(h, train=train)


class SepInceptionBlock3D(nn.Module):
    b0: int
    b1_mid: int
    b1: int
    b2_mid: int
    b2: int
    b3: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        br0 = ConvBN(self.b0, (1, 1, 1), name="branch0")(x, train=train)
        br1 = ConvBN(self.b1_mid, (1, 1, 1), name="branch1_0")(x, train=train)
        br1 = TemporalSeparableConv(self.b1, 3, 1, 1, name="branch1_1")(
            br1, train=train)
        br2 = ConvBN(self.b2_mid, (1, 1, 1), name="branch2_0")(x, train=train)
        br2 = TemporalSeparableConv(self.b2, 3, 1, 1, name="branch2_1")(
            br2, train=train)
        br3 = max_pool_nd(x, 3, 1, padding=1)
        br3 = ConvBN(self.b3, (1, 1, 1), name="branch3_1")(br3, train=train)
        return jnp.concatenate([br0, br1, br2, br3], axis=-1)


_INCEPTIONS = (
    (64, 96, 128, 16, 32, 32),
    (128, 128, 192, 32, 96, 64),
    "pool",
    (192, 96, 208, 16, 48, 64),
    (160, 112, 224, 24, 64, 64),
    (128, 128, 256, 24, 64, 64),
    (112, 144, 288, 32, 64, 64),
    (256, 160, 320, 32, 128, 128),
    "pool2",
    (256, 160, 320, 32, 128, 128),
    (384, 192, 384, 48, 128, 128),
)


class S3DFeatures(nn.Module):
    """(B, T, H, W, 3) -> (B, T', H', W', 1024)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = TemporalSeparableConv(64, 7, 2, 3, name="stem0")(x, train=train)
        h = max_pool_nd(h, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        h = ConvBN(64, (1, 1, 1), name="stem1")(h, train=train)
        h = TemporalSeparableConv(192, 3, 1, 1, name="stem2")(h, train=train)
        h = max_pool_nd(h, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        idx = 0
        for spec in _INCEPTIONS:
            if spec == "pool":
                h = max_pool_nd(h, 3, 2, 1)
            elif spec == "pool2":
                h = max_pool_nd(h, 2, 2, 0)
            else:
                h = SepInceptionBlock3D(*spec, name=f"inception{idx}")(
                    h, train=train)
                idx += 1
        return h


class S3DExtractor(nn.Module):
    """Headless S3D: global-pooled 1024-d features (reference models.py:61-71)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return global_avg_pool(S3DFeatures(name="features")(x, train=train))


class S3DClassifier(nn.Module):
    """Full S3D with the Kinetics conv head (for weight-parity checks)."""

    class_num: int = 400
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = S3DFeatures(name="features")(x, train=train)
        # torchvision: AvgPool3d((2,7,7), stride=1) -> dropout -> 1x1 conv -> mean
        import jax

        h = jax.lax.reduce_window(
            h, 0.0, jax.lax.add, (1, 2, 7, 7, 1), (1, 1, 1, 1, 1),
            "VALID") / (2 * 7 * 7)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = Conv3d(self.class_num, 1, name="head")(h)
        return jnp.mean(h, axis=(1, 2, 3))
