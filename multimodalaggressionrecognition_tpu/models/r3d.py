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


class _StemConvS2D(nn.Module):
    """The stem conv computed via 2x2 space-to-depth, exact rewrite.

    Holds the CANONICAL kernel param (3, 7, 7, 3, 64) under the same
    name/shape as Conv3d, so checkpoints and torch converters see no
    difference; the packed kernel is derived from it inside the forward.

    Identity: out[j] = sum_k x[2j - 3 + k] w[k] (per H and W axis).  With
    packed cells x'[p, r] = x[2p + r] (r in {0,1}) the window spans packed
    cells p = j-2 .. j+1, and k = 2*kp + r - 1, i.e. the packed kernel is
    w'[kp, r] = w_pad[2*kp + r] where w_pad is w with one leading zero —
    a reshape of the zero-padded kernel, no arithmetic.
    """

    @nn.compact
    def __call__(self, x):
        import jax

        from ..utils.torch_compat import uniform_fan_in

        b, t, hh, ww, c = x.shape
        kernel = self.param("kernel", uniform_fan_in(c * 3 * 7 * 7),
                            (3, 7, 7, c, 64))
        # pack input: (B,T,H,W,C) -> (B,T,H/2,W/2, 2*2*C), channel order
        # (ry, rx, c)
        xp = x.reshape(b, t, hh // 2, 2, ww // 2, 2, c)
        xp = xp.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
            b, t, hh // 2, ww // 2, 4 * c)
        # pack kernel: zero-pad each stride-2 spatial dim 7 -> 8, then
        # (kt, 8, 8, c, o) -> (kt, kp_y, r_y, kp_x, r_x, c, o) ->
        # (kt, 4, 4, (ry, rx, c), o)
        wp = jnp.pad(kernel, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
        wp = wp.reshape(3, 4, 2, 4, 2, c, 64)
        wp = wp.transpose(0, 1, 3, 2, 4, 5, 6).reshape(3, 4, 4, 4 * c, 64)
        # (Folding the kt=3 temporal taps into channels as well — one 2-D
        # conv with C_in=12c — measured faster on the bare conv but slower
        # in the full model: the 3x T-stack concat breaks the BN/ReLU
        # fusion. The 3-D packed conv is the better full-model form.)
        # no preferred_element_type=f32: its conv TRANSPOSE rule breaks
        # bf16 training (see models/nn3d.ConvNd); MXU accumulates f32 anyway
        y = jax.lax.conv_general_dilated(
            xp, wp.astype(x.dtype), window_strides=(1, 1, 1),
            padding=[(1, 1), (2, 1), (2, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return y.astype(x.dtype)


class R3DStem(nn.Module):
    """Stem conv: 3->64, k=(3,7,7), s=(1,2,2), p=(1,3,3).

    On TPU the naive form runs at ~2% MFU (C_in=3 against a 128-lane conv
    unit; measured 6.4 ms of the 12.5 ms batch-8 16f@112 forward,
    benchmarks/profile_video_stages.py).  `space_to_depth=True` (default)
    computes it exactly via `_StemConvS2D`: 2x2-packed input (H/2, W/2, 12
    channels) against a 4x4-stride-1 packed kernel — identical math
    (tests/test_video_models.py parity tests run through it), 4x fewer
    spatial positions against the lane unit.  Param path/shape is identical
    either way ('conv/kernel', (3,7,7,3,64)), so converters/checkpoints are
    unaffected.
    """

    space_to_depth: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.space_to_depth and x.shape[2] % 2 == 0 and x.shape[3] % 2 == 0:
            h = _StemConvS2D(name="conv")(x)
        else:
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
    """torch F.interpolate(mode='nearest') on (B, T, H, W, C).

    Exact integer downsamples (the only case the R3D mask pyramid hits:
    112 -> 56/28/14/7, 16 -> 8/4/2) are strided slices — floor(i*inp/out)
    == i*(inp//out) when out divides inp — which TPU executes as cheap
    copies instead of gathers (measured ~1.2 ms of the batch-8 16f@112
    forward before this, benchmarks/profile_video_stages.py)."""
    def shrink(m, axis, out):
        inp = m.shape[axis]
        if inp == out:
            return m
        if inp % out == 0:
            sl = [slice(None)] * m.ndim
            sl[axis] = slice(0, None, inp // out)
            return m[tuple(sl)]
        return jnp.take(m, (jnp.arange(out) * inp // out).astype(jnp.int32),
                        axis=axis)

    m = shrink(mask, 1, t)
    m = shrink(m, 2, h)
    m = shrink(m, 3, w)
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
