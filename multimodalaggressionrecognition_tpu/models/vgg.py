"""VGG11-BN image classifier (the reference's spectrogram model,
reference train_audio_transformer.py:157: 3-channel spectrogram stacks fed
to torchvision vgg11_bn).  Channels-last (B, H, W, 3).

Configuration 'A' with batch norm: conv 64 M 128 M 256 256 M 512 512 M
512 512 M, adaptive 7x7 avg pool, classifier 4096-4096-classes.
"""

import flax.linen as nn
import jax.numpy as jnp

from .layers import TorchLinear
from .nn3d import BatchNorm, Conv2d, max_pool_nd

_VGG11 = (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M")


class VGG11BN(nn.Module):
    class_num: int = 1000
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        idx = 0
        for v in _VGG11:
            if v == "M":
                x = max_pool_nd(x, 2, 2)
            else:
                x = Conv2d(v, 3, padding=1, name=f"conv{idx}")(x)
                x = BatchNorm(name=f"bn{idx}")(x, use_running_average=not train)
                x = nn.relu(x)
                idx += 1
        # adaptive 7x7 average pool (exact torch semantics)
        b = x.shape[0]
        if x.shape[1:3] != (7, 7):
            from ..ops.video import adaptive_avg_pool_2d

            x = adaptive_avg_pool_2d(x, 7, 7)
        # torch flattens (C, 7, 7) C-order; transpose to match
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
        x = TorchLinear(4096, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        x = TorchLinear(4096, name="fc2")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return TorchLinear(self.class_num, name="fc3")(x)
