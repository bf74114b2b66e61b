"""Windowed frozen video feature extraction.

The reference slid a window over the frame axis and ran the backbone once
per window in a Python loop — 16 sequential CUDA calls for 128 frames
(reference models.py:25-32).  Here the windows are folded into the batch
axis and the backbone runs ONCE on (B * T/win, win, H, W, C): a single large
MXU-saturating call (ops/video.py window_frames).
"""

import flax.linen as nn
import jax

from ..ops.video import unwindow_features, window_frames


class WindowedVideoExtractor(nn.Module):
    """(B, T, H, W, C) -> (B, T//window, D) token sequence.

    `backbone` maps (B', window, H, W, C) -> (B', D); frozen (stop_gradient)
    by default like the reference's no_grad extractors.  `remat` wraps a
    *trainable* backbone in gradient checkpointing (jax.checkpoint) so long
    clips fit HBM — activations are recomputed in the backward pass.
    """

    backbone: nn.Module
    window: int = 16
    freeze: bool = True
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        wins, num = window_frames(x, self.window)
        do_train = False if self.freeze else train
        if self.remat and not self.freeze:
            feats = nn.remat(
                lambda mdl, w: mdl(w, train=do_train))(self.backbone, wins)
        else:
            feats = self.backbone(wins, train=do_train)
        if self.freeze:
            feats = jax.lax.stop_gradient(feats)
        return unwindow_features(feats, b, num)
