"""Torch replicas of torchvision swin3d_t and s3d.

torchvision is absent in this environment, so these modules re-encode the
published architectures (reference models.py:49-59 Swin3d_T_extractor,
:61-71 S3D_extractor) with torchvision-compatible state_dict key names and
forward semantics, so io/torch_import converters and the Flax models can be
checked for logit parity end to end — the same approach as the hand-built
_TR3D18/_TVGG11BN replicas in test_video_models.py.

The shifted-window attention follows torchvision's functional
`shifted_window_attention_3d`: pad-to-window, clamp window/shift to the
input size, roll, partition, qkv with q pre-scaled, relative-position bias
looked up by slicing the FULL-window index buffer to [:N, :N], additive
-100 region mask for shifted windows, reverse, roll back, crop.
"""

import torch
import torch.nn.functional as F
from torch import nn as tnn


# --------------------------------------------------------------- swin3d_t
def _t_rel_pos_index(window):
    wt, wh, ww = window
    coords = torch.stack(torch.meshgrid(
        torch.arange(wt), torch.arange(wh), torch.arange(ww), indexing="ij"))
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += wt - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= 2 * ww - 1
    return rel.sum(-1)


class _TSwinAttn3d(tnn.Module):
    def __init__(self, dim, window, shift, heads):
        super().__init__()
        self.window, self.shift, self.heads = list(window), list(shift), heads
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.proj = tnn.Linear(dim, dim)
        self.relative_position_bias_table = tnn.Parameter(
            torch.randn((2 * window[0] - 1) * (2 * window[1] - 1)
                        * (2 * window[2] - 1), heads) * 0.02)
        self.register_buffer(
            "relative_position_index", _t_rel_pos_index(window))

    def forward(self, x):
        b, t, h, w, c = x.shape
        window, shift = self.window.copy(), self.shift.copy()
        size = [t, h, w]
        for i in range(3):
            if size[i] <= window[i]:
                window[i] = size[i]
                shift[i] = 0
        pad = [(window[i] - size[i] % window[i]) % window[i] for i in range(3)]
        x = F.pad(x, (0, 0, 0, pad[2], 0, pad[1], 0, pad[0]))
        _, tp, hp, wp, _ = x.shape
        if sum(shift) > 0:
            x = torch.roll(x, (-shift[0], -shift[1], -shift[2]), dims=(1, 2, 3))
        nwt, nwh, nww = tp // window[0], hp // window[1], wp // window[2]
        num_windows = nwt * nwh * nww
        n = window[0] * window[1] * window[2]
        xw = x.view(b, nwt, window[0], nwh, window[1], nww, window[2], c)
        xw = xw.permute(0, 1, 3, 5, 2, 4, 6, 7).reshape(b * num_windows, n, c)
        qkv = self.qkv(xw).reshape(
            b * num_windows, n, 3, self.heads, c // self.heads
        ).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q * (c // self.heads) ** -0.5
        attn = q.matmul(k.transpose(-2, -1))
        bias = self.relative_position_bias_table[
            self.relative_position_index[:n, :n].reshape(-1)
        ].view(n, n, -1).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if sum(shift) > 0:
            mask = x.new_zeros((tp, hp, wp))
            slices = [((0, -window[i]), (-window[i], -shift[i]),
                       (-shift[i], None)) for i in range(3)]
            count = 0
            for d in slices[0]:
                for hh in slices[1]:
                    for ww_ in slices[2]:
                        mask[d[0]:d[1], hh[0]:hh[1], ww_[0]:ww_[1]] = count
                        count += 1
            mask = mask.view(nwt, window[0], nwh, window[1], nww, window[2])
            mask = mask.permute(0, 2, 4, 1, 3, 5).reshape(num_windows, n)
            mask = mask.unsqueeze(1) - mask.unsqueeze(2)
            mask = mask.masked_fill(mask != 0, -100.0)
            attn = attn.view(b, num_windows, self.heads, n, n) \
                + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.heads, n, n)
        attn = F.softmax(attn, dim=-1)
        out = attn.matmul(v).transpose(1, 2).reshape(b * num_windows, n, c)
        out = self.proj(out)
        out = out.view(b, nwt, nwh, nww, window[0], window[1], window[2], c)
        out = out.permute(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, tp, hp, wp, c)
        if sum(shift) > 0:
            out = torch.roll(out, (shift[0], shift[1], shift[2]), dims=(1, 2, 3))
        return out[:, :t, :h, :w, :].contiguous()


class _TSwinBlock3d(tnn.Module):
    def __init__(self, dim, heads, window, shift, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = _TSwinAttn3d(dim, window, shift, heads)
        self.norm2 = tnn.LayerNorm(dim)
        hidden = int(dim * mlp_ratio)
        self.mlp = tnn.Sequential(
            tnn.Linear(dim, hidden), tnn.GELU(), tnn.Dropout(0.0),
            tnn.Linear(hidden, dim), tnn.Dropout(0.0))

    def forward(self, x):  # stochastic depth is identity at eval
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class _TPatchMerging3d(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = tnn.LayerNorm(4 * dim)

    def forward(self, x):
        _, _, h, w, _ = x.shape
        x = F.pad(x, (0, 0, 0, w % 2, 0, h % 2))
        x0 = x[:, :, 0::2, 0::2, :]
        x1 = x[:, :, 1::2, 0::2, :]
        x2 = x[:, :, 0::2, 1::2, :]
        x3 = x[:, :, 1::2, 1::2, :]
        x = torch.cat([x0, x1, x2, x3], dim=-1)
        return self.reduction(self.norm(x))


class _TPatchEmbed3d(tnn.Module):
    def __init__(self, embed_dim=96):
        super().__init__()
        self.proj = tnn.Conv3d(3, embed_dim, (2, 4, 4), (2, 4, 4))
        self.norm = tnn.LayerNorm(embed_dim)

    def forward(self, x):  # (B, C, T, H, W) -> (B, T', H', W', C')
        return self.norm(self.proj(x).permute(0, 2, 3, 4, 1))


class _TSwin3dT(tnn.Module):
    """torchvision swin3d_t backbone (headless), channels-first input."""

    def __init__(self, embed_dim=96, depths=(2, 2, 6, 2),
                 heads=(3, 6, 12, 24), window=(8, 7, 7)):
        super().__init__()
        self.patch_embed = _TPatchEmbed3d(embed_dim)
        layers = []
        dim = embed_dim
        for stage, (depth, nh) in enumerate(zip(depths, heads)):
            blocks = []
            for i in range(depth):
                shift = [0 if i % 2 == 0 else ws // 2 for ws in window]
                blocks.append(_TSwinBlock3d(dim, nh, window, shift))
            layers.append(tnn.Sequential(*blocks))
            if stage < len(depths) - 1:
                layers.append(_TPatchMerging3d(dim))
                dim *= 2
        self.features = tnn.Sequential(*layers)
        self.norm = tnn.LayerNorm(dim)

    def forward(self, x):  # (B, C, T, H, W) -> (B, C_final) mean-pooled
        x = self.norm(self.features(self.patch_embed(x)))
        return x.mean(dim=(1, 2, 3))


# -------------------------------------------------------------------- s3d
def _cna3d(cin, cout, k, s=1, p=0):
    """torchvision Conv3dNormActivation: conv(bias=False) + BN(eps=1e-3) + ReLU."""
    return tnn.Sequential(
        tnn.Conv3d(cin, cout, k, s, p, bias=False),
        tnn.BatchNorm3d(cout, eps=0.001),
        tnn.ReLU(inplace=True))


def _tsep(cin, cout, k, s, p):
    return tnn.Sequential(
        _cna3d(cin, cout, (1, k, k), (1, s, s), (0, p, p)),
        _cna3d(cout, cout, (k, 1, 1), (s, 1, 1), (p, 0, 0)))


class _TSepInception(tnn.Module):
    def __init__(self, cin, b0, b1m, b1, b2m, b2, b3):
        super().__init__()
        self.branch0 = _cna3d(cin, b0, 1)
        self.branch1 = tnn.Sequential(
            _cna3d(cin, b1m, 1), _tsep(b1m, b1, 3, 1, 1))
        self.branch2 = tnn.Sequential(
            _cna3d(cin, b2m, 1), _tsep(b2m, b2, 3, 1, 1))
        self.branch3 = tnn.Sequential(
            tnn.MaxPool3d(3, 1, 1), _cna3d(cin, b3, 1))

    def forward(self, x):
        return torch.cat([self.branch0(x), self.branch1(x),
                          self.branch2(x), self.branch3(x)], dim=1)


class _TS3D(tnn.Module):
    """torchvision S3D, channels-first input (B, 3, T, H, W)."""

    def __init__(self, num_classes=400):
        super().__init__()
        self.features = tnn.Sequential(
            _tsep(3, 64, 7, 2, 3),
            tnn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)),
            _cna3d(64, 64, 1),
            _tsep(64, 192, 3, 1, 1),
            tnn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)),
            _TSepInception(192, 64, 96, 128, 16, 32, 32),
            _TSepInception(256, 128, 128, 192, 32, 96, 64),
            tnn.MaxPool3d((3, 3, 3), (2, 2, 2), (1, 1, 1)),
            _TSepInception(480, 192, 96, 208, 16, 48, 64),
            _TSepInception(512, 160, 112, 224, 24, 64, 64),
            _TSepInception(512, 128, 128, 256, 24, 64, 64),
            _TSepInception(512, 112, 144, 288, 32, 64, 64),
            _TSepInception(528, 256, 160, 320, 32, 128, 128),
            tnn.MaxPool3d(2, 2),
            _TSepInception(832, 256, 160, 320, 32, 128, 128),
            _TSepInception(832, 384, 192, 384, 48, 128, 128))
        self.avgpool = tnn.AvgPool3d((2, 7, 7), 1)
        self.classifier = tnn.Sequential(
            tnn.Dropout(0.2), tnn.Conv3d(1024, num_classes, 1))

    def features_pooled(self, x):
        """Headless extractor output: global-avg-pooled 1024-d features."""
        return self.features(x).mean(dim=(2, 3, 4))

    def forward(self, x):
        x = self.classifier(self.avgpool(self.features(x)))
        return x.mean(dim=(2, 3, 4))
