"""Torch-CPU reference baselines for BASELINE.md configs 1-4.

bench.py measures config 5 (the flagship) against a torch-CPU subprocess;
this module gives the remaining driver-defined configs their own measured
reference number (VERDICT r2 item 5), so every row in results_v5e.json can
carry `vs_baseline` instead of asserting the >=5x north star only for the
flagship.  Each model mirrors the reference implementation style (plain
torch modules, channels-first, eval + no_grad — how the reference scripts
ran inference, reference trainer.py:464-465) at the exact shapes bench_all
uses.

Run as a subprocess (clean process, no JAX runtime contention):
    python benchmarks/torch_baselines.py <config1|config2|config3|config4>
prints one float: clips/sec.
"""

import sys
import time

import numpy as np
import torch
from torch import nn

def _measure(model, args, batch, iters=10, warmup=2):
    model.eval()
    with torch.no_grad():
        for _ in range(warmup):
            model(*args)
        t0 = time.perf_counter()
        for _ in range(iters):
            model(*args)
        dt = (time.perf_counter() - t0) / iters
    return batch / dt


def config1(batch=16, seconds=10):
    """wav -> wav2vec1-style conv encoder -> GRU head (bench_audio_rnn)."""

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            layers = []
            cin = 1
            for feats, k, s in ((512, 10, 5), (512, 8, 4), (512, 4, 2),
                                (512, 4, 2), (512, 4, 2)):
                layers += [nn.Conv1d(cin, feats, k, stride=s, bias=False),
                           nn.GroupNorm(1, feats), nn.ReLU()]
                cin = feats
            self.encoder = nn.Sequential(*layers)
            self.gru = nn.GRU(512, 512, batch_first=True)
            self.head = nn.Sequential(nn.Linear(512, 256), nn.ReLU(),
                                      nn.Dropout(0.5), nn.Linear(256, 2))

        def forward(self, x):
            h = self.encoder(x).permute(0, 2, 1)
            seq, _ = self.gru(h)
            return self.head(seq[:, -1])

    x = torch.from_numpy(np.random.default_rng(0).standard_normal(
        (batch, 1, 16000 * seconds)).astype(np.float32) * 0.1)
    return _measure(Model(), (x,), batch, iters=5, warmup=1)


def _r3d_block(cin, cout, stride):
    return nn.ModuleDict({
        "conv1": nn.Conv3d(cin, cout, 3, stride=stride, padding=1, bias=False),
        "bn1": nn.BatchNorm3d(cout),
        "conv2": nn.Conv3d(cout, cout, 3, padding=1, bias=False),
        "bn2": nn.BatchNorm3d(cout),
        "down": (nn.Sequential(nn.Conv3d(cin, cout, 1, stride=stride,
                                         bias=False), nn.BatchNorm3d(cout))
                 if (stride != 1 or cin != cout) else nn.Identity()),
    })


def config2(batch=8, frames=16, size=112):
    """16f 112px clip -> R3D-18 with per-stage bbox blend (bench_video_3dcnn,
    reference models.py:307-342)."""

    class Model(nn.Module):
        def __init__(self, alpha=0.4):
            super().__init__()
            self.alpha = alpha
            self.stem = nn.Sequential(
                nn.Conv3d(3, 64, (3, 7, 7), stride=(1, 2, 2),
                          padding=(1, 3, 3), bias=False),
                nn.BatchNorm3d(64), nn.ReLU())
            chans = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
            self.blocks = nn.ModuleList()
            for cin, cout, s in chans:
                self.blocks.append(_r3d_block(cin, cout, s))
                self.blocks.append(_r3d_block(cout, cout, 1))
            self.head = nn.Sequential(nn.Linear(512, 128), nn.ReLU(),
                                      nn.Dropout(0.4), nn.Linear(128, 4))

        @staticmethod
        def _block(b, x):
            h = torch.relu(b["bn1"](b["conv1"](x)))
            h = b["bn2"](b["conv2"](h))
            return torch.relu(h + b["down"](x))

        def forward(self, x, mask):
            def blend(h, m):
                if m.shape[2:] != h.shape[2:]:
                    m = nn.functional.interpolate(m, size=h.shape[2:],
                                                  mode="nearest")
                return (1 - self.alpha) * h + self.alpha * m

            h = self.stem(blend(x, mask))
            for i in range(0, len(self.blocks), 2):
                h = blend(h, mask)
                h = self._block(self.blocks[i], h)
                h = self._block(self.blocks[i + 1], h)
            h = h.mean(dim=(2, 3, 4))
            return self.head(h)

    rng = np.random.default_rng(0)
    x = torch.from_numpy(rng.standard_normal(
        (batch, 3, frames, size, size)).astype(np.float32) * 0.3)
    mask = torch.from_numpy((rng.uniform(0, 1, (batch, 1, frames, size, size))
                             > 0.5).astype(np.float32))
    return _measure(Model(), (x, mask), batch, iters=5, warmup=1)


class _SeqClassifier(nn.Module):
    """2-layer transformer + mean-pool MLP (TransformerSequenceClassifier)."""

    def __init__(self, d, heads=8, layers=2, classes=2):
        super().__init__()
        layer = nn.TransformerEncoderLayer(d_model=d, nhead=heads,
                                           batch_first=True)
        self.encoder = nn.TransformerEncoder(layer, layers,
                                             norm=nn.LayerNorm(d))
        self.head = nn.Sequential(nn.Linear(d, 256), nn.ReLU(),
                                  nn.Dropout(0.3), nn.Linear(256, 2))

    def forward(self, x, features=False):
        h = self.encoder(x)
        if features:
            return h
        return self.head(h.mean(dim=1))


def config3(batch=32):
    """Precomputed-feature transformer heads (bench_feature_transformers);
    returns the slower of the audio (49x768) / video (16x768) rows."""
    worst = float("inf")
    for t, d in ((49, 768), (16, 768)):
        x = torch.from_numpy(np.random.default_rng(0).standard_normal(
            (batch, t, d)).astype(np.float32))
        worst = min(worst, _measure(_SeqClassifier(d), (x,), batch))
    return worst


def config4(batch=32):
    """CNN1D audio tower + transformer text tower (bench_audio_text,
    reference models.py:889-928)."""

    def conv_block(cin, cout, pool=True):
        layers = [nn.Conv1d(cin, cout, 3, padding=1), nn.BatchNorm1d(cout),
                  nn.ReLU(),
                  nn.Conv1d(cout, cout, 3, padding=1), nn.BatchNorm1d(cout),
                  nn.ReLU()]
        if pool:
            layers.append(nn.MaxPool1d(4, 4))
        layers.append(nn.Dropout1d(0.1))
        return layers

    class Model(nn.Module):
        def __init__(self, hidden=768):
            super().__init__()
            self.audio = nn.Sequential(
                nn.Conv1d(1, 64, 160, stride=40, padding=80),
                nn.BatchNorm1d(64), nn.ReLU(), nn.MaxPool1d(4, 4),
                nn.Dropout1d(0.1),
                *conv_block(64, 64), *conv_block(64, 128),
                *conv_block(128, 256), *conv_block(256, 512, pool=False))
            self.adaptor = nn.Sequential(nn.Linear(512, hidden), nn.ReLU(),
                                         nn.Dropout(0.3))
            self.text = _SeqClassifier(hidden)
            self.fusion = nn.Sequential(nn.Linear(2 * hidden, hidden),
                                        nn.ReLU(), nn.Dropout(0.3))
            self.head = nn.Sequential(nn.Linear(hidden, 256), nn.ReLU(),
                                      nn.Dropout(0.3), nn.Linear(256, 2))

        def forward(self, wav, text):
            a = self.adaptor(self.audio(wav).permute(0, 2, 1)).mean(dim=1)
            t = self.text(text, features=True).mean(dim=1)
            return self.head(self.fusion(torch.cat([a, t], dim=1)))

    rng = np.random.default_rng(0)
    wav = torch.from_numpy(rng.standard_normal(
        (batch, 1, 80000)).astype(np.float32) * 0.1)
    text = torch.from_numpy(rng.standard_normal(
        (batch, 48, 768)).astype(np.float32))
    return _measure(Model(), (wav, text), batch)


def config_w2v2(batch=16, seconds=10):
    """Frozen wav2vec2-base transformer extractor (bench_wav2vec2_extractors;
    reference models.py:188-193 consumed the torchaudio bundle via
    `extract_features(x)[0][-1]`): 7-layer strided conv encoder + feature
    projection + grouped-conv positional embedding + 12 post-LN encoder
    layers, output (B, T', 768).  batch default matches the JAX row's
    batch — the vs_baseline ratio must compare the same operating point."""

    class Model(nn.Module):
        def __init__(self, d=768, heads=12, ff=3072, layers=12):
            super().__init__()
            convs, cin = [], 1
            for i, (feats, k, s) in enumerate(
                    ((512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
                     (512, 3, 2), (512, 2, 2), (512, 2, 2))):
                convs += [nn.Conv1d(cin, feats, k, stride=s, bias=False)]
                if i == 0:
                    convs += [nn.GroupNorm(feats, feats)]
                convs += [nn.GELU()]
                cin = feats
            self.encoder = nn.Sequential(*convs)
            self.fp_norm = nn.LayerNorm(512)
            self.fp_proj = nn.Linear(512, d)
            self.pos_conv = nn.Conv1d(d, d, 128, padding=64, groups=16)
            self.enc_norm = nn.LayerNorm(d)
            layer = nn.TransformerEncoderLayer(
                d, heads, ff, dropout=0.0, activation="gelu",
                batch_first=True, norm_first=False)
            self.transformer = nn.TransformerEncoder(layer, layers)

        def forward(self, x):
            h = self.fp_proj(self.fp_norm(self.encoder(x).permute(0, 2, 1)))
            pos = self.pos_conv(h.permute(0, 2, 1))[..., :-1].permute(0, 2, 1)
            return self.transformer(self.enc_norm(h + torch.nn.functional.gelu(pos)))

    x = torch.from_numpy(np.random.default_rng(0).standard_normal(
        (batch, 1, 16000 * seconds)).astype(np.float32) * 0.1)
    # ~0.5-1 s/forward on CPU at these shapes; 5 iters keeps the subprocess
    # under the bench timeout while averaging out scheduler noise
    return _measure(Model(), (x,), batch, iters=5)


def main():
    torch.manual_seed(0)
    fn = {"config1": config1, "config2": config2,
          "config3": config3, "config4": config4,
          "config_w2v2": config_w2v2}[sys.argv[1]]
    print(fn())


if __name__ == "__main__":
    main()
