import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from multimodalaggressionrecognition_tpu import ops


def test_pad_or_truncate():
    x = np.ones((5, 3))
    assert ops.pad_or_truncate(x, 8).shape == (8, 3)
    assert ops.pad_or_truncate(x, 8)[5:].sum() == 0
    assert ops.pad_or_truncate(x, 2).shape == (2, 3)
    assert np.allclose(ops.pad_or_truncate(x, 5), x)


def test_frame_signal_matches_unfold(rng):
    x = rng.standard_normal((2, 100)).astype(np.float32)
    frames = ops.frame_signal(jnp.asarray(x), 16, 5, pad=8)
    tx = F.pad(torch.from_numpy(x), (8, 8)).unfold(-1, 16, 5)
    np.testing.assert_allclose(np.asarray(frames), tx.numpy(), atol=1e-6)


@pytest.mark.parametrize("cin,cout,k,s,p,L", [(1, 64, 160, 40, 80, 4000), (3, 8, 3, 1, 1, 50)])
def test_framed_matmul_matches_conv1d(rng, cin, cout, k, s, p, L):
    x = rng.standard_normal((2, L, cin)).astype(np.float32)
    conv = torch.nn.Conv1d(cin, cout, k, stride=s, padding=p)
    w = conv.weight.detach().numpy()  # (cout, cin, k)
    b = conv.bias.detach().numpy()
    ref = conv(torch.from_numpy(x).permute(0, 2, 1)).detach().numpy()  # (B,cout,T)
    weight = jnp.asarray(w.transpose(2, 1, 0).reshape(k * cin, cout))
    y = ops.framed_matmul(jnp.asarray(x), weight, jnp.asarray(b), k, s, pad=p)
    np.testing.assert_allclose(np.asarray(y), ref.transpose(0, 2, 1), atol=2e-4)


def test_spectrogram_matches_torch_stft(rng):
    x = rng.standard_normal((2, 8000)).astype(np.float32)
    n_fft, hop = 512, 256
    spec = ops.spectrogram(jnp.asarray(x), n_fft=n_fft)
    tref = torch.stft(
        torch.from_numpy(x), n_fft, hop_length=hop, win_length=n_fft,
        window=torch.hann_window(n_fft, periodic=True), center=True,
        pad_mode="reflect", onesided=True, return_complex=True,
    )
    tref = tref.abs().pow(2).numpy()
    assert spec.shape == tref.shape
    np.testing.assert_allclose(np.asarray(spec), tref, atol=2e-2, rtol=1e-4)


def test_freq_time_mask_shapes(rng):
    spec = jnp.asarray(rng.standard_normal((2, 257, 313)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    fm = ops.freq_mask(key, spec, 80)
    tm = ops.time_mask(key, spec, 80)
    assert fm.shape == spec.shape and tm.shape == spec.shape
    # some rows fully zeroed along the masked axis
    zero_rows = np.asarray((np.abs(np.asarray(fm)).sum(axis=-1) == 0)).sum()
    assert zero_rows > 0


def test_resample_poly_vs_bruteforce(rng):
    """Brute-force evaluation of the same windowed-sinc definition."""
    orig, new = 44100, 16000
    x = rng.standard_normal((1, 2000)).astype(np.float32)
    y = np.asarray(ops.resample_poly(jnp.asarray(x), orig, new))
    kernels, width, orig_g, new_g = ops.resample_kernel(orig, new)
    L = x.shape[-1]
    target = -(-new_g * L // orig_g)
    xpad = np.pad(x, [(0, 0), (width, width + orig_g)])
    out = np.zeros((1, (L // orig_g + 1) * new_g), np.float32)
    for t in range(L // orig_g + 1):
        seg = xpad[:, t * orig_g: t * orig_g + kernels.shape[1]]
        out[:, t * new_g:(t + 1) * new_g] = seg @ kernels.T
    np.testing.assert_allclose(y, out[:, :target], atol=1e-4)
    assert y.shape[-1] == target


def test_resample_preserves_tone(rng):
    """A 1 kHz tone resampled 48k->16k should stay a 1 kHz tone."""
    t = np.arange(4800) / 48000.0
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)[None]
    y = np.asarray(ops.resample_poly(jnp.asarray(x), 48000, 16000))[0]
    t2 = np.arange(y.shape[-1]) / 16000.0
    ref = np.sin(2 * np.pi * 1000 * t2)
    # ignore filter edge transients
    np.testing.assert_allclose(y[50:-50], ref[50:-50], atol=5e-3)


def test_losses_match_torch(rng):
    logits = rng.standard_normal((16, 3)).astype(np.float32)
    labels = rng.integers(0, 3, 16).astype(np.int64)
    w = np.array([0.2, 0.5, 0.3], np.float32)

    ce = ops.cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    tce = F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels))
    np.testing.assert_allclose(float(ce), float(tce), atol=1e-6)

    wce = ops.weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), w)
    twce = F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels),
                           weight=torch.from_numpy(w))
    np.testing.assert_allclose(float(wce), float(twce), atol=1e-6)

    # focal parity with adeelh's definition, re-derived in torch here
    logp = F.log_softmax(torch.from_numpy(logits), dim=-1)
    ce_t = F.nll_loss(logp, torch.from_numpy(labels),
                      weight=torch.from_numpy(w), reduction="none")
    pt = logp.exp().gather(1, torch.from_numpy(labels)[:, None])[:, 0]
    tfocal = (((1 - pt) ** 2.0) * ce_t).mean()
    fl = ops.focal_loss(jnp.asarray(logits), jnp.asarray(labels), alpha=w, gamma=2.0)
    np.testing.assert_allclose(float(fl), float(tfocal), atol=1e-6)


def test_masked_loss_equals_filtered_loss(rng):
    """Static-mask reduction == reference's boolean-indexing filtering."""
    logits = rng.standard_normal((8, 2)).astype(np.float32)
    labels = rng.integers(0, 2, 8).astype(np.int64)
    mask = np.array([1, 1, 0, 1, 0, 0, 1, 1], np.float32)
    got = ops.cross_entropy(jnp.asarray(logits), jnp.asarray(labels), row_mask=jnp.asarray(mask))
    keep = mask.astype(bool)
    ref = F.cross_entropy(torch.from_numpy(logits[keep]), torch.from_numpy(labels[keep]))
    np.testing.assert_allclose(float(got), float(ref), atol=1e-6)


def test_confusion_metrics_match_sklearn(rng):
    from sklearn.metrics import (accuracy_score, precision_score, recall_score,
                                 f1_score)
    preds = rng.integers(0, 3, 100)
    labels = rng.integers(0, 3, 100)
    cm = ops.confusion_matrix(jnp.asarray(preds), jnp.asarray(labels), 3)
    m = ops.metrics_from_confusion(cm)
    assert m["accuracy"] == pytest.approx(accuracy_score(labels, preds))
    np.testing.assert_allclose(
        m["recall"], recall_score(labels, preds, average=None, zero_division=0), atol=1e-12)
    assert m["UAR"] == pytest.approx(recall_score(labels, preds, average="macro", zero_division=0))
    assert m["UAP"] == pytest.approx(precision_score(labels, preds, average="macro", zero_division=0))
    assert m["UAF1"] == pytest.approx(f1_score(labels, preds, average="macro", zero_division=0))


def test_confusion_matrix_row_mask(rng):
    preds = jnp.asarray([0, 1, 1, 0])
    labels = jnp.asarray([0, 1, 0, 0])
    mask = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    cm = ops.confusion_matrix(preds, labels, 2, row_mask=mask)
    np.testing.assert_allclose(np.asarray(cm), [[1, 0], [0, 1]])
