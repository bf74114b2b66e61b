"""Property-based tests (hypothesis) for the subtlest fixed-shape / EMPTY
invariants — the randomized counterpart of the targeted tests SURVEY.md §4
calls for.  derandomize=True: the suite must stay reproducible."""

import numpy as np
from hypothesis import given, settings, strategies as st

SETTINGS = dict(deadline=None, max_examples=60, derandomize=True)


@given(length=st.integers(0, 40), target=st.integers(1, 40),
       width=st.integers(1, 5))
@settings(**SETTINGS)
def test_pad_or_truncate_invariants(length, target, width):
    """Output is exactly target long; the kept prefix is bit-identical; the
    padding (if any) is zeros (reference AppendZeroValues semantics,
    datasets.py:202-231)."""
    from multimodalaggressionrecognition_tpu.ops.padding import (
        pad_or_truncate)

    rng = np.random.default_rng(length * 41 + target)
    x = rng.standard_normal((length, width)).astype(np.float32)
    y = np.asarray(pad_or_truncate(x, target))
    assert y.shape == (target, width)
    kept = min(length, target)
    np.testing.assert_array_equal(y[:kept], x[:kept])
    assert not y[kept:].any()


@given(n=st.integers(1, 60), batch=st.integers(1, 9),
       n_types=st.integers(1, 4), seed=st.integers(0, 3),
       shuffle=st.booleans())
@settings(**SETTINGS)
def test_aggr_sampler_partition_and_homogeneity(n, batch, n_types, seed,
                                                shuffle):
    """Every batch is homogeneous in aggr_type; the batches partition the
    index set exactly (each sample once); len() matches; a reseeded
    iteration with set_epoch reproduces the order."""
    from multimodalaggressionrecognition_tpu.data.sampler import (
        AggrBatchSampler)

    rng = np.random.default_rng(seed * 977 + n)
    types = rng.integers(0, n_types, size=n).astype(str)
    s = AggrBatchSampler(types, batch, shuffle=shuffle, seed=seed)
    s.set_epoch(0)
    batches = list(s)
    assert len(batches) == len(s)
    seen = [i for b in batches for i in b]
    assert sorted(seen) == list(range(n))  # exact partition
    for b in batches:
        assert len(b) <= batch
        assert len({types[i] for i in b}) == 1  # homogeneous
    s.set_epoch(0)
    assert list(s) == batches  # epoch-pinned determinism


@given(seed=st.integers(0, 30))
@settings(**SETTINGS)
def test_masked_ce_equals_filtered_ce(seed):
    """The static-shape multiply-by-mask loss equals torch-style boolean
    filtering for ANY mask pattern — the EMPTY-protocol conversion's core
    claim (SURVEY.md §7; reference models.py:241-258 filtered rows)."""
    from multimodalaggressionrecognition_tpu.ops.losses import cross_entropy

    rng = np.random.default_rng(seed)
    b, c = 12, 3  # fixed shapes: one jit compile across examples
    logits = rng.standard_normal((b, c)).astype(np.float32)
    labels = rng.integers(0, c, size=b).astype(np.int32)
    mask = rng.integers(0, 2, size=b).astype(np.float32)
    if mask.sum() == 0:
        mask[rng.integers(0, b)] = 1.0
    got = float(cross_entropy(logits, labels, mask))

    keep = mask.astype(bool)
    z = logits[keep] - logits[keep].max(axis=1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(axis=1, keepdims=True))
    want = float(-logp[np.arange(keep.sum()), labels[keep]].mean())
    np.testing.assert_allclose(got, want, rtol=1e-5)


@given(tokens=st.lists(st.integers(1, 7), min_size=1, max_size=4),
       seed=st.integers(0, 5))
@settings(**SETTINGS)
def test_fusion_bounds_partition_and_recover(tokens, seed):
    """concat_with_bounds: bounds are contiguous, ordered by sorted name,
    cover the concat exactly, and slicing by them recovers each modality's
    tokens bit-identically (the split-back contract the reference implements
    at models.py:407-430)."""
    from multimodalaggressionrecognition_tpu.models.fusion import (
        concat_with_bounds)

    rng = np.random.default_rng(seed)
    feats = {f"m{i}": rng.standard_normal((2, t, 4)).astype(np.float32)
             for i, t in enumerate(tokens)}
    concat, bounds = concat_with_bounds(feats)
    assert concat.shape[1] == sum(tokens)
    offset = 0
    for name in sorted(feats):
        lo, hi = bounds[name]
        assert lo == offset  # contiguous, sorted order
        offset = hi
        np.testing.assert_array_equal(np.asarray(concat[:, lo:hi]),
                                      feats[name])
    assert offset == concat.shape[1]  # exact cover


@given(seed=st.integers(0, 30))
@settings(**SETTINGS)
def test_confusion_matrix_masked_rows_excluded(seed):
    """Rows with mask 0 contribute nothing; totals match the kept count —
    for any mask pattern (the on-device metric accumulators feed every
    UAR/UAP/UAF1 number, ops/metrics.py)."""
    from multimodalaggressionrecognition_tpu.ops.metrics import (
        confusion_matrix)

    rng = np.random.default_rng(seed + 1000)
    b, c = 16, 4
    preds = rng.integers(0, c, size=b)
    labels = rng.integers(0, c, size=b)
    mask = rng.integers(0, 2, size=b).astype(np.float32)
    cm = np.asarray(confusion_matrix(preds, labels, c, row_mask=mask))
    assert cm.sum() == mask.sum()
    want = np.zeros((c, c))
    for p, t, m in zip(preds, labels, mask):
        want[t, p] += m
    np.testing.assert_array_equal(cm, want)
