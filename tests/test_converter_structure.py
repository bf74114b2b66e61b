"""Structural self-checks for every torch->Flax weight converter.

For each converter in io/torch_import.py, build a torch-layout state_dict
(from a torch replica where one exists, otherwise from the documented
inverse mapping), convert, and assert the resulting variables pytree has
exactly the structure and leaf shapes of `model.init(...)`. This is the
class of check that catches converters silently dropping parameters (the
round-1 S3D `branch2_1` bug) or emitting keys the model never consumes —
for every converter, for free.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import test_cnn1d
import test_torch_import_swin
import test_torch_import_wav2vec
import test_video_models
from _replicas import _TS3D, _TSwin3dT
from multimodalaggressionrecognition_tpu.io import torch_import
from multimodalaggressionrecognition_tpu.models.cnn1d import (
    CNN1D, AudioCnn1DExtractorWrapper)
from multimodalaggressionrecognition_tpu.models.r3d import R3D18Classifier
from multimodalaggressionrecognition_tpu.models.s3d import S3DClassifier
from multimodalaggressionrecognition_tpu.models.swin3d import SwinTransformer3d
from multimodalaggressionrecognition_tpu.models.vgg import VGG11BN
from multimodalaggressionrecognition_tpu.models.wav2vec import Wav2Vec2Model

pytestmark = pytest.mark.slow  # initializes every backbone


def _torch_sd(tm):
    return {k: v.numpy() for k, v in tm.state_dict().items()}


def _shapes(tree):
    return jax.tree.map(
        lambda a: tuple(a.shape) if hasattr(a, "shape") else np.shape(a),
        tree)


def _assert_same_structure_and_shapes(converted, reference):
    c, r = _shapes(converted), _shapes(reference)
    cs, rs = jax.tree.structure(c), jax.tree.structure(r)
    assert cs == rs, f"pytree structure mismatch:\n got {cs}\n want {rs}"
    mismatched = [
        (path, a, b)
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(c)[0],
            jax.tree_util.tree_flatten_with_path(r)[0])
        if a != b
    ]
    assert not mismatched, f"shape mismatches: {mismatched[:10]}"


def _case_cnn1d():
    tm = test_cnn1d._TorchCNN1D(class_num=3)
    return torch_import.cnn1d(_torch_sd(tm)), CNN1D(class_num=3), (2, 80000)


def _case_wrapper():
    tm = test_cnn1d._TorchWrapper(hidden=32)
    return (torch_import.audio_cnn1d_wrapper(_torch_sd(tm)),
            AudioCnn1DExtractorWrapper(hidden_size=32), (2, 80000))


def _case_r3d18():
    tm = test_video_models._TR3D18(class_num=6)
    return (torch_import.r3d18(_torch_sd(tm)), R3D18Classifier(6),
            (1, 4, 16, 16, 3))


def _case_vgg11_bn():
    tm = test_video_models._TVGG11BN(class_num=6)
    return torch_import.vgg11_bn(_torch_sd(tm)), VGG11BN(6), (1, 64, 64, 3)


def _case_swin3d_t():
    tm = _TSwin3dT(embed_dim=8, depths=(1, 1), heads=(2, 4), window=(2, 3, 3))
    return (torch_import.swin3d_t(_torch_sd(tm), depths=(1, 1)),
            SwinTransformer3d(embed_dim=8, depths=(1, 1), num_heads=(2, 4),
                              window=(2, 3, 3)),
            (1, 4, 12, 12, 3))


def _case_s3d():
    # Structure is checked against the full classifier tree; the
    # finite-forward smoke uses the headless extractor, because the
    # classifier's AvgPool3d(2,7,7) needs a 224px input (covered by the
    # slow parity test in test_swin_s3d_parity.py).
    tm = _TS3D(num_classes=4)
    converted = torch_import.s3d(_torch_sd(tm))

    def fwd(variables, x):
        from multimodalaggressionrecognition_tpu.models.s3d import S3DExtractor
        ext_vars = {"params": {"features": variables["params"]["features"]},
                    "batch_stats": variables["batch_stats"]}
        return S3DExtractor().apply(ext_vars, x)

    return converted, S3DClassifier(4), (1, 8, 64, 64, 3), fwd


def _case_wav2vec2():
    cfg = test_torch_import_wav2vec.CFG
    model = Wav2Vec2Model(cfg)
    init_vars = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 800), jnp.float32))
    sd = test_torch_import_wav2vec._to_torch_sd(init_vars["params"])
    converted = torch_import.wav2vec2(sd, num_layers=2, extractor_layers=2)
    return converted, model, (1, 800)


_CASES = {
    "cnn1d": _case_cnn1d,
    "audio_cnn1d_wrapper": _case_wrapper,
    "r3d18": _case_r3d18,
    "vgg11_bn": _case_vgg11_bn,
    "swin3d_t": _case_swin3d_t,
    "s3d": _case_s3d,
    "wav2vec2": _case_wav2vec2,
}


@pytest.mark.parametrize("name", sorted(_CASES))
def test_converted_tree_matches_model_init(name):
    torch.manual_seed(0)
    case = _CASES[name]()
    converted, model, input_shape = case[:3]
    fwd = case[3] if len(case) > 3 else (
        lambda variables, x: model.apply(variables, x))
    # structure/shape check needs no compute: abstract-eval the init
    reference = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                               jnp.zeros(input_shape, jnp.float32))
    _assert_same_structure_and_shapes(converted, reference)
    # and the converted tree must actually drive a forward pass
    out = jax.jit(fwd)(jax.tree.map(jnp.asarray, converted),
                       jnp.zeros(input_shape, jnp.float32))
    assert np.asarray(out).size and np.isfinite(np.asarray(out)).all()
