"""Convert a PyTorch checkpoint into this framework's parameter format.

Reads a torch .pt/.pth state_dict (or a checkpoint dict containing one),
applies the matching io/torch_import converter, and writes an orbax
checkpoint directory loadable by the Trainer / models.

  python -m multimodalaggressionrecognition_tpu.cli.import_torch_checkpoint \
      --model cnn1d --torch_path model.pt --out_dir converted/cnn1d

Models: cnn1d | audio_cnn1d_wrapper | r3d18 | vgg11_bn | swin3d_t | s3d |
wav2vec2 (+--num_layers/--extractor_mode for variants).
"""

import argparse
import os

import numpy as np


def load_state_dict(path: str):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    for key in ("state_dict", "model", "model_state_dict"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
            break
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()}


def convert(model: str, sd, num_layers=12, extractor_mode="group_norm"):
    from ..io import torch_import as ti

    if model == "cnn1d":
        return ti.cnn1d(sd)
    if model == "audio_cnn1d_wrapper":
        return ti.audio_cnn1d_wrapper(sd)
    if model == "r3d18":
        return ti.r3d18(sd)
    if model == "vgg11_bn":
        return ti.vgg11_bn(sd)
    if model == "swin3d_t":
        return ti.swin3d_t(sd)
    if model == "s3d":
        return ti.s3d(sd)
    if model == "wav2vec2":
        return ti.wav2vec2(sd, num_layers=num_layers,
                           extractor_mode=extractor_mode)
    raise ValueError(f"unknown model {model!r}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True)
    p.add_argument("--torch_path", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--num_layers", type=int, default=12)
    p.add_argument("--extractor_mode", default="group_norm")
    args = p.parse_args(argv)

    import orbax.checkpoint as ocp

    sd = load_state_dict(args.torch_path)
    variables = convert(args.model, sd, args.num_layers, args.extractor_mode)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.out_dir), variables, force=True)
    ckptr.wait_until_finished()
    n = sum(np.asarray(x).size for x in
            __import__("jax").tree.leaves(variables))
    print(f"converted {args.model}: {n:,} params -> {args.out_dir}")


if __name__ == "__main__":
    main()
