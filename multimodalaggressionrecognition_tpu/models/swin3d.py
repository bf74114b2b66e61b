"""Swin3D video transformer (tiny config), channels-last.

Follows torchvision.models.video.swin3d_t — the reference's flagship frozen
video extractor (reference models.py:49-59; used by train_multimodal.py:335
and train_video_transformer.py:116): patch-embed Conv3d(3->96,(2,4,4)),
stages of shifted-window attention blocks (window (8,7,7), shift (4,3,3),
depths (2,2,6,2), heads (3,6,12,24)), patch merging between stages, final
LayerNorm; the extractor mean-pools the (T',H',W') grid to a 768-d vector.

TPU notes: window partition/reverse are pure reshapes/transposes; attention
over the (B*nW, 392, C) windows is large batched MXU matmuls; the relative
position bias index is a host-precomputed constant folded into the compiled
program.  Stochastic depth is identity at eval (parity mode) and row-wise
random at train, matching torchvision.
"""

import functools
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import TorchLayerNorm, TorchLinear


@functools.lru_cache(maxsize=8)
def _relative_position_index(window: Tuple[int, int, int]) -> np.ndarray:
    wt, wh, ww = window
    coords = np.stack(np.meshgrid(np.arange(wt), np.arange(wh), np.arange(ww),
                                  indexing="ij"))  # (3, wt, wh, ww)
    flat = coords.reshape(3, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (3, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[..., 0] += wt - 1
    rel[..., 1] += wh - 1
    rel[..., 2] += ww - 1
    rel[..., 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[..., 1] *= (2 * ww - 1)
    return rel.sum(-1)  # (N, N)


@functools.lru_cache(maxsize=32)
def _attention_mask(pt: int, ph: int, pw: int,
                    window: Tuple[int, int, int],
                    shift: Tuple[int, int, int]) -> np.ndarray | None:
    """(nW, N, N) additive mask (0 / -100) for shifted windows, or None."""
    if not any(shift):
        return None
    wt, wh, ww = window
    region = np.zeros((pt, ph, pw), np.int32)
    cnt = 0
    for t_slice in ((0, pt - wt), (pt - wt, pt - shift[0]), (pt - shift[0], pt)):
        for h_slice in ((0, ph - wh), (ph - wh, ph - shift[1]), (ph - shift[1], ph)):
            for w_slice in ((0, pw - ww), (pw - ww, pw - shift[2]), (pw - shift[2], pw)):
                region[t_slice[0]:t_slice[1], h_slice[0]:h_slice[1],
                       w_slice[0]:w_slice[1]] = cnt
                cnt += 1
    region = region.reshape(pt // wt, wt, ph // wh, wh, pw // ww, ww)
    region = region.transpose(0, 2, 4, 1, 3, 5).reshape(-1, wt * wh * ww)
    diff = region[:, :, None] - region[:, None, :]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_partition(x, window):
    b, t, h, w, c = x.shape
    wt, wh, ww = window
    x = x.reshape(b, t // wt, wt, h // wh, wh, w // ww, ww, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7))
    return x.reshape(b * (t // wt) * (h // wh) * (w // ww), wt * wh * ww, c)


def _window_reverse(windows, window, b, t, h, w):
    wt, wh, ww = window
    c = windows.shape[-1]
    x = windows.reshape(b, t // wt, h // wh, w // ww, wt, wh, ww, c)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3, 6, 7))
    return x.reshape(b, t, h, w, c)


class ShiftedWindowAttention3d(nn.Module):
    dim: int
    num_heads: int
    window: Tuple[int, int, int] = (8, 7, 7)
    shift: Tuple[int, int, int] = (0, 0, 0)
    attn_dropout: float = 0.0
    proj_dropout: float = 0.0
    # None = auto (fused Pallas window attention on the TPU backend; the
    # XLA path materializes the (W, heads, N, N) scores in HBM repeatedly
    # and is ~60% of each Swin stage — ops/pallas/window_attention.py).
    use_pallas: bool | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, t, h, w, c = x.shape
        window = list(self.window)
        shift = list(self.shift)
        # clamp window to input size (torchvision semantics)
        for i, size in enumerate((t, h, w)):
            if size <= window[i]:
                window[i] = size
                shift[i] = 0
        window, shift = tuple(window), tuple(shift)
        wt, wh, ww = window
        pad_t = (wt - t % wt) % wt
        pad_h = (wh - h % wh) % wh
        pad_w = (ww - w % ww) % ww
        xp = jnp.pad(x, ((0, 0), (0, pad_t), (0, pad_h), (0, pad_w), (0, 0)))
        pt, ph, pw = t + pad_t, h + pad_h, w + pad_w

        if any(shift):
            xp = jnp.roll(xp, (-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))

        windows = _window_partition(xp, window)  # (B*nW, N, C)
        n = windows.shape[1]
        heads = self.num_heads
        d = c // heads

        qkv_out = TorchLinear(3 * c, name="qkv")(windows)

        # torchvision semantics: the bias table and position index are always
        # built for the FULL self.window; when the runtime window is clamped
        # (input smaller than the window) the index matrix is sliced to the
        # top-left (n, n) block — torchvision _get_relative_position_bias
        # takes index[:window_vol, :window_vol] of the stored full-window
        # buffer. Recomputing the index for the clamped window would select
        # different table rows and break checkpoint parity.
        fwt, fwh, fww = self.window
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * fwt - 1) * (2 * fwh - 1) * (2 * fww - 1), heads))
        index = _relative_position_index(tuple(self.window))[:n, :n]
        bias = table[index.reshape(-1)].reshape(n, n, heads)
        bias_hnn = jnp.transpose(bias, (2, 0, 1))  # (heads, N, N)
        mask = _attention_mask(pt, ph, pw, window, shift)

        use_pallas = self.use_pallas
        if use_pallas is None:
            from ..utils.kernels import pallas_auto

            use_pallas = pallas_auto()
        mask_arr = None if mask is None else jnp.asarray(mask)
        # the fused kernel applies no attention dropout (swin3d_t uses 0.0)
        if use_pallas and (deterministic or self.attn_dropout == 0.0):
            from ..ops.pallas.window_attention import fused_window_attention

            out = fused_window_attention(qkv_out, bias_hnn, mask_arr, heads)
        elif deterministic or self.attn_dropout == 0.0:
            # one shared XLA reference (also the kernel's backward path)
            from ..ops.pallas.window_attention import attention_core_ref

            out = attention_core_ref(qkv_out, bias_hnn, mask_arr, heads)
        else:
            # train-mode attention dropout: the only configuration that
            # cannot reuse the shared core (swin3d_t ships attn_dropout=0)
            qkv = qkv_out.reshape(-1, n, 3, heads, d)
            q = jnp.transpose(qkv[:, :, 0], (0, 2, 1, 3))
            k = jnp.transpose(qkv[:, :, 1], (0, 2, 1, 3))
            v = jnp.transpose(qkv[:, :, 2], (0, 2, 1, 3))
            attn = jnp.einsum("whnd,whmd->whnm", q * (d ** -0.5), k,
                              preferred_element_type=jnp.float32)
            attn = attn + bias_hnn[None]
            if mask_arr is not None:
                n_windows = mask_arr.shape[0]
                attn = attn.reshape(b, n_windows, heads, n, n)
                attn = attn + mask_arr[None, :, None]
                attn = attn.reshape(-1, heads, n, n)
            attn = jax.nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.attn_dropout)(attn,
                                                 deterministic=deterministic)
            out = jnp.einsum("whnm,whmd->whnd", attn, v,
                             preferred_element_type=jnp.float32)
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(-1, n, c)
        out = TorchLinear(c, name="proj")(out)
        out = nn.Dropout(self.proj_dropout)(out, deterministic=deterministic)

        xp = _window_reverse(out, window, b, pt, ph, pw)
        if any(shift):
            xp = jnp.roll(xp, shift, axis=(1, 2, 3))
        return xp[:, :t, :h, :w]


class StochasticDepth(nn.Module):
    """Row-wise stochastic depth (torchvision 'row' mode); identity at eval."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class SwinBlock3d(nn.Module):
    dim: int
    num_heads: int
    window: Tuple[int, int, int] = (8, 7, 7)
    shift: Tuple[int, int, int] = (0, 0, 0)
    mlp_ratio: float = 4.0
    sd_prob: float = 0.0
    # torchvision uses exact (erf) GELU; XLA's erf lowering costs 6x the
    # tanh approximation on the v5e VPU (6.1 vs 1.0 ms per stage0 MLP over
    # 128 windows, benchmarks/profile_swin_parts.py).  Modes:
    #   "poly" (default) — float32-exact polynomial erf (ops/erf.py,
    #       max GELU deviation 1.3e-6): parity-exact AND fast;
    #   "erf"  — XLA's erf lowering (slow reference path);
    #   "tanh" — torch approximate='tanh' semantics (3e-3 deviation).
    gelu: str = "poly"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from ..ops.erf import gelu_exact

        h = TorchLayerNorm(name="norm1")(x)
        h = ShiftedWindowAttention3d(self.dim, self.num_heads, self.window,
                                     self.shift, name="attn")(h, deterministic)
        x = x + StochasticDepth(self.sd_prob, name="sd1")(h, deterministic)
        h = TorchLayerNorm(name="norm2")(x)
        h = TorchLinear(int(self.dim * self.mlp_ratio), name="mlp_fc1")(h)
        if self.gelu not in ("poly", "erf", "tanh"):
            raise ValueError(
                f"gelu must be 'poly', 'erf' or 'tanh', got {self.gelu!r}")
        if self.gelu == "poly":
            h = gelu_exact(h)
        else:
            h = nn.gelu(h, approximate=self.gelu == "tanh")
        h = TorchLinear(self.dim, name="mlp_fc2")(h)
        return x + StochasticDepth(self.sd_prob, name="sd2")(h, deterministic)


class PatchMerging3d(nn.Module):
    """Spatial 2x2 merge: concat(x00,x10,x01,x11) -> LN -> Linear(4C, 2C)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, :, 0::2, 0::2]
        x1 = x[:, :, 1::2, 0::2]
        x2 = x[:, :, 0::2, 1::2]
        x3 = x[:, :, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = TorchLayerNorm(name="norm")(x)
        return TorchLinear(2 * self.dim, use_bias=False, name="reduction")(x)


class SwinTransformer3d(nn.Module):
    """Patch embed + stages + final norm -> (B, T', H', W', C_final)."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: Tuple[int, int, int] = (8, 7, 7)
    stochastic_depth_prob: float = 0.2
    gelu: str = "poly"  # see SwinBlock3d.gelu
    # Per-block gradient checkpointing for fine-tuning: each SwinBlock3d
    # saves only its boundary activations; qkv/scores/MLP intermediates are
    # recomputed one block at a time in the backward.  Much lower peak HBM
    # than wrapping the whole backbone in a single remat segment (a single
    # segment re-materializes every intermediate at once during backward).
    remat: bool = False
    # remat policy: None = save nothing (minimum HBM, max recompute);
    # "dots" = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    # (saves matmul outputs, recomputes elementwise — trades HBM for time;
    # sweep in benchmarks/profile_finetune_remat.py)
    remat_policy: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .nn3d import Conv3d

        h = Conv3d(self.embed_dim, (2, 4, 4), stride=(2, 4, 4),
                   name="patch_embed")(x)
        h = TorchLayerNorm(name="patch_norm")(h)
        total_blocks = sum(self.depths)
        block_id = 0
        dim = self.embed_dim
        if self.remat:
            if self.remat_policy not in (None, "dots"):
                raise ValueError(
                    f"remat_policy must be None or 'dots', got "
                    f"{self.remat_policy!r} — a typo here would silently "
                    "run the save-nothing policy")
            policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                      if self.remat_policy == "dots" else None)
            block_cls = nn.remat(SwinBlock3d, static_argnums=(2,),
                                 policy=policy)
        else:
            block_cls = SwinBlock3d
        for stage, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            for i in range(depth):
                shift = tuple(0 if i % 2 == 0 else wsz // 2
                              for wsz in self.window)
                sd = self.stochastic_depth_prob * block_id / max(total_blocks - 1, 1)
                # deterministic passed positionally: it is static_argnums=2
                # (0 = module) under nn.remat, and static markers only
                # apply to positional arguments
                h = block_cls(dim, heads, self.window, shift, sd_prob=sd,
                              gelu=self.gelu,
                              name=f"stage{stage}_block{i}")(h, not train)
                block_id += 1
            if stage < len(self.depths) - 1:
                h = PatchMerging3d(dim, name=f"merge{stage}")(h)
                dim *= 2
        return TorchLayerNorm(name="norm")(h)


class Swin3dTExtractor(nn.Module):
    """Headless swin3d_t: (B, T, H, W, 3) -> (B, 768) mean-pooled features
    (reference models.py:49-59)."""

    gelu: str = "poly"  # GELU mode (see SwinBlock3d.gelu)
    remat: bool = False  # per-block gradient checkpointing (fine-tuning)
    remat_policy: str | None = None  # see SwinTransformer3d.remat_policy

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = SwinTransformer3d(gelu=self.gelu, remat=self.remat,
                              remat_policy=self.remat_policy,
                              name="backbone")(x, train=train)
        return jnp.mean(h, axis=(1, 2, 3))
