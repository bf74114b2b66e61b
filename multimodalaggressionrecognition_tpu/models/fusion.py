"""Late-fusion modules over per-modality token sequences.

Rebuilds the reference fusion family (reference models.py:391-503):
- `EqualSizedTransformerModalitiesFusion`: concatenate per-modality token
  sequences along time (sorted modality order, matching the reference's
  `dict(sorted(...))` upstream), derive the key-padding mask from all-zero
  feature rows (models.py:421-422 — this covers both EMPTY-modality zero
  stubs and zero-padded tail rows), run one transformer encoder, split the
  fused tokens back per modality by recorded bounds.
- `AveragedFeaturesTransformerFusion`: same, but each modality is mean-pooled
  to a single token first (models.py:480-503).

The reference's `CrossModalFusion` (models.py:432-478) is broken/dead
upstream (duplicate attribute assignment, forward references a nonexistent
module) and is deliberately not reproduced; `CrossAttentionFusion` below is a
working bidirectional cross-attention fusion filling that design slot.
"""

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from .layers import TorchLayerNorm, TorchLinear, TransformerEncoder


def concat_with_bounds(feats: Dict[str, jnp.ndarray]):
    """Concatenate sorted-by-name (B, T_m, H) features; return bounds per name."""
    bounds = {}
    parts = []
    offset = 0
    for name in sorted(feats):
        t = feats[name].shape[1]
        bounds[name] = (offset, offset + t)
        parts.append(feats[name])
        offset += t
    return jnp.concatenate(parts, axis=1), bounds


def zero_row_mask(tokens):
    """True where a token's features sum to exactly zero (reference semantics)."""
    return jnp.sum(tokens, axis=2) == 0


class EqualSizedTransformerModalitiesFusion(nn.Module):
    num_layers: int = 1
    hidden_size: int = 768
    num_heads: int = 8

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray], train: bool = False):
        concat, bounds = concat_with_bounds(feats)
        mask = zero_row_mask(concat)
        fused = TransformerEncoder(
            d_model=self.hidden_size, nhead=self.num_heads,
            num_layers=self.num_layers, name="encoder")(
            concat, key_padding_mask=mask, deterministic=not train)
        return {name: fused[:, b0:b1] for name, (b0, b1) in bounds.items()}


class AveragedFeaturesTransformerFusion(nn.Module):
    num_layers: int = 1
    hidden_size: int = 768
    num_heads: int = 8

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray], train: bool = False):
        feats = {k: jnp.mean(v, axis=1, keepdims=True) for k, v in feats.items()}
        concat, bounds = concat_with_bounds(feats)
        mask = zero_row_mask(concat)
        fused = TransformerEncoder(
            d_model=self.hidden_size, nhead=self.num_heads,
            num_layers=self.num_layers, name="encoder")(
            concat, key_padding_mask=mask, deterministic=not train)
        return {name: fused[:, b0:b1] for name, (b0, b1) in bounds.items()}


class CrossAttentionFusion(nn.Module):
    """Working two-way cross-attention fusion (the reference's intent).

    Each modality pair (m1, m2) attends m1->m2 and m2->m1 with a shared
    per-direction attention block; outputs keep per-modality shapes.
    Implemented as: for each modality, queries = its tokens, keys/values =
    the concatenation of all *other* modalities' tokens.
    """

    hidden_size: int = 768
    num_heads: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray], train: bool = False):
        concat, bounds = concat_with_bounds(feats)
        mask = zero_row_mask(concat)
        out = {}
        attn = MultiheadCrossAttention(self.hidden_size, self.num_heads,
                                       self.dropout, name="cross_attn")
        norm = TorchLayerNorm(name="norm")
        for name in sorted(feats):
            b0, b1 = bounds[name]
            q = feats[name]
            # mask own tokens so each modality attends only to the others
            own = jnp.zeros(mask.shape, bool).at[:, b0:b1].set(True)
            kpm = mask | own
            fused = attn(q, concat, key_padding_mask=kpm,
                         deterministic=not train)
            out[name] = norm(q + fused)
        return out


class MultiheadCrossAttention(nn.Module):
    """Q from x, K/V from memory; same packed layout as self-attention."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, memory, key_padding_mask=None, deterministic=True):
        import jax

        b, t, e = x.shape
        s = memory.shape[1]
        h = self.num_heads
        d = e // h
        q = TorchLinear(e, name="q_proj")(x)
        k = TorchLinear(e, name="k_proj")(memory)
        v = TorchLinear(e, name="v_proj")(memory)

        def heads(z, length):
            return jnp.transpose(z.reshape(b, length, h, d), (0, 2, 1, 3))

        q, k, v = heads(q, t), heads(k, s), heads(v, s)
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k,
                            preferred_element_type=jnp.float32) / jnp.sqrt(
            jnp.asarray(d, jnp.float32))
        if key_padding_mask is not None:
            neg = jnp.asarray(jnp.finfo(jnp.float32).min, scores.dtype)
            scores = jnp.where(key_padding_mask[:, None, None, :], neg, scores)
        attn = jax.nn.softmax(scores, axis=-1)
        if key_padding_mask is not None:
            any_valid = jnp.any(~key_padding_mask, axis=-1)[:, None, None, None]
            attn = jnp.where(any_valid, attn, 0.0)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhts,bhsd->bhtd", attn, v,
                         preferred_element_type=jnp.float32)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, t, e)
        return TorchLinear(e, name="out_proj")(out)
