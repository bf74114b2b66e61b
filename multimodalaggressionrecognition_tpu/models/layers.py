"""Flax layers with PyTorch semantics.

The reference's sequence heads are built from torch's default
`nn.TransformerEncoderLayer` (post-LN, ReLU, d_ff=2048, dropout=0.1; see the
golden architecture printouts, reference 1.txt:55-70) wrapped in
`nn.TransformerEncoder(..., norm=LayerNorm)` (reference models.py:344-352,
391-403).  These modules reproduce that computation exactly — including the
key-padding-mask convention (True/1 = masked) the fusion module derives from
all-zero feature rows (reference models.py:421-422) — so converted torch
checkpoints produce matching logits.

Parameter layout notes (for io/torch_import.py):
- TorchLinear.kernel is (in, out) = torch weight.T
- MultiheadSelfAttention.in_proj_kernel is (E, 3E) = torch in_proj_weight.T
- LayerNorm: scale/bias match torch weight/bias.

One deliberate divergence: rows whose keys are *all* masked would produce NaN
in torch's softmax; here they produce zeros (safe softmax).  The reference
never hits that case (every sample has >=1 present modality), so logits are
unaffected.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.torch_compat import uniform_fan_in


def xavier_uniform_packed(key, shape, dtype=jnp.float32):
    """Xavier-uniform for the packed (E, 3E) qkv kernel.

    Matches torch MHA `_reset_parameters`, which xavier-inits the (3E, E)
    in_proj_weight with fan_in=E, fan_out=3E.
    """
    e, three_e = shape
    bound = (6.0 / (e + three_e)) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _maybe_int8_matmul(module: nn.Module, x, kernel, param_name: str):
    """Dispatch a dense matmul, int8-aware.

    Under w8a8 serving (utils/quantize.split_w8a8) matmul kernels arrive as
    bare int8 arrays with their per-output-channel scale stored in the
    `quant` variable collection; the dot then runs int8 x int8 -> int32 on
    the MXU.  Float kernels take the ordinary f32-accumulating path.
    """
    if kernel.dtype == jnp.int8:
        from ..utils.quantize import int8_matmul

        wscale = module.get_variable("quant", param_name + "_scale")
        return int8_matmul(x, kernel, wscale, out_dtype=jnp.float32)
    return jnp.matmul(x, kernel.astype(x.dtype),
                      preferred_element_type=jnp.float32)


class TorchLinear(nn.Module):
    """Dense layer with torch nn.Linear default init."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param("kernel", uniform_fan_in(in_features),
                            (in_features, self.features))
        y = _maybe_int8_matmul(self, x.astype(self.dtype or x.dtype),
                               kernel, "kernel")
        if self.use_bias:
            bias = self.param("bias", uniform_fan_in(in_features), (self.features,))
            y = y + bias
        return y.astype(x.dtype)


class TorchLayerNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class MultiheadSelfAttention(nn.Module):
    """torch nn.MultiheadAttention (self-attention, batch_first) equivalent."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic: bool = True):
        b, t, e = x.shape
        h = self.num_heads
        d = e // h
        in_kernel = self.param("in_proj_kernel", xavier_uniform_packed, (e, 3 * e))
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,))
        # Accumulate in f32 on the MXU, keep activations in the input dtype
        # (bf16 under mixed precision, f32 otherwise).
        qkv = (_maybe_int8_matmul(self, x, in_kernel, "in_proj_kernel")
               + in_bias).astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(z):  # (B, T, E) -> (B, H, T, d)
            return jnp.transpose(z.reshape(b, t, h, d), (0, 2, 1, 3))

        q, k, v = heads(q), heads(k), heads(v)
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k,
                            preferred_element_type=jnp.float32) / jnp.sqrt(
            jnp.asarray(d, jnp.float32))
        if key_padding_mask is not None:
            # True / 1 = masked key (reference convention: all-zero rows)
            neg = jnp.asarray(jnp.finfo(jnp.float32).min, scores.dtype)
            scores = jnp.where(key_padding_mask[:, None, None, :], neg, scores)
        attn = jax.nn.softmax(scores, axis=-1)
        if key_padding_mask is not None:
            # safe-softmax: zero out rows where every key is masked
            any_valid = jnp.any(~key_padding_mask, axis=-1)[:, None, None, None]
            attn = jnp.where(any_valid, attn, 0.0)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        # Softmax ran in f32; cast the weights back so the PV matmul and the
        # output projection stay in the compute dtype (f32 accumulation).
        attn = attn.astype(x.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, t, e)
        out_kernel = self.param("out_proj_kernel", uniform_fan_in(e), (e, e))
        out_bias = self.param("out_proj_bias", nn.initializers.zeros, (e,))
        y = _maybe_int8_matmul(self, out, out_kernel,
                               "out_proj_kernel") + out_bias
        return y.astype(x.dtype)


class TransformerEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer. Defaults: post-LN, ReLU, d_ff=2048.

    `activation`/`norm_first` cover the wav2vec2 (gelu, post-LN) and
    HuBERT-xlarge (gelu, pre-LN) encoder variants as well.
    """

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    norm_first: bool = False

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic: bool = True):
        from ..ops.erf import gelu_exact

        # torch's activation='gelu' is EXACT (erf) gelu; flax nn.gelu
        # defaults to the tanh approximation — use the f32-exact (and
        # VPU-fast) polynomial erf instead (ops/erf.py).
        act = {"relu": nn.relu, "gelu": gelu_exact,
               "gelu_tanh": nn.gelu}[self.activation]

        def attn_block(z):
            a = MultiheadSelfAttention(self.d_model, self.nhead, self.dropout,
                                       name="self_attn")(
                z, key_padding_mask, deterministic)
            return nn.Dropout(self.dropout)(a, deterministic=deterministic)

        def ff_block(z):
            ff = TorchLinear(self.dim_feedforward, name="linear1")(z)
            ff = act(ff)
            ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
            ff = TorchLinear(self.d_model, name="linear2")(ff)
            return nn.Dropout(self.dropout)(ff, deterministic=deterministic)

        if self.norm_first:
            x = x + attn_block(TorchLayerNorm(name="norm1")(x))
            x = x + ff_block(TorchLayerNorm(name="norm2")(x))
            return x
        x = TorchLayerNorm(name="norm1")(x + attn_block(x))
        return TorchLayerNorm(name="norm2")(x + ff_block(x))


class TransformerEncoder(nn.Module):
    """Stack of encoder layers + final LayerNorm (torch `norm=` argument).

    Inference parity note: the reference evaluates under model.eval() +
    no_grad (reference trainer.py:464-465), which activates torch's
    nested-tensor fast path when a key padding mask is given — masked
    positions are dropped from computation and restored as zeros.  Masked
    keys never influence unmasked outputs in either path, so the only
    difference is the masked rows themselves; we reproduce it by zeroing
    them when `deterministic` (eval).  In training mode torch uses the slow
    path (masked query rows get computed values), and so do we.
    """

    d_model: int
    nhead: int
    num_layers: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    norm_first: bool = False
    final_norm: bool = True
    zero_masked_on_eval: bool = True

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic: bool = True):
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                self.activation, self.norm_first,
                name=f"layers_{i}")(x, key_padding_mask, deterministic)
        if self.final_norm:
            x = TorchLayerNorm(name="norm")(x)
        if (self.zero_masked_on_eval and deterministic
                and key_padding_mask is not None):
            x = jnp.where(key_padding_mask[:, :, None], 0.0, x)
        return x
