"""GRU / LSTM sequence layers with torch gate semantics, built on lax.scan.

The reference's sequence heads wrap single-layer `nn.LSTM` / `nn.GRU`
(`FeatureSequenceProcessing`, reference models.py:107-124, configured at
train_audio_rnn.py:120-157 and train_video_rnn.py:93-133).  TPU-first layout:
the input projections for *all* timesteps are computed as one big MXU matmul
outside the scan; only the small (H, 3H/4H) recurrent matmul lives inside the
scan body.

Gate order matches torch exactly (GRU: r, z, n; LSTM: i, f, g, o), so torch
weights convert by transposition alone:
  w_ih (3H, E) -> kernel_ih (E, 3H) = w_ih.T, etc.
Initial state is zeros (torch default when no h0 is passed).
Init parity: all four tensors ~ U(-1/sqrt(H), 1/sqrt(H)).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.torch_compat import uniform_fan_in


class GRU(nn.Module):
    hidden_size: int
    unroll: int = 4  # lax.scan unroll: fewer, fatter scan steps on TPU

    @nn.compact
    def __call__(self, x):
        """x: (B, T, E) -> (outputs (B, T, H), final hidden (B, H))."""
        b, t, e = x.shape
        h_sz = self.hidden_size
        init = uniform_fan_in(h_sz)
        kernel_ih = self.param("kernel_ih", init, (e, 3 * h_sz))
        kernel_hh = self.param("kernel_hh", init, (h_sz, 3 * h_sz))
        bias_ih = self.param("bias_ih", init, (3 * h_sz,))
        bias_hh = self.param("bias_hh", init, (3 * h_sz,))

        # One MXU matmul for every timestep's input projection.
        x_proj = jnp.matmul(x, kernel_ih, preferred_element_type=jnp.float32) + bias_ih
        x_proj = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 3H)

        def step(h, xp):
            hp = jnp.matmul(h, kernel_hh, preferred_element_type=jnp.float32) + bias_hh
            xr, xz, xn = jnp.split(xp, 3, axis=-1)
            hr, hz, hn = jnp.split(hp, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * n + z * h
            return h_new, h_new

        h0 = jnp.zeros((b, h_sz), x_proj.dtype)
        h_last, outs = jax.lax.scan(step, h0, x_proj, unroll=self.unroll)
        return jnp.swapaxes(outs, 0, 1), h_last


class LSTM(nn.Module):
    hidden_size: int
    unroll: int = 4

    @nn.compact
    def __call__(self, x):
        """x: (B, T, E) -> (outputs (B, T, H), (h_T, c_T))."""
        b, t, e = x.shape
        h_sz = self.hidden_size
        init = uniform_fan_in(h_sz)
        kernel_ih = self.param("kernel_ih", init, (e, 4 * h_sz))
        kernel_hh = self.param("kernel_hh", init, (h_sz, 4 * h_sz))
        bias_ih = self.param("bias_ih", init, (4 * h_sz,))
        bias_hh = self.param("bias_hh", init, (4 * h_sz,))

        x_proj = jnp.matmul(x, kernel_ih, preferred_element_type=jnp.float32) + bias_ih
        x_proj = jnp.swapaxes(x_proj, 0, 1)

        def step(carry, xp):
            h, c = carry
            gates = xp + jnp.matmul(h, kernel_hh,
                                    preferred_element_type=jnp.float32) + bias_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        h0 = jnp.zeros((b, h_sz), x_proj.dtype)
        c0 = jnp.zeros((b, h_sz), x_proj.dtype)
        (h_last, c_last), outs = jax.lax.scan(step, (h0, c0), x_proj,
                                              unroll=self.unroll)
        return jnp.swapaxes(outs, 0, 1), (h_last, c_last)
