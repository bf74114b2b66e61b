"""Pallas TPU kernel: fused (shifted-)window attention for Swin3D.

The XLA path materializes the per-window score tensor (nW, heads, N, N) in
HBM several times over (bias add, mask add, softmax, attention-weighted
sum): for swin3d_t stage0 on 128 8-frame windows that is ~1 GB of traffic
per block and ~60% of the stage's runtime (benchmarks/profile_swin.py).
Window attention is tiny per window — N<=392 tokens, head_dim 32 — so this
kernel keeps a whole block of windows resident in VMEM and runs
qk^T + bias + mask + softmax + av without touching HBM in between.

Layout notes (Mosaic): blocks slice only the leading window axis, so DMA
stays contiguous; q/k/v per head are static 32-aligned lane slices of the
packed qkv activation (no lane concat).  The relative-position bias is a
constant-index block (fetched once); the shifted-window mask is indexed
`window mod nW_img`, so the windows-per-block must divide nW_img.

Used by models/swin3d.py ShiftedWindowAttention3d on the TPU backend.
The backward is a flash-style Pallas kernel (recompute softmax per window
block in VMEM, accumulate dbias across the sequential grid), so fine-tuning
an unfrozen Swin tower keeps the same HBM-traffic profile as inference;
the reference itself always froze Swin (reference models.py:49-59).
Measured (benchmarks/profile_swin_bwd.py, v5e, 8-frame 112px windows):
full-backbone value_and_grad 12.6 ms @32 windows (1.29x pure-XLA
attention) and 23.2 ms @64 (1.57x); the XLA-recompute fallback it replaces
measures within 1% of the flash backward — XLA fuses the recompute well —
so the flash kernel's margin is the transient (W, heads, N, N) HBM scratch
it avoids, not time.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def attention_core_ref(qkv, bias, mask, heads: int):
    """Reference jnp implementation: (W, N, 3C) -> (W, N, C).

    bias: (heads, N, N); mask: (nW_img, N, N) or None, window w uses
    mask[w % nW_img].
    """
    w, n, c3 = qkv.shape
    c = c3 // 3
    d = c // heads
    qkv_r = qkv.reshape(w, n, 3, heads, d)
    q = jnp.transpose(qkv_r[:, :, 0], (0, 2, 1, 3))  # (W, heads, N, d)
    k = jnp.transpose(qkv_r[:, :, 1], (0, 2, 1, 3))
    v = jnp.transpose(qkv_r[:, :, 2], (0, 2, 1, 3))
    attn = jnp.einsum("whnd,whmd->whnm", q * (d ** -0.5), k,
                      preferred_element_type=jnp.float32)
    attn = attn + bias[None].astype(attn.dtype)
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(w // nw, nw, heads, n, n)
        attn = attn + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(w, heads, n, n)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("whnm,whmd->whnd", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(w, n, c).astype(qkv.dtype)


# exp(x) on the VPU lowers to exp2(x * log2e); working in the log2 domain
# end-to-end (scale/bias/mask pre-multiplied by log2e, exp2 in the kernel)
# deletes that per-score-element multiply — and the softmax row
# normalization is postponed past the e@v matmul, turning an (N, N)
# broadcast-divide into an (N, d) multiply (d=32 vs N<=392).  MEASURED
# round 5 (7_trimodal rows): f32 -0.2% / bf16 +0.8% / serving +0.9% —
# noise-level, i.e. Mosaic already folds the log2e multiply and the
# kernel's softmax cost is the max/sum REDUCTIONS, not the exp itself.
# Kept because the form is strictly-not-more work and parity-tested;
# do not re-attempt exp-targeted lowering here.
_LOG2E = 1.4426950408889634


def _kernel(qkv_ref, bias_ref, mask_ref, out_ref, *, heads: int, d: int,
            scale: float):
    qkv = qkv_ref[...]
    c = heads * d
    mask = mask_ref[...].astype(jnp.float32)  # pre-scaled by log2e
    for h in range(heads):
        q = qkv[:, :, h * d:(h + 1) * d].astype(jnp.float32)
        k = qkv[:, :, c + h * d:c + (h + 1) * d].astype(jnp.float32)
        v = qkv[:, :, 2 * c + h * d:2 * c + (h + 1) * d].astype(jnp.float32)
        s = jax.lax.dot_general(
            q * (scale * _LOG2E), k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # (wb, n, n), log2 dom.
        s = s + bias_ref[h].astype(jnp.float32)[None]  # bias pre-scaled
        s = s + mask
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2(s)
        recip = 1.0 / jnp.sum(e, axis=-1, keepdims=True)   # (wb, n, 1)
        o = jax.lax.dot_general(
            e, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * recip    # (wb, n, d)
        out_ref[:, :, h * d:(h + 1) * d] = o.astype(out_ref.dtype)


def _pick_block(w_total: int, nw_img: int, n: int, c: int) -> int:
    """Windows per grid step: divides nW_img (mask alignment; 0 = unmasked,
    no constraint) and keeps the double-buffered qkv block in VMEM budget."""
    budget = 2 * 1024 * 1024  # qkv block bytes (x2 for double buffering)
    wb = max(1, min(budget // max(1, n * 3 * c * 4), w_total))
    while w_total % wb or (nw_img and nw_img % wb):
        wb -= 1
    return max(wb, 1)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def _fused_fwd(qkv, bias, mask, heads: int, interpret: bool):
    w, n, c3 = qkv.shape
    c = c3 // 3
    d = c // heads
    masked = mask is not None
    nw_img = mask.shape[0] if masked else 0
    wb = _pick_block(w, nw_img, n, c)
    grid = (w // wb,)
    if masked:
        blocks_per_img = nw_img // wb
        mask_spec = pl.BlockSpec((wb, n, n),
                                 lambda i: (i % blocks_per_img, 0, 0),
                                 memory_space=pltpu.VMEM)
        mask_arr = mask.astype(jnp.float32) * _LOG2E  # log2-domain scores
    else:
        mask_spec = pl.BlockSpec((1, n, n), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
        mask_arr = jnp.zeros((1, n, n), jnp.float32)
    kernel = functools.partial(_kernel, heads=heads, d=d,
                               scale=float(d) ** -0.5)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((wb, n, 3 * c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, n, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            mask_spec,
        ],
        out_specs=pl.BlockSpec((wb, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((w, n, c), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * w * heads * n * n * d,
            bytes_accessed=4 * (w * n * 3 * c + heads * n * n + w * n * c),
            transcendentals=w * heads * n * n),
        interpret=interpret,
    )(qkv, bias.astype(jnp.float32) * _LOG2E, mask_arr)


def _bwd_kernel(qkv_ref, bias_ref, mask_ref, g_ref, dqkv_ref, dbias_ref, *,
                heads: int, d: int, scale: float):
    """Flash-style backward: recompute p per (window-block, head) in VMEM,
    derive dQ/dK/dV/dbias without ever writing the (W, heads, N, N) score
    tensor to HBM.  dbias is a revisited output block (index map pinned to
    0) accumulated across the sequential TPU grid."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    qkv = qkv_ref[...]
    c = heads * d
    mask = mask_ref[...].astype(jnp.float32)
    for h in range(heads):
        q = qkv[:, :, h * d:(h + 1) * d].astype(jnp.float32)
        k = qkv[:, :, c + h * d:c + (h + 1) * d].astype(jnp.float32)
        v = qkv[:, :, 2 * c + h * d:2 * c + (h + 1) * d].astype(jnp.float32)
        g = g_ref[:, :, h * d:(h + 1) * d].astype(jnp.float32)
        s = jax.lax.dot_general(
            q * scale, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # (wb, n, n)
        s = s + bias_ref[h].astype(jnp.float32)[None]
        s = s + mask
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        # dV[w,m,e] = sum_n p[w,n,m] g[w,n,e]
        dv = jax.lax.dot_general(
            p, g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        # dP[w,n,m] = sum_e g[w,n,e] v[w,m,e]
        dp = jax.lax.dot_general(
            g, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        # dQ[w,n,e] = scale * sum_m ds[w,n,m] k[w,m,e]
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        # dK[w,m,e] = scale * sum_n ds[w,n,m] q[w,n,e]
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dqkv_ref[:, :, h * d:(h + 1) * d] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, c + h * d:c + (h + 1) * d] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * c + h * d:2 * c + (h + 1) * d] = (
            dv.astype(dqkv_ref.dtype))
        dbias_ref[h] += jnp.sum(ds, axis=0)


def _pick_block_bwd(w_total: int, nw_img: int, n: int, c: int,
                    heads: int, d: int) -> int:
    """Per-window-block VMEM cost: double-buffered streamed blocks (qkv in,
    g in, dqkv out = 2 x 4 x n x 7c bytes f32) PLUS the kernel's scoped
    stack — the head loop is unrolled, and Mosaic keeps each iteration's
    (wb, n, n) softmax/ds intermediates and (wb, n, d) q/k/v/g/dq/dk/dv
    slices live, so the stack scales with heads.  Ignoring that term blew
    the scoped-vmem limit at stage3 shapes (heads=24, N=64, C=768, W=128:
    wb=16 requested a 36 MB stack).  Then the same divisibility rules as
    the forward (mask alignment, even grid)."""
    budget = 80 * 1024 * 1024
    streams = 2 * 4 * n * 7 * c
    stack = heads * (3 * n * n + 8 * n * d) * 4
    wb = max(1, min(budget // max(1, streams + stack), w_total))
    while w_total % wb or (nw_img and nw_img % wb):
        wb -= 1
    return max(wb, 1)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def _fused_bwd(qkv, bias, mask, g, heads: int, interpret: bool):
    w, n, c3 = qkv.shape
    c = c3 // 3
    d = c // heads
    masked = mask is not None
    nw_img = mask.shape[0] if masked else 0
    wb = _pick_block_bwd(w, nw_img, n, c, heads, d)
    grid = (w // wb,)
    if masked:
        blocks_per_img = nw_img // wb
        mask_spec = pl.BlockSpec((wb, n, n),
                                 lambda i: (i % blocks_per_img, 0, 0),
                                 memory_space=pltpu.VMEM)
        mask_arr = mask.astype(jnp.float32)
    else:
        mask_spec = pl.BlockSpec((1, n, n), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
        mask_arr = jnp.zeros((1, n, n), jnp.float32)
    kernel = functools.partial(_bwd_kernel, heads=heads, d=d,
                               scale=float(d) ** -0.5)
    dqkv, dbias = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((wb, n, 3 * c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, n, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            mask_spec,
            pl.BlockSpec((wb, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((wb, n, 3 * c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, n, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((w, n, 3 * c), qkv.dtype),
            jax.ShapeDtypeStruct((heads, n, n), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * w * heads * n * n * d,
            bytes_accessed=4 * (2 * w * n * 3 * c + heads * n * n * 2
                                + w * n * c),
            transcendentals=w * heads * n * n),
        # the unrolled head loop's scoped stack exceeds the 16 MB default
        # at wide stages; the block picker bounds streams+stack to ~80 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qkv, bias.astype(jnp.float32), mask_arr, g)
    return dqkv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_window_attention(qkv, bias, mask, heads: int):
    """(W, N, 3C), (heads, N, N), (nW_img, N, N)|None -> (W, N, C).

    Pallas forward on TPU (auto-interpret elsewhere); backward is a
    flash-style Pallas kernel that recomputes the softmax per window block
    in VMEM — neither direction materializes (W, heads, N, N) in HBM, so
    fine-tuning the Swin tower keeps the forward kernel's memory savings."""
    interpret = jax.default_backend() != "tpu"
    return _fused_fwd(qkv, bias, mask, heads, interpret)


def _fwd(qkv, bias, mask, heads):
    return fused_window_attention(qkv, bias, mask, heads), (qkv, bias, mask)


def _bwd(heads, res, g):
    qkv, bias, mask = res
    interpret = jax.default_backend() != "tpu"
    d_qkv, d_bias = _fused_bwd(qkv, bias, mask, g, heads, interpret)
    return d_qkv, d_bias.astype(bias.dtype), None


fused_window_attention.defvjp(_fwd, _bwd)
