"""Token-grid pooling primitives for pooled multiscale attention.

TPU-native formulation of the reference ``attention_pool``
(reference ``slowfast/models/attention.py:13-65``): the token sequence is laid
out as ``[cls | T*H*W patch tokens | O object tokens]``; only the patch grid is
spatially pooled, the cls token passes through, and object tokens are handled
per pooling mode:

- depthwise-conv pooling: the reference broadcasts each object token over the
  conv kernel window, applies the same depthwise conv, and means the result
  (``attention.py:45-54``).  Because the conv is linear and its input constant
  per channel, that whole dance reduces *exactly* to a per-channel scalar
  multiplier ``m[c] = mean_p(sum of kernel weights at output position p)`` —
  computed here with a single conv over a ones-tensor instead of B*N*O tiny
  convs.  This is bit-equivalent in exact arithmetic and removes all dynamic
  per-object work from the hot path.
- max/avg pooling: object tokens pass through unchanged (the reference only
  routes objects through ``pool`` when it is a Conv3d).

Layouts are channels-last (NDHWC) throughout — XLA's native TPU layout.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


Triple = Tuple[int, int, int]


def _pad_cfg(kernel: Triple) -> Sequence[Tuple[int, int]]:
    return [(k // 2, k // 2) for k in kernel]


def out_shape(thw: Triple, kernel: Triple, stride: Triple) -> Triple:
    """Spatial output shape of a pool/conv with padding k//2 (floor mode)."""
    return tuple(
        (d + 2 * (k // 2) - k) // s + 1 for d, k, s in zip(thw, kernel, stride)
    )


def _grouped_conv3d(x: jax.Array, kernel: jax.Array, stride: Triple) -> jax.Array:
    C = x.shape[-1]
    k = kernel.shape[:3]
    return lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=stride,
        padding=_pad_cfg(k),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=C,
    )


def _tap_slices(xp: jax.Array, ksize: Triple, osize: Triple, stride: Triple):
    """Yield (tap_index, strided window of the padded input) per kernel tap."""
    kT, kH, kW = ksize
    oT, oH, oW = osize
    st, sh, sw = stride
    for dt in range(kT):
        for dh in range(kH):
            for dw in range(kW):
                yield (dt, dh, dw), lax.slice(
                    xp,
                    (0, dt, dh, dw, 0),
                    (
                        xp.shape[0],
                        dt + (oT - 1) * st + 1,
                        dh + (oH - 1) * sh + 1,
                        dw + (oW - 1) * sw + 1,
                        xp.shape[4],
                    ),
                    (1, st, sh, sw, 1),
                )


# Filter-gradient implementation switch.  'taps' is the production default:
# XLA's SPMD partitioner computes WRONG filter gradients for feature-grouped
# convolutions on a multi-axis mesh (observed rel-err ~1.0 on a
# (data=4, model=2) mesh; single-axis meshes are fine).  'native' uses XLA's
# own filter-grad conv — correct and fast on a single chip / single-axis
# mesh; the on-hardware numerics gate (tools/check_kernels_hw.py) traces its
# f32 ground-truth variant with it so the two implementations cross-check
# each other on the real TPU.
FILTER_GRAD_IMPL = "taps"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def depthwise_conv3d(
    x: jax.Array, kernel: jax.Array, stride: Triple
) -> jax.Array:
    """Depthwise 3D conv, NDHWC, padding k//2 each side (torch Conv3d semantics).

    x: [B, T, H, W, C]; kernel: [kT, kH, kW, 1, C] (one filter per channel).

    Forward and the input-gradient use XLA's grouped convolution (fast, and
    partitioner-safe). The FILTER gradient carries a custom VJP (see
    ``FILTER_GRAD_IMPL``): dk is computed as kT*kH*kW shifted multiply-reduce
    taps — pure elementwise + reduction ops that shard trivially over any
    mesh.
    """
    return _grouped_conv3d(x, kernel, stride)


def _depthwise_fwd(x, kernel, stride):
    return _grouped_conv3d(x, kernel, stride), (x, kernel)


def _depthwise_bwd(stride, residuals, ct):
    x, kernel = residuals
    if FILTER_GRAD_IMPL == "native":
        _, vjp = jax.vjp(
            lambda xx, kk: _grouped_conv3d(xx, kk, stride), x, kernel
        )
        return vjp(ct)
    # dx: XLA's own transpose of the grouped conv (input-grads partition
    # correctly; only the filter-grad conv is broken under SPMD).
    _, vjp_x = jax.vjp(lambda xx: _grouped_conv3d(xx, kernel, stride), x)
    (dx,) = vjp_x(ct)

    ksize = kernel.shape[:3]
    pads = [(0, 0)] + _pad_cfg(ksize) + [(0, 0)]
    # optimization_barrier: without it XLA-TPU fuses the pad into the strided
    # tap-slice gathers and the fused reads return garbage (deterministic
    # NaNs at specific taps) — found by tools/check_kernels_hw.py on real
    # hardware; the barrier forces the padded operand to materialize.
    xp = jax.lax.optimization_barrier(jnp.pad(x, pads))
    ct32 = jax.lax.optimization_barrier(ct.astype(jnp.float32))
    dk = jnp.zeros(kernel.shape, jnp.float32)
    for (dt, dh, dw), sl in _tap_slices(xp, ksize, ct.shape[1:4], stride):
        tap = jnp.sum(sl.astype(jnp.float32) * ct32, axis=(0, 1, 2, 3))
        dk = dk.at[dt, dh, dw, 0].set(tap)
    return dx, dk.astype(kernel.dtype)


depthwise_conv3d.defvjp(_depthwise_fwd, _depthwise_bwd)


def max_pool3d(
    x: jax.Array, kernel: Triple, stride: Triple
) -> jax.Array:
    """MaxPool3d with padding k//2, floor mode (torch ceil_mode=False). NDHWC.

    (XLA reduce_window.  NOTE: on TPU reduce_window prefers
    batch-second-minor layouts and causes relayout copies around Pallas
    calls; a tap-formulated XLA rewrite was measured WORSE — strided
    slices run at gather speed, +12 ms/fwd — so the strided production
    path uses the Pallas max kernel in pallas_pool.fused_pool_max
    instead; this remains the reference/fallback.)
    """
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        neg_inf,
        lax.max,
        window_dimensions=(1,) + tuple(kernel) + (1,),
        window_strides=(1,) + tuple(stride) + (1,),
        padding=[(0, 0)] + list(_pad_cfg(kernel)) + [(0, 0)],
    )


def avg_pool3d(x: jax.Array, kernel: Triple, stride: Triple) -> jax.Array:
    """AvgPool3d (count includes zero padding — torch count_include_pad=True default)."""
    summed = lax.reduce_window(
        x,
        jnp.array(0, x.dtype),
        lax.add,
        window_dimensions=(1,) + tuple(kernel) + (1,),
        window_strides=(1,) + tuple(stride) + (1,),
        padding=[(0, 0)] + list(_pad_cfg(kernel)) + [(0, 0)],
    )
    return summed / jnp.prod(jnp.array(kernel)).astype(x.dtype)


@functools.partial(jax.jit, static_argnums=(1,))
def conv_obj_multiplier(kernel: jax.Array, stride: Triple) -> jax.Array:
    """Per-channel multiplier equivalent to the reference's object-token conv.

    Applying a depthwise conv (padding k//2, stride s) to a constant-per-channel
    input of spatial size (kT,kH,kW) and meaning the outputs multiplies each
    channel by ``mean_p(sum of weights overlapping position p)`` — which is what
    this returns, shape [C].
    """
    kT, kH, kW, _, C = kernel.shape
    ones = jnp.ones((1, kT, kH, kW, C), dtype=kernel.dtype)
    out = depthwise_conv3d(ones, kernel, stride)
    return out.mean(axis=(1, 2, 3))[0]  # [C]


def split_tokens(
    x: jax.Array, thw: Triple, num_obj: int, has_cls: bool
):
    """Split [..., L, C] into (cls [...,1,C] | patches [...,THW,C] | obj [...,O,C])."""
    T, H, W = thw
    L = T * H * W
    start = 1 if has_cls else 0
    cls_tok = x[..., :start, :]
    patches = x[..., start : start + L, :]
    obj = x[..., start + L :, :]
    assert obj.shape[-2] == num_obj, (
        f"object token count mismatch: {obj.shape[-2]} != {num_obj}"
    )
    return cls_tok, patches, obj


def attention_pool(
    x: jax.Array,
    thw: Triple,
    *,
    mode: str,                       # 'conv' | 'max' | 'avg' | 'none'
    kernel: Triple = None,
    stride: Triple = None,
    conv_kernel: jax.Array = None,   # [kT,kH,kW,1,C] for mode='conv'
    num_obj: int,
    has_cls: bool = True,
    norm: "callable | None" = None,
):
    """Pool the patch grid of a token sequence; cls/object tokens per the rules above.

    x: [B, L, C] or [B, N_heads, L, C].  Returns (pooled tokens, new thw).
    """
    if mode == "none":
        return x, thw

    squeeze = x.ndim == 3
    if squeeze:
        x = x[:, None]  # [B, 1, L, C]

    B, N, L, C = x.shape
    cls_tok, patches, obj = split_tokens(x, thw, num_obj, has_cls)

    T, H, W = thw
    grid = patches.reshape(B * N, T, H, W, C)

    if mode == "conv":
        grid = depthwise_conv3d(grid, conv_kernel, stride)
        mult = conv_obj_multiplier(conv_kernel, stride).astype(x.dtype)
        obj = obj * mult
    elif mode == "max":
        grid = max_pool3d(grid, kernel, stride)
    elif mode == "avg":
        grid = avg_pool3d(grid, kernel, stride)
    else:
        raise NotImplementedError(f"Unsupported pool mode {mode}")

    new_thw = grid.shape[1:4]
    grid = grid.reshape(B, N, -1, C)

    parts = ([cls_tok] if has_cls else []) + [grid, obj]
    out = jnp.concatenate(parts, axis=2)
    if norm is not None:
        out = norm(out)
    if squeeze:
        out = out[:, 0]
    return out, tuple(new_thw)
