"""Pooled multiscale attention over separate (patch-grid | cls+object) streams.

TPU-native redesign of reference ``slowfast/models/attention.py:186-571``
(``MultiScaleAttention`` / ``MultiScaleBlock``).  Differences from the torch
implementation are purely in *how*, never in *what*:

- **Separate-stream token layout**: instead of one concatenated
  ``[cls | T*H*W | O*T]`` sequence that every pooling path must slice apart and
  re-concatenate (measured at ~40% of forward wall-time in HBM copies/pads/
  slices), the residual stream is carried as two tensors — the patch grid
  ``[B, T, H, W, C]`` (channels-last, XLA's native conv layout) and the tiny
  ``extras [B, 1+O*T, C]`` (cls + object tokens).  Attention keys/values are
  ``[patches | extras]``; softmax is permutation-invariant w.r.t. key order,
  so this matches the reference's joint attention exactly.
- channels-last layouts, all matmuls with f32 accumulation on the MXU;
- the fused qkv projection keeps its single ``[C, 3C]`` parameter (checkpoint
  compatible) but is applied as three weight-sliced matmuls — slicing the
  weights (KB) instead of the activations (155MB/block at the stem);
- object-token conv pooling folded to an exact per-channel multiplier
  (see ``svit_tpu/ops/pooling.py``);
- decomposed rel-pos bias enters the kernel through a scatter-matmul
  (``svit_tpu/ops/pallas_attention.py``); extras queries attend bias-free via
  a tiny XLA attention sharing the same K/V (reference gives cls/object query
  rows zero bias: ``attention.py:84-183`` only touches the patch block);
- softmax in f32, everything else in the configured compute dtype.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from svit_tpu.models.common import LayerNorm, Mlp
from svit_tpu.ops import mm, pooling

Triple = Tuple[int, int, int]

# Routing switch for the pooling implementation under use_pallas (module-level
# so profiling tools can ablate the fused pool kernel specifically).
POOL_PALLAS = True


class _DenseParams(nn.Module):
    """Parameter container matching nn.Dense's tree (kernel/bias) and init,
    for ops computed by fused or weight-sliced kernels instead of module calls."""

    dim_in: int
    dim_out: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.dim_in, self.dim_out), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.dim_out,), jnp.float32)
        return k, b


class _LNParams(nn.Module):
    """Parameter container matching LayerNorm's tree (scale/bias)."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return s, b


class _MlpParams(nn.Module):
    dim_in: int
    hidden: int
    dim_out: int

    @nn.compact
    def __call__(self):
        fc1 = _DenseParams(self.dim_in, self.hidden, name="fc1")()
        fc2 = _DenseParams(self.hidden, self.dim_out, name="fc2")()
        return fc1, fc2


def _needs_pool(kernel, stride) -> bool:
    """Pooling is skipped for kernel=stride=1 (reference attention.py:234-237)."""
    if not kernel or not stride:
        return False
    return int(np.prod(kernel)) != 1 or int(np.prod(stride)) != 1


class _GroupedLayerNorm(nn.Module):
    """LayerNorm over head_dim applied per head on [..., h*hd] channels.

    Matches the reference's per-head ``norm_q/k/v`` (LayerNorm(head_dim) on
    [B, heads, L, hd]) without requiring a head-major layout.  Param names
    (scale/bias of size head_dim) stay converter-compatible.
    """

    head_dim: int
    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shape = x.shape
        orig_dtype = x.dtype
        h = shape[-1] // self.head_dim
        x = x.reshape(*shape[:-1], h, self.head_dim).astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (self.head_dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.head_dim,), jnp.float32)
        y = y * scale + bias
        return y.astype(orig_dtype).reshape(shape)


def _ln_functional(x, scale, bias, epsilon: float = 1e-6):
    """Plain last-axis LN with explicit params (same math as LayerNorm)."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + epsilon) * scale + bias).astype(orig)


def _grouped_ln_apply(x, scale, bias, head_dim: int, epsilon: float = 1e-6):
    """Functional per-head LN (same math as _GroupedLayerNorm.__call__).

    ``scale``/``bias`` may be head_dim-sized (shared across heads) or full
    channel width (the lane-fused k|v pool's concatenated params)."""
    shape = x.shape
    h = shape[-1] // head_dim
    xf = x.reshape(*shape[:-1], h, head_dim).astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    if scale.size != head_dim:
        scale = scale.reshape(h, head_dim)
        bias = bias.reshape(h, head_dim)
    y = (xf - mean) * jax.lax.rsqrt(var + epsilon) * scale + bias
    return y.astype(x.dtype).reshape(shape)


class _PoolConvParams(nn.Module):
    """Parameter container for one conv-pool path (pool_kernel + per-head
    LN), used by the lane-fused k|v pool.  Param tree matches _PoolPath's
    (checkpoint/converter-compatible: pool_k/pool_kernel, pool_k/norm/...)."""

    head_dim: int
    kernel: Triple

    @nn.compact
    def __call__(self):
        ck = self.param(
            "pool_kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            tuple(self.kernel) + (1, self.head_dim),
            jnp.float32,
        )
        ln_s, ln_b = _LNParams(self.head_dim, name="norm")()
        return ck, ln_s, ln_b


class _PoolPath(nn.Module):
    """One q/k/v pooling path over the (grid, extras) streams.

    conv mode: depthwise conv on the grid (the reference's per-head conv with
    the kernel tiled across heads — no head-split copies), the exact
    per-channel multiplier on object tokens, cls passthrough, then per-head LN
    on both streams (the reference norms the full pooled sequence).  On TPU
    the grid's conv+LN runs as one fused Pallas pass
    (``svit_tpu/ops/pallas_pool.py``).
    max/avg: grid pooled, extras pass through (reference only routes objects
    through a Conv3d pool).
    """

    mode: str                    # 'conv' | 'max' | 'avg'
    head_dim: int                # the conv kernel's channel count
    num_heads: int
    kernel: Triple
    stride: Triple
    has_cls: bool
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, grid, extras, w_true: int = None):
        """``w_true``: true width of a W8-carried ``grid`` (None = exact).
        On the Pallas path the pooled grid comes back W8-carried
        (``keep_pad``) so the downstream flat reshapes stay bitcasts."""
        carried = w_true is not None and w_true < grid.shape[3]
        if self.mode == "conv":
            conv_kernel = self.param(
                "pool_kernel",
                nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
                tuple(self.kernel) + (1, self.head_dim),
                jnp.float32,
            )
            if self.num_heads > 1:
                conv_kernel = jnp.tile(conv_kernel, (1, 1, 1, 1, self.num_heads))
            mult = pooling.conv_obj_multiplier(
                conv_kernel, tuple(self.stride)
            ).astype(extras.dtype)
            if self.has_cls:
                extras = jnp.concatenate(
                    [extras[:, :1], extras[:, 1:] * mult], axis=1
                )
            else:
                extras = extras * mult
            if self.use_pallas and POOL_PALLAS:
                from svit_tpu.ops import pallas_pool

                ln_s, ln_b = _LNParams(self.head_dim, name="norm")()
                grid = pallas_pool.fused_pool_ln(
                    grid, conv_kernel, ln_s, ln_b,
                    tuple(self.kernel), tuple(self.stride), self.head_dim,
                    w_true, self.use_pallas,
                )
                extras = _grouped_ln_apply(extras, ln_s, ln_b, self.head_dim)
            else:
                if carried:  # ablation path (POOL_PALLAS off): exact-extent
                    grid = grid[:, :, :, :w_true]
                grid = pooling.depthwise_conv3d(
                    grid, conv_kernel, tuple(self.stride)
                )
                norm = _GroupedLayerNorm(
                    head_dim=self.head_dim, dtype=self.dtype, name="norm"
                )
                grid = norm(grid)
                extras = norm(extras)
                if self.use_pallas:  # stay carried for the fused attention
                    from svit_tpu.ops.pallas_pool import _carry_pad

                    grid = _carry_pad(grid, True)
        elif self.mode in ("max", "avg"):
            if carried:
                grid = grid[:, :, :, :w_true]
            pool = pooling.max_pool3d if self.mode == "max" else pooling.avg_pool3d
            grid = pool(grid, tuple(self.kernel), tuple(self.stride))
            if self.use_pallas:
                from svit_tpu.ops.pallas_pool import _carry_pad

                grid = _carry_pad(grid, True)
        else:
            raise NotImplementedError(f"Unsupported pool mode {self.mode}")
        return grid, extras


def _drop_path_pair(grid, extras, prob, rng, deterministic):
    """Stochastic depth with ONE per-sample mask shared by both streams
    (the reference drops the whole residual branch per sample)."""
    if prob == 0.0 or deterministic or rng is None:
        return grid, extras
    keep = 1.0 - prob
    mask = jax.random.bernoulli(rng, keep, (grid.shape[0],))
    mg = mask.reshape((-1,) + (1,) * (grid.ndim - 1)).astype(grid.dtype)
    me = mask.reshape((-1,) + (1,) * (extras.ndim - 1)).astype(extras.dtype)
    return grid / keep * mg, extras / keep * me


class MultiScaleAttention(nn.Module):
    dim: int
    dim_out: int
    num_heads: int
    input_size: Triple           # (T, H, W) token grid at this block
    qkv_bias: bool = True
    kernel_q: Tuple[int, ...] = ()
    kernel_kv: Tuple[int, ...] = ()
    stride_q: Tuple[int, ...] = ()
    stride_kv: Tuple[int, ...] = ()
    mode: str = "conv"
    has_cls: bool = True
    rel_pos_spatial: bool = False
    rel_pos_temporal: bool = False
    rel_pos_zero_init: bool = False
    residual_pooling: bool = False
    separate_qkv: bool = False
    drop_rate: float = 0.0
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, thw: Triple, deterministic: bool = True, ln1=None):
        grid, extras = x
        B = grid.shape[0]
        E = extras.shape[1]
        heads = self.num_heads
        head_dim = self.dim_out // heads
        dim_out = self.dim_out
        scale = head_dim ** -0.5

        # Projections in stream layout.  The fused qkv keeps one [C, 3C]
        # parameter (converter-compatible) applied as three weight-sliced
        # matmuls: weight slices are KB, activation slices would be 100s of MB.
        # The grid is flattened to rank 3 around the matmul (free reshapes —
        # channel-minor layout preserved): a rank-5 einsum lowers to a 1x1x1
        # convolution whose layout assignment derails the depthwise pool convs.
        gshape = grid.shape

        def on_flat(f, t):
            if t.ndim == 5:
                return f(
                    t.reshape(t.shape[0], -1, t.shape[-1])
                ).reshape(t.shape[:4] + (-1,))
            return f(t)

        if self.separate_qkv:
            dq = nn.Dense(dim_out, use_bias=self.qkv_bias, dtype=self.dtype, name="q")
            dk = nn.Dense(dim_out, use_bias=self.qkv_bias, dtype=self.dtype, name="k")
            dv = nn.Dense(dim_out, use_bias=self.qkv_bias, dtype=self.dtype, name="v")
            qg, qe = on_flat(dq, grid), dq(extras)
            kvg = jnp.concatenate(
                [on_flat(dk, grid), on_flat(dv, grid)], axis=-1
            )
            kve = jnp.concatenate([dk(extras), dv(extras)], axis=-1)
        else:
            wk, wb = _DenseParams(grid.shape[-1], dim_out * 3, name="qkv")()

            def wslice(lo, hi):
                w = jax.lax.slice_in_dim(wk, lo, hi, axis=1).astype(self.dtype)
                b = jax.lax.slice_in_dim(wb, lo, hi, axis=0)
                return w, (b if self.qkv_bias else jnp.zeros_like(b))

            def sliced(t, lo, hi):
                # k and v are computed by ONE matmul over the contiguous
                # [C, 2*dim_out] weight slice: k|v stay lane-fused through
                # the pool and into the attention kernel, so no separate
                # k/v tensors (or their pads/pools) ever hit HBM.
                # Rank-2 dot (ops/mm.py): the rank-3 einsum form lowers to a
                # 1x1 conv whose batch-minor layout forces relayout copies
                # around every Pallas call.
                w, b = wslice(lo, hi)
                return mm.dense2d(
                    t.astype(self.dtype), w,
                    b if self.qkv_bias else None,
                )

            if ln1 is not None:
                # norm1 fused into the q / k|v matmul prologues (the block
                # passed the RAW streams): ONE kernel reads x once, computes
                # the LN statistics once, and emits both projections —
                # instead of materializing the normed tensor in HBM and
                # re-reading it twice (see ops/pallas_ffn.fused_ln_qkv).
                from svit_tpu.ops import pallas_ffn as pf

                ls, lb = ln1
                gflat = grid.reshape(B, -1, grid.shape[-1]).astype(self.dtype)
                wq, bq = wslice(0, dim_out)
                wkv, bkv = wslice(dim_out, 3 * dim_out)
                qg, kvg = pf.fused_ln_qkv(gflat, ls, lb, wq, bq, wkv, bkv)
                qg = qg.reshape(grid.shape[:4] + (dim_out,))
                kvg = kvg.reshape(grid.shape[:4] + (2 * dim_out,))
                extras = _ln_functional(extras, ls, lb)
                qe = sliced(extras, 0, dim_out)
                kve = sliced(extras, dim_out, 3 * dim_out)
            else:
                qg = sliced(grid, 0, dim_out)
                kvg = sliced(grid, dim_out, 3 * dim_out)
                qe = sliced(extras, 0, dim_out)
                kve = sliced(extras, dim_out, 3 * dim_out)

        pool_q_on = _needs_pool(self.kernel_q, self.stride_q)
        pool_kv_on = _needs_pool(self.kernel_kv, self.stride_kv)

        def pooled_true(kernel, stride):
            # TRUE pooled token grid (torch pool semantics, padding k//2) —
            # under the W8-carry the arrays may be wider than this
            from svit_tpu.ops.pallas_pool import _out_size

            return tuple(
                _out_size(d, k, s) for d, k, s in zip(thw, kernel, stride)
            )

        q_shape = thw
        if pool_q_on:
            qg, qe = _PoolPath(
                mode=self.mode, head_dim=head_dim, num_heads=heads,
                kernel=tuple(self.kernel_q), stride=tuple(self.stride_q),
                has_cls=self.has_cls, use_pallas=self.use_pallas,
                dtype=self.dtype, name="pool_q",
            )(qg, qe, w_true=thw[2])
            q_shape = pooled_true(self.kernel_q, self.stride_q)
        k_shape = thw
        if pool_kv_on:
            if self.mode == "conv":
                # ONE pool pass for the lane-fused k|v tensor: depthwise
                # conv + per-head LN are channel-local, so pooling the
                # fused [.., 2C] tensor with lane-concatenated pool_k |
                # pool_v weights is exactly pooling each separately — at
                # half the pad/parity/kernel-launch cost.
                ck_k, ls_k, lb_k = _PoolConvParams(
                    head_dim=head_dim, kernel=tuple(self.kernel_kv),
                    name="pool_k",
                )()
                ck_v, ls_v, lb_v = _PoolConvParams(
                    head_dim=head_dim, kernel=tuple(self.kernel_kv),
                    name="pool_v",
                )()

                def tile_h(t, reps):
                    return jnp.tile(t, (1,) * (t.ndim - 1) + (reps,))

                ck = jnp.concatenate(
                    [tile_h(ck_k, heads), tile_h(ck_v, heads)], axis=-1
                )  # [kT, kH, kW, 1, 2C]
                ls = jnp.concatenate(
                    [jnp.tile(ls_k, heads), jnp.tile(ls_v, heads)]
                )  # [2C]
                lb = jnp.concatenate(
                    [jnp.tile(lb_k, heads), jnp.tile(lb_v, heads)]
                )
                mult = pooling.conv_obj_multiplier(
                    ck, tuple(self.stride_kv)
                ).astype(kve.dtype)
                if self.has_cls:
                    kve = jnp.concatenate(
                        [kve[:, :1], kve[:, 1:] * mult], axis=1
                    )
                else:
                    kve = kve * mult
                if self.use_pallas and POOL_PALLAS:
                    from svit_tpu.ops import pallas_pool

                    # keep_pad=False: the pooled K/V is flattened into the
                    # attention key axis, where carried junk columns would
                    # grow Nk_pad (stage 2: 512 -> 640, +25% attention
                    # FLOPs x11 blocks).  The kv tensors are pooled-tiny,
                    # so the exact-width slice is ~30x cheaper than the
                    # junk-key work it avoids; only the big residual/q
                    # stream rides W8-carried.
                    kvg = pallas_pool.fused_pool_ln(
                        kvg, ck, ls, lb,
                        tuple(self.kernel_kv), tuple(self.stride_kv),
                        head_dim, thw[2], False,
                    )
                else:
                    if self.use_pallas and thw[2] < kvg.shape[3]:
                        kvg = kvg[:, :, :, :thw[2]]  # POOL_PALLAS ablation
                    kvg = pooling.depthwise_conv3d(
                        kvg, ck, tuple(self.stride_kv)
                    )
                    kvg = _grouped_ln_apply(kvg, ls, lb, head_dim)
                kve = _grouped_ln_apply(kve, ls, lb, head_dim)
            elif self.mode in ("max", "avg"):
                if self.use_pallas and thw[2] < kvg.shape[3]:
                    kvg = kvg[:, :, :, :thw[2]]
                pool = (
                    pooling.max_pool3d if self.mode == "max"
                    else pooling.avg_pool3d
                )
                kvg = pool(kvg, tuple(self.kernel_kv), tuple(self.stride_kv))
            else:
                raise NotImplementedError(f"Unsupported pool mode {self.mode}")
            k_shape = pooled_true(self.kernel_kv, self.stride_kv)

        # Physical (possibly W8-carried) grids drive layout; q_shape/k_shape
        # stay TRUE and drive the rel-pos tables.  When carried, the flat
        # reshapes below are bitcasts — that is the whole point of the carry
        # (flat<->rank-5 transitions were 2 physical copies each whenever
        # W % 8 != 0; ~15 ms of a 77 ms batch-16 forward).
        q_phys = tuple(qg.shape[1:4])
        k_phys = tuple(kvg.shape[1:4])
        q_l = int(np.prod(q_phys))
        k_l = int(np.prod(k_phys))
        n_k = k_l + E

        # Keys/values: [patches | extras] — a tiny concat (K/V are pooled).
        # Everything stays channel-flat and k|v lane-fused [B, N, 2C]: the
        # attention kernel loops heads over lane slices in VMEM, so neither
        # a head-major [B*h, N, hd] transpose nor a k/v split (full HBM
        # passes per block) is ever built.
        kv_all = jnp.concatenate(
            [kvg.reshape(B, k_l, 2 * dim_out), kve], axis=1
        )
        qf = qg.reshape(B, q_l, dim_out)

        rp_h = rp_w = rp_t = None
        if self.rel_pos_spatial:
            assert self.input_size[1] == self.input_size[2]
            size = self.input_size[1]
            sq = self.stride_q[1] if pool_q_on else 1
            skv = self.stride_kv[1] if pool_kv_on else 1
            rel_sp_dim = 2 * max(size // sq, size // skv) - 1
            init = (
                nn.initializers.zeros
                if self.rel_pos_zero_init
                else nn.initializers.truncated_normal(0.02)
            )
            rp_h = self.param("rel_pos_h", init, (rel_sp_dim, head_dim), jnp.float32)
            rp_w = self.param("rel_pos_w", init, (rel_sp_dim, head_dim), jnp.float32)
        if self.rel_pos_temporal:
            init = (
                nn.initializers.zeros
                if self.rel_pos_zero_init
                else nn.initializers.truncated_normal(0.02)
            )
            rp_t = self.param(
                "rel_pos_t", init, (2 * self.input_size[0] - 1, head_dim), jnp.float32
            )

        from svit_tpu.ops import pallas_attention as pa

        bias_src, scatter = pa.build_bias_inputs_grid(
            qg, heads, q_shape, k_shape, n_k,
            rel_pos_h=rp_h, rel_pos_w=rp_w, rel_pos_t=rp_t,
            k_w_phys=k_phys[2] if k_phys[2] != k_shape[2] else None,
        )
        wp, bp = _DenseParams(dim_out, dim_out, name="proj")()
        if self.use_pallas:
            # Fused kernel: softmax((q*scale)@K^T + bias) @ V without the
            # HBM-resident [Nq, Nk] logits (see ops/pallas_attention.py).
            # The q scale is applied inside the kernel (VMEM) — scaling in
            # XLA materializes a full scaled copy of q in HBM — and the
            # out-projection (+ the residual-pooling ``out += q``,
            # reference attention.py:455-459) runs in the kernel epilogue,
            # so neither the raw attention output nor the ``out+q`` sum is
            # ever written to HBM.
            og = pa.fused_attention_proj(
                qf, kv_all, bias_src, scatter, wp.astype(self.dtype), bp,
                scale, heads, self.residual_pooling,
            )
        else:
            og = pa.reference_attention(
                qf, kv_all, bias_src, scatter[:, :n_k], scale, heads
            )
            if self.residual_pooling:
                og = og + qf.astype(og.dtype)
            og = mm.dense2d(
                og.astype(self.dtype), wp.astype(self.dtype), bp
            )

        # Extras (cls + object) queries: zero rel-pos bias (reference only
        # biases the patch block) — they attend over the same K/V.
        if self.use_pallas:
            # Same fused kernel, second launch: bias rows are zeros except
            # the mask channel (junk padded keys still need their -inf), so
            # the scatter-matmul contributes exactly 0 rel-pos bias.  This
            # replaces ~15 small XLA ops per block (head-split transposes,
            # logits/softmax/out einsums, proj) with one kernel call, and
            # the bwd runs the same Pallas attention bwd as the grid.
            bias_e = jnp.concatenate(
                [
                    jnp.zeros(
                        (B, heads, E, bias_src.shape[-1] - 1),
                        bias_src.dtype,
                    ),
                    jnp.ones((B, heads, E, 1), bias_src.dtype),
                ],
                axis=-1,
            )
            oe = pa.fused_attention_proj(
                qe.astype(self.dtype), kv_all, bias_e, scatter,
                wp.astype(self.dtype), bp, scale, heads,
                self.residual_pooling,
            )
            if self.residual_pooling and self.has_cls:
                # reference adds the q residual to all but the cls row
                # (attention.py:455-459); the kernel adds it to every row,
                # so remove the cls row's q contribution post-projection
                oe = jnp.concatenate(
                    [
                        oe[:, :1]
                        - mm.dense2d(
                            qe[:, :1].astype(self.dtype),
                            wp.astype(self.dtype),
                        ),
                        oe[:, 1:],
                    ],
                    axis=1,
                )
        else:
            qe_h = (
                (qe * scale)
                .reshape(B, E, heads, head_dim).transpose(0, 2, 1, 3)
            )
            kh = (
                kv_all[..., :dim_out]
                .reshape(B, n_k, heads, head_dim).transpose(0, 2, 1, 3)
            )
            vh = (
                kv_all[..., dim_out:]
                .reshape(B, n_k, heads, head_dim).transpose(0, 2, 1, 3)
            )
            logits_e = jnp.einsum(
                "bhed,bhkd->bhek", qe_h, kh,
                preferred_element_type=jnp.float32,
            )
            pe = jax.nn.softmax(logits_e, axis=-1)
            oe = jnp.einsum(
                "bhek,bhkd->bhed", pe.astype(vh.dtype), vh,
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)

            if self.residual_pooling:
                # Reference attention.py:455-459: add pooled q to all but
                # the cls row — grid rows are handled inside the attention
                # epilogue (q_residual); only extras' object rows remain.
                qe_res = (
                    qe.reshape(B, E, heads, head_dim).transpose(0, 2, 1, 3)
                )
                if self.has_cls:
                    oe = jnp.concatenate(
                        [oe[:, :, :1], oe[:, :, 1:] + qe_res[:, :, 1:]],
                        axis=2,
                    )
                else:
                    oe = oe + qe_res

            # og is already channel-flat and projected; only the tiny
            # extras output needs its head axis folded back + proj.
            oe = oe.transpose(0, 2, 1, 3).reshape(B, E, dim_out)
            oe = mm.dense2d(
                oe.astype(self.dtype), wp.astype(self.dtype), bp
            )
        if self.drop_rate > 0.0:
            drop = nn.Dropout(self.drop_rate)
            og = drop(og, deterministic=deterministic)
            oe = drop(oe, deterministic=deterministic)
        og = og.reshape((B,) + q_phys + (dim_out,))
        return (og, oe), q_shape


class MultiScaleBlock(nn.Module):
    dim: int
    dim_out: int
    num_heads: int
    input_size: Triple
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    drop_path: float = 0.0
    kernel_q: Tuple[int, ...] = ()
    kernel_kv: Tuple[int, ...] = ()
    stride_q: Tuple[int, ...] = ()
    stride_kv: Tuple[int, ...] = ()
    mode: str = "conv"
    has_cls: bool = True
    rel_pos_spatial: bool = False
    rel_pos_temporal: bool = False
    rel_pos_zero_init: bool = False
    residual_pooling: bool = False
    dim_mul_in_att: bool = False
    separate_qkv: bool = False
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, thw: Triple, deterministic: bool = True):
        grid, extras = x
        att_dim = self.dim_out if self.dim_mul_in_att else self.dim

        # norm1 params owned here (tree-compatible with the LayerNorm module);
        # when only the attention consumes the normed stream, the LN is fused
        # into its q/kv matmul prologues instead of materializing gn in HBM.
        ln1_s, ln1_b = _LNParams(self.dim, name="norm1")()
        fuse_ln1 = self.use_pallas and not self.separate_qkv
        if fuse_ln1:
            gn, en = grid, extras          # raw; attention applies LN
            ln1 = (ln1_s, ln1_b)
        else:
            gn = _ln_functional(grid, ln1_s, ln1_b)
            en = _ln_functional(extras, ln1_s, ln1_b)
            ln1 = None
        (ag, ae), thw_new = MultiScaleAttention(
            dim=self.dim,
            dim_out=att_dim,
            num_heads=self.num_heads,
            input_size=self.input_size,
            qkv_bias=self.qkv_bias,
            kernel_q=self.kernel_q,
            kernel_kv=self.kernel_kv,
            stride_q=self.stride_q,
            stride_kv=self.stride_kv,
            mode=self.mode,
            has_cls=self.has_cls,
            rel_pos_spatial=self.rel_pos_spatial,
            rel_pos_temporal=self.rel_pos_temporal,
            rel_pos_zero_init=self.rel_pos_zero_init,
            residual_pooling=self.residual_pooling,
            separate_qkv=self.separate_qkv,
            drop_rate=self.drop_rate,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
            name="attn",
        )((gn, en), thw, deterministic=deterministic, ln1=ln1)

        if self.dim_mul_in_att and self.dim != self.dim_out:
            if ln1 is not None:
                # gn/en are the RAW streams here (norm1 fused into the
                # attention's qkv kernel); the grid proj recomputes norm1
                # inside the LN+dense kernel — a second LN costs nothing
                # (VMEM) and keeps the big matmul layout-pinned in Pallas
                # (the XLA dot at stage-transition blocks picked an
                # M-minor layout and forced ~0.6 ms relayout copies).
                from svit_tpu.ops import pallas_ffn as pf

                wpj, bpj = _DenseParams(self.dim, self.dim_out, name="proj")()
                gflat = gn.reshape(
                    gn.shape[0], -1, gn.shape[-1]
                ).astype(self.dtype)
                grid = pf.fused_ln_dense(
                    gflat, ln1_s, ln1_b, wpj.astype(self.dtype), bpj
                ).reshape(gn.shape[:4] + (self.dim_out,))
                enx = _ln_functional(en, ln1_s, ln1_b)
                extras = mm.dense2d(
                    enx.astype(self.dtype), wpj.astype(self.dtype), bpj
                )
            else:
                # rank-2 inputs: a Dense on [B, L, C] lowers to a 1x1 conv
                # whose batch-minor layout forces relayouts (ops/mm.py)
                proj = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")
                gf = gn.reshape(-1, gn.shape[-1])
                grid = proj(gf).reshape(gn.shape[:4] + (self.dim_out,))
                extras = proj(
                    en.reshape(-1, en.shape[-1])
                ).reshape(en.shape[:2] + (self.dim_out,))

        # Residual skip path: max-pool the patch grid with kernel s+1 where the
        # q stride is s (reference attention.py:503-505,549-555); extras pass
        # through (MaxPool3d never touches cls/objects).  Identity when the
        # block does not change resolution.
        if self.stride_q and int(np.prod(self.stride_q)) > 1:
            kernel_skip = tuple(s + 1 if s > 1 else s for s in self.stride_q)
            if self.use_pallas:
                # XLA reduce_window wants batch-second-minor layouts and
                # drags relayout copies around the Pallas calls; the Pallas
                # max kernel keeps the stream in the default layout
                from svit_tpu.ops import pallas_pool

                grid_res = pallas_pool.fused_pool_max(
                    grid, kernel_skip, tuple(self.stride_q),
                    w_true=thw[2], keep_pad=True,
                )
            else:
                grid_res = pooling.max_pool3d(
                    grid, kernel_skip, tuple(self.stride_q)
                )
        else:
            grid_res = grid
        if self.use_pallas and grid_res.shape[3] < ag.shape[3]:
            # a stride-1 q pool W8-carried the attention output while the
            # residual skip kept the exact input width: align the skip
            # (zero junk columns; the add keeps junk finite)
            from svit_tpu.ops.pallas_pool import _carry_pad

            grid_res = _carry_pad(grid_res, True)

        use_dp = self.drop_path > 0.0 and not deterministic
        rng1 = self.make_rng("dropout") if use_dp else None

        hidden = int(att_dim * self.mlp_ratio)
        # Fused LN+MLP kernel on the grid stream: usable whenever norm2's
        # output feeds only the MLP (the dim_mul_in_att=False dim-change path
        # consumes it too) and the MLP has no dropout.  Extras run the
        # numerics-identical XLA reference with the same parameters.
        fuse_ffn = (
            self.use_pallas
            and self.drop_rate == 0.0
            and (self.dim_mul_in_att or self.dim == self.dim_out)
        )
        if fuse_ffn:
            # Whole residual tail in one kernel (see fused_ffn_residual):
            # x = grid_res + attention; out = x + mlp(ln2(x)).  The
            # post-attention stream never exists in HBM.  Under active
            # drop-path the two per-sample mask scalings run inside the
            # kernel too (fused_ffn_residual_masked) with the exact op
            # order of _drop_path_pair; the rng draws stay in XLA and in
            # the same order as the unfused path.
            from svit_tpu.ops import pallas_ffn

            keep = 1.0 - self.drop_path
            B0 = grid_res.shape[0]
            if use_dp:
                rng2 = self.make_rng("dropout")
                mask1 = jax.random.bernoulli(rng1, keep, (B0,))
                mask2 = jax.random.bernoulli(rng2, keep, (B0,))
                ae = ae / keep * mask1.reshape(-1, 1, 1).astype(ae.dtype)
            ln_s, ln_b = _LNParams(att_dim, name="norm2")()
            (w1, b1), (w2, b2) = _MlpParams(
                att_dim, hidden, self.dim_out, name="mlp"
            )()
            w1c, w2c = w1.astype(self.dtype), w2.astype(self.dtype)
            # physical token count (W8-carried arrays are wider than
            # thw_new; the flat reshape is a bitcast either way)
            L = int(np.prod(grid_res.shape[1:4]))
            gr = grid_res.reshape(B0, L, att_dim)
            agf = ag.reshape(B0, L, att_dim)
            if use_dp:
                out_g = pallas_ffn.fused_ffn_residual_masked(
                    keep, gr, agf, ln_s, ln_b, w1c, b1, w2c, b2,
                    mask1, mask2,
                )
            else:
                out_g = pallas_ffn.fused_ffn_residual(
                    gr, agf, ln_s, ln_b, w1c, b1, w2c, b2,
                )
            out_g = out_g.reshape(grid_res.shape[:4] + (self.dim_out,))
            ex = extras + ae
            ye = pallas_ffn.ffn_reference(ex, ln_s, ln_b, w1c, b1, w2c, b2)
            if use_dp:
                ye = ye / keep * mask2.reshape(-1, 1, 1).astype(ye.dtype)
            out_e = ex + ye
            return (out_g, out_e), thw_new

        ag, ae = _drop_path_pair(ag, ae, self.drop_path, rng1, deterministic)
        grid = grid_res + ag
        extras = extras + ae
        norm2 = LayerNorm(dtype=self.dtype, name="norm2")
        g2, e2 = norm2(grid), norm2(extras)
        mlp = Mlp(
            hidden_features=hidden,
            out_features=self.dim_out,
            drop_rate=self.drop_rate,
            dtype=self.dtype,
            name="mlp",
        )
        # rank-3 around the matmuls: a rank-5 Dense lowers to a 1x1x1
        # convolution whose layout assignment derails downstream convs
        gshape2 = g2.shape
        g2f = g2.reshape(gshape2[0], -1, gshape2[-1])
        mg = mlp(g2f, deterministic=deterministic).reshape(
            gshape2[:4] + (self.dim_out,)
        )
        me = mlp(e2, deterministic=deterministic)
        if not self.dim_mul_in_att and self.dim != self.dim_out:
            proj = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")
            grid = proj(
                g2f.reshape(-1, g2f.shape[-1])
            ).reshape(gshape2[:4] + (self.dim_out,))
            extras = proj(
                e2.reshape(-1, e2.shape[-1])
            ).reshape(e2.shape[:2] + (self.dim_out,))

        rng2 = self.make_rng("dropout") if use_dp else None
        mg, me = _drop_path_pair(mg, me, self.drop_path, rng2, deterministic)
        return (grid + mg, extras + me), thw_new
