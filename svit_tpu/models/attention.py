"""Pooled multiscale attention over [cls | patch-grid | object] tokens.

TPU-native redesign of reference ``slowfast/models/attention.py:186-571``
(``MultiScaleAttention`` / ``MultiScaleBlock``).  Differences from the torch
implementation are purely in *how*, never in *what*:

- channels-last layouts, all matmuls with f32 accumulation on the MXU;
- object-token conv pooling folded to an exact per-channel multiplier
  (see ``svit_tpu/ops/pooling.py``);
- rel-pos bias added via fused broadcasts (``svit_tpu/ops/rel_pos.py``)
  instead of in-place sub-block mutation;
- softmax in f32, everything else in the configured compute dtype.

The fused Pallas attention kernel (svit_tpu/ops/pallas_attention.py) slots in
behind the same interface for the perf path.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from svit_tpu.models.common import DropPath, LayerNorm, Mlp
from svit_tpu.ops import pooling, rel_pos

Triple = Tuple[int, int, int]


class _DenseParams(nn.Module):
    """Parameter container matching nn.Dense's tree (kernel/bias) and init,
    for ops computed by fused kernels instead of module calls."""

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
        import jax

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


class _PoolPath(nn.Module):
    """One q/k/v pooling path: depthwise conv (or max/avg) + per-head LN.

    Operates in the merged [B, L, heads*head_dim] layout: the reference's
    per-head depthwise conv (shared kernel across heads,
    ``attention.py:258-304``) is one conv with the kernel tiled across the
    head axis — no head-split reshapes/copies on the hot path.
    """

    mode: str                    # 'conv' | 'max' | 'avg'
    head_dim: int                # the conv kernel's channel count
    num_heads: int
    kernel: Triple
    stride: Triple
    num_obj: int
    has_cls: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, thw):
        conv_kernel = None
        norm = None
        if self.mode == "conv":
            conv_kernel = self.param(
                "pool_kernel",
                nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
                tuple(self.kernel) + (1, self.head_dim),
                jnp.float32,
            )
            if self.num_heads > 1:
                conv_kernel = jnp.tile(conv_kernel, (1, 1, 1, 1, self.num_heads))
            norm = _GroupedLayerNorm(
                head_dim=self.head_dim, dtype=self.dtype, name="norm"
            )
        return pooling.attention_pool(
            x,
            thw,
            mode=self.mode,
            kernel=tuple(self.kernel),
            stride=tuple(self.stride),
            conv_kernel=conv_kernel,
            num_obj=self.num_obj,
            has_cls=self.has_cls,
            norm=norm,
        )


class MultiScaleAttention(nn.Module):
    dim: int
    dim_out: int
    num_heads: int
    input_size: Triple           # (T, H, W) token grid at this block
    num_obj: int                 # O * T object tokens in the sequence
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
    def __call__(self, x, thw: Triple, deterministic: bool = True):
        B, N, _ = x.shape
        head_dim = self.dim_out // self.num_heads
        scale = head_dim ** -0.5

        heads = self.num_heads
        # Projections and pooling run in the merged [B, L, heads*hd] layout;
        # heads are split only at the attention boundary (one small transpose
        # of the pooled tensors instead of per-path head-major copies).
        if self.separate_qkv:
            q = nn.Dense(self.dim_out, use_bias=self.qkv_bias, dtype=self.dtype, name="q")(x)
            k = nn.Dense(self.dim_out, use_bias=self.qkv_bias, dtype=self.dtype, name="k")(x)
            v = nn.Dense(self.dim_out, use_bias=self.qkv_bias, dtype=self.dtype, name="v")(x)
        else:
            qkv = nn.Dense(
                self.dim_out * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv"
            )(x)
            # fused projection output is laid out (3, heads, hd) on the
            # feature axis — minor-axis slices, no transpose copy
            q = qkv[..., : self.dim_out]
            k = qkv[..., self.dim_out : 2 * self.dim_out]
            v = qkv[..., 2 * self.dim_out :]

        pool_q_on = _needs_pool(self.kernel_q, self.stride_q)
        pool_kv_on = _needs_pool(self.kernel_kv, self.stride_kv)

        q_shape = thw
        if pool_q_on:
            q, q_shape = _PoolPath(
                mode=self.mode, head_dim=head_dim, num_heads=heads,
                kernel=tuple(self.kernel_q), stride=tuple(self.stride_q),
                num_obj=self.num_obj, has_cls=self.has_cls,
                dtype=self.dtype, name="pool_q",
            )(q, thw)
        k_shape = v_shape = thw
        if pool_kv_on:
            k, k_shape = _PoolPath(
                mode=self.mode, head_dim=head_dim, num_heads=heads,
                kernel=tuple(self.kernel_kv), stride=tuple(self.stride_kv),
                num_obj=self.num_obj, has_cls=self.has_cls,
                dtype=self.dtype, name="pool_k",
            )(k, thw)
            v, v_shape = _PoolPath(
                mode=self.mode, head_dim=head_dim, num_heads=heads,
                kernel=tuple(self.kernel_kv), stride=tuple(self.stride_kv),
                num_obj=self.num_obj, has_cls=self.has_cls,
                dtype=self.dtype, name="pool_v",
            )(v, thw)

        def to_heads(t):
            # [B, L, heads*hd] -> [B, heads, L, hd]
            return t.reshape(B, t.shape[1], heads, head_dim).transpose(0, 2, 1, 3)

        q = to_heads(q)
        k = to_heads(k)
        v = to_heads(v)

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

        if self.use_pallas:
            # Fused kernel: softmax((q*scale)@K^T + bias) @ V without the
            # HBM-resident [Nq, Nk] logits (see ops/pallas_attention.py).
            from svit_tpu.ops import pallas_attention as pa

            Nq, Nk = q.shape[2], k.shape[2]
            bias_src, scatter = pa.build_bias_inputs(
                q, q_shape, k_shape, Nk,
                has_cls=self.has_cls,
                rel_pos_h=rp_h, rel_pos_w=rp_w, rel_pos_t=rp_t,
            )
            heads = self.num_heads
            out = pa.fused_attention(
                (q * scale).reshape(B * heads, Nq, head_dim),
                k.reshape(B * heads, Nk, head_dim),
                v.reshape(B * heads, Nk, head_dim),
                bias_src,
                scatter,
            )
            x = out.reshape(B, heads, Nq, head_dim).astype(self.dtype)
        else:
            # XLA path: logits in f32 (MXU accumulates f32 from bf16 inputs).
            attn = jnp.einsum(
                "bhqc,bhkc->bhqk", q * scale, k,
                preferred_element_type=jnp.float32,
            )
            attn = rel_pos.add_rel_pos_bias(
                attn,
                q.astype(jnp.float32),
                q_shape,
                k_shape,
                has_cls=self.has_cls,
                rel_pos_h=rp_h,
                rel_pos_w=rp_w,
                rel_pos_t=rp_t,
            )
            attn = nn.softmax(attn, axis=-1).astype(self.dtype)
            x = jnp.einsum(
                "bhqk,bhkc->bhqc", attn, v.astype(self.dtype),
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)

        if self.residual_pooling:
            # Reference attention.py:455-459: add pooled q to all but the cls row.
            qc = q.astype(x.dtype)
            if self.has_cls:
                x = jnp.concatenate([x[:, :, :1], x[:, :, 1:] + qc[:, :, 1:]], axis=2)
            else:
                x = x + qc

        Nq = x.shape[2]
        x = x.transpose(0, 2, 1, 3).reshape(B, Nq, self.dim_out)
        x = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(x)
        if self.drop_rate > 0.0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        return x, q_shape


class MultiScaleBlock(nn.Module):
    dim: int
    dim_out: int
    num_heads: int
    input_size: Triple
    num_obj: int
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
        att_dim = self.dim_out if self.dim_mul_in_att else self.dim

        x_norm = LayerNorm(dtype=self.dtype, name="norm1")(x)
        x_block, thw_new = MultiScaleAttention(
            dim=self.dim,
            dim_out=att_dim,
            num_heads=self.num_heads,
            input_size=self.input_size,
            num_obj=self.num_obj,
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
        )(x_norm, thw, deterministic=deterministic)

        if self.dim_mul_in_att and self.dim != self.dim_out:
            x = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(x_norm)

        # Residual skip path: max-pool the patch grid with kernel s+1 where the
        # q stride is s (reference attention.py:503-505,549-555).  Identity when
        # the block does not change resolution.
        if self.stride_q and int(np.prod(self.stride_q)) > 1:
            kernel_skip = tuple(s + 1 if s > 1 else s for s in self.stride_q)
            x_res, _ = pooling.attention_pool(
                x,
                thw,
                mode="max",
                kernel=kernel_skip,
                stride=tuple(self.stride_q),
                num_obj=self.num_obj,
                has_cls=self.has_cls,
            )
        else:
            x_res = x

        dp = DropPath(self.drop_path, name="drop_path")
        x = x_res + dp(x_block, deterministic=deterministic)
        hidden = int(att_dim * self.mlp_ratio)
        # Fused LN+MLP kernel: usable whenever norm2's output feeds only the
        # MLP (the dim_mul_in_att=False dim-change path consumes it too) and
        # the MLP has no dropout.
        fuse_ffn = (
            self.use_pallas
            and self.drop_rate == 0.0
            and (self.dim_mul_in_att or self.dim == self.dim_out)
        )
        if fuse_ffn:
            from svit_tpu.ops.pallas_ffn import fused_ffn

            ln_s, ln_b = _LNParams(att_dim, name="norm2")()
            (w1, b1), (w2, b2) = _MlpParams(
                att_dim, hidden, self.dim_out, name="mlp"
            )()
            cast = self.dtype
            x_mlp = fused_ffn(
                x, ln_s, ln_b,
                w1.astype(cast), b1, w2.astype(cast), b2,
            )
        else:
            x_norm2 = LayerNorm(dtype=self.dtype, name="norm2")(x)
            x_mlp = Mlp(
                hidden_features=hidden,
                out_features=self.dim_out,
                drop_rate=self.drop_rate,
                dtype=self.dtype,
                name="mlp",
            )(x_norm2, deterministic=deterministic)
            if not self.dim_mul_in_att and self.dim != self.dim_out:
                x = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(x_norm2)
        x = x + dp(x_mlp, deterministic=deterministic)
        return x, thw_new
