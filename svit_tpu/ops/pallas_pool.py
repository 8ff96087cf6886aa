"""Fused depthwise-conv pooling + per-head LayerNorm kernel (Pallas/TPU).

The SViT attention pools q/k/v at EVERY block with a depthwise 3x3x3 conv
followed by LayerNorm(head_dim) (reference ``slowfast/models/attention.py:
258-304``; the ``configs/ssv2.yaml`` schedule pools all 16 blocks).  XLA's
depthwise convolution at these shapes runs ~2ms per call on a VPU fallback
path and drags f32 converts + layout relayouts into its fusion — measured as
the single largest cost family of the forward pass (~28ms/fwd).

This kernel computes conv + LN in one VMEM pass.  Design notes:

- **Stride-1 kernel, halo tiling via ``pl.Element``.**  The grid tiles
  (batch, t_out chunks, h_out chunks); input blocks span the conv halo with
  element-indexed starts so 56x56 stem grids stay within VMEM.  The 27 taps
  are value-level slices: T/H offsets are free (untiled dims) and the kW
  W-shifts are hoisted (a misaligned slice on the tiled W axis relays out
  the whole operand, so it happens kW times, not kT*kH*kW).
- **True-strided kernel via parity reshapes.**  For spatial stride s the
  input is pre-reshaped H->(Hq, s) (free, leading dims) and W->(Wq, s*C)
  (free, lane merge), turning every strided tap into leading-dim indexing
  plus at most 3 hoisted lane/sublane offsets.  VPU work is output-sized.
- **Per-head LN stats via sum+expand matmuls.**  Mosaic cannot reshape the
  lane axis into (heads, head_dim); group sums are computed as ``a @ S``
  (S [C, heads] one-hot) and broadcast back with ``@ S^T`` — in HIGHEST
  precision (the default one-pass bf16 f32 matmul loses ~1e-2 after the
  rsqrt; 6-pass is f32-exact and the [C, heads] operands make it cheap).
  Stats run ONCE per invocation: per-frame stats serialize hundreds of tiny
  MXU calls against the VPU tap chain.
- Weight rows are read with keepdim [1, C] slices: extracting a 1-D row of a
  VMEM block triggers a pathological Mosaic relayout (~400s compile).

Backward differentiates a recompute whose conv is the Pallas primitive
``pallas_depthwise_conv`` (custom VJP: dx = flipped-filter Pallas conv of
the zero-stuffed cotangent; dk = tap-formulated reduces, which are also
partition-safe under SPMD — XLA's grouped-conv filter gradient is wrong on
multi-axis meshes, see ``svit_tpu/ops/pooling.py``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # element-indexed (overlapping) block dims
    from jax._src.pallas.core import Element as _Element
except ImportError:  # pragma: no cover - older jax
    _Element = None

try:  # native sublane rotate (compiled path)
    from jax.experimental.pallas import tpu as _pltpu
except ImportError:  # pragma: no cover
    _pltpu = None


def _roll_w(x, shift: int, axis: int, interpret: bool):
    """Rotate ``x`` by ``shift`` along ``axis`` (the W/sublane dim).

    Compiled path uses the native Mosaic rotate (``pltpu.roll``); interpret
    mode (CPU tests) falls back to ``jnp.roll`` — identical semantics."""
    if interpret or _pltpu is None:
        return jnp.roll(x, shift, axis)
    # pltpu.roll is cyclic but requires a non-negative shift
    return _pltpu.roll(x, shift % x.shape[axis], axis)

Triple = Tuple[int, int, int]

_EPS = 1e-6
_VMEM_BUDGET = 11 * 1024 * 1024
# Tile-budget note (measured on chip, r4): raising the s1 budget to 24 MB
# makes the isolated stride-1 pools ~30% faster (fewer halo re-reads) but
# the END-TO-END fwd is flat and the train step ~7% SLOWER (the bigger
# bwd-recompute tiles overlap worse) — so both budgets stay at 11 MB.
# Tiles above Mosaic's default 16 MB scoped-vmem limit would need the
# explicit vmem_limit_bytes below (kept wired for future tile work).
_VMEM_BUDGET_S1 = 11 * 1024 * 1024
_S1_COMPILER_PARAMS = None
if _pltpu is not None and hasattr(_pltpu, "CompilerParams"):
    _S1_COMPILER_PARAMS = _pltpu.CompilerParams(
        vmem_limit_bytes=48 * 1024 * 1024
    )


def _out_size(d: int, k: int, s: int) -> int:
    return (d + 2 * (k // 2) - k) // s + 1


# W8-carry geometry.  Measured on chip (round 5): a flat<->rank-5 reshape
# is a bitcast only when W is a multiple of 16 for bf16 — the (8, 128)
# tiling packs ROW PAIRS per 32-bit word for 2-byte dtypes, so 8-alignment
# is not enough (W=56 round-trips ran at GATHER speed, ~90x slower than
# W=64).  Carrying also costs junk compute in every row-parallel kernel, so
# widths whose 16-aligned form exceeds the true width by >30% (e.g. the
# stage-3 7 -> 16) stay EXACT and pay the (tiny, pooled-stream) copies
# instead.
CARRY_UNIT = 8
_MAX_CARRY_NUM, _MAX_CARRY_DEN = 13, 10   # carry iff cw/w <= 1.3


def _carry_width(w: int) -> int:
    """Measured A/B note (round 5): unit 16 with the stage-3 width left
    exact LOST to unit 8 end-to-end — the exact stage-3 stream pays
    gather-speed tile-misaligned slices that outweigh its bf16 reshape
    copies.  Unit 8 carries 7->8 (and already lands 16-aligned at the
    even stages: 28->32, 14->16)."""
    cw = ((w + CARRY_UNIT - 1) // CARRY_UNIT) * CARRY_UNIT
    return cw if cw * _MAX_CARRY_DEN <= w * _MAX_CARRY_NUM else w


def _mask_w(x, w_true: int, fill):
    """Zero/-inf columns >= w_true on the W axis (dim 3 of [B,T,H,W,C]).

    W8-carry support (docs/ROADMAP.md round-5): tensors ride with their W
    axis right-padded to a multiple of 8 so flat<->rank-5 reshapes are
    bitcasts; the junk columns carry finite garbage and every consumer that
    reduces across W must neutralize them.  Callers apply this right before
    an ``jnp.pad`` so XLA fuses the select into the copy it already makes.
    ``where`` (select), not multiply: NaN-safe if junk ever goes non-finite.
    """
    if w_true is None or w_true >= x.shape[3]:
        return x
    wi = jax.lax.broadcasted_iota(jnp.int32, x.shape, 3)
    return jnp.where(wi < w_true, x, jnp.full_like(x, fill))


def _pad8(x: int) -> int:
    return ((x + 7) // 8) * 8


def _lane_pad(c: int) -> int:
    return ((c + 127) // 128) * 128



def _expand_ln(ln_scale, ln_bias, C: int, head_dim: int):
    """LN params of size head_dim (tiled across heads) OR already full
    channel width C (e.g. the lane-fused k|v pool, whose scale is the
    concat of two per-head param sets)."""
    heads = C // head_dim
    ls = ln_scale.astype(jnp.float32)
    lb = ln_bias.astype(jnp.float32)
    if ls.shape[0] != C:
        ls = jnp.tile(ls, heads)
        lb = jnp.tile(lb, heads)
    return ls.reshape(1, C), lb.reshape(1, C)


def _group_ln(a, s_ref, st_ref, ls_ref, lb_ref, head_dim: int):
    """Per-head LN over [rows, C] via sum+expand matmuls (f32)."""
    hp = dict(precision=jax.lax.Precision.HIGHEST,
              preferred_element_type=jnp.float32)
    inv = np.float32(1.0 / head_dim)
    gsum = jax.lax.dot(a, s_ref[...], **hp)
    mean = jax.lax.dot(gsum * inv, st_ref[...], **hp)
    xc = a - mean
    gvar = jax.lax.dot(xc * xc, s_ref[...], **hp)
    var = jax.lax.dot(gvar * inv, st_ref[...], **hp)
    return xc * jax.lax.rsqrt(var + _EPS) * ls_ref[...] + lb_ref[...]


def _zero_junk_w(y, wo_true: Optional[int], w_out: int, axis: int = 2):
    """Zero output columns >= wo_true (W8-carry: junk must stay finite —
    downstream LNs/matmuls process junk rows and -inf/NaN would poison the
    attention softmax through its additive mask)."""
    if wo_true is None or wo_true >= w_out:
        return y
    wi = jax.lax.broadcasted_iota(jnp.int32, y.shape, axis)
    return jnp.where(wi < wo_true, y, jnp.zeros_like(y))


def _kernel_s1(
    x_ref, k_ref, s_ref, st_ref, ls_ref, lb_ref, o_ref,
    *, kernel: Triple, t_tile: int, h_tile: int, w_out: int, head_dim: int,
    apply_ln: bool = True, interpret: bool = False,
    wo_true: Optional[int] = None,
):
    """Stride-1 conv+LN over one (t, h) tile.  The input block carries the
    full W row WITHOUT a W halo pad: a left pad of kW//2 sublane-misaligns
    every (W, C) row and the XLA pad before the kernel ran at gather speed
    (~2 ms/tensor at stem shapes).  Instead the kW W-shifts are in-kernel
    rotates (``pltpu.roll``) with the wrapped columns masked to zero — the
    exact zero-padding conv semantics.  T/H halos stay as XLA pads (untiled
    dims — alignment-preserving, ~copy speed).  The 27 taps are value-level
    slices of the kW hoisted rotate planes; each tap covers the whole tile
    in one vector op, and the LN stats run ONCE per invocation — per-frame
    stats would serialize hundreds of tiny MXU calls against the VPU tap
    chain."""
    kT, kH, kW = kernel
    # Upcast ONCE: the tap FMAs accumulate in f32 anyway (previously each of
    # the 27 overlapping taps converted its slice), and Mosaic's rotate only
    # supports 32-bit data.
    x = x_ref[0].astype(jnp.float32)   # [t_tile+kT-1, h_tile+kH-1, W8, C]
    C = x.shape[-1]
    tin, hin = x.shape[0], x.shape[1]
    W8 = x.shape[2]
    kv = k_ref[...]                    # [kT*kH*kW, C]
    # Hoist the W-shift: one rotate per dw (kW total, not kT*kH*kW).  The
    # roll wraps; wrapped columns are masked to zero (= conv zero padding).
    # Right-junk input columns (W8 > w_out) are zero by construction (the
    # XLA right-alignment pad fills zeros), so their tap contributions
    # vanish without masking.
    wi = jax.lax.broadcasted_iota(jnp.int32, (tin, hin, W8, C), 2)
    xw = []
    for dw in range(kW):
        shift = kW // 2 - dw           # +1 (left tap) .. -1 (right tap)
        if shift == 0:
            xw.append(x)
            continue
        r = _roll_w(x, shift, 2, interpret)
        if shift > 0:
            r = jnp.where(wi < shift, jnp.zeros_like(r), r)
        else:
            r = jnp.where(wi >= W8 + shift, jnp.zeros_like(r), r)
        xw.append(r)
    acc = jnp.zeros((t_tile, h_tile, w_out, C), jnp.float32)
    i = 0
    for dt in range(kT):
        for dh in range(kH):
            for dw in range(kW):
                tap = jax.lax.slice(
                    xw[dw],
                    (dt, dh, 0, 0),
                    (dt + t_tile, dh + h_tile, w_out, C),
                )
                # keepdim weight slice: extracting a 1-D row of a VMEM block
                # triggers a pathological Mosaic relayout (~400s compile)
                w = jax.lax.slice(kv, (i, 0), (i + 1, C))
                acc += tap * w[None]
                i += 1
    if apply_ln:
        y = _group_ln(
            acc.reshape(t_tile * h_tile * w_out, C),
            s_ref, st_ref, ls_ref, lb_ref, head_dim,
        ).reshape(t_tile, h_tile, w_out, C)
    else:
        y = acc
    y = _zero_junk_w(y, wo_true, w_out)
    if o_ref.shape[3] < w_out:
        # exact-width store: slicing the W8-wide result in XLA afterwards
        # runs at gather speed (tile-misaligned slice relays out the whole
        # operand); a masked narrow store costs nothing extra
        y = jax.lax.slice(y, (0, 0, 0, 0), y.shape[:2] + (o_ref.shape[3], C))
    o_ref[0] = y.astype(o_ref.dtype)


def _kernel_strided(
    x_ref, k_ref, s_ref, st_ref, ls_ref, lb_ref, o_ref,
    *, kernel: Triple, s: int, t_tile: int, h_tile: int, w_out: int,
    C: int, head_dim: int, apply_ln: bool = True, interpret: bool = False,
    wo_true: Optional[int] = None,
):
    """True-strided conv+LN (spatial stride s on H and W).

    The input block is the RAW halo-padded tensor [tin, hq_in*s, Wq*s, C];
    the parity regroup H->(Hq, s), W->(Wq, s*C) happens IN VMEM (a
    sublane->lane relayout Mosaic lowers to register shuffles) — as an XLA
    op it was a full extra HBM pass per pooled tensor (~1.4 ms at stem
    shapes; the "free reshape" assumption was wrong under tiled layouts).
    A tap at output (t, h, w) with offsets (dt, dh, dw) reads original
    column ``w*s + dw - kW//2 = w*s + o*s + p`` — parity plane p at Wq
    offset ``o``; negative ``o`` (left-halo taps) becomes an in-kernel
    sublane rotate of the plane with the wrapped columns masked to zero
    (exact conv zero-padding semantics).  Planes are hoisted: <= kW
    lane/sublane relayouts per invocation, and VPU work stays output-sized
    (27 * out elements), not stride-1-sized."""
    kT, kH, kW = kernel
    xr = x_ref[0]
    if xr.ndim == 4:                   # raw [tin, hq_in*s, Wq*s, C] block
        # parity regroup in VMEM (C % 128 == 0 only — Mosaic's shape cast
        # needs a lane-aligned source); as an XLA reshape this cost a full
        # HBM relayout pass per pooled tensor
        tin = xr.shape[0]
        hq_in = xr.shape[1] // s
        Wq = xr.shape[2] // s
        x = xr.reshape(tin, hq_in, s, Wq, s * C)
    else:                              # pre-reshaped [tin, hq_in, s, Wq, s*C]
        x = xr
        tin, hq_in = x.shape[0], x.shape[1]
    del xr
    kv = k_ref[...]
    planes = {}
    for dw in range(kW):
        a = dw - kW // 2
        o, p = a // s, a % s           # floor div: o may be negative
        key = (o, p)
        if key not in planes:
            if o >= 0:
                base = jax.lax.slice(
                    x,
                    (0, 0, 0, o, p * C),
                    (tin, hq_in, s, o + w_out, p * C + C),
                )                      # [tin, hq_in, s, w_out, C]
                # upcast per plane (<= kW of them): taps accumulate in f32
                # and Mosaic's rotate needs 32-bit data anyway
                planes[key] = base.astype(jnp.float32)
            else:
                base = jax.lax.slice(
                    x,
                    (0, 0, 0, 0, p * C),
                    (tin, hq_in, s, w_out, p * C + C),
                ).astype(jnp.float32)
                r = _roll_w(base, -o, 3, interpret)
                wi = jax.lax.broadcasted_iota(jnp.int32, r.shape, 3)
                planes[key] = jnp.where(wi < -o, jnp.zeros_like(r), r)
    acc = jnp.zeros((t_tile, h_tile, w_out, C), jnp.float32)
    i = 0
    for dt in range(kT):
        for dh in range(kH):
            for dw in range(kW):
                a = dw - kW // 2
                pl_ = planes[(a // s, a % s)]
                tap = jax.lax.slice(
                    pl_,
                    (dt, dh // s, dh % s, 0, 0),
                    (dt + t_tile, dh // s + h_tile, dh % s + 1, w_out, C),
                ).reshape(t_tile, h_tile, w_out, C)
                w = jax.lax.slice(kv, (i, 0), (i + 1, C))
                acc += tap * w[None]
                i += 1
    if apply_ln:
        y = _group_ln(
            acc.reshape(t_tile * h_tile * w_out, C),
            s_ref, st_ref, ls_ref, lb_ref, head_dim,
        ).reshape(t_tile, h_tile, w_out, C)
    else:
        y = acc
    y = _zero_junk_w(y, wo_true, w_out)
    if o_ref.shape[3] < w_out:
        y = jax.lax.slice(y, (0, 0, 0, 0), y.shape[:2] + (o_ref.shape[3], C))
    o_ref[0] = y.astype(o_ref.dtype)


def _pick_tiles_strided(To, Ho, Wq, w_out, s, C, kernel, itemsize):
    kT, kH, kW = kernel
    cp = _lane_pad(s * C)
    co = _lane_pad(C)
    wo8 = _pad8(w_out)

    def need(tt, hh):
        tin = tt + kT - 1
        hq_in = hh + (kH - 1) // s
        return (
            2 * tin * hq_in * s * _pad8(Wq) * cp * itemsize      # in x2buf
            + tin * hq_in * s * _pad8(Wq) * cp * itemsize        # VMEM parity regroup
            + 3 * tin * hq_in * s * wo8 * co * 4                 # f32 parity planes
            + tin * hq_in * s * wo8 * co * 4                     # iota mask (i32)
            + 2 * tt * hh * wo8 * co * itemsize                  # out x2buf
            + 3 * tt * hh * wo8 * co * 4                         # f32 acc+temps
        )

    best, best_steps = (1, 1), None
    for tt in (t for t in range(1, To + 1) if To % t == 0):
        for hh in (h for h in range(1, Ho + 1) if Ho % h == 0):
            if need(tt, hh) > _VMEM_BUDGET:
                continue
            steps = (To // tt) * (Ho // hh)
            if best_steps is None or steps < best_steps or (
                steps == best_steps and tt * hh > best[0] * best[1]
            ):
                best, best_steps = (tt, hh), steps
    return best, best_steps is not None


def _stat_mats(C: int, head_dim: int):
    heads = C // head_dim
    s = jnp.asarray(np.kron(np.eye(heads), np.ones((head_dim, 1))), jnp.float32)
    st = jnp.asarray(np.kron(np.eye(heads), np.ones((1, head_dim))), jnp.float32)
    return s, st


def _pick_tiles(To, Ho, Wo, C, kernel, itemsize):
    kT, kH, kW = kernel
    cp = _lane_pad(C)
    wo8 = _pad8(Wo)

    def need(tt, hh):
        tin, hin = tt + kT - 1, hh + kH - 1
        return (
            2 * tin * hin * wo8 * cp * itemsize           # in x2buf (no W halo)
            + tin * hin * wo8 * cp * 4                    # f32 upcast of x
            + kW * tin * hin * wo8 * cp * 4               # f32 rotate planes
            + tin * hin * wo8 * cp * 4                    # iota mask (i32)
            + 2 * tt * hh * wo8 * cp * itemsize           # out x2buf
            + 3 * tt * hh * wo8 * cp * 4                  # f32 acc+temps
        )

    best, best_steps = (1, 1), None
    for tt in (t for t in range(1, To + 1) if To % t == 0):
        for hh in (h for h in range(1, Ho + 1) if Ho % h == 0):
            if need(tt, hh) > _VMEM_BUDGET_S1:
                continue
            steps = (To // tt) * (Ho // hh)
            if best_steps is None or steps < best_steps or (
                steps == best_steps and tt * hh > best[0] * best[1]
            ):
                best, best_steps = (tt, hh), steps
    return best, best_steps is not None


def _carry_pad(out, keep_pad: bool):
    """Right-pad an exact-width result to the carry width with zeros."""
    if not keep_pad:
        return out
    Wo = out.shape[3]
    Wc = _carry_width(Wo)
    if Wc != Wo:
        out = jnp.pad(out, [(0, 0)] * 3 + [(0, Wc - Wo)] + [(0, 0)])
    return out


def _forward(x, kernel_w, ln_scale, ln_bias, kernel, stride, head_dim,
             interpret: bool, apply_ln: bool = True,
             w_true: Optional[int] = None, keep_pad: bool = False):
    B, T, H, Wp, C = x.shape
    W = Wp if w_true is None else w_true
    kT, kH, kW = kernel
    st_, sh, sw = stride

    if (st_, sh, sw) != (1, 1, 1):
        if sh == sw and sh > 1:
            out = _forward_strided(
                x, kernel_w, ln_scale, ln_bias, kernel, sh, head_dim,
                interpret, apply_ln=apply_ln, w_true=w_true,
                keep_pad=keep_pad,
            )
            # temporal stride (unused by the SSv2 schedule) via subsample
            return out[:, ::st_] if st_ > 1 else out
        # Uneven spatial strides: stride-1 pool subsampled at the strided
        # positions (odd kernels; conv windows are translation-invariant and
        # LN is per-token) — bitwise identical.
        full = _forward(
            x, kernel_w, ln_scale, ln_bias, kernel, (1, 1, 1), head_dim,
            interpret, apply_ln=apply_ln, w_true=w_true, keep_pad=False,
        )
        return _carry_pad(full[:, ::st_, ::sh, ::sw], keep_pad)

    To, Ho, Wo = (_out_size(d, k, 1) for d, k in zip((T, H, W), kernel))
    # T/H halos via XLA pad (untiled dims: alignment-preserving, ~copy
    # speed).  NO W halo pad — a kW//2 left pad sublane-misaligns every
    # (W, C) row and ran at gather speed; the kernel rotates in VMEM
    # instead.  W is right-padded (aligned append, zero fill) so block
    # shapes are legal: to the 8-divisible W8 for exact outputs, to the
    # carry width when ``keep_pad`` carries it forward.  Carried inputs
    # (w_true < Wp) get their junk columns zeroed by the same fused select,
    # restoring the zero-padding conv semantics.
    carry = keep_pad and _carry_width(Wo) > Wo
    W8 = _carry_width(Wo) if carry else _pad8(Wo)
    W8 = max(W8, _pad8(Wp))   # robust to inputs wider than the out extent
    pads = [
        (0, 0),
        (kernel[0] // 2, kernel[0] // 2),
        (kernel[1] // 2, kernel[1] // 2),
        (0, W8 - Wp),
        (0, 0),
    ]
    (t_tile, h_tile), ok = _pick_tiles(To, Ho, Wo, C, kernel, x.dtype.itemsize)
    if not ok:
        # no divisor tiling fits the VMEM budget at this shape: running with
        # (1, 1) tiles would fail at Mosaic compile time, so use the XLA
        # reference path instead
        return pool_ln_reference(
            x, kernel_w, ln_scale, ln_bias, kernel, (1, 1, 1), head_dim,
            apply_ln=apply_ln, w_true=w_true, keep_pad=keep_pad,
        )
    xp = jnp.pad(_mask_w(x, w_true, 0.0), pads)

    kf = kernel_w.reshape(kT * kH * kW, C).astype(jnp.float32)
    s_mat, st_mat = _stat_mats(C, head_dim)
    heads = C // head_dim
    ls, lb = _expand_ln(ln_scale, ln_bias, C, head_dim)

    kern = functools.partial(
        _kernel_s1, kernel=kernel, t_tile=t_tile, h_tile=h_tile,
        w_out=W8, head_dim=head_dim, apply_ln=apply_ln, interpret=interpret,
        wo_true=Wo if W8 != Wo else None,
    )
    grid = (B, To // t_tile, Ho // h_tile)
    tin, hin = t_tile + kT - 1, h_tile + kH - 1
    Wp = xp.shape[3]

    extra = {}
    if not interpret and _S1_COMPILER_PARAMS is not None:
        extra["compiler_params"] = _S1_COMPILER_PARAMS
    out_w = W8 if carry else Wo   # exact widths store natively (masked
    #                               narrow stores; an XLA slice afterwards
    #                               ran at gather speed)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, To, Ho, out_w, C), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (
                    _Element(1), _Element(tin), _Element(hin),
                    _Element(Wp), _Element(C),
                ),
                lambda b, t, h: (b, t * t_tile, h * h_tile, 0, 0),
            ),
            pl.BlockSpec((kT * kH * kW, C), lambda b, t, h: (0, 0)),
            pl.BlockSpec((C, heads), lambda b, t, h: (0, 0)),
            pl.BlockSpec((heads, C), lambda b, t, h: (0, 0)),
            pl.BlockSpec((1, C), lambda b, t, h: (0, 0)),
            pl.BlockSpec((1, C), lambda b, t, h: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, t_tile, h_tile, out_w, C), lambda b, t, h: (b, t, h, 0, 0)
        ),
        interpret=interpret,
        **extra,
    )(xp, kf, s_mat, st_mat, ls, lb)
    return out


def _forward_strided(x, kernel_w, ln_scale, ln_bias, kernel, s, head_dim,
                     interpret: bool, apply_ln: bool = True,
                     w_true: Optional[int] = None, keep_pad: bool = False):
    """Spatially-strided (stride s on H and W, stride 1 on T) fused pool+LN."""
    B, T, H, Wp, C = x.shape
    W = Wp if w_true is None else w_true
    kT, kH, kW = kernel
    To = _out_size(T, kT, 1)
    Ho = _out_size(H, kH, s)
    Wo = _out_size(W, kW, s)
    carry = keep_pad and _carry_width(Wo) > Wo
    W8 = _carry_width(Wo) if carry else _pad8(Wo)

    # pad: T/H conv halo (untiled dims, ~copy speed) + parity-split
    # divisibility.  NO W left-halo pad (it sublane-misaligned every row and
    # ran at gather speed): left taps become in-kernel rotates, W is only
    # right-padded with zeros up to Wq*s so the parity reshape and the
    # 8-aligned output width are legal (zero fill makes junk-column taps
    # vanish).  W8-carried inputs get their junk zeroed by the fused select.
    Hp = H + 2 * (kH // 2)
    Hq = -(-max(Hp, (Ho - 1) * s + kH) // s)
    omax = (kW - 1 - kW // 2) // s
    Wq = max(omax + W8, -(-Wp // s))
    pads = [
        (0, 0),
        (kT // 2, kT // 2),
        (kH // 2, Hq * s - H - (kH // 2)),
        (0, Wq * s - Wp),
        (0, 0),
    ]
    xp = jnp.pad(_mask_w(x, w_true, 0.0), pads)
    # The parity regroup H -> (Hq, s), W -> (Wq, s*C) happens inside the
    # kernel (VMEM) when C is lane-aligned: as an XLA reshape it cost a
    # full HBM relayout pass.  Mosaic's shape cast rejects non-128-multiple
    # C (the early 96/192-channel blocks), which keep the XLA reshape.
    in_kernel_parity = (C % 128 == 0)
    if not in_kernel_parity:
        Tp = xp.shape[1]
        xp = xp.reshape(B, Tp, Hq, s, Wq, s * C)

    (t_tile, h_tile), ok = _pick_tiles_strided(
        To, Ho, Wq, W8, s, C, kernel, x.dtype.itemsize
    )
    if not ok:
        # over-budget at every divisor tiling: fall back to the XLA
        # reference (compiling the (1,1)-tile kernel would fail in Mosaic)
        return pool_ln_reference(
            x, kernel_w, ln_scale, ln_bias, kernel, (1, s, s), head_dim,
            apply_ln=apply_ln, w_true=w_true, keep_pad=keep_pad,
        )

    kf = kernel_w.reshape(kT * kH * kW, C).astype(jnp.float32)
    s_mat, st_mat = _stat_mats(C, head_dim)
    heads = C // head_dim
    ls, lb = _expand_ln(ln_scale, ln_bias, C, head_dim)

    kern = functools.partial(
        _kernel_strided, kernel=kernel, s=s, t_tile=t_tile, h_tile=h_tile,
        w_out=W8, C=C, head_dim=head_dim, apply_ln=apply_ln,
        interpret=interpret,
        wo_true=Wo if W8 != Wo else None,
    )
    grid = (B, To // t_tile, Ho // h_tile)
    tin = t_tile + kT - 1
    hq_in = h_tile + (kH - 1) // s

    if in_kernel_parity:
        x_spec = pl.BlockSpec(
            (
                _Element(1), _Element(tin), _Element(hq_in * s),
                _Element(Wq * s), _Element(C),
            ),
            lambda b, t, h: (b, t * t_tile, h * h_tile * s, 0, 0),
        )
    else:
        x_spec = pl.BlockSpec(
            (
                _Element(1), _Element(tin), _Element(hq_in),
                _Element(s), _Element(Wq), _Element(s * C),
            ),
            lambda b, t, h: (b, t * t_tile, h * h_tile, 0, 0, 0),
        )
    out_w = W8 if carry else Wo
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, To, Ho, out_w, C), x.dtype),
        grid=grid,
        in_specs=[
            x_spec,
            pl.BlockSpec((kT * kH * kW, C), lambda b, t, h: (0, 0)),
            pl.BlockSpec((C, heads), lambda b, t, h: (0, 0)),
            pl.BlockSpec((heads, C), lambda b, t, h: (0, 0)),
            pl.BlockSpec((1, C), lambda b, t, h: (0, 0)),
            pl.BlockSpec((1, C), lambda b, t, h: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, t_tile, h_tile, out_w, C), lambda b, t, h: (b, t, h, 0, 0)
        ),
        interpret=interpret,
    )(xp, kf, s_mat, st_mat, ls, lb)
    return out


def pool_ln_reference(x, kernel_w, ln_scale, ln_bias, kernel, stride,
                      head_dim, apply_ln: bool = True,
                      w_true: Optional[int] = None, keep_pad: bool = False):
    """XLA formulation with identical numerics (VJP recompute + fallback).

    The conv is tap-formulated (kT*kH*kW shifted strided slices, one fused
    multiply-add chain) rather than ``conv_general_dilated``: XLA's TPU
    depthwise conv takes a ~2ms VPU fallback path per call and its SPMD
    filter gradient is wrong on multi-axis meshes (see
    ``svit_tpu/ops/pooling.py``); the tap form autodiffs into pads and
    reduces that are both fast and partitioner-safe.

    ``apply_ln=False`` gives the bare conv (same contract as the kernels),
    so every fused_pool_ln/pallas_depthwise_conv call has a working fallback
    on environments without ``pl.Element``.  W8-carry contract matches the
    kernels: ``w_true`` slices the carried input to its true width,
    ``keep_pad`` re-pads the output to W8 with zeros."""
    if w_true is not None and w_true < x.shape[3]:
        x = x[:, :, :, :w_true]
    B, T, H, W, C = x.shape
    kT, kH, kW = kernel
    st_, sh, sw = stride
    To, Ho, Wo = (
        _out_size(d, k, s) for d, k, s in zip((T, H, W), kernel, stride)
    )
    pads = [(0, 0)] + [(k // 2, k // 2) for k in kernel] + [(0, 0)]
    # barrier: XLA-TPU fuses the pad into the strided tap-slice gathers and
    # the fused reads can return garbage lanes (found on hardware by
    # tools/check_kernels_hw.py; see svit_tpu/ops/pooling.py:_depthwise_bwd)
    xp = jax.lax.optimization_barrier(jnp.pad(x, pads))
    kf = kernel_w.astype(jnp.float32)
    acc = jnp.zeros((B, To, Ho, Wo, C), jnp.float32)
    for dt in range(kT):
        for dh in range(kH):
            for dw in range(kW):
                sl = jax.lax.slice(
                    xp,
                    (0, dt, dh, dw, 0),
                    (
                        B,
                        dt + (To - 1) * st_ + 1,
                        dh + (Ho - 1) * sh + 1,
                        dw + (Wo - 1) * sw + 1,
                        C,
                    ),
                    (1, st_, sh, sw, 1),
                )
                acc = acc + sl.astype(jnp.float32) * kf[dt, dh, dw, 0]
    if not apply_ln:
        return _carry_pad(acc.astype(x.dtype), keep_pad)
    h = C // head_dim
    yf = acc.reshape(B, To, Ho, Wo, h, head_dim)
    mean = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(yf - mean), axis=-1, keepdims=True)
    ls, lb = ln_scale, ln_bias
    if ls.shape[-1] != head_dim:
        # full-channel-width params (lane-fused k|v pool)
        ls = ls.reshape(h, head_dim)
        lb = lb.reshape(h, head_dim)
    o = (yf - mean) * jax.lax.rsqrt(var + _EPS) * ls + lb
    return _carry_pad(o.astype(x.dtype).reshape(B, To, Ho, Wo, C), keep_pad)


# ---------------------------------------------------------------------------
# Strided max pool (the MultiScaleBlock residual-skip pool_skip, reference
# attention.py:503-505).  XLA's reduce_window prefers batch-second-minor
# layouts ({4,0,3,2,1}) on TPU and layout assignment then drags the whole
# residual stream through relayout copies at every Pallas-call boundary;
# a tap-formulated XLA rewrite was measured WORSE (strided slices run at
# gather speed, +12 ms/fwd).  This kernel reuses the strided parity-plane
# machinery with a max accumulator; halos are -inf so padding never wins.
# ---------------------------------------------------------------------------


def _kernel_strided_max(
    x_ref, o_ref,
    *, kernel: Triple, s: int, t_tile: int, h_tile: int, w_out: int,
    C: int, interpret: bool = False, wo_true: Optional[int] = None,
):
    kT, kH, kW = kernel
    xr = x_ref[0]
    if xr.ndim == 4:                   # raw block; parity regroup in VMEM
        tin = xr.shape[0]
        hq_in = xr.shape[1] // s
        x = xr.reshape(tin, hq_in, s, xr.shape[2] // s, s * C)
    else:
        x = xr
        tin, hq_in = x.shape[0], x.shape[1]
    del xr
    neg = np.float32(-np.inf)
    planes = {}
    for dw in range(kW):
        a = dw - kW // 2
        o, p = a // s, a % s
        if (o, p) not in planes:
            if o >= 0:
                planes[(o, p)] = jax.lax.slice(
                    x,
                    (0, 0, 0, o, p * C),
                    (tin, hq_in, s, o + w_out, p * C + C),
                ).astype(jnp.float32)
            else:
                base = jax.lax.slice(
                    x,
                    (0, 0, 0, 0, p * C),
                    (tin, hq_in, s, w_out, p * C + C),
                ).astype(jnp.float32)
                r = _roll_w(base, -o, 3, interpret)
                wi = jax.lax.broadcasted_iota(jnp.int32, r.shape, 3)
                planes[(o, p)] = jnp.where(wi < -o, jnp.full_like(r, neg), r)
    acc = jnp.full((t_tile, h_tile, w_out, C), neg, jnp.float32)
    for dt in range(kT):
        for dh in range(kH):
            for dw in range(kW):
                a = dw - kW // 2
                pl_ = planes[(a // s, a % s)]
                tap = jax.lax.slice(
                    pl_,
                    (dt, dh // s, dh % s, 0, 0),
                    (dt + t_tile, dh // s + h_tile, dh % s + 1, w_out, C),
                ).reshape(t_tile, h_tile, w_out, C)
                acc = jnp.maximum(acc, tap)
    # W8-carry: junk output columns would otherwise be -inf (all-pad
    # windows) and poison downstream arithmetic — zero them in VMEM
    acc = _zero_junk_w(acc, wo_true, w_out)
    if o_ref.shape[3] < w_out:
        acc = jax.lax.slice(
            acc, (0, 0, 0, 0), acc.shape[:2] + (o_ref.shape[3], C)
        )
    o_ref[0] = acc.astype(o_ref.dtype)


def _forward_strided_max(x, kernel, s: int, interpret: bool,
                         w_true: Optional[int] = None,
                         keep_pad: bool = False):
    """Pallas strided max pool.  Returns None when no tiling fits (caller
    falls back to the XLA reduce_window path)."""
    B, T, H, Wp, C = x.shape
    W = Wp if w_true is None else w_true
    kT, kH, kW = kernel
    To = _out_size(T, kT, 1)
    Ho = _out_size(H, kH, s)
    Wo = _out_size(W, kW, s)
    carry = keep_pad and _carry_width(Wo) > Wo
    W8 = _carry_width(Wo) if carry else _pad8(Wo)
    Hp = H + 2 * (kH // 2)
    Hq = -(-max(Hp, (Ho - 1) * s + kH) // s)
    omax = (kW - 1 - kW // 2) // s
    Wq = max(omax + W8, -(-Wp // s))
    (t_tile, h_tile), ok = _pick_tiles_strided(
        To, Ho, Wq, W8, s, C, kernel, x.dtype.itemsize
    )
    if not ok:
        return None
    pads = [
        (0, 0),
        (kT // 2, kT // 2),
        (kH // 2, Hq * s - H - (kH // 2)),
        (0, Wq * s - Wp),
        (0, 0),
    ]
    # -inf fill: max-pool padding must never win (the conv kernels use the
    # zero fill because zero taps vanish in the FMA; max has no such luck).
    # Carried junk columns get the same -inf through the fused select.
    xp = jnp.pad(_mask_w(x, w_true, -np.inf), pads, constant_values=-np.inf)
    in_kernel_parity = (C % 128 == 0)
    if not in_kernel_parity:
        xp = xp.reshape(B, xp.shape[1], Hq, s, Wq, s * C)

    kern = functools.partial(
        _kernel_strided_max, kernel=kernel, s=s, t_tile=t_tile,
        h_tile=h_tile, w_out=W8, C=C, interpret=interpret,
        wo_true=Wo if W8 != Wo else None,
    )
    grid = (B, To // t_tile, Ho // h_tile)
    tin = t_tile + kT - 1
    hq_in = h_tile + (kH - 1) // s
    if in_kernel_parity:
        x_spec = pl.BlockSpec(
            (
                _Element(1), _Element(tin), _Element(hq_in * s),
                _Element(Wq * s), _Element(C),
            ),
            lambda b, t, h: (b, t * t_tile, h * h_tile * s, 0, 0),
        )
    else:
        x_spec = pl.BlockSpec(
            (
                _Element(1), _Element(tin), _Element(hq_in),
                _Element(s), _Element(Wq), _Element(s * C),
            ),
            lambda b, t, h: (b, t * t_tile, h * h_tile, 0, 0, 0),
        )
    out_w = W8 if carry else Wo
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, To, Ho, out_w, C), x.dtype),
        grid=grid,
        in_specs=[x_spec],
        out_specs=pl.BlockSpec(
            (1, t_tile, h_tile, out_w, C), lambda b, t, h: (b, t, h, 0, 0)
        ),
        interpret=interpret,
    )(xp)
    return out


def _max_pool3d_true(x, kernel, stride, w_true, keep_pad):
    """XLA reduce_window with the W8-carry contract (slice true, re-pad)."""
    from svit_tpu.ops import pooling

    if w_true is not None and w_true < x.shape[3]:
        x = x[:, :, :, :w_true]
    return _carry_pad(pooling.max_pool3d(x, kernel, stride), keep_pad)


def fused_pool_max(x, kernel, stride, interpret: Optional[bool] = None,
                   w_true: Optional[int] = None, keep_pad: bool = False):
    """Strided max pool (torch MaxPool3d semantics, padding k//2).

    Pallas kernel when the shape qualifies (spatial stride s==s>1, temporal
    stride 1, element-indexed blocks available); XLA reduce_window
    otherwise.  The VJP recomputes through the XLA reference, so gradient
    routing (first-match window element on ties) is unchanged.
    W8-carry: ``w_true`` masks carried junk input columns to -inf;
    ``keep_pad`` keeps the 8-aligned output width with junk columns ZEROED
    (an all-junk window is -inf and would poison downstream arithmetic).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    kT, kH, kW = kernel
    st_, sh, sw = stride
    if (
        _Element is None
        or st_ != 1
        or sh != sw
        or sh <= 1
        or kH != kW
        or kT % 2 == 0
    ):
        return _max_pool3d_true(x, tuple(kernel), tuple(stride), w_true,
                                keep_pad)
    return _pool_max(tuple(kernel), tuple(stride), bool(interpret),
                     w_true, bool(keep_pad), x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _pool_max(kernel, stride, interpret, w_true, keep_pad, x):
    out = _forward_strided_max(x, kernel, stride[1], interpret,
                               w_true=w_true, keep_pad=keep_pad)
    if out is None:
        out = _max_pool3d_true(x, kernel, stride, w_true, keep_pad)
    return out


def _pool_max_fwd(kernel, stride, interpret, w_true, keep_pad, x):
    return _pool_max(kernel, stride, interpret, w_true, keep_pad, x), x


def _pool_max_bwd(kernel, stride, interpret, w_true, keep_pad, x, g):
    _, vjp = jax.vjp(
        lambda xx: _max_pool3d_true(xx, kernel, stride, w_true, keep_pad), x
    )
    return vjp(g)


_pool_max.defvjp(_pool_max_fwd, _pool_max_bwd)


# ---------------------------------------------------------------------------
# Filter-gradient kernel: dk[i, c] = sum_{b,out} tap_i(x)[out, c] * g[out, c].
# Same tap/W-hoist structure as the forward kernels; the [27, C] output is
# accumulated across the (sequential) grid.  The XLA tap formulation costs
# ~110ms/train-step in shifted slices; this runs at the fwd kernel's rate.
# ---------------------------------------------------------------------------


def _kernel_dk_s1(
    x_ref, g_ref, o_ref,
    *, kernel: Triple, t_tile: int, h_tile: int, w_out: int,
):
    """Accumulates per-tap partial filter grads [kTHW, w_out, C]; only the
    leading (t, h) dims are reduced in-kernel — reducing to [1, C] rows
    forces Mosaic sublane-offset row writes (measured 3x slower than the
    whole step), while [w_out, C] plane writes are leading-dim indexed.
    The tiny W reduction happens outside in XLA."""
    kT, kH, kW = kernel
    b, t, h = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when((b == 0) & (t == 0) & (h == 0))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    x = x_ref[0]
    C = x.shape[-1]
    tin, hin = x.shape[0], x.shape[1]
    g = g_ref[0].astype(jnp.float32)
    xw = [
        jax.lax.slice(x, (0, 0, dw, 0), (tin, hin, dw + w_out, C))
        for dw in range(kW)
    ]
    i = 0
    for dt in range(kT):
        for dh in range(kH):
            for dw in range(kW):
                tap = jax.lax.slice(
                    xw[dw], (dt, dh, 0, 0), (dt + t_tile, dh + h_tile, w_out, C)
                )
                o_ref[i] += jnp.sum(
                    tap.astype(jnp.float32) * g, axis=(0, 1)
                )
                i += 1


def _kernel_dk_strided(
    x_ref, g_ref, o_ref,
    *, kernel: Triple, s: int, t_tile: int, h_tile: int, w_out: int, C: int,
):
    kT, kH, kW = kernel
    b, t, h = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when((b == 0) & (t == 0) & (h == 0))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    x = x_ref[0]                       # [tin, hq_in, s, Wq, s*C]
    tin, hq_in = x.shape[0], x.shape[1]
    g = g_ref[0].astype(jnp.float32)
    planes = {}
    for dw in range(kW):
        key = (dw // s, dw % s)
        if key not in planes:
            o, p = key
            planes[key] = jax.lax.slice(
                x, (0, 0, 0, o, p * C), (tin, hq_in, s, o + w_out, p * C + C)
            )
    i = 0
    for dt in range(kT):
        for dh in range(kH):
            for dw in range(kW):
                pl_ = planes[(dw // s, dw % s)]
                tap = jax.lax.slice(
                    pl_,
                    (dt, dh // s, dh % s, 0, 0),
                    (dt + t_tile, dh // s + h_tile, dh % s + 1, w_out, C),
                ).reshape(t_tile, h_tile, w_out, C)
                o_ref[i] += jnp.sum(
                    tap.astype(jnp.float32) * g, axis=(0, 1)
                )
                i += 1


def _dk_pallas(x, g, kernel, stride, interpret: bool):
    """Depthwise filter gradient [kT,kH,kW,1,C] via one Pallas pass.

    Returns None when no divisor tiling fits the VMEM budget (caller falls
    back to the XLA tap formulation)."""
    B, T, H, W, C = x.shape
    kT, kH, kW = kernel
    st_, sh, sw = stride
    To, Ho, Wo = g.shape[1:4]
    W8 = _pad8(Wo)
    g8 = jnp.pad(
        g, [(0, 0), (0, 0), (0, 0), (0, W8 - Wo), (0, 0)]
    ) if W8 != Wo else g

    if (sh, sw) == (1, 1) and st_ == 1:
        pads = [
            (0, 0),
            (kT // 2, kT // 2),
            (kH // 2, kH // 2),
            (kW // 2, kW // 2 + (W8 - Wo)),
            (0, 0),
        ]
        xp = jnp.pad(x, pads)
        (t_tile, h_tile), ok = _pick_tiles(
            To, Ho, Wo, C, kernel, x.dtype.itemsize
        )
        if not ok:
            return None
        kern = functools.partial(
            _kernel_dk_s1, kernel=kernel, t_tile=t_tile, h_tile=h_tile,
            w_out=W8,
        )
        grid = (B, To // t_tile, Ho // h_tile)
        tin, hin = t_tile + kT - 1, h_tile + kH - 1
        Wp = xp.shape[3]
        in_specs = [
            pl.BlockSpec(
                (
                    _Element(1), _Element(tin), _Element(hin),
                    _Element(Wp), _Element(C),
                ),
                lambda b, t, h: (b, t * t_tile, h * h_tile, 0, 0),
            ),
            pl.BlockSpec(
                (1, t_tile, h_tile, W8, C), lambda b, t, h: (b, t, h, 0, 0)
            ),
        ]
        operands = (xp, g8)
    else:
        assert sh == sw and st_ == 1, (stride,)
        s = sh
        Hp = H + 2 * (kH // 2)
        Hq = -(-max(Hp, (Ho - 1) * s + kH) // s)
        # W8-carry: the saved input may be WIDER than the tap extent needs
        # ((kW-1)//s + W8 rows of parity planes) — Wq must also cover the
        # physical input plus its left halo or the pad below goes negative
        Wq = max((kW - 1) // s + W8, -(-(W + kW // 2) // s))
        pads = [
            (0, 0),
            (kT // 2, kT // 2),
            (kH // 2, Hq * s - H - (kH // 2)),
            (kW // 2, Wq * s - W - (kW // 2)),
            (0, 0),
        ]
        xp = jnp.pad(x, pads)
        Tp = xp.shape[1]
        x6 = xp.reshape(B, Tp, Hq, s, Wq, s * C)
        (t_tile, h_tile), ok = _pick_tiles_strided(
            To, Ho, Wq, W8, s, C, kernel, x.dtype.itemsize
        )
        if not ok:
            return None
        kern = functools.partial(
            _kernel_dk_strided, kernel=kernel, s=s, t_tile=t_tile,
            h_tile=h_tile, w_out=W8, C=C,
        )
        grid = (B, To // t_tile, Ho // h_tile)
        tin = t_tile + kT - 1
        hq_in = h_tile + (kH - 1) // s
        in_specs = [
            pl.BlockSpec(
                (
                    _Element(1), _Element(tin), _Element(hq_in),
                    _Element(s), _Element(Wq), _Element(s * C),
                ),
                lambda b, t, h: (b, t * t_tile, h * h_tile, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, t_tile, h_tile, W8, C), lambda b, t, h: (b, t, h, 0, 0)
            ),
        ]
        operands = (x6, g8)

    extra = {}
    if not interpret and _S1_COMPILER_PARAMS is not None:
        extra["compiler_params"] = _S1_COMPILER_PARAMS
    dk = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((kT * kH * kW, W8, C), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (kT * kH * kW, W8, C), lambda b, t, h: (0, 0, 0)
        ),
        interpret=interpret,
        **extra,
    )(*operands)
    return dk.sum(axis=1).reshape(kT, kH, kW, 1, C)


# ---------------------------------------------------------------------------
# Differentiable Pallas depthwise conv (used by the pool-LN backward).
#
# dx is itself a depthwise conv: zero-stuff the cotangent at the strided
# positions, right-pad to the input extent, and convolve with the spatially
# flipped filters at stride 1 (same padding, odd kernels).  dk is the tap
# formulation (27 shifted multiply-reduces) — partition-safe under SPMD,
# unlike XLA's grouped-convolution filter gradient.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def pallas_depthwise_conv(x, kernel_w, kernel, stride, head_dim,
                          w_true=None, keep_pad=False):
    """Depthwise conv (torch padding k//2), bf16 out, via the pool kernels.

    W8-carry contract: ``w_true`` zeroes carried junk input columns (the
    conv's zero-padding semantics), ``keep_pad`` keeps the 8-aligned output
    width (junk output columns zeroed in-kernel)."""
    return _fused_pool_ln_fwd_impl(
        x, kernel_w, jnp.ones((head_dim,), jnp.float32),
        jnp.zeros((head_dim,), jnp.float32), kernel, stride, head_dim,
        apply_ln=False, w_true=w_true, keep_pad=keep_pad,
    )


def _pdc_fwd(x, kernel_w, kernel, stride, head_dim, w_true, keep_pad):
    return pallas_depthwise_conv(
        x, kernel_w, kernel, stride, head_dim, w_true, keep_pad
    ), (x, kernel_w)


def _pdc_bwd(kernel, stride, head_dim, w_true, keep_pad, res, g):
    x, kernel_w = res
    B, T, H, Wp, C = x.shape
    W = Wp if w_true is None else w_true
    kT, kH, kW = kernel
    st_, sh, sw = stride
    # W8-carry: the primal zeroes junk input columns and junk output
    # columns; differentiate that exact function.  Junk cotangent columns
    # are zero by construction upstream, but slicing g to the true output
    # extent makes dk/dx independent of them regardless.
    Wo = _out_size(W, kW, sw)
    if g.shape[3] > Wo:
        g = g[:, :, :, :Wo]
    xm = _mask_w(x, w_true, 0.0)
    g32 = g.astype(jnp.float32)

    # dx: zero-stuff g to the input grid, right-pad to (T, H, Wp), stride-1
    # conv with flipped filters (same padding).  The conv's keep_pad zeroes
    # the junk dx columns in-kernel (d(masked input)/dx == 0 there).
    gf = g32
    if (st_, sh, sw) != (1, 1, 1):
        gf = jax.lax.pad(
            gf, jnp.float32(0),
            [(0, 0, 0), (0, 0, st_ - 1), (0, 0, sh - 1), (0, 0, sw - 1),
             (0, 0, 0)],
        )
    pad_t, pad_h, pad_w = (
        T - gf.shape[1], H - gf.shape[2], Wp - gf.shape[3]
    )
    gf = jnp.pad(gf, [(0, 0), (0, pad_t), (0, pad_h), (0, pad_w), (0, 0)])
    flipped = kernel_w[::-1, ::-1, ::-1]
    dx = pallas_depthwise_conv(
        gf, flipped, kernel, (1, 1, 1), head_dim,
        W, Wp != W,
    ).astype(x.dtype)

    # dk: tap-formulated filter gradient via the Pallas reduction kernel
    # (the XLA formulation costs ~110ms/train-step in shifted slices).
    interpret = jax.default_backend() == "cpu"
    dk = None
    if _Element is not None and st_ == 1 and sh == sw:
        dk = _dk_pallas(xm, g, kernel, stride, interpret)  # None if over-budget
    if dk is None:
        pads = [(0, 0)] + [(k // 2, k // 2) for k in kernel] + [(0, 0)]
        # barrier: prevents XLA-TPU from fusing the pad into the strided
        # tap-slice gathers (garbage lanes on hardware — see
        # svit_tpu/ops/pooling.py:_depthwise_bwd)
        xp = jax.lax.optimization_barrier(jnp.pad(x.astype(jnp.float32), pads))
        To, Ho, Wo = g.shape[1:4]
        taps = []
        for dt in range(kT):
            for dh in range(kH):
                for dw in range(kW):
                    sl = jax.lax.slice(
                        xp,
                        (0, dt, dh, dw, 0),
                        (
                            B,
                            dt + (To - 1) * st_ + 1,
                            dh + (Ho - 1) * sh + 1,
                            dw + (Wo - 1) * sw + 1,
                            C,
                        ),
                        (1, st_, sh, sw, 1),
                    )
                    taps.append(jnp.sum(sl * g32, axis=(0, 1, 2, 3)))
        dk = jnp.stack(taps).reshape(kT, kH, kW, 1, C)
    return dx, dk.astype(kernel_w.dtype)


pallas_depthwise_conv.defvjp(_pdc_fwd, _pdc_bwd)


def _pool_ln_recompute(x, kernel_w, ln_scale, ln_bias, kernel, stride,
                       head_dim, w_true=None, keep_pad=False):
    """Differentiable recompute for the fused kernel's VJP: the conv runs as
    the Pallas primitive above (XLA's TPU depthwise conv costs ~2ms/call on
    a VPU fallback path) and the per-head LN is plain jnp (its autodiff is
    elementwise + small reduces).  W8-carry: the conv primitive carries the
    masking; the final select reproduces the kernel's zeroed junk output
    columns so the VJP kills any junk cotangent automatically."""
    y = pallas_depthwise_conv(x, kernel_w, kernel, stride, head_dim,
                              w_true, keep_pad)
    shape = y.shape
    h = shape[-1] // head_dim
    yf = y.reshape(*shape[:-1], h, head_dim).astype(jnp.float32)
    mean = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(yf - mean), axis=-1, keepdims=True)
    ls, lb = ln_scale, ln_bias
    if ls.shape[-1] != head_dim:
        # full-channel-width params (lane-fused k|v pool)
        ls = ls.reshape(h, head_dim)
        lb = lb.reshape(h, head_dim)
    o = (yf - mean) * jax.lax.rsqrt(var + _EPS) * ls + lb
    o = o.astype(x.dtype).reshape(shape)
    if keep_pad:
        W = x.shape[3] if w_true is None else w_true
        kW, sw = kernel[2], stride[2]
        o = _mask_w(o, _out_size(W, kW, sw), 0.0)
    return o


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def fused_pool_ln(x, kernel_w, ln_scale, ln_bias, kernel, stride, head_dim,
                  w_true=None, keep_pad=False):
    """Depthwise-conv pool (torch padding k//2) + per-head LN, one Pallas pass.

    x: [B, T, H, W, C]; kernel_w: [kT, kH, kW, 1, C]; LN over head_dim groups.
    W8-carry: ``w_true`` marks the true width of an 8-aligned carried input
    (junk columns re-zeroed, restoring zero-pad conv semantics);
    ``keep_pad`` emits the 8-aligned output width with junk columns zeroed.
    """
    return _fused_pool_ln_fwd_impl(x, kernel_w, ln_scale, ln_bias,
                                   kernel, stride, head_dim,
                                   w_true=w_true, keep_pad=keep_pad)


def _fused_pool_ln_fwd_impl(x, kernel_w, ln_scale, ln_bias,
                            kernel, stride, head_dim,
                            interpret: Optional[bool] = None,
                            apply_ln: bool = True,
                            w_true: Optional[int] = None,
                            keep_pad: bool = False):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if _Element is None:
        return pool_ln_reference(
            x, kernel_w, ln_scale, ln_bias, kernel, stride, head_dim,
            apply_ln=apply_ln, w_true=w_true, keep_pad=keep_pad,
        )
    return _forward(
        x, kernel_w, ln_scale, ln_bias, tuple(kernel), tuple(stride),
        head_dim, interpret, apply_ln=apply_ln, w_true=w_true,
        keep_pad=keep_pad,
    )


def _fpl_fwd(x, kernel_w, ln_scale, ln_bias, kernel, stride, head_dim,
             w_true, keep_pad):
    out = _fused_pool_ln_fwd_impl(
        x, kernel_w, ln_scale, ln_bias, kernel, stride, head_dim,
        w_true=w_true, keep_pad=keep_pad,
    )
    return out, (x, kernel_w, ln_scale, ln_bias)


def _fpl_bwd(kernel, stride, head_dim, w_true, keep_pad, res, g):
    x, kernel_w, ln_scale, ln_bias = res
    _, vjp = jax.vjp(
        lambda a, b, c, d: _pool_ln_recompute(
            a, b, c, d, kernel, stride, head_dim, w_true, keep_pad
        ),
        x, kernel_w, ln_scale, ln_bias,
    )
    return vjp(g)


fused_pool_ln.defvjp(_fpl_fwd, _fpl_bwd)
