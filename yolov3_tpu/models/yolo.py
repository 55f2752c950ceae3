"""YOLOv3 in Flax: Darknet-53 backbone + 3-scale FPN heads.

TPU-native design choices vs. the reference (reference/model.py:19-464):
- NHWC layout throughout (TPU conv layout; the reference is NCHW for cuDNN).
  The public apply-functions accept NCHW and transpose at the edge.
- bfloat16 compute / float32 params by default; float32 available for parity.
- The fixed ones-kernel 2x Conv2DTranspose upsample (reference/model.py:93-105)
  sums over input channels (see `upsample_2x`); we deliberately FIX this to
  per-channel nearest-neighbor replication by default and keep a
  bug-compatible `upsample_channel_sum` mode for reference-weight parity.

Reference quirks preserved for output parity (SURVEY.md §7 "hard parts"):
- conv block order is Conv -> LeakyReLU -> BatchNorm, i.e. activation INSIDE
  the conv and BN after (reference/model.py:28-39), a deviation from
  canonical Darknet (Conv -> BN -> LeakyReLU).
- the residual block adds the UNCHANGED block input at every repetition
  (reference/model.py:41-48), not the previous repetition's output.
- the same anchor list is used at all three scales (reference/model.py:364-378).
"""

from __future__ import annotations

import functools
from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from yolov3_tpu.config import (
    BLOCK_COUNT,
    FILTER_COUNT,
    KERNEL_SIZE,
    ModelConfig,
)
from yolov3_tpu.ops.decode import decode_detections

Array = Any


class ConvBlock(nn.Module):
    """Conv(SAME, bias) -> LeakyReLU -> BatchNorm (reference/model.py:28-39).

    BatchNorm uses Keras defaults (momentum 0.99, epsilon 1e-3) and is NOT
    cross-replica synchronized: under data parallelism each chip normalizes
    with its local batch statistics, matching MirroredStrategy behavior.
    """

    features: int
    kernel: int
    stride: int = 1
    alpha: float = 0.2
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Any = jnp.bfloat16
    use_pallas_pointwise: bool = False
    int8_ste: bool = False
    int8_static: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        if self.int8_ste and self.int8_static:
            # frozen calibration scale (quant_scales collection): declared
            # outside the train branch so init(train=False) creates it
            sx = self.variable("quant_scales", "act_scale",
                               lambda: jnp.ones((), jnp.float32))
        if self.int8_ste and train:
            # int8 MXU forward with straight-through bf16 backward
            # (`int8_ste_conv`); identical variable tree to the standard
            # path, full batch-stat BatchNorm behavior
            conv = _ConvParams(
                (self.kernel, self.kernel, x.shape[-1], self.features),
                name="Conv_0")
            bn = _BNParams(self.features, self.bn_momentum,
                           name="BatchNorm_0")
            k, b = conv()
            if self.int8_static:
                # no per-batch absmax reduction in the forward
                y = int8_ste_conv_static(x, k, sx.value,
                                         (self.stride, self.stride),
                                         "SAME", self.dtype, None)
            else:
                y = int8_ste_conv(x, k, (self.stride, self.stride), "SAME",
                                  self.dtype, None)
            y = y + b.astype(self.dtype)
            y = nn.leaky_relu(y, negative_slope=self.alpha)
            return _s2d_batchnorm(y, bn, train, 1, self.bn_epsilon,
                                  self.dtype)
        if (self.use_pallas_pointwise and self.kernel == 1
                and self.stride == 1 and not train):
            # fused single-kernel path (matmul + bias + leaky + affine BN);
            # same variable tree as the standard path below
            conv = _ConvParams((1, 1, x.shape[-1], self.features),
                               name="Conv_0")
            bn = _BNParams(self.features, self.bn_momentum,
                           name="BatchNorm_0")
            k, b = conv()
            scale, offset, mean, var = bn()
            from yolov3_tpu.ops.pallas.conv_block_kernel import (
                fused_pointwise_conv_block)
            return fused_pointwise_conv_block(
                x, k, b, scale, offset, mean, var, alpha=self.alpha,
                eps=self.bn_epsilon, out_dtype=self.dtype,
                interpret=jax.default_backend() != "tpu")
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.leaky_relu(x, negative_slope=self.alpha)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                         dtype=self.dtype, param_dtype=jnp.float32)(x)
        return x


class FeatureBlock(nn.Module):
    """Repeated 1x1 half-filter / 3x3 full-filter pairs with residual adds.

    Each repetition adds the ORIGINAL block input (reference/model.py:41-48).
    """

    reps: int
    kernel: int
    features: int
    conv_kwargs: dict

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        inputs = x
        for _ in range(self.reps):
            y = ConvBlock(self.features // 2, 1, **self.conv_kwargs)(x, train)
            y = ConvBlock(self.features, self.kernel, **self.conv_kwargs)(y, train)
            x = inputs + y
        return x


class YoloBlock(nn.Module):
    """Five-conv neck returning (route, output) (reference/model.py:50-59)."""

    kernel: int
    features: int
    conv_kwargs: dict

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Tuple[Array, Array]:
        half, full = self.features // 2, self.features
        x = ConvBlock(half, 1, **self.conv_kwargs)(x, train)
        x = ConvBlock(full, self.kernel, **self.conv_kwargs)(x, train)
        x = ConvBlock(half, 1, **self.conv_kwargs)(x, train)
        x = ConvBlock(full, self.kernel, **self.conv_kwargs)(x, train)
        x = ConvBlock(half, 1, **self.conv_kwargs)(x, train)
        route = x
        x = ConvBlock(full, self.kernel, **self.conv_kwargs)(x, train)
        return route, x


def space_to_depth(x: Array, block: int = 2) -> Array:
    """NHWC [N,H,W,C] -> [N,H/b,W/b,b*b*C], channel order (dy, dx, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // block, block, w // block, block, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        n, h // block, w // block, block * block * c)


def depth_to_space(x: Array, block: int = 2) -> Array:
    """Inverse of `space_to_depth`: [N,H/b,W/b,b*b*C] -> [N,H,W,C]."""
    n, hb, wb, c4 = x.shape
    c = c4 // (block * block)
    x = x.reshape(n, hb, wb, block, block, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, hb * block, wb * block, c)


def _s2d_kernel_stride1(w: Array) -> Array:
    """Rearrange a 3x3 stride-1 SAME conv kernel [3,3,Ci,Co] into the exact
    equivalent space-to-depth-domain kernel [3,3,4Ci,4Co].

    In the 2x2-blocked domain, output block pixel (dy,dx) at block (i,j)
    needs original rows 2i+dy-1..2i+dy+1, which span blocks i-1..i+1 — a 3x3
    block window. Original tap (u,v) maps to block offset (U,V) and block
    pixel (dy',dx') via u = 2(U-1) + dy' - dy + 1; out-of-range taps are
    zero (they encode the block-domain zero padding exactly).
    """
    ci, co = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, 2, 2, ci, 2, 2, co), w.dtype)
    for U in range(3):
        for V in range(3):
            for dyp in range(2):
                for dxp in range(2):
                    for dy in range(2):
                        for dx in range(2):
                            u = 2 * (U - 1) + dyp - dy + 1
                            v = 2 * (V - 1) + dxp - dx + 1
                            if 0 <= u < 3 and 0 <= v < 3:
                                out = out.at[U, V, dyp, dxp, :, dy, dx, :].set(
                                    w[u, v])
    return out.reshape(3, 3, 4 * ci, 4 * co)


def _s2d_kernel_stem1_direct(w: Array) -> Array:
    """[3,3,Ci,Co] -> the [4,4,Ci,4Co] STRIDE-2 kernel computing stem1's
    blocked output directly from the RAW image (no space_to_depth!).

    Blocked output (i, dy) channel (dy,dx,co) is the original stride-1
    SAME conv at row 2i+dy, which reads rows 2i+dy+u-1 = 2i + (dy+u) - 1 —
    a 4-row window at stride 2 with padding (1, 2). Dense inner terms per
    output: 16 taps x Ci, vs the space-to-depth lifted form's 9 x 4Ci —
    for Ci=3 that is 48 vs 432 dense multiplies (measured on v5e: full
    int8 model 16.76 -> 16.05 ms at b32, and the input transpose
    disappears)."""
    ci, co = w.shape[2], w.shape[3]
    out = jnp.zeros((4, 4, ci, 2, 2, co), w.dtype)
    for dy in range(2):
        for dx in range(2):
            for u in range(3):
                for v in range(3):
                    out = out.at[dy + u, dx + v, :, dy, dx, :].set(w[u, v])
    return out.reshape(4, 4, ci, 4 * co)


def _s2d_kernel_stem1_s2d2(w: Array) -> Array:
    """[3,3,Ci,Co] -> the [9, 4Ci, 4Co] kernel computing stem1's blocked
    output from the SPACE-TO-DEPTH(2) image (channel layout (dr,dc,ch),
    i.e. `img.reshape(n,H,2,W,2,ci).transpose(0,1,3,2,4,5)`).

    Blocked output row g channel (dy,dx,co) is the original stride-1
    SAME conv at raw row 2g+dy, reading raw rows 2g+(dy+u-1) for
    u in 0..2 — raw row 2g+k lives in S2D row g+floor(k/2) at dr=k%2,
    so the window is the 3 S2D rows g-1..g+1 (tap a) x 3 S2D cols (tap
    b). 48 of the 9*4Ci*4Co slots are dense (same 48-term arithmetic as
    `_s2d_kernel_stem1_direct`); the zero-padded form exists so the
    region kernel can run stem1 as ONE [m, 9*4Ci] @ [9*4Ci, 4Co] MXU
    pass per row (ops/pallas/s2d_region_kernel.py rawimg mode)."""
    ci, co = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, 2, 2, ci, 2, 2, co), w.dtype)
    for dy in range(2):
        for dx in range(2):
            for u in range(3):
                for v in range(3):
                    a, dr = divmod(dy + u - 1 + 2, 2)
                    b, dc = divmod(dx + v - 1 + 2, 2)
                    out = out.at[a, b, dr, dc, :, dy, dx, :].set(w[u, v])
    return out.reshape(3, 3, 4 * ci, 4 * co).reshape(9, 4 * ci, 4 * co)


def _s2d_kernel_stride2_exit(w: Array) -> Array:
    """Rearrange a 3x3 stride-2 SAME conv kernel [3,3,Ci,Co] into the exact
    stride-1 kernel [2,2,4Ci,Co] whose output leaves the blocked domain.

    XLA SAME padding for kernel 3 / stride 2 / even input pads (0, 1), so
    output pixel (i,j) reads original rows 2i..2i+2 = blocks i..i+1 (pixel
    row 2i+3 is the dead tap). Block-domain padding is (0, 1).
    """
    ci, co = w.shape[2], w.shape[3]
    out = jnp.zeros((2, 2, 2, 2, ci, co), w.dtype)
    for U in range(2):
        for V in range(2):
            for dyp in range(2):
                for dxp in range(2):
                    u = 2 * U + dyp
                    v = 2 * V + dxp
                    if u < 3 and v < 3:
                        out = out.at[U, V, dyp, dxp].set(w[u, v])
    return out.reshape(2, 2, 4 * ci, co)


def _s2d_kernel_stride2_stay(w: Array) -> Array:
    """Rearrange a 3x3 stride-2 SAME conv kernel [3,3,Ci,Co] into the exact
    stride-2 block-domain kernel [3,3,4Ci,4Co] whose output STAYS blocked
    (output block (I,J) pixel (dy,dx) = original output pixel (2I+dy,2J+dx),
    reading original rows 4I+2dy..4I+2dy+2 = blocks 2I+dy..2I+dy+1, i.e. a
    3-block window at block stride 2 with padding (0, 1))."""
    ci, co = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, 2, 2, ci, 2, 2, co), w.dtype)
    for U in range(3):
        for V in range(3):
            for dyp in range(2):
                for dxp in range(2):
                    for dy in range(2):
                        for dx in range(2):
                            u = 2 * U + dyp - 2 * dy
                            v = 2 * V + dxp - 2 * dx
                            if 0 <= u < 3 and 0 <= v < 3:
                                out = out.at[U, V, dyp, dxp, :, dy, dx, :].set(
                                    w[u, v])
    return out.reshape(3, 3, 4 * ci, 4 * co)


def _s2d_kernel_1x1(w: Array) -> Array:
    """Lift a 1x1 conv kernel [1,1,Ci,Co] into the blocked domain as the
    block-diagonal kernel [1,1,4Ci,4Co] (each block pixel maps to itself)."""
    ci, co = w.shape[2], w.shape[3]
    out = jnp.zeros((1, 1, 2, 2, ci, 2, 2, co), w.dtype)
    for dy in range(2):
        for dx in range(2):
            out = out.at[0, 0, dy, dx, :, dy, dx, :].set(w[0, 0])
    return out.reshape(1, 1, 4 * ci, 4 * co)


# --- space-to-depth conv dispatch table ----------------------------------
# kind -> (lift fn, blocked-domain strides, blocked-domain padding)
_S2D_CONV_KINDS = {
    "stem1_direct": (_s2d_kernel_stem1_direct, (2, 2), ((1, 2), (1, 2))),
    "stride2_stay": (_s2d_kernel_stride2_stay, (2, 2), ((0, 1), (0, 1))),
    "pointwise": (_s2d_kernel_1x1, (1, 1), ((0, 0), (0, 0))),
    "stride1": (_s2d_kernel_stride1, (1, 1), ((1, 1), (1, 1))),
    "stride2_exit": (_s2d_kernel_stride2_exit, (1, 1), ((0, 1), (0, 1))),
}
# kind -> (base strides, base padding, d2s the input?, d2s the cotangent?)
# for the base-kernel-space weight-grad (original-domain conv geometry;
# SAME padding for kernel 3 is (1,1) at stride 1 and (0,1) at stride 2 on
# even inputs, matching the reference convs at reference/model.py:26-35).
_S2D_BASE_GEOM = {
    "stem1_direct": ((1, 1), ((1, 1), (1, 1)), False, True),
    "stride2_stay": ((2, 2), ((0, 1), (0, 1)), True, True),
    "stride1": ((1, 1), ((1, 1), (1, 1)), True, True),
    "stride2_exit": ((2, 2), ((0, 1), (0, 1)), True, False),
}


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _s2d_conv(x: Array, w: Array, kind: str, dtype: Any) -> Array:
    """Blocked-domain conv of `x` with the `kind`-lifted base kernel `w`.

    Forward is bit-identical to conv-ing the lifted kernel directly. The
    custom VJP exists for the WEIGHT grad: autodiff computes it as a conv
    producing the full lifted kernel shape ([3,3,4Ci,4Co] — 4x the dense
    FLOPs, 16x the output elements, 75% structural zeros) and then
    gather-reduces it back through the lift. The backward here instead
    rearranges the saved input / cotangent to the ORIGINAL domain
    (`depth_to_space` — pure layout) and runs the base-shape weight-grad
    conv: 1x FLOPs, no zero inflation. Measured on the train step
    (DESIGN.md round-3). Data-grads stay in the blocked domain, where the
    lane-filling channel counts beat the original shapes (same reason the
    forward is blocked).
    """
    lift, strides, pad = _S2D_CONV_KINDS[kind]
    return jax.lax.conv_general_dilated(x, lift(w).astype(dtype), strides,
                                        pad, dimension_numbers=_conv_dn())


def _s2d_conv_fwd(x, w, kind, dtype):
    return _s2d_conv(x, w, kind, dtype), (x, w)


def _s2d_conv_bwd(kind, dtype, res, dy):
    x, w = res
    lift, strides, pad = _S2D_CONV_KINDS[kind]
    if kind == "pointwise":
        # block-diagonal 1x1: both grads are plain matmuls over the
        # blocked view — reshape only, no transposes, no zero padding
        ci, co = w.shape[2], w.shape[3]
        x2 = x.reshape(-1, ci)
        dy2 = dy.reshape(-1, co)
        dx = jax.lax.dot_general(dy2, w[0, 0].astype(dtype),
                                 (((1,), (1,)), ((), ()))).reshape(x.shape)
        dw = jax.lax.dot_general(
            x2, dy2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(w.shape)
        return dx, dw
    # data-grad: autodiff through the blocked conv (unchanged path; for
    # stem1 the image is not differentiated, so XLA DCEs this branch)
    lifted = lift(w).astype(dtype)
    _, vjp_x = jax.vjp(
        lambda xx: jax.lax.conv_general_dilated(
            xx, lifted, strides, pad, dimension_numbers=_conv_dn()), x)
    dx = vjp_x(dy)[0]
    # weight-grad in base-kernel space
    b_strides, b_pad, d2s_x, d2s_dy = _S2D_BASE_GEOM[kind]
    x_o = depth_to_space(x) if d2s_x else x
    dy_o = depth_to_space(dy) if d2s_dy else dy
    _, vjp_w = jax.vjp(
        lambda ww: jax.lax.conv_general_dilated(
            x_o, ww.astype(dtype), b_strides, b_pad,
            dimension_numbers=_conv_dn()), w)
    dw = vjp_w(dy_o)[0]
    return dx, dw


_s2d_conv.defvjp(_s2d_conv_fwd, _s2d_conv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _stem1_conv_im2row_grads(x: Array, w: Array, dtype: Any) -> Array:
    """stem1-direct conv with the weight grad computed as an im2row matmul.

    Forward is bit-identical to conv-ing the lifted [4,4,Ci,4Co] kernel
    (the default stem1 path). The custom VJP replaces autodiff's
    weight-grad conv — f01b_i01o producing f32[4,4,3,128], which runs
    ~50x above its flop floor because 3 input channels strand the MXU
    (3.45 ms of the 47 ms bf16 b16 train step, DESIGN.md round-3 train
    profile) — with: extract the 4x4/2 input patches as four shifted
    space-to-depth views (pure layout), then ONE [48, N] @ [N, 4Co]
    matmul contracting the batch*positions axis with f32 accumulation.
    The base-kernel grad falls out through the lift's own transpose.
    """
    lift, strides, pad = _S2D_CONV_KINDS["stem1_direct"]
    return jax.lax.conv_general_dilated(x, lift(w).astype(dtype), strides,
                                        pad, dimension_numbers=_conv_dn())


def _stem1_im2row_fwd(x, w, dtype):
    return _stem1_conv_im2row_grads(x, w, dtype), (x, w)


def _stem1_im2row_bwd(dtype, res, dy):
    x, w = res
    lift, strides, pad = _S2D_CONV_KINDS["stem1_direct"]
    # data-grad via autodiff (the image is not differentiated in training,
    # so XLA DCEs this whole branch — same pattern as _s2d_conv_bwd)
    lifted = lift(w).astype(dtype)
    _, vjp_x = jax.vjp(
        lambda xx: jax.lax.conv_general_dilated(
            xx, lifted, strides, pad, dimension_numbers=_conv_dn()), x)
    dx = vjp_x(dy)[0]

    # weight grad: dW[ky,kx,c,o] = sum_{b,i,j} xp[b,2i+ky,2j+kx,c]*dy[b,i,j,o]
    b, h, wd, ci = x.shape
    ho, wo = dy.shape[1], dy.shape[2]
    co4 = dy.shape[3]
    # conv padding is ((1,2),(1,2)); one extra trailing row/col makes the
    # padded image even for the space-to-depth view (never read)
    xp = jnp.pad(x, ((0, 0), (1, 3), (1, 3), (0, 0)))
    t = (h + 4) // 2
    z = (xp.reshape(b, t, 2, t, 2, ci).transpose(0, 1, 3, 2, 4, 5)
         .reshape(b, t, t, 4 * ci))       # [b, t, t, (s, sx, c)]
    # patch lanes ordered (m, n, s, sx, c): row offset ky = 2m+s, col 2n+sx
    patches = jnp.concatenate(
        [z[:, m:m + ho, n:n + wo, :] for m in range(2) for n in range(2)],
        axis=-1)                          # [b, ho, wo, 16*ci]
    dw_p = jax.lax.dot_general(
        patches, dy, (((0, 1, 2), (0, 1, 2)), ((), ())),
        preferred_element_type=jnp.float32)             # [16*ci, 4Co]
    dw_direct = (dw_p.reshape(2, 2, 2, 2, ci, co4)      # [m,n,s,sx,c,o]
                 .transpose(0, 2, 1, 3, 4, 5)           # [m,s,n,sx,c,o]
                 .reshape(4, 4, ci, co4))
    _, vjp_lift = jax.vjp(_s2d_kernel_stem1_direct, w)
    dw = vjp_lift(dw_direct.astype(w.dtype))[0]
    return dx, dw


_stem1_conv_im2row_grads.defvjp(_stem1_im2row_fwd, _stem1_im2row_bwd)


# --- int8-forward training (straight-through estimator) -------------------

def _ste_quantize_act(x: Array) -> Tuple[Array, Array]:
    """Per-tensor symmetric dynamic quantization of an activation: scale
    from THIS batch's absmax (no calibration state, no staleness)."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-6) / 127.0
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def _ste_quantize_weight(w: Array) -> Tuple[Array, Array]:
    """Per-output-channel symmetric weight quantization ([kh,kw,ci,co])."""
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def int8_ste_conv(x: Array, w: Array, strides, padding, dtype: Any,
                  lift_kind) -> Array:
    """Conv whose FORWARD runs on the int8 MXU path (v5e: 2x the bf16
    rate) and whose BACKWARD is the plain bf16 conv VJP evaluated at the
    saved full-precision operands — the straight-through estimator, the
    standard quantization-aware-training gradient.

    Quantization is dynamic per batch: activations per-tensor from the
    batch absmax, weights per-output-channel — the same scheme the PTQ
    serving path validated for accuracy (models/quantized.py), minus the
    static calibration. `lift_kind` (a `_S2D_CONV_KINDS` key or None)
    quantizes the BASE kernel and lifts the int8 result, so structural
    zeros stay exact zeros.
    """
    qx, sx = _ste_quantize_act(x)
    if lift_kind is None:
        qw, sw = _ste_quantize_weight(w)
    else:
        qw, sw = _ste_quantize_weight(w)
        lift = _S2D_CONV_KINDS[lift_kind][0]
        qw = lift(qw)
        sw = jnp.tile(sw, qw.shape[-1] // w.shape[-1])
    y = jax.lax.conv_general_dilated(qx, qw, strides, padding,
                                     dimension_numbers=_conv_dn(),
                                     preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sx * sw)).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def int8_ste_conv_static(x: Array, w: Array, sx: Array, strides, padding,
                         dtype: Any, lift_kind) -> Array:
    """`int8_ste_conv` with a STATIC activation scale `sx` (a traced f32
    scalar, e.g. from `models/quantized.py::calibrate`): the forward skips
    the per-layer activation absmax reduction — the serializing cost the
    round-3 int8-STE post-mortem attributed ~2 ms/step to (DESIGN.md) —
    and quantizes with the frozen scale instead. Out-of-range activations
    saturate at ±127, the standard static-QAT behavior; refresh scales
    periodically via `train.py`'s recalibration hook. Backward is the same
    straight-through bf16 conv VJP (zero grad to `sx`)."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(sx.astype(jnp.float32), 1e-12)
    qx = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    if lift_kind is None:
        qw, sw = _ste_quantize_weight(w)
    else:
        qw, sw = _ste_quantize_weight(w)
        lift = _S2D_CONV_KINDS[lift_kind][0]
        qw = lift(qw)
        sw = jnp.tile(sw, qw.shape[-1] // w.shape[-1])
    y = jax.lax.conv_general_dilated(qx, qw, strides, padding,
                                     dimension_numbers=_conv_dn(),
                                     preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (s * sw)).astype(dtype)


def _int8_ste_static_fwd(x, w, sx, strides, padding, dtype, lift_kind):
    return (int8_ste_conv_static(x, w, sx, strides, padding, dtype,
                                 lift_kind), (x, w))


def _int8_ste_static_bwd(strides, padding, dtype, lift_kind, res, dy):
    dx, dw = _int8_ste_conv_bwd(strides, padding, dtype, lift_kind, res, dy)
    return dx, dw, jnp.zeros((), jnp.float32)


def _int8_ste_conv_fwd(x, w, strides, padding, dtype, lift_kind):
    return int8_ste_conv(x, w, strides, padding, dtype, lift_kind), (x, w)


def _int8_ste_conv_bwd(strides, padding, dtype, lift_kind, res, dy):
    x, w = res
    if lift_kind is None:
        f = lambda xx, ww: jax.lax.conv_general_dilated(
            xx, ww.astype(dtype), strides, padding,
            dimension_numbers=_conv_dn())
    else:
        lift = _S2D_CONV_KINDS[lift_kind][0]
        f = lambda xx, ww: jax.lax.conv_general_dilated(
            xx, lift(ww).astype(dtype), strides, padding,
            dimension_numbers=_conv_dn())
    _, vjp = jax.vjp(f, x, w)
    return vjp(dy)


int8_ste_conv.defvjp(_int8_ste_conv_fwd, _int8_ste_conv_bwd)
int8_ste_conv_static.defvjp(_int8_ste_static_fwd, _int8_ste_static_bwd)


class _ConvParams(nn.Module):
    """Parameter container with nn.Conv's tree ({kernel, bias})."""

    shape: Tuple[int, ...]  # (kh, kw, in, out)

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 self.shape, jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros_init(),
                               (self.shape[-1],), jnp.float32)

    def __call__(self):
        return self.kernel, self.bias


class _BNParams(nn.Module):
    """Parameter container with nn.BatchNorm's tree; stats update by hand."""

    features: int
    momentum: float

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones_init(),
                                (self.features,), jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros_init(),
                               (self.features,), jnp.float32)
        self.ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32))
        self.ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32))

    def __call__(self):
        return self.scale, self.bias, self.ra_mean.value, self.ra_var.value

    def update_stats(self, batch_mean: Array, batch_var: Array) -> None:
        if not self.is_initializing():
            m = self.momentum
            self.ra_mean.value = m * self.ra_mean.value + (1 - m) * batch_mean
            self.ra_var.value = m * self.ra_var.value + (1 - m) * batch_var


class _StemBlockParams(nn.Module):
    """ConvBlock-shaped parameter container (Conv_0 + BatchNorm_0) for the
    space-to-depth region — same variable tree as `ConvBlock`, so
    checkpoints are interchangeable between the standard and S2D paths."""

    features: int
    in_features: int
    kernel: int
    momentum: float
    int8_static: bool = False

    def setup(self):
        self.conv = _ConvParams(
            (self.kernel, self.kernel, self.in_features, self.features),
            name="Conv_0")
        self.bn = _BNParams(self.features, self.momentum, name="BatchNorm_0")
        if self.int8_static:
            # declared only when static QAT is on, in its own collection —
            # the params/batch_stats trees stay byte-identical to the
            # standard path (test_s2d_stem::test_same_variable_tree)
            self.act_scale = self.variable(
                "quant_scales", "act_scale",
                lambda: jnp.ones((), jnp.float32))


class _S2DFeatureBlockParams(nn.Module):
    """FeatureBlock-shaped parameter container (two ConvBlocks) for the
    space-to-depth region."""

    features: int
    kernel: int
    momentum: float
    int8_static: bool = False

    def setup(self):
        self.block1 = _StemBlockParams(self.features // 2, self.features, 1,
                                       self.momentum,
                                       int8_static=self.int8_static,
                                       name="ConvBlock_0")
        self.block2 = _StemBlockParams(self.features, self.features // 2,
                                       self.kernel, self.momentum,
                                       int8_static=self.int8_static,
                                       name="ConvBlock_1")


def _s2d_batchnorm(y: Array, bn: "_BNParams", train: bool, tile: int,
                   epsilon: float, dtype: Any) -> Array:
    """BatchNorm whose channels may be block-tiled `tile` times.

    Training statistics reduce over (N, H, W, block) so they equal the
    standard path's per-channel statistics exactly; running stats are stored
    untiled in the shared ConvBlock/BatchNorm_0 tree.
    """
    scale, bias, ra_mean, ra_var = bn()
    c = scale.shape[0]
    if train:
        n, h, w, _ = y.shape
        yr = y.astype(jnp.float32).reshape(n, h, w, tile, c)
        batch_mean = yr.mean(axis=(0, 1, 2, 3))
        batch_var = (yr * yr).mean(axis=(0, 1, 2, 3)) - batch_mean ** 2
        bn.update_stats(batch_mean, batch_var)
        mean, var = batch_mean, batch_var
    else:
        mean, var = ra_mean, ra_var
    inv = jax.lax.rsqrt(var + epsilon) * scale
    mul = jnp.tile(inv, tile).astype(dtype)
    add = jnp.tile(bias - mean * inv, tile).astype(dtype)
    return y * mul + add


_DN = None


def _conv_dn():
    global _DN
    if _DN is None:
        _DN = jax.lax.conv_dimension_numbers(
            (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    return _DN


def _s2d_conv_block(x: Array, blk: "_StemBlockParams", kind: str,
                    out_tile: int, train: bool, alpha: float,
                    bn_epsilon: float, dtype: Any,
                    base_grads: bool = True,
                    int8_ste: bool = False,
                    stem1_im2row: bool = False) -> Array:
    """One ConvBlock (conv -> LeakyReLU -> BN) in the blocked domain.

    `base_grads` routes the conv through `_s2d_conv`'s custom VJP (weight
    grads computed in base-kernel space); off = plain autodiff through the
    lifted kernel (for A/B and grad-equivalence tests). `int8_ste` runs
    the training forward on the int8 path (`int8_ste_conv`).
    `stem1_im2row` routes stem1's weight grad through the im2row matmul
    VJP (`_stem1_conv_im2row_grads`).
    """
    k, b = blk.conv()
    use_vjp = (base_grads is True
               or (not isinstance(base_grads, bool)
                   and base_grads and kind in base_grads))
    if int8_ste and train and kind != "stem1_direct":
        # int8 MXU forward, STE backward; stem1 stays bf16 — mirrors the
        # serving path's stem1-only quantization skip (models/quantized.py)
        lift, strides, padding = _S2D_CONV_KINDS[kind]
        if getattr(blk, "int8_static", False):
            y = int8_ste_conv_static(x, k, blk.act_scale.value, strides,
                                     padding, dtype, kind)
        else:
            y = int8_ste_conv(x, k, strides, padding, dtype, kind)
    elif use_vjp:
        y = _s2d_conv(x, k, kind, dtype)
    elif stem1_im2row and kind == "stem1_direct":
        y = _stem1_conv_im2row_grads(x, k, dtype)
    else:
        lift, strides, padding = _S2D_CONV_KINDS[kind]
        y = jax.lax.conv_general_dilated(x, lift(k).astype(dtype), strides,
                                         padding,
                                         dimension_numbers=_conv_dn())
    bias = b if out_tile == 1 else jnp.tile(b, out_tile)
    y = y + bias.astype(dtype)
    y = nn.leaky_relu(y, negative_slope=alpha)
    return _s2d_batchnorm(y, blk.bn, train, out_tile, bn_epsilon, dtype)


def _s2d_region_apply(x: Array, stem1, stem2, fb1, fb2, exit_conv,
                      train: bool, alpha: float, bn_epsilon: float,
                      dtype: Any, base_grads: bool = True,
                      int8_ste: bool = False,
                      stem1_im2row: bool = False) -> Array:
    """Exact space-to-depth rewrite of the darknet low-channel region: the
    two stem conv blocks, the first residual feature block, and the stride-2
    conv into the 128-channel stage.

    The reference runs these layers at high resolution with 3..64 channels
    (reference/model.py:385-396) — shapes that strand most of the TPU's
    128-wide vector lanes and systolic array (profiling shows this region
    costs ~16 ms of a 31 ms 512x512 forward step at batch 32). Rewriting
    them in a 2x2-blocked domain (input [N,H/2,W/2,4C], exactly rearranged
    kernels, BN statistics reduced over the block sub-axis) computes
    equivalent math with lane-filling channel counts. Variable trees match
    the standard path exactly, so checkpoints are interchangeable.

    Domains: input S2D(H) -> conv1 (s1, stays, spatial H/2) -> conv2
    (s2, stays, spatial H/4 blocked) -> feature block (1x1 + 3x3 + residual,
    stays) -> exit conv (s2, leaves, spatial H/8 plain NHWC).
    """
    a, e, dt, bg, q = alpha, bn_epsilon, dtype, base_grads, int8_ste

    # stem1 consumes the RAW image through the direct stride-2 kernel —
    # no space_to_depth transpose, and 9x fewer dense inner terms than
    # conv-ing the lifted kernel over the blocked input
    y = _s2d_conv_block(x.astype(dtype), stem1, "stem1_direct", 4,
                        train, a, e, dt, bg, q, stem1_im2row=stem1_im2row)
    y = _s2d_conv_block(y, stem2, "stride2_stay", 4, train, a, e, dt, bg, q)
    inputs = y
    z = _s2d_conv_block(y, fb1, "pointwise", 4, train, a, e, dt, bg, q)
    z = _s2d_conv_block(z, fb2, "stride1", 4, train, a, e, dt, bg, q)
    y = inputs + z  # residual adds the block input (reference/model.py:47)
    return _s2d_conv_block(y, exit_conv, "stride2_exit", 1,
                           train, a, e, dt, bg, q)


def upsample_2x(x: Array, channel_sum: bool = False) -> Array:
    """2x spatial upsample (NHWC).

    The reference uses a non-trainable ones-kernel stride-2 Conv2DTranspose
    (reference/model.py:93-105). That is NOT per-channel nearest-neighbor
    replication: an all-ones (2, 2, C_out, C_in) kernel makes every output
    channel the SUM over all input channels, so after the reference
    upsample every channel carries the same channel-sum value (the
    following YoloBlock convs relearn a mixing on top of that).

    We deliberately fix this to per-channel nearest-neighbor replication
    (``channel_sum=False``, the default) — an intentional deviation,
    documented like the EagerTensor clip fix. ``channel_sum=True``
    reproduces the reference's quirk bit-for-bit and exists so weights
    trained by the TF2 reference (imported via `utils/tf_import.py`)
    decode identically.
    """
    n, h, w, c = x.shape
    if channel_sum:
        # float32 accumulation: summing C bf16 values loses precision the
        # TF reference (fp32 conv accumulate) does not.
        x = jnp.broadcast_to(
            jnp.sum(x.astype(jnp.float32), axis=-1, keepdims=True),
            (n, h, w, c)).astype(x.dtype)
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


class DetectionHead(nn.Module):
    """Linear 1x1 conv to A*(5+C) channels (reference/model.py:107-120)."""

    num_anchors: int
    number_classes: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Conv(self.num_anchors * (5 + self.number_classes), (1, 1),
                       padding="SAME", use_bias=True, dtype=self.dtype,
                       param_dtype=jnp.float32)(x)


class Darknet53(nn.Module):
    """Backbone producing routes at strides 8/16/32 (reference/model.py:382-421).

    With `s2d_stem` the first two conv blocks run in the space-to-depth
    domain (see `_s2d_stem_apply`) — same math and the SAME variable tree,
    so both stems load each other's checkpoints. Conv-block names are pinned
    so the trees stay identical across the two paths.
    """

    conv_kwargs: dict
    block_count: int = BLOCK_COUNT
    filter_count: int = FILTER_COUNT
    kernel: int = KERNEL_SIZE
    s2d_stem: bool = False
    s2d_base_grads: Any = False
    s2d_stem1_im2row: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Tuple[Array, Array, Array]:
        fc, k, ck = self.filter_count, self.kernel, self.conv_kwargs
        mom = ck["bn_momentum"]
        # rematerialized residual blocks: recompute activations in the
        # backward pass instead of storing them (jax.checkpoint)
        FB = (nn.remat(FeatureBlock, static_argnums=(2,)) if self.remat
              else FeatureBlock)
        if self.s2d_stem:
            assert k == 3, "space-to-depth region requires 3x3 kernels"
            qs = (ck.get("int8_ste", False)
                  and ck.get("int8_static", False))
            # stem1 never quantizes (it stays bf16, mirroring the serving
            # path's stem1-only skip) so it declares no act_scale
            stem1 = _StemBlockParams(fc // 32, x.shape[-1], k, mom,
                                     name="ConvBlock_0")
            stem2 = _StemBlockParams(fc // 16, fc // 32, k, mom,
                                     int8_static=qs, name="ConvBlock_1")
            fb = _S2DFeatureBlockParams(fc // 16, k, mom, int8_static=qs,
                                        name="FeatureBlock_0")
            exit_conv = _StemBlockParams(fc // 8, fc // 16, k, mom,
                                         int8_static=qs, name="ConvBlock_2")
            x = _s2d_region_apply(x, stem1, stem2, fb.block1, fb.block2,
                                  exit_conv, train, ck["alpha"],
                                  ck["bn_epsilon"], ck["dtype"],
                                  base_grads=self.s2d_base_grads,
                                  int8_ste=ck.get("int8_ste", False),
                                  stem1_im2row=self.s2d_stem1_im2row)
        else:
            x = ConvBlock(fc // 32, k, name="ConvBlock_0", **ck)(x, train)
            x = ConvBlock(fc // 16, k, stride=2, name="ConvBlock_1",
                          **ck)(x, train)
            x = FB(1, k, fc // 16, ck, name="FeatureBlock_0")(x, train)
            x = ConvBlock(fc // 8, k, stride=2, name="ConvBlock_2",
                          **ck)(x, train)
        x = FB(2, k, fc // 8, ck, name="FeatureBlock_1")(x, train)
        x = ConvBlock(fc // 4, k, stride=2, name="ConvBlock_3", **ck)(x, train)
        x = FB(self.block_count, k, fc // 4, ck,
               name="FeatureBlock_2")(x, train)
        route1 = x  # stride 8
        x = ConvBlock(fc // 2, k, stride=2, name="ConvBlock_4", **ck)(x, train)
        x = FB(self.block_count, k, fc // 2, ck,
               name="FeatureBlock_3")(x, train)
        route2 = x  # stride 16
        x = ConvBlock(fc, k, stride=2, name="ConvBlock_5", **ck)(x, train)
        x = FB(self.block_count // 2, k, fc, ck,
               name="FeatureBlock_4")(x, train)
        route3 = x  # stride 32
        return route1, route2, route3


class YoloV3(nn.Module):
    """Feature-map model: NHWC image -> 3 raw detection feature maps.

    Output order matches the reference (reference/model.py:356-380):
    (fm1 @ stride 32, fm2 @ stride 16, fm3 @ stride 8), each NHWC with
    A*(5+C) channels. This is the training-loss model (`yolov3_fm`).
    """

    config: ModelConfig

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Tuple[Array, Array, Array]:
        cfg = self.config
        ck = dict(alpha=cfg.leaky_relu_alpha, bn_momentum=cfg.bn_momentum,
                  bn_epsilon=cfg.bn_epsilon, dtype=cfg.dtype,
                  use_pallas_pointwise=cfg.use_pallas_pointwise,
                  int8_ste=cfg.int8_train,
                  int8_static=cfg.int8_train_static)
        k = cfg.kernel_size
        x = x.astype(cfg.dtype)

        route_s8, route_s16, route_s32 = Darknet53(
            conv_kwargs=ck, block_count=cfg.block_count,
            filter_count=cfg.filter_count, kernel=k,
            s2d_stem=cfg.stem_space_to_depth,
            s2d_base_grads=cfg.s2d_base_grads,
            s2d_stem1_im2row=cfg.stem1_im2row_grads,
            remat=cfg.remat_blocks)(x, train)
        f8 = route_s8.shape[-1]
        f16 = route_s16.shape[-1]
        f32 = route_s32.shape[-1]

        head = lambda: DetectionHead(cfg.number_anchors, cfg.number_classes,
                                     dtype=cfg.dtype)
        YB = (nn.remat(YoloBlock, static_argnums=(2,)) if cfg.remat_blocks
              else YoloBlock)

        route, y = YB(k, f32, ck, name="YoloBlock_0")(route_s32, train)
        fm1 = head()(y)

        up = lambda y: upsample_2x(y, channel_sum=cfg.upsample_channel_sum)
        y = ConvBlock(f16, 1, **ck)(route, train)
        y = jnp.concatenate([up(y), route_s16], axis=-1)
        route, y = YB(k, f16, ck, name="YoloBlock_1")(y, train)
        fm2 = head()(y)

        y = ConvBlock(f8, 1, **ck)(route, train)
        y = jnp.concatenate([up(y), route_s8], axis=-1)
        route, y = YB(k, f8, ck, name="YoloBlock_2")(y, train)
        fm3 = head()(y)

        return fm1, fm2, fm3


class YoloV3Detector(nn.Module):
    """Inference model: NHWC image -> decoded detections [N, boxes, 4+1+C].

    The reference exports this as its SavedModel (`yolov3`,
    reference/model.py:453-464); it shares all weights with `YoloV3`.
    """

    config: ModelConfig

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        fms = YoloV3(self.config, name="backbone")(x, train)
        return decode_detections(fms, self.config.anchors,
                                 self.config.number_classes,
                                 self.config.strides)


def nchw_to_nhwc(x: Array) -> Array:
    """Accept the reference's NCHW interchange layout at the API edge."""
    return jnp.transpose(x, (0, 2, 3, 1))


def feature_maps_nchw(fms: Sequence[Array]) -> List[Array]:
    """Convert NHWC feature maps to the reference's NCHW for comparison."""
    return [jnp.transpose(fm, (0, 3, 1, 2)) for fm in fms]
