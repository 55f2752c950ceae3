"""Post-training-quantized (int8) serving path.

v5e doubles its MXU rate at int8 (394 TOPS vs ~197 TFLOPs bf16), and the
bf16 roofline for this network (~96.5 GFLOPs/img) caps out near 2000 img/s
at 512^2 — int8 is the only route to the 4000 img/s BASELINE.md target.

This module is a serving-only pure-function mirror of the Flax model's
wiring (`models/yolo.py`, itself a rebuild of reference/model.py:356-421):
it consumes the SAME variable tree the trainer exports and runs in one of
three modes sharing one code path:

- bf16   : reference math — must match `YoloV3.apply` exactly
           (tests/test_quantized.py uses this as the wiring oracle)
- collect: bf16 math while recording each conv input's absmax
           (activation-scale calibration)
- int8   : symmetric per-output-channel weight scales + per-tensor
           activation scales; int8 x int8 -> int32 convs on the MXU with
           dequant + bias + LeakyReLU + affine BN fused into the epilogue

Quantization choices:
- weights: per-output-channel symmetric, s_w[o] = max|W[..,o]| / 127,
  computed from the f32 checkpoint weights at trace time (XLA constant-
  folds the rounding at compile time).
- activations: per-tensor symmetric from a calibration batch's absmax.
- detection heads and box decode stay in bf16/f32 (accuracy-critical,
  negligible FLOPs).
- the space-to-depth stem region quantizes its REARRANGED kernels (the
  rearrangement is tap shuffling + zeros, so per-channel scales apply to
  the tiled output channels directly).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolov3_tpu.config import InferenceConfig, ModelConfig
from yolov3_tpu.models import yolo as Y
from yolov3_tpu.ops.decode import decode_detections

Array = Any


def _quantize_weight(w: Array) -> Tuple[Array, Array]:
    """f32 [kh,kw,ci,co] -> (int8 kernel, per-out-channel scale [co])."""
    w = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    # all-zero output channels quantize to wq == 0 no matter the scale, so
    # pick scale = 1.0 there: a tiny floor (1e-12/127) would make the
    # epilogue's b/dq fold blow the channel's bias up to ~1e14*b and lose
    # its float32 precision through the (b/dq)*(dq*mul) round trip
    scale = jnp.where(absmax > 0, absmax, 127.0) / 127.0
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def _quantize_act(x: Array, scale: Array) -> Array:
    # multiply by the f32 reciprocal (not divide): cheaper on the VPU, and
    # the SAME rounding sequence the fused Pallas kernel uses, so the two
    # int8 paths stay bit-identical
    inv = jnp.float32(1.0) / jnp.float32(scale)
    xq = jnp.round(x.astype(jnp.float32) * inv)
    return jnp.clip(xq, -127, 127).astype(jnp.int8)


_DN = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                     ("NHWC", "HWIO", "NHWC"))

# Percentile calibration histogram resolution: linear bins over [0, absmax]
# per tensor. 4096 bins bound the percentile-edge quantization error at
# absmax/4096 (~0.025% of range) — far below int8's own 1/127 grid.
_HIST_BINS = 4096


def _hist_percentile(counts: Array, m: Array, pct: float) -> Array:
    """Percentile of |activations| from a (counts, absmax) histogram, with
    linear interpolation inside the landing bin.

    Targets numpy's 'linear' rank h = (n-1)*pct/100 (cumulative-count
    target h+1), so the estimate lands between the same bracketing order
    statistics as jnp.percentile; accuracy is then one histogram bin when
    the distribution is dense at the percentile (always true at real
    activation sizes), and bounded by the local order-statistic gap on
    tiny tensors."""
    c = jnp.cumsum(counts.astype(jnp.float32))
    target = (c[-1] - 1.0) * (pct / 100.0) + 1.0
    idx = jnp.clip(jnp.searchsorted(c, target), 0, _HIST_BINS - 1)
    prev = jnp.where(idx > 0, c[jnp.maximum(idx - 1, 0)], 0.0)
    frac = jnp.clip((target - prev) / jnp.maximum(c[idx] - prev, 1.0),
                    0.0, 1.0)
    return (idx.astype(jnp.float32) + frac) * (m / _HIST_BINS)


# Conv blocks that stay bf16 in the int8 path by default: stem1 is
# lane/memory-bound, not MXU-bound — measured on v5e, int8 made it SLOWER
# (2.53 ms int8 vs 1.31 bf16: tiny contraction K = 9 x 12 plus a quantize
# pass over a 256^2-resolution tensor). stem2 int8 WINS (measured round 2:
# 17.12 -> 16.91 ms full-model; its K = 9 x 128 contraction is MXU-bound).
DEFAULT_QUANT_SKIP: Tuple[str, ...] = (
    "Darknet53_0/ConvBlock_0",   # stem1 (blocked domain, K = 9 x 12)
)


class _Ctx:
    """Mode carrier: act_scales for int8, collect dict for calibration."""

    def __init__(self, cfg: ModelConfig,
                 act_scales: Optional[Dict[str, float]] = None,
                 collect: Optional[Dict[str, Array]] = None,
                 quant_skip: Sequence[str] = DEFAULT_QUANT_SKIP,
                 fused_interpret: bool = False,
                 collect_reduce: str = "absmax",
                 requant_residual: bool = True,
                 rep_requant: bool = False,
                 rep_requant_final: bool = False,
                 pointwise_pallas: bool = False,
                 exit_pallas: bool = False,
                 down_pallas: bool = False,
                 conv3_pallas: bool = False,
                 region_pallas: bool = False,
                 region_full: bool = False,
                 region_fast: bool = False,
                 region_affine2: bool = False,
                 region_pipe: bool = False,
                 region_pipe2: bool = False,
                 region_rawin: bool = False,
                 region_rawimg: bool = False,
                 head_matmul: bool = False,
                 head_pad: bool = False,
                 bn_batch_stats: bool = False):
        self.cfg = cfg
        self.act_scales = act_scales
        self.collect = collect
        self.bn_batch_stats = bn_batch_stats
        self.exit_pallas = exit_pallas
        self.down_pallas = down_pallas
        self.region_pallas = region_pallas
        self.region_full = region_full
        self.region_fast = region_fast
        self.region_affine2 = region_affine2
        self.region_pipe = region_pipe
        self.region_pipe2 = region_pipe2
        self.region_rawin = region_rawin
        self.region_rawimg = region_rawimg
        self.head_matmul = head_matmul
        self.dtype = cfg.dtype
        self.quant_skip = frozenset(quant_skip)
        self.fused_interpret = fused_interpret
        self.collect_reduce = collect_reduce
        self.requant_residual = requant_residual
        self.rep_requant = rep_requant
        self.rep_requant_final = rep_requant_final
        self.pointwise_pallas = pointwise_pallas
        self.conv3_pallas = conv3_pallas
        self.head_pad = head_pad

    def pw_eligible(self, name: str, next_name: str, w: Array) -> bool:
        """1x1 conv blocks the transposed-view Pallas kernel may replace:
        both this conv and the following one (whose input quantize the
        kernel emits) must run int8."""
        return (self.pointwise_pallas and self.int8
                and w.shape[0] == 1 and w.shape[1] == 1
                and name not in self.quant_skip
                and next_name not in self.quant_skip
                and name in self.act_scales
                and next_name in self.act_scales)

    def block_input(self, cb0_name: str, x: Array) -> Tuple[Array, Array]:
        """(conv_in, residual_in) for a residual block's entry.

        In int8 mode with `requant_residual`, conv_in is the PRE-QUANTIZED
        s8 tensor (ConvBlock_0 consumes it directly, skipping its own
        quantize) and residual_in is its dequantized image. The bf16 x
        then dies at the quantize: the block boundary stores/reads ONE s8
        tensor instead of the round-2 (s8, bf16) tuple — the HLO
        attribution showed those dual-output boundary fusions bandwidth-
        bound on the bf16 copies kept alive only for residual adds (the
        S2D region alone was 30% of the b64 step). The residual then
        carries the same quantization noise the conv path already has;
        the decode-fidelity gate bounds the quality impact."""
        if x.dtype == jnp.int8:
            # already quantized with THIS block's scale by the producer
            # (the exit-conv Pallas kernel emits FeatureBlock_1's input)
            sx = jnp.float32(self.act_scales[cb0_name])
            return x, (x.astype(jnp.float32) * sx).astype(self.dtype)
        if (self.requant_residual and self.int8
                and cb0_name not in self.quant_skip):
            sx = jnp.float32(self.act_scales[cb0_name])
            xq = _quantize_act(x, sx)
            return xq, (xq.astype(jnp.float32) * sx).astype(self.dtype)
        return x, x

    def record(self, name: str, *tensors: Array) -> None:
        """Calibration-mode recording: per-tensor absmax, a fixed-size
        |activation| histogram ("hist", what percentile calibration uses —
        O(bins) live memory per conv instead of a full activation copy), or
        the raw flattened |activations| ("abs", test-oracle only: holding
        every conv input alive at once OOMs at real sizes)."""
        if self.collect_reduce == "absmax":
            self.collect[name] = jnp.max(jnp.stack(
                [jnp.max(jnp.abs(t.astype(jnp.float32))) for t in tensors]))
        elif self.collect_reduce == "hist":
            avs = [jnp.abs(t.astype(jnp.float32)).ravel() for t in tensors]
            m = jnp.maximum(
                jnp.max(jnp.stack([jnp.max(a) for a in avs])), 1e-30)
            counts = jnp.zeros((_HIST_BINS,), jnp.int32)
            for a in avs:
                idx = jnp.minimum((a * (_HIST_BINS / m)).astype(jnp.int32),
                                  _HIST_BINS - 1)
                counts = counts.at[idx].add(1)
            self.collect[name] = (counts, m)
        else:
            self.collect[name] = jnp.concatenate(
                [jnp.abs(t.astype(jnp.float32)).ravel() for t in tensors])

    @property
    def int8(self) -> bool:
        return self.act_scales is not None


def _conv_raw(ctx: _Ctx, name: str, x: Array, w: Array, stride,
              padding) -> Tuple[Array, Optional[Array]]:
    """One convolution in the ctx's mode: (f32 output, dequant scale).

    In int8 mode the output is the RAW int32 accumulation cast to f32 and
    the per-output-channel dequant scale sx*sw comes back separately, so
    `_epilogue` can commute it through LeakyReLU (dq > 0) instead of
    spending a full-tensor multiply."""
    strides = (stride, stride) if isinstance(stride, int) else stride
    if ctx.collect is not None:
        ctx.record(name, x)
    with jax.named_scope(name):  # per-layer attribution in profiles
        if ctx.int8 and name not in ctx.quant_skip:
            if name not in ctx.act_scales:
                raise KeyError(f"no activation scale calibrated for {name}")
            sx = jnp.float32(ctx.act_scales[name])
            wq, sw = _quantize_weight(w)
            # NOTE(measured, v5e b32): lowering 1x1 convs to
            # reshape+dot_general REGRESSES the full model (16.8 -> 23.8 ms
            # n-major flatten; 26.3 ms even with a transpose-view matching
            # the conv layout {3,0,2,1} — XLA materializes the transposes
            # either way). The conv form's ~0.2 ms/op fused-epilogue floor
            # stands; cross-op fusion needs custom-call layout control
            # (DESIGN.md round-2b).
            xq = x if x.dtype == jnp.int8 else _quantize_act(x, sx)
            y = jax.lax.conv_general_dilated(
                xq, wq, strides, padding,
                dimension_numbers=_DN, preferred_element_type=jnp.int32)
            return y.astype(jnp.float32), sx * sw
        return jax.lax.conv_general_dilated(
            x.astype(ctx.dtype), w.astype(ctx.dtype), strides, padding,
            dimension_numbers=_DN).astype(jnp.float32), None


def _conv(ctx: _Ctx, name: str, x: Array, w: Array, stride, padding) -> Array:
    """Dequantized convolution output (heads and callers that skip the
    conv-block epilogue)."""
    y, dq = _conv_raw(ctx, name, x, w, stride, padding)
    return y if dq is None else y * dq


def _epilogue(ctx: _Ctx, p: dict, bs: dict, y: Array,
              out_tile: int = 1, dq: Optional[Array] = None) -> Array:
    """bias -> LeakyReLU -> affine BN on an f32 conv output.

    When `dq` (the int8 path's per-channel dequant scale, > 0) is given,
    it is commuted through LeakyReLU — leaky(y*dq + b) * mul ==
    leaky(y + b/dq) * (dq*mul) — saving a full-tensor multiply in the
    conv's fused epilogue (XLA cannot do this fold itself: it does not
    know dq is positive)."""
    cfg = ctx.cfg
    b = p["Conv_0"]["bias"].astype(jnp.float32)
    scale = p["BatchNorm_0"]["scale"].astype(jnp.float32)
    offset = p["BatchNorm_0"]["bias"].astype(jnp.float32)
    if ctx.bn_batch_stats:
        # QAT calibration mode: normalize with THIS batch's statistics —
        # what the train-mode forward actually sees. BN running averages
        # can be arbitrarily stale mid-training (momentum 0.99, and the
        # QAT train forward feeds them quantized activations while this
        # mirror runs f32): the per-layer mis-normalization compounds
        # multiplicatively through the backbone, and the round-4
        # int8_static overfit gate NaN'd on a 1.6e19 calibrated scale at
        # its step-250 recalibration. Batch statistics are
        # self-stabilizing — every layer output is re-centered no matter
        # how the conv outputs drift.
        if dq is not None:
            raise ValueError("bn_batch_stats is a calibration (f32 path) "
                             "mode; the int8 dq commute is not supported")
        if out_tile > 1:
            b = jnp.tile(b, out_tile)
            scale = jnp.tile(scale, out_tile)
            offset = jnp.tile(offset, out_tile)
        y = y + b
        y = jnp.where(y >= 0, y, cfg.leaky_relu_alpha * y)
        if out_tile > 1:
            # S2D lifted view: the out_tile channel groups are the
            # spatial phases of ONE true output channel — pooling the
            # stats over (N, H, W, phase) reproduces the standard-layout
            # batch statistics exactly
            g = y.reshape(y.shape[:-1] + (out_tile, y.shape[-1] // out_tile))
            mean = jnp.tile(jnp.mean(g, (0, 1, 2, 3)), out_tile)
            var = jnp.tile(jnp.var(g, (0, 1, 2, 3)), out_tile)
        else:
            mean = jnp.mean(y, (0, 1, 2))
            var = jnp.var(y, (0, 1, 2))
        mul = jax.lax.rsqrt(var + cfg.bn_epsilon) * scale
        return (y * mul + (offset - mean * mul)).astype(ctx.dtype)
    mean = bs["BatchNorm_0"]["mean"].astype(jnp.float32)
    var = bs["BatchNorm_0"]["var"].astype(jnp.float32)
    if out_tile > 1:
        b, scale, offset, mean, var = (jnp.tile(v, out_tile)
                                       for v in (b, scale, offset, mean, var))
    # folded affine form (y*mul + add), the same arithmetic sequence the
    # fused Pallas kernel uses, so the two int8 paths stay comparable
    mul = jax.lax.rsqrt(var + cfg.bn_epsilon) * scale
    add = offset - mean * mul
    if dq is not None:
        b = b / dq
        mul = mul * dq
    y = y + b
    y = jnp.where(y >= 0, y, cfg.leaky_relu_alpha * y)
    return (y * mul + add).astype(ctx.dtype)


def _conv_block(ctx: _Ctx, name: str, p: dict, bs: dict, x: Array,
                stride: int = 1, kernel_override: Optional[Array] = None,
                padding="SAME", out_tile: int = 1) -> Array:
    """Conv -> LeakyReLU -> affine BN (inference), any mode.

    `out_tile` > 1 serves the space-to-depth region, whose block-tiled
    channels share the untiled BN/bias parameters (models/yolo.py
    `_s2d_batchnorm`).
    """
    w = p["Conv_0"]["kernel"] if kernel_override is None else kernel_override
    y, dq = _conv_raw(ctx, name, x, w, stride, padding)
    return _epilogue(ctx, p, bs, y, out_tile, dq=dq)


def _pw_block(ctx: _Ctx, name: str, p: dict, bs: dict, x: Array,
              next_name: str, residual_q: Optional[Array] = None,
              res_scale: Optional[Array] = None, emit_bf16: bool = False,
              kernel_override: Optional[Array] = None, out_tile: int = 1):
    """1x1 ConvBlock via the transposed-view Pallas kernel
    (`ops/pallas/pointwise_kernel.py`): quantize (+ requantized residual
    add) + int8 matmul + folded epilogue + the NEXT conv's input quantize,
    one VMEM-resident pass. Output matches `_conv_block` -> `_quantize_act`
    up to .5-quantization-boundary noise. `kernel_override`/`out_tile`
    serve the S2D region's lifted 1x1 (`_s2d_kernel_1x1`, block-diagonal,
    tiled BN)."""
    from yolov3_tpu.ops.pallas.pointwise_kernel import pointwise_conv_block_q

    w = p["Conv_0"]["kernel"] if kernel_override is None else kernel_override
    cin, cout = w.shape[2], w.shape[3]
    wq, sw = _quantize_weight(w)
    sx = jnp.float32(ctx.act_scales[name])
    dq = sx * sw
    mul, add = _bn_affine(ctx.cfg, p, bs)
    b = p["Conv_0"]["bias"].astype(jnp.float32)
    if out_tile > 1:
        b, mul, add = (jnp.tile(v, out_tile) for v in (b, mul, add))
    inv_next = jnp.float32(1.0) / jnp.float32(ctx.act_scales[next_name])
    cmax = max(cin, cout)

    def pad(v, n):
        return jnp.zeros((cmax,), jnp.float32).at[:n].set(v)

    epi = jnp.stack([
        pad(b / dq, cout), pad(mul * dq, cout), pad(add, cout),
        pad(jnp.full((cout,), inv_next), cout),
        pad(jnp.full((cin,), jnp.float32(1.0) / sx), cin),
        pad(jnp.full((cin,), jnp.float32(0.0) if res_scale is None
                     else jnp.float32(res_scale)), cin),
    ])
    with jax.named_scope(f"{name}/pw"):
        # barrier-pinned boundaries: stop XLA sinking the kernel's bitcast
        # transposes into the neighbouring convs (see the exit-conv kernel
        # — unpinned, the relayout cascade costs more than the kernel wins)
        x = jax.lax.optimization_barrier(x)
        if residual_q is not None:
            residual_q = jax.lax.optimization_barrier(residual_q)
        out = pointwise_conv_block_q(
            x, wq.reshape(cin, cout), epi, residual_q,
            alpha=ctx.cfg.leaky_relu_alpha, emit_bf16=emit_bf16,
            interpret=ctx.fused_interpret)
        return jax.tree_util.tree_map(jax.lax.optimization_barrier, out)


def _conv3_block(ctx: _Ctx, name: str, p: dict, bs: dict, x: Array,
                 next_name: Optional[str],
                 residual_q: Optional[Array] = None,
                 res_scale: Optional[Array] = None,
                 emit_s8: bool = True, emit_bf16: bool = False,
                 kernel_override: Optional[Array] = None,
                 out_tile: int = 1):
    """3x3 stride-1 ConvBlock via the conv3x3 Pallas kernel: int8 taps +
    folded epilogue + the feature block's residual add + the next conv's
    input quantize, one VMEM-resident pass. Caller guarantees
    eligibility (see `_feature_block`'s c3_all guard)."""
    from yolov3_tpu.ops.pallas.conv3x3_kernel import conv3x3_block_q

    w = p["Conv_0"]["kernel"] if kernel_override is None else kernel_override
    cin, cout = w.shape[2], w.shape[3]
    wq, sw = _quantize_weight(w)
    sx = jnp.float32(ctx.act_scales[name])
    dq = sx * sw
    mul, add = _bn_affine(ctx.cfg, p, bs)
    b = p["Conv_0"]["bias"].astype(jnp.float32)
    if out_tile > 1:
        b, mul, add = (jnp.tile(v, out_tile) for v in (b, mul, add))
    inv_next = (jnp.float32(0.0) if next_name is None
                else jnp.float32(1.0) / jnp.float32(ctx.act_scales[next_name]))
    cmax = max(cin, cout)

    def pad(v, n):
        return jnp.zeros((cmax,), jnp.float32).at[:n].set(v)

    epi = jnp.stack([
        pad(b / dq, cout), pad(mul * dq, cout), pad(add, cout),
        pad(jnp.full((cout,), inv_next), cout),
        pad(jnp.full((cin,), jnp.float32(1.0) / sx), cin),
        pad(jnp.full((cout,), jnp.float32(0.0) if res_scale is None
                     else jnp.float32(res_scale)), cout),
    ])
    with jax.named_scope(f"{name}/c3"):
        # barrier-pinned boundaries, same rationale as _pw_block
        x = jax.lax.optimization_barrier(x)
        if residual_q is not None:
            residual_q = jax.lax.optimization_barrier(residual_q)
        out = conv3x3_block_q(
            x, wq.reshape(9, cin, cout), epi, residual_q,
            alpha=ctx.cfg.leaky_relu_alpha, emit_s8=emit_s8,
            emit_bf16=emit_bf16,
            cast_bf16=(ctx.dtype == jnp.bfloat16),
            interpret=ctx.fused_interpret)
        out = jax.tree_util.tree_map(jax.lax.optimization_barrier, out)
    if emit_s8 and emit_bf16:
        return out
    return out if not isinstance(out, tuple) else out[0]


def _conv_block_cat2(ctx: _Ctx, name: str, p: dict, bs: dict,
                     a: Array, b_in: Array) -> Array:
    """`_conv_block` of a 1x1 conv over concatenate([a, b_in], -1) WITHOUT
    materializing the concat: conv(concat(a,b), W) = conv(a, Wa) +
    conv(b, Wb). Skips a full-tensor concat write AND (in int8 mode) the
    separate quantize pass over the concatenated tensor — both halves
    quantize with the same per-tensor scale, so calibration keys are
    unchanged."""
    w = p["Conv_0"]["kernel"]
    ca = a.shape[-1]
    wa, wb = w[:, :, :ca, :], w[:, :, ca:, :]
    if ctx.collect is not None:
        ctx.record(name, a, b_in)
    with jax.named_scope(name):
        if ctx.int8 and name not in ctx.quant_skip:
            if name not in ctx.act_scales:
                raise KeyError(f"no activation scale calibrated for {name}")
            sx = jnp.float32(ctx.act_scales[name])
            # per-output-channel scales span both halves: quantize the FULL
            # kernel, then split — identical numbers to the concat form
            wq, sw = _quantize_weight(w)
            ya = jax.lax.conv_general_dilated(
                _quantize_act(a, sx), wq[:, :, :ca, :], (1, 1), "SAME",
                dimension_numbers=_DN, preferred_element_type=jnp.int32)
            yb = jax.lax.conv_general_dilated(
                _quantize_act(b_in, sx), wq[:, :, ca:, :], (1, 1), "SAME",
                dimension_numbers=_DN, preferred_element_type=jnp.int32)
            return _epilogue(ctx, p, bs, (ya + yb).astype(jnp.float32),
                             dq=sx * sw)
        conv = lambda t, k: jax.lax.conv_general_dilated(
            t.astype(ctx.dtype), k.astype(ctx.dtype), (1, 1), "SAME",
            dimension_numbers=_DN).astype(jnp.float32)
        y = conv(a, wa) + conv(b_in, wb)
    return _epilogue(ctx, p, bs, y)


def _feature_block(ctx: _Ctx, name: str, p: dict, bs: dict, x: Array,
                   reps: int, next_name: Optional[str] = None) -> Array:
    """`next_name`: the SINGLE consumer of this block's output, when it
    has exactly one (FB1 -> ConvBlock_3, FB4 -> YoloBlock_0; FB2/FB3
    also feed FPN routes at a different scale, so they don't qualify).
    With `rep_requant_final`, the final rep's chain tensor is then
    stored pre-quantized at that consumer's scale — the same
    BIT-IDENTICAL fold `rep_requant` applies to the in-block reps,
    extended to the block's exit boundary."""
    if reps == 0:  # zero-rep blocks create no params (e.g. block_count=1)
        return x

    def exit_requant(out):
        if (ctx.rep_requant_final and ctx.int8 and next_name is not None
                and next_name not in ctx.quant_skip
                and ctx.act_scales is not None
                and next_name in ctx.act_scales
                and out.dtype != jnp.int8):
            return _quantize_act(out,
                                 jnp.float32(ctx.act_scales[next_name]))
        return out
    # requantized residual: ConvBlock_0 consumes the pre-quantized s8
    # directly; every residual add reads its dequantized image (the fused
    # kernel gets the dequantized bf16 and re-quantizes — same numbers to
    # 1 LSB, tolerated by its quantization-noise test bound)
    conv_in, inputs = ctx.block_input(f"{name}/ConvBlock_0", x)
    names = [(f"{name}/ConvBlock_{2 * r}", f"{name}/ConvBlock_{2 * r + 1}")
             for r in range(reps)]
    pw_all = (all(ctx.pw_eligible(n1, n2, p[n1.split("/")[-1]]
                                  ["Conv_0"]["kernel"])
                  for n1, n2 in names)
              and (reps == 1 or conv_in.dtype == jnp.int8))
    c3_all = (pw_all and ctx.conv3_pallas and conv_in.dtype == jnp.int8
              and all(n2 not in ctx.quant_skip
                      and p[n2.split("/")[-1]]["Conv_0"]["kernel"]
                      .shape[:2] == (3, 3)
                      for _, n2 in names)
              and all(names[r + 1][0] in ctx.act_scales
                      for r in range(reps - 1)))
    if c3_all:
        from yolov3_tpu.ops.pallas.conv3x3_kernel import vmem_fits as c3_fits

        k3 = p["ConvBlock_1"]["Conv_0"]["kernel"]
        n_, h_, w_, _ = conv_in.shape
        c3_all = (c3_fits(h_, w_, n_, k3.shape[2], k3.shape[3],
                          has_res=True)
                  and c3_fits(h_, w_, n_, k3.shape[2], k3.shape[3],
                              has_res=True, emit_bf16=True))
    if c3_all:
        # FULLY kernelized feature block: 1x1s on the pointwise kernel,
        # 3x3s + residual adds + boundary quantizes on the conv3x3 kernel
        # — only s8 tensors touch HBM between passes; the bf16 block
        # output materializes once, at the last rep.
        s_in = jnp.float32(ctx.act_scales[f"{name}/ConvBlock_0"])
        q = conv_in
        for r, (n1, n2) in enumerate(names):
            q2 = _pw_block(ctx, n1, p[f"ConvBlock_{2 * r}"],
                           bs[f"ConvBlock_{2 * r}"], q, n2)
            last = r == reps - 1
            out = _conv3_block(ctx, n2, p[f"ConvBlock_{2 * r + 1}"],
                               bs[f"ConvBlock_{2 * r + 1}"], q2,
                               next_name=None if last else names[r + 1][0],
                               residual_q=conv_in, res_scale=s_in,
                               emit_s8=not last, emit_bf16=last)
            q = out
        return out

    if pw_all:
        # 1x1s via the Pallas kernel (which also folds the residual add
        # and the 3x3's input quantize); 3x3s stay on XLA's conv emitter
        # (already at the MXU roofline). Only the LAST rep's bf16 sum is
        # materialized — mid-rep sums live inside the kernels.
        s_in = ctx.act_scales[f"{name}/ConvBlock_0"]
        y = None
        for r, (n1, n2) in enumerate(names):
            if r == 0:
                q2 = _pw_block(ctx, n1, p[f"ConvBlock_{2 * r}"],
                               bs[f"ConvBlock_{2 * r}"], conv_in, n2)
            else:
                q2 = _pw_block(ctx, n1, p[f"ConvBlock_{2 * r}"],
                               bs[f"ConvBlock_{2 * r}"], y, n2,
                               residual_q=conv_in, res_scale=s_in)
            y = _conv_block(ctx, n2, p[f"ConvBlock_{2 * r + 1}"],
                            bs[f"ConvBlock_{2 * r + 1}"], q2)
        return exit_requant(inputs + y)

    x = conv_in
    for r in range(reps):
        y = _conv_block(ctx, f"{name}/ConvBlock_{2 * r}",
                        p[f"ConvBlock_{2 * r}"], bs[f"ConvBlock_{2 * r}"], x)
        y = _conv_block(ctx, f"{name}/ConvBlock_{2 * r + 1}",
                        p[f"ConvBlock_{2 * r + 1}"],
                        bs[f"ConvBlock_{2 * r + 1}"], y)
        # residual adds the block input (reference/model.py:47)
        nxt = f"{name}/ConvBlock_{2 * r + 2}"
        if (ctx.rep_requant and r < reps - 1 and ctx.int8
                and conv_in.dtype == jnp.int8
                and nxt not in ctx.quant_skip and nxt in ctx.act_scales):
            # rep-boundary requantization: the chain tensor's ONLY
            # consumer is the next rep's 1x1, which quantizes it with
            # exactly this scale anyway — folding that quantize into the
            # residual-add fusion is BIT-IDENTICAL and stores/reads the
            # boundary as one s8 tensor instead of bf16 (halves the
            # FB2/FB3 rep-boundary HBM traffic; the round-2 block-
            # boundary result one level down)
            x = _quantize_act(inputs + y,
                              jnp.float32(ctx.act_scales[nxt]))
        else:
            x = inputs + y
    return exit_requant(x)


def _bn_affine(cfg: ModelConfig, p: dict, bs: dict):
    mul = (p["BatchNorm_0"]["scale"].astype(jnp.float32)
           * jax.lax.rsqrt(bs["BatchNorm_0"]["var"].astype(jnp.float32)
                           + cfg.bn_epsilon))
    add = (p["BatchNorm_0"]["bias"].astype(jnp.float32)
           - bs["BatchNorm_0"]["mean"].astype(jnp.float32) * mul)
    return mul, add


def _down_block(ctx: _Ctx, name: str, p: dict, bs: dict, x: Array,
                next_name: str, kernel_override: Optional[Array] = None,
                out_tile: int = 1) -> Array:
    """3x3 stride-2 downsample ConvBlock between backbone stages. With
    `down_pallas` (int8 mode), runs as one Pallas pass that quantizes the
    bf16 block-boundary tensor in-VMEM and emits the NEXT block's
    pre-quantized s8 input (`ops/pallas/down_conv_kernel.py` — XLA's
    emitter runs these strided s8 convs at ~30-45% MXU, DESIGN.md
    round 3); otherwise the plain `_conv_block`. Also serves the S2D
    stem2: its block-domain lifted kernel (`_s2d_kernel_stride2_stay`)
    is exactly a 3x3 stride-2 pad-(0,1) conv (`kernel_override`/
    `out_tile`, tiled BN like `_epilogue`)."""
    w = (p["Conv_0"]["kernel"] if kernel_override is None
         else kernel_override)
    eligible = (ctx.int8 and ctx.down_pallas and ctx.requant_residual
                and x.dtype != jnp.int8
                and w.shape[:2] == (3, 3)
                and name not in ctx.quant_skip
                and next_name not in ctx.quant_skip
                and ctx.act_scales is not None
                and name in ctx.act_scales
                and next_name in ctx.act_scales)
    if eligible:
        from yolov3_tpu.ops.pallas.down_conv_kernel import (down_conv_block_q,
                                                            vmem_fits)

        eligible = vmem_fits(x.shape[1], x.shape[2], x.shape[0],
                             w.shape[2], w.shape[3])
    if not eligible:
        return _conv_block(ctx, name, p, bs, x, stride=2,
                           kernel_override=kernel_override,
                           padding=("SAME" if kernel_override is None
                                    else ((0, 1), (0, 1))),
                           out_tile=out_tile)

    cin, cout = w.shape[2], w.shape[3]
    sx = jnp.float32(ctx.act_scales[name])
    wq, sw = _quantize_weight(w)
    dq = sx * sw
    mul, add = _bn_affine(ctx.cfg, p, bs)
    b = p["Conv_0"]["bias"].astype(jnp.float32)
    if out_tile > 1:
        b, mul, add = (jnp.tile(v, out_tile) for v in (b, mul, add))
    inv_next = jnp.float32(1.0) / jnp.float32(ctx.act_scales[next_name])
    cmax = max(cin, cout)

    def pad(v, n):
        return jnp.zeros((cmax,), jnp.float32).at[:n].set(v)

    epi = jnp.stack([
        pad(b / dq, cout), pad(mul * dq, cout), pad(add, cout),
        pad(jnp.full((cout,), inv_next), cout),
        pad(jnp.full((cin,), jnp.float32(1.0) / sx), cin),
    ])
    with jax.named_scope(f"{name}/down_pallas"):
        # barrier-pinned boundaries, same rationale as _pw_block
        xb = jax.lax.optimization_barrier(x.astype(ctx.dtype))
        out = down_conv_block_q(
            xb, wq.reshape(9, cin, cout), epi,
            alpha=ctx.cfg.leaky_relu_alpha,
            cast_bf16=(ctx.dtype == jnp.bfloat16),
            interpret=ctx.fused_interpret)
        return jax.lax.optimization_barrier(out)


def _yolo_block(ctx: _Ctx, name: str, p: dict, bs: dict, x: Array,
                x2: Optional[Array] = None) -> Tuple[Array, Array]:
    """5-conv yolo block + route (reference/model.py:50-59). When `x2` is
    given, the block's input is concatenate([x, x2], -1) — computed as a
    split 1x1 conv, skipping the concat materialization."""
    start = 0
    if x2 is not None:
        x = _conv_block_cat2(ctx, f"{name}/ConvBlock_0", p["ConvBlock_0"],
                             bs["ConvBlock_0"], x, x2)
        start = 1
    names = [f"{name}/ConvBlock_{i}" for i in range(6)]
    pw_mid = (ctx.pw_eligible(names[2], names[3],
                              p["ConvBlock_2"]["Conv_0"]["kernel"])
              and ctx.pw_eligible(names[4], names[5],
                                  p["ConvBlock_4"]["Conv_0"]["kernel"]))
    if pw_mid:
        # CB2/CB4 (the mid 1x1s) via the Pallas kernel; CB4 also emits the
        # bf16 route tensor the FPN conv consumes
        for i in range(start, 2):
            x = _conv_block(ctx, names[i], p[f"ConvBlock_{i}"],
                            bs[f"ConvBlock_{i}"], x)
        q = _pw_block(ctx, names[2], p["ConvBlock_2"], bs["ConvBlock_2"],
                      x, names[3])
        x = _conv_block(ctx, names[3], p["ConvBlock_3"], bs["ConvBlock_3"],
                        q)
        q, route = _pw_block(ctx, names[4], p["ConvBlock_4"],
                             bs["ConvBlock_4"], x, names[5],
                             emit_bf16=True)
        x = _conv_block(ctx, names[5], p["ConvBlock_5"], bs["ConvBlock_5"],
                        q)
        return route, x
    for i in range(start, 5):
        x = _conv_block(ctx, f"{name}/ConvBlock_{i}", p[f"ConvBlock_{i}"],
                        bs[f"ConvBlock_{i}"], x)
    route = x
    x = _conv_block(ctx, f"{name}/ConvBlock_5", p["ConvBlock_5"],
                    bs["ConvBlock_5"], x)
    return route, x


def _region_tail_eligible(ctx: _Ctx, p: dict, conv_in: Array) -> bool:
    """The S2D tail kernel needs all four of its conv blocks int8-
    calibrated (it consumes FeatureBlock_0's pre-quantized s8 entry and
    emits FeatureBlock_1's), and the band plan within its VMEM budget."""
    from yolov3_tpu.ops.pallas.s2d_tail_kernel import vmem_fits

    d = "Darknet53_0"
    names = (f"{d}/FeatureBlock_0/ConvBlock_0",
             f"{d}/FeatureBlock_0/ConvBlock_1", f"{d}/ConvBlock_2",
             f"{d}/FeatureBlock_1/ConvBlock_0")
    if not (ctx.int8 and ctx.requant_residual):
        return False
    if any(nm in ctx.quant_skip or nm not in ctx.act_scales
           for nm in names):
        return False
    n, h, w, c = conv_in.shape
    cm = 4 * p[d]["FeatureBlock_0"]["ConvBlock_0"]["Conv_0"][
        "kernel"].shape[3]
    co = p[d]["ConvBlock_2"]["Conv_0"]["kernel"].shape[3]
    return vmem_fits(h, w, n, c, cm, co)


def _s2d_tail(ctx: _Ctx, p: dict, bs: dict, conv_in: Array) -> Array:
    """Pack the tail's lifted kernels + folded epilogues and run the fused
    band pipeline. conv_in: the pre-quantized s8 stem2 output (scale s2 =
    FeatureBlock_0/ConvBlock_0's activation scale)."""
    from yolov3_tpu.ops.pallas.s2d_tail_kernel import s2d_tail_block_q

    d = "Darknet53_0"
    fb = f"{d}/FeatureBlock_0"
    pfb, bfb = p[d]["FeatureBlock_0"], bs[d]["FeatureBlock_0"]
    kf1 = Y._s2d_kernel_1x1(pfb["ConvBlock_0"]["Conv_0"]["kernel"])
    kf2 = Y._s2d_kernel_stride1(pfb["ConvBlock_1"]["Conv_0"]["kernel"])
    k3 = Y._s2d_kernel_stride2_exit(p[d]["ConvBlock_2"]["Conv_0"]["kernel"])
    c, cm, co = kf1.shape[2], kf1.shape[3], k3.shape[3]
    s2 = jnp.float32(ctx.act_scales[f"{fb}/ConvBlock_0"])
    s3 = jnp.float32(ctx.act_scales[f"{fb}/ConvBlock_1"])
    s4 = jnp.float32(ctx.act_scales[f"{d}/ConvBlock_2"])
    s5 = jnp.float32(ctx.act_scales[f"{d}/FeatureBlock_1/ConvBlock_0"])

    def stage(pp, bb, ww, sx, tile):
        wq, sw = _quantize_weight(ww)
        dq = sx * sw
        mul, add = _bn_affine(ctx.cfg, pp, bb)
        b = pp["Conv_0"]["bias"].astype(jnp.float32)
        if tile > 1:
            b, mul, add = (jnp.tile(v, tile) for v in (b, mul, add))
        return wq, b / dq, mul * dq, add

    wq1, b1, m1, a1 = stage(pfb["ConvBlock_0"], bfb["ConvBlock_0"],
                            kf1, s2, 4)
    wq2, b2, m2, a2 = stage(pfb["ConvBlock_1"], bfb["ConvBlock_1"],
                            kf2, s3, 4)
    wq3, b3, m3, a3 = stage(p[d]["ConvBlock_2"], bs[d]["ConvBlock_2"],
                            k3, s4, 1)

    def pad(v):
        return jnp.zeros((c,), jnp.float32).at[:v.shape[0]].set(v)

    epi = jnp.stack([
        pad(b1), pad(m1), pad(a1), pad(jnp.full((cm,), 1.0 / s3)),
        pad(b2), pad(m2), pad(a2), jnp.full((c,), s2),
        jnp.full((c,), 1.0 / s4),
        pad(b3), pad(m3), pad(a3), pad(jnp.full((co,), 1.0 / s5)),
    ])
    with jax.named_scope(f"{d}/s2d_tail_pallas"):
        # barrier-pinned boundaries, same rationale as the exit kernel
        xb = jax.lax.optimization_barrier(conv_in)
        out = s2d_tail_block_q(
            xb, wq1.reshape(c, cm), wq2.reshape(9, cm, c),
            wq3.reshape(4, c, co), epi,
            alpha=ctx.cfg.leaky_relu_alpha,
            cast_bf16=(ctx.dtype == jnp.bfloat16),
            interpret=ctx.fused_interpret)
        return jax.lax.optimization_barrier(out)


def _region_full_eligible(ctx: _Ctx, p: dict, conv_in: Array,
                          rawin: bool = False,
                          rawimg: bool = False) -> bool:
    """The full-region kernel needs all five conv blocks int8-calibrated
    (it consumes stem1's pre-quantized s8 output — or, with `rawin`, its
    raw bf16 output, quantizing in-VMEM; with `rawimg`, the z-scored
    IMAGE itself, running stem1 in-kernel — and emits FeatureBlock_1's
    entry) and the band plan within its VMEM budget."""
    from yolov3_tpu.ops.pallas.s2d_region_kernel import vmem_fits

    d = "Darknet53_0"
    names = (f"{d}/ConvBlock_1", f"{d}/FeatureBlock_0/ConvBlock_0",
             f"{d}/FeatureBlock_0/ConvBlock_1", f"{d}/ConvBlock_2",
             f"{d}/FeatureBlock_1/ConvBlock_0")
    if not (ctx.int8 and ctx.requant_residual):
        return False
    if any(nm in ctx.quant_skip or nm not in ctx.act_scales
           for nm in names):
        return False
    if rawimg:
        n, hr, wr, ci = conv_in.shape
        if hr % 4 or wr % 4:
            return False
        h2, w2 = hr // 2, wr // 2
        ci2 = 4 * ci
        c1 = 4 * p[d]["ConvBlock_0"]["Conv_0"]["kernel"].shape[3]
    else:
        ci2 = 0
        n, h2, w2, c1 = conv_in.shape
    cm = 4 * p[d]["FeatureBlock_0"]["ConvBlock_0"]["Conv_0"][
        "kernel"].shape[3]
    c = 4 * p[d]["ConvBlock_1"]["Conv_0"]["kernel"].shape[3]
    co = p[d]["ConvBlock_2"]["Conv_0"]["kernel"].shape[3]
    return vmem_fits(h2 // 2, w2 // 2, n, c1, c, cm, co, rawin, ci2)


def _s2d_region_fused(ctx: _Ctx, p: dict, bs: dict, conv_in: Array,
                      rawin: bool = False, rawimg: bool = False) -> Array:
    """Pack the full region's lifted kernels + folded epilogues and run
    the fused band pipeline. conv_in: stem1's pre-quantized s8 output
    (scale s1 = ConvBlock_1's activation scale) — or, with `rawin`, its
    RAW bf16/f32 output (the kernel quantizes in-VMEM, epi row 17 =
    1/s1); or, with `rawimg`, the z-scored IMAGE itself — stem1 runs
    in-kernel (epi rows 17-20 = stem1's bias/BN affine + 1/s1) and its
    entire HBM boundary never exists."""
    from yolov3_tpu.ops.pallas.s2d_region_kernel import s2d_region_block_q

    d = "Darknet53_0"
    fb = f"{d}/FeatureBlock_0"
    pfb, bfb = p[d]["FeatureBlock_0"], bs[d]["FeatureBlock_0"]
    k2 = Y._s2d_kernel_stride2_stay(p[d]["ConvBlock_1"]["Conv_0"]["kernel"])
    kf1 = Y._s2d_kernel_1x1(pfb["ConvBlock_0"]["Conv_0"]["kernel"])
    kf2 = Y._s2d_kernel_stride1(pfb["ConvBlock_1"]["Conv_0"]["kernel"])
    k3 = Y._s2d_kernel_stride2_exit(p[d]["ConvBlock_2"]["Conv_0"]["kernel"])
    c1, c = k2.shape[2], k2.shape[3]
    cm, co = kf1.shape[3], k3.shape[3]
    s1 = jnp.float32(ctx.act_scales[f"{d}/ConvBlock_1"])
    s2 = jnp.float32(ctx.act_scales[f"{fb}/ConvBlock_0"])
    s3 = jnp.float32(ctx.act_scales[f"{fb}/ConvBlock_1"])
    s4 = jnp.float32(ctx.act_scales[f"{d}/ConvBlock_2"])
    s5 = jnp.float32(ctx.act_scales[f"{d}/FeatureBlock_1/ConvBlock_0"])

    def stage(pp, bb, ww, sx, tile):
        wq, sw = _quantize_weight(ww)
        dq = sx * sw
        mul, add = _bn_affine(ctx.cfg, pp, bb)
        b = pp["Conv_0"]["bias"].astype(jnp.float32)
        if tile > 1:
            b, mul, add = (jnp.tile(v, tile) for v in (b, mul, add))
        return wq, b / dq, mul * dq, add

    wq2, b2s, m2s, a2s = stage(p[d]["ConvBlock_1"], bs[d]["ConvBlock_1"],
                               k2, s1, 4)
    wq1, b1, m1, a1 = stage(pfb["ConvBlock_0"], bfb["ConvBlock_0"],
                            kf1, s2, 4)
    wqf, bf, mf, af = stage(pfb["ConvBlock_1"], bfb["ConvBlock_1"],
                            kf2, s3, 4)
    wq3, b3, m3, a3 = stage(p[d]["ConvBlock_2"], bs[d]["ConvBlock_2"],
                            k3, s4, 1)

    def pad(v):
        return jnp.zeros((c,), jnp.float32).at[:v.shape[0]].set(v)

    fast = ctx.region_fast
    affine2 = ctx.region_affine2
    if affine2:
        # 2-affine fast epilogue: mul*leaky(acc+b)+add == max of two
        # affines of acc when mul >= 0; negative-mul channels pack
        # negated coefficients (the stage then emits -q, which round-
        # nearest-even and the symmetric clip commute with) and the
        # CONSUMING weights' input channels flip to compensate — all
        # pack-time, bit-equivalent up to rounding-boundary flips.
        alpha = jnp.float32(ctx.cfg.leaky_relu_alpha)

        def quad(b, mm, a, s_out):
            g1 = mm / s_out
            k1 = g1 * b + a / s_out
            g2 = alpha * g1
            k2 = g2 * b + a / s_out
            sgn = jnp.where(g1 >= 0, jnp.float32(1), jnp.float32(-1))
            return g1 * sgn, k1 * sgn, g2 * sgn, k2 * sgn, sgn

        s2_m1, s2_c1, s2_m2, s2_c2, sgn2 = quad(b2s, m2s, a2s, s2)
        pw_m1, pw_c1, pw_m2, pw_c2, sgnp = quad(b1, m1, a1, s3)
        fb_m1, fb_c1, fb_m2, fb_c2, sgnf = quad(bf, mf, af, s4)
        res_row = jnp.full((c,), s2 / s4) * sgn2 * sgnf

        def flip(wq, sgn):
            # negate the input channels fed by a sign-flipped stage
            # (s8 weights are clipped to +/-127: negation is lossless)
            return jnp.where((sgn < 0)[None, None, :, None], -wq, wq)

        wq1 = flip(wq1, sgn2)
        wqf = flip(wqf, sgnp)
        wq3 = flip(wq3, sgnf)
        epi = jnp.stack([
            pad(pw_m1), pad(pw_c1), pad(pw_m2), pad(pw_c2),
            fb_m1, fb_c1, fb_m2, fb_c2, res_row,
            pad(b3), pad(m3 / s5), pad(a3 / s5), jnp.zeros((c,)),
            s2_m1, s2_c1, s2_m2, s2_c2,
        ])
    else:
        if fast:
            # pre-fold each stage's requant 1/s into its affine (the
            # kernel's fast epilogue skips the separate inv multiply and
            # the bf16 roundtrips; see s2d_region_block_q docstring)
            m1, a1 = m1 / s3, a1 / s3
            mf, af = mf / s4, af / s4
            res_row = jnp.full((c,), s2 / s4)
            m3, a3 = m3 / s5, a3 / s5
            m2s, a2s = m2s / s2, a2s / s2
        else:
            res_row = jnp.full((c,), s2)
        epi = jnp.stack([
            pad(b1), pad(m1), pad(a1), pad(jnp.full((cm,), 1.0 / s3)),
            pad(bf), pad(mf), pad(af), res_row,
            jnp.full((c,), 1.0 / s4),
            pad(b3), pad(m3), pad(a3), pad(jnp.full((co,), 1.0 / s5)),
            pad(b2s), pad(m2s), pad(a2s), jnp.full((c,), 1.0 / s2),
        ])
    if rawin:
        # row 17 = the in-VMEM input quantize's reciprocal (the same f32
        # division _quantize_act performs, so codes stay bit-identical)
        epi = jnp.concatenate(
            [epi, jnp.full((1, c), jnp.float32(1.0) / s1)], axis=0)
    ws1 = None
    if rawimg:
        # rows 17-20: stem1's bias / BN affine (UNQUANTIZED — stem1
        # keeps the serving path's bf16 skip) + the 1/s1 quantize; fast
        # mode folds 1/s1 into the affine like the other stages
        ws1 = Y._s2d_kernel_stem1_s2d2(
            p[d]["ConvBlock_0"]["Conv_0"]["kernel"])
        ws1 = ws1.reshape(ws1.shape[0] * ws1.shape[1], ws1.shape[2])
        mul0, add0 = _bn_affine(ctx.cfg, p[d]["ConvBlock_0"],
                                bs[d]["ConvBlock_0"])
        b0 = p[d]["ConvBlock_0"]["Conv_0"]["bias"].astype(jnp.float32)
        b0, mul0, add0 = (jnp.tile(v, 4) for v in (b0, mul0, add0))
        if fast:
            mul0, add0 = mul0 / s1, add0 / s1
        epi = jnp.concatenate(
            [epi, jnp.stack([pad(b0), pad(mul0), pad(add0),
                             jnp.full((c,), jnp.float32(1.0) / s1)])],
            axis=0)
    with jax.named_scope(f"{d}/s2d_region_pallas"):
        # barrier-pinned boundaries, same rationale as the exit kernel
        xb = jax.lax.optimization_barrier(conv_in)
        out = s2d_region_block_q(
            xb, wq2.reshape(9, c1, c), wq1.reshape(c, cm),
            wqf.reshape(9, cm, c), wq3.reshape(4, c, co), epi, ws1,
            alpha=ctx.cfg.leaky_relu_alpha,
            cast_bf16=(ctx.dtype == jnp.bfloat16), fast=fast,
            affine2=affine2, rawin=rawin, rawimg=rawimg,
            pipe=ctx.region_pipe, pipe2=ctx.region_pipe2,
            interpret=ctx.fused_interpret)
        return jax.lax.optimization_barrier(out)


def _s2d_region(ctx: _Ctx, p: dict, bs: dict, x: Array) -> Array:
    """Mirror of `_s2d_region_apply` (inference path) in any mode."""
    d = "Darknet53_0"
    if (ctx.region_full and ctx.region_rawimg
            and _region_full_eligible(ctx, p, x, rawimg=True)):
        # the kernel consumes the z-scored IMAGE and runs stem1
        # in-kernel: stem1's entire HBM boundary (bf16 out + s8 in) and
        # the XLA stem1 conv + quantize fusions never exist
        return _s2d_region_fused(ctx, p, bs, x.astype(ctx.dtype),
                                 rawimg=True)
    # stem1 consumes the RAW image directly (see _s2d_kernel_stem1_direct)
    k4 = Y._s2d_kernel_stem1_direct(p[d]["ConvBlock_0"]["Conv_0"]["kernel"])
    y = _conv_block(ctx, f"{d}/ConvBlock_0", p[d]["ConvBlock_0"],
                    bs[d]["ConvBlock_0"], x, stride=2, kernel_override=k4,
                    padding=((1, 2), (1, 2)), out_tile=4)
    if ctx.region_full and ctx.region_rawin:
        if (y.dtype != jnp.int8
                and _region_full_eligible(ctx, p, y, rawin=True)):
            # the kernel consumes stem1's RAW bf16 output and quantizes
            # in-VMEM: the s8 stem1 boundary (537 MB write + 1.07 GB
            # read at b64/512px) never exists in HBM
            return _s2d_region_fused(ctx, p, bs, y, rawin=True)
    if ctx.region_full:
        conv_in1, _ = ctx.block_input(f"{d}/ConvBlock_1", y)
        if (conv_in1.dtype == jnp.int8
                and _region_full_eligible(ctx, p, conv_in1)):
            # stem2 -> pw -> FB0 3x3 -> residual -> exit as ONE Pallas
            # band pipeline with cross-band scratch carries
            # (ops/pallas/s2d_region_kernel.py): the stem2 and tail stage
            # boundaries never touch HBM; emits FeatureBlock_1's
            # pre-quantized s8 input directly
            return _s2d_region_fused(ctx, p, bs, conv_in1)
    k2 = Y._s2d_kernel_stride2_stay(p[d]["ConvBlock_1"]["Conv_0"]["kernel"])
    y = _down_block(ctx, f"{d}/ConvBlock_1", p[d]["ConvBlock_1"],
                    bs[d]["ConvBlock_1"], y,
                    f"{d}/FeatureBlock_0/ConvBlock_0",
                    kernel_override=k2, out_tile=4)
    fb = f"{d}/FeatureBlock_0"
    conv_in, inputs = ctx.block_input(f"{fb}/ConvBlock_0", y)
    if (ctx.region_pallas and conv_in.dtype == jnp.int8
            and _region_tail_eligible(ctx, p, conv_in)):
        # pw -> FB0 3x3 -> residual -> exit as ONE VMEM-resident Pallas
        # band pipeline (ops/pallas/s2d_tail_kernel.py): the stage
        # boundaries' ~2 GB/step of s8 HBM traffic at b64 never leaves
        # VMEM; emits FeatureBlock_1's pre-quantized s8 input directly
        return _s2d_tail(ctx, p, bs, conv_in)
    kf1 = Y._s2d_kernel_1x1(
        p[d]["FeatureBlock_0"]["ConvBlock_0"]["Conv_0"]["kernel"])
    if ctx.pw_eligible(f"{fb}/ConvBlock_0", f"{fb}/ConvBlock_1", kf1):
        z = _pw_block(ctx, f"{fb}/ConvBlock_0",
                      p[d]["FeatureBlock_0"]["ConvBlock_0"],
                      bs[d]["FeatureBlock_0"]["ConvBlock_0"], conv_in,
                      f"{fb}/ConvBlock_1", kernel_override=kf1, out_tile=4)
    else:
        z = _conv_block(ctx, f"{fb}/ConvBlock_0",
                        p[d]["FeatureBlock_0"]["ConvBlock_0"],
                        bs[d]["FeatureBlock_0"]["ConvBlock_0"], conv_in,
                        kernel_override=kf1, padding=((0, 0), (0, 0)),
                        out_tile=4)
    kf2 = Y._s2d_kernel_stride1(
        p[d]["FeatureBlock_0"]["ConvBlock_1"]["Conv_0"]["kernel"])
    nm2, nxt2 = f"{fb}/ConvBlock_1", f"{d}/ConvBlock_2"

    def _fb0_c3_ok():
        from yolov3_tpu.ops.pallas.conv3x3_kernel import vmem_fits as c3f

        return c3f(z.shape[1], z.shape[2], z.shape[0], kf2.shape[2],
                   kf2.shape[3], has_res=True)

    if (ctx.conv3_pallas and z.dtype == jnp.int8
            and nm2 not in ctx.quant_skip and nm2 in ctx.act_scales
            and nxt2 not in ctx.quant_skip and nxt2 in ctx.act_scales
            and _fb0_c3_ok()):
        # FB0's lifted stride-1 3x3 + the residual add + the exit conv's
        # input quantize, one conv3x3-kernel pass (s8 in, s8 out)
        y = _conv3_block(ctx, nm2, p[d]["FeatureBlock_0"]["ConvBlock_1"],
                         bs[d]["FeatureBlock_0"]["ConvBlock_1"], z,
                         next_name=nxt2, residual_q=conv_in,
                         res_scale=jnp.float32(
                             ctx.act_scales[f"{fb}/ConvBlock_0"]),
                         kernel_override=kf2, out_tile=4)
    else:
        z = _conv_block(ctx, f"{fb}/ConvBlock_1",
                        p[d]["FeatureBlock_0"]["ConvBlock_1"],
                        bs[d]["FeatureBlock_0"]["ConvBlock_1"], z,
                        kernel_override=kf2, padding=((1, 1), (1, 1)),
                        out_tile=4)
        y = inputs + z
    k3 = Y._s2d_kernel_stride2_exit(p[d]["ConvBlock_2"]["Conv_0"]["kernel"])
    nm, nxt = f"{d}/ConvBlock_2", f"{d}/FeatureBlock_1/ConvBlock_0"
    if ctx.int8 and ctx.exit_pallas and _exit_eligible(ctx, nm, nxt, k3, y):
        # XLA's conv emitter runs the lifted [2,2,4Ci,Co] window conv at
        # ~22% MXU (3.23 ms of the 28.6 ms b64 step, DESIGN.md round 3);
        # the tap-matmul Pallas kernel emits FeatureBlock_1's s8 input
        # directly (exit_conv_kernel.py)
        from yolov3_tpu.ops.pallas.exit_conv_kernel import exit_conv_block_q

        sx = jnp.float32(ctx.act_scales[nm])
        wq, sw = _quantize_weight(k3)
        dq = sx * sw
        mul, add = _bn_affine(ctx.cfg, p[d]["ConvBlock_2"],
                              bs[d]["ConvBlock_2"])
        b = p[d]["ConvBlock_2"]["Conv_0"]["bias"].astype(jnp.float32)
        inv_next = jnp.float32(1.0) / jnp.float32(ctx.act_scales[nxt])
        epi = jnp.stack([b / dq, mul * dq, add, jnp.full_like(add, inv_next)])
        with jax.named_scope(f"{nm}/exit_pallas"):
            # the barriers stop XLA from sinking the kernel's (bitcast)
            # boundary transposes into the neighbouring convs, which would
            # re-run THEM in the transposed layout (measured +2.8 ms)
            xq = jax.lax.optimization_barrier(
                y if y.dtype == jnp.int8 else _quantize_act(y, sx))
            out = exit_conv_block_q(
                xq, wq.reshape(4, *wq.shape[2:]), epi,
                alpha=ctx.cfg.leaky_relu_alpha,
                cast_bf16=(ctx.dtype == jnp.bfloat16),
                interpret=ctx.fused_interpret)
            return jax.lax.optimization_barrier(out)
    return _conv_block(ctx, f"{d}/ConvBlock_2", p[d]["ConvBlock_2"],
                       bs[d]["ConvBlock_2"], y, kernel_override=k3,
                       padding=((0, 1), (0, 1)), out_tile=1)


def _exit_eligible(ctx: _Ctx, nm: str, nxt: str, k3: Array,
                   y: Array) -> bool:
    """The exit kernel needs both the exit conv and the next block's entry
    int8-calibrated (it emits the latter's pre-quantized s8 input, which
    `_Ctx.block_input` then consumes — requant_residual semantics), and
    the per-image block within its VMEM plan."""
    from yolov3_tpu.ops.pallas.exit_conv_kernel import vmem_fits

    return (ctx.requant_residual
            and nm not in ctx.quant_skip and nxt not in ctx.quant_skip
            and nm in ctx.act_scales and nxt in ctx.act_scales
            and vmem_fits(y.shape[1], y.shape[2], y.shape[0],
                          k3.shape[2], k3.shape[3]))


def forward_feature_maps(params: dict, batch_stats: dict, cfg: ModelConfig,
                         x: Array,
                         act_scales: Optional[Dict[str, float]] = None,
                         collect: Optional[Dict[str, Array]] = None,
                         quant_skip: Sequence[str] = DEFAULT_QUANT_SKIP,
                         fused_interpret: bool = False,
                         collect_reduce: str = "absmax",
                         requant_residual: bool = True,
                         rep_requant: bool = False,
                         rep_requant_final: bool = False,
                         pointwise_pallas: bool = False,
                         exit_pallas: bool = False,
                         down_pallas: bool = False,
                         conv3_pallas: bool = False,
                         region_pallas: bool = False,
                         region_full: bool = False,
                         region_fast: bool = False,
                         region_affine2: bool = False,
                         region_pipe: bool = False,
                         region_pipe2: bool = False,
                         region_rawin: bool = False,
                         region_rawimg: bool = False,
                         head_matmul: bool = False,
                         bn_batch_stats: bool = False,
                         ) -> Tuple[Array, Array, Array]:
    """Inference feature maps, mirroring `YoloV3.apply(..., train=False)`.

    x is NHWC float32 (already z-scored). Mode per (act_scales, collect);
    `quant_skip` names conv blocks kept bf16 in int8 mode.
    `requant_residual` (int8 mode) takes residual adds from the
    dequantized int8 block input instead of a live bf16 copy — see
    `_Ctx.residual_input`. (The round-2 fused-FeatureBlock kernel and its
    `fused_blocks` flag were REMOVED in round 4 after the region fusion
    landed: its full-model regression was structural — the Pallas-island
    relayout cascade — and unlike the region kernel it had no
    kernel/image boundary to pin; DESIGN.md round-2b/round-4.)
    """
    ctx = _Ctx(cfg, act_scales, collect, quant_skip,
               fused_interpret=fused_interpret,
               collect_reduce=collect_reduce,
               requant_residual=requant_residual,
               rep_requant=rep_requant,
               rep_requant_final=rep_requant_final,
               pointwise_pallas=pointwise_pallas,
               exit_pallas=exit_pallas, down_pallas=down_pallas,
               conv3_pallas=conv3_pallas, region_pallas=region_pallas,
               region_full=region_full, region_fast=region_fast,
               region_affine2=region_affine2, region_pipe=region_pipe,
               region_pipe2=region_pipe2,
               region_rawin=region_rawin,
               region_rawimg=region_rawimg,
               head_matmul=head_matmul, bn_batch_stats=bn_batch_stats)
    return tuple(_apply_head(ctx, params, nm, h)
                 for nm, h in _forward_necks(ctx, params, batch_stats, x))


def head_pad_width(cfg: ModelConfig) -> int:
    """Per-anchor padded channel width dp for the head-conv Co padding,
    or 0 when padding does not apply.

    MEASURED NEGATIVE — kept behind `head_pad=False`. Hypothesis was
    that the head conv's batch-minor f32[B,gh,gw,14]{0,3,2,1} output
    (0.68 ms vs ~0.005 compute, DESIGN.md round-3 profile) is a layout
    trap escapable by zero-padding Co to a full 128 lanes. Full-model
    A/B at b64: 33.27 ms vs 28.53 (+4.7 ms) — batch-minor was XLA being
    smart (batch=64 fills the lane dim; channel-minor at 14 lanes wastes
    89% of every vector), and padding made every decode intermediate ~9x
    more physical traffic. The packed decode's `anchor_pad` support and
    this helper stay as the tested record of the experiment."""
    a = len(cfg.anchors)
    d = 5 + cfg.number_classes
    if 128 % a == 0 and 128 // a >= d and a * d < 128:
        return 128 // a
    return 0


def _apply_head(ctx: _Ctx, p: dict, name: str, h: Array) -> Array:
    """Detection head: plain 1x1 conv + bias in the compute dtype
    (accuracy-critical, stays unquantized in every mode). With
    `ctx.head_pad`, Co is zero-padded per anchor to `head_pad_width`
    lanes (decode slices the pad away; bit-identical outputs)."""
    w = p[name]["Conv_0"]["kernel"].astype(ctx.dtype)
    b = p[name]["Conv_0"]["bias"].astype(ctx.dtype)
    if ctx.head_matmul:
        # head 1x1 as a dot on the FLATTENED spatial view (the packed-
        # decode trick): the conv form emits f32[B,gh,gw,14]{0,3,2,1} at
        # 0.68 ms vs a ~0.02 ms matmul floor (round-3/4 profiles); a
        # [B*gh*gw, Ci] @ [Ci, 14] dot gives XLA a shape it can tile
        # without the 14-lane channel-minor trap
        n, gh, gw, ci = h.shape
        co = w.shape[-1]
        y = jnp.dot(h.reshape(n * gh * gw, ci), w.reshape(ci, co)) + b
        return y.reshape(n, gh, gw, co)
    dp = head_pad_width(ctx.cfg) if ctx.head_pad else 0
    if dp:
        a = len(ctx.cfg.anchors)
        d = 5 + ctx.cfg.number_classes
        kh, kw, ci, _ = w.shape
        w = jnp.pad(w.reshape(kh, kw, ci, a, d),
                    ((0, 0), (0, 0), (0, 0), (0, 0), (0, dp - d))
                    ).reshape(kh, kw, ci, a * dp)
        b = jnp.pad(b.reshape(a, d), ((0, 0), (0, dp - d))).reshape(a * dp)
    return jax.lax.conv_general_dilated(
        h, w, (1, 1), "SAME", dimension_numbers=_DN) + b


def _forward_necks(ctx: _Ctx, params: dict, batch_stats: dict,
                   x: Array) -> Tuple[Tuple[str, Array], ...]:
    """Backbone + FPN in the ctx's mode, up to (but excluding) the
    detection heads: ((head name, neck output), ...) stride-32 first."""
    cfg = ctx.cfg
    p, bs = params, batch_stats
    d = "Darknet53_0"
    bc = cfg.block_count
    fc = cfg.filter_count

    if cfg.stem_space_to_depth:
        y = _s2d_region(ctx, p, bs, x)
    else:
        y = _conv_block(ctx, f"{d}/ConvBlock_0", p[d]["ConvBlock_0"],
                        bs[d]["ConvBlock_0"], x.astype(ctx.dtype))
        y = _down_block(ctx, f"{d}/ConvBlock_1", p[d]["ConvBlock_1"],
                        bs[d]["ConvBlock_1"], y,
                        f"{d}/FeatureBlock_0/ConvBlock_0")
        y = _feature_block(ctx, f"{d}/FeatureBlock_0",
                           p[d]["FeatureBlock_0"], bs[d]["FeatureBlock_0"],
                           y, 1, next_name=f"{d}/ConvBlock_2")
        y = _down_block(ctx, f"{d}/ConvBlock_2", p[d]["ConvBlock_2"],
                        bs[d]["ConvBlock_2"], y,
                        f"{d}/FeatureBlock_1/ConvBlock_0")
    y = _feature_block(ctx, f"{d}/FeatureBlock_1", p[d]["FeatureBlock_1"],
                       bs[d]["FeatureBlock_1"], y, 2,
                       next_name=f"{d}/ConvBlock_3")
    y = _down_block(ctx, f"{d}/ConvBlock_3", p[d]["ConvBlock_3"],
                    bs[d]["ConvBlock_3"], y,
                    f"{d}/FeatureBlock_2/ConvBlock_0")
    y = _feature_block(ctx, f"{d}/FeatureBlock_2", p[d]["FeatureBlock_2"],
                       bs[d]["FeatureBlock_2"], y, bc)
    route_s8 = y
    y = _down_block(ctx, f"{d}/ConvBlock_4", p[d]["ConvBlock_4"],
                    bs[d]["ConvBlock_4"], y,
                    f"{d}/FeatureBlock_3/ConvBlock_0")
    y = _feature_block(ctx, f"{d}/FeatureBlock_3", p[d]["FeatureBlock_3"],
                       bs[d]["FeatureBlock_3"], y, bc)
    route_s16 = y
    y = _down_block(ctx, f"{d}/ConvBlock_5", p[d]["ConvBlock_5"],
                    bs[d]["ConvBlock_5"], y,
                    f"{d}/FeatureBlock_4/ConvBlock_0")
    y = _feature_block(ctx, f"{d}/FeatureBlock_4",
                       p[d].get("FeatureBlock_4", {}),
                       bs[d].get("FeatureBlock_4", {}), y, bc // 2,
                       next_name="YoloBlock_0/ConvBlock_0")
    route_s32 = y

    up = lambda t: Y.upsample_2x(t, channel_sum=cfg.upsample_channel_sum)
    route, yb1 = _yolo_block(ctx, "YoloBlock_0", p["YoloBlock_0"],
                             bs["YoloBlock_0"], route_s32)
    y = _conv_block(ctx, "ConvBlock_0", p["ConvBlock_0"], bs["ConvBlock_0"],
                    route)
    route, yb2 = _yolo_block(ctx, "YoloBlock_1", p["YoloBlock_1"],
                             bs["YoloBlock_1"], up(y), x2=route_s16)
    y = _conv_block(ctx, "ConvBlock_1", p["ConvBlock_1"], bs["ConvBlock_1"],
                    route)
    _, yb3 = _yolo_block(ctx, "YoloBlock_2", p["YoloBlock_2"],
                         bs["YoloBlock_2"], up(y), x2=route_s8)
    return (("DetectionHead_0", yb1), ("DetectionHead_1", yb2),
            ("DetectionHead_2", yb3))


def forward_detections(params: dict, batch_stats: dict, cfg: ModelConfig,
                       x: Array,
                       act_scales: Optional[Dict[str, float]] = None,
                       quant_skip: Sequence[str] = DEFAULT_QUANT_SKIP,
                       fused_interpret: bool = False,
                       **fm_kwargs) -> Array:
    """Feature maps -> decoded detections [B, num_boxes, 4+1+C] in one
    call; identical to `decode_detections(forward_feature_maps(...))`.
    (A fused head-conv+decode Pallas kernel lived here through round 4
    behind `head_decode_pallas`; it lost its full-model A/B twice —
    round-3 sweep 29.11 vs 28.69 ms b64 — and was DELETED in round 5
    once the packed decode covered its original motivation. DESIGN.md
    round-3/round-5 ledgers keep the measured record.)"""
    ctx = _Ctx(cfg, act_scales, None, quant_skip,
               fused_interpret=fused_interpret, **fm_kwargs)
    necks = _forward_necks(ctx, params, batch_stats, x)
    fms = [_apply_head(ctx, params, nm, h) for nm, h in necks]
    dp = head_pad_width(cfg) if ctx.head_pad else 0
    return decode_detections(fms, cfg.anchors, cfg.number_classes,
                             cfg.strides, anchor_pad=dp)


def calibrate(params: dict, batch_stats: dict, cfg: ModelConfig,
              images: Array,
              percentile: Optional[float] = None,
              train_mode: bool = False) -> Dict[str, float]:
    """Per-tensor activation scales from one calibration batch.

    Default: absmax (conservative — no clipping, outlier-fragile range).
    `percentile` (e.g. 99.9) instead clips each tensor's range at that
    percentile of |activations| — the standard post-training-quantization
    quality lever when a layer has heavy-tailed activations. Percentiles
    come from per-tensor fixed-bin histograms reduced inside the jit
    (O(bins) live memory per conv), not from materializing every conv
    input's |activations| at once — the latter is gigabytes of f32 live
    simultaneously at 512^2 and OOMs with realistic calibration batches.

    `train_mode=True` (QAT static-scale calibration) applies BN with the
    calibration batch's OWN statistics — matching the train-mode forward
    the frozen scales will be used in. Post-training (serving)
    calibration keeps the default running averages, matching inference.
    """
    collect: Dict[str, Array] = {}
    reduce_mode = "absmax" if percentile is None else "hist"

    @jax.jit
    def run(x):
        forward_feature_maps(params, batch_stats, cfg, x, collect=collect,
                             collect_reduce=reduce_mode,
                             bn_batch_stats=train_mode)
        if percentile is None:
            return dict(collect)
        return {k: _hist_percentile(counts, m, percentile)
                for k, (counts, m) in collect.items()}

    vals = jax.device_get(run(jnp.asarray(images)))
    return {k: max(float(v), 1e-12) / 127.0 for k, v in vals.items()}


def scales_to_collection(scales: Dict[str, float], template) -> Any:
    """Map `calibrate`'s {block path: scale} dict onto a `quant_scales`
    flax collection tree (static-QAT, ModelConfig.int8_train_static).

    `template` is the collection as produced by `model.init` — leaves are
    `.../act_scale` scalars whose joined module path keys into `scales`.
    Raises KeyError if a declared scale has no calibrated value (a
    topology/naming drift, better loud than silently training on 1.0)."""

    def to_leaf(path, leaf):
        names = [p.key for p in path if getattr(p, "key", None) is not None]
        assert names[-1] == "act_scale", names
        key = "/".join(names[:-1])
        if key not in scales:
            raise KeyError(f"no calibrated scale for {key}; have "
                           f"{sorted(scales)[:8]}...")
        return jnp.asarray(scales[key], jnp.float32)

    return jax.tree_util.tree_map_with_path(to_leaf, template)


def default_serving_kernels() -> Dict[str, bool]:
    """The measured-winner Pallas kernel flag set for int8 serving.

    Round-4 full-model A/B at the b64 operating point (DESIGN.md round-4
    ledger): the FULL S2D-region kernel with the folded fast epilogue
    (stem2+pw+3x3+residual+exit in one scratch-carried band pipeline,
    `ops/pallas/s2d_region_kernel.py`) beats the round-3 exit-kernel
    champion 27.84 vs 28.15 ms, and rep-boundary requantization in the
    deep blocks (`rep_requant`, bit-identical s8 chain-tensor stores)
    adds another measured step: 27.75 vs 28.09 ms in the same-session
    A/B. Round-5: `region_pipe` (row r+1's stem2 tap matmuls issue
    before row r's VPU epilogue chain — software pipelining of the
    kernel's serialized MXU/VPU boundary; bit-identical) wins the
    same-session A/B twice: 27.42 vs 27.63 and 27.36 vs 27.66 ms b64.
    `exit_pallas` stays on as the fallback
    for configs where the region kernel is ineligible (uncalibrated
    blocks, VMEM overflow, non-s2d stems) — when the region kernel
    engages, the exit-conv path is never reached. Every other staged
    kernel (downsample, head+decode, pointwise, conv3 chain, fused
    FeatureBlock; round-3 sweep) regresses the full model despite
    winning its op in isolation. Gated to the TPU backend — on CPU
    Mosaic kernels only run in interpret mode, a test facility, so the
    dict is empty there and the XLA mirror serves.
    """
    if jax.default_backend() == "tpu":
        return {"exit_pallas": True, "region_full": True,
                "region_fast": True, "rep_requant": True,
                "region_pipe": True}
    return {}


def make_quantized_detector_fn(saved_model_filepath: str,
                               calib_images: Array,
                               calib_percentile: Optional[float] = None,
                               kernels: Optional[Dict[str, bool]] = None):
    """int8 twin of `inference.make_detector_fn`: detect(images NHWC f32)
    -> decoded detections [B, num_boxes, 4+1+C] (no NMS — callers like the
    tiled pipeline run their own per-tile NMS). `calib_images`: a
    representative z-scored batch for activation-scale calibration.
    `kernels`: Pallas-kernel flag overrides (default: the measured
    winners, `default_serving_kernels`)."""
    from yolov3_tpu.utils import checkpoint as ckpt

    params, batch_stats, cfg = ckpt.load_model(saved_model_filepath)
    scales = calibrate(params, batch_stats, cfg, calib_images,
                       percentile=calib_percentile)
    kw = default_serving_kernels() if kernels is None else dict(kernels)

    @jax.jit
    def detect(images: Array) -> Array:
        return forward_detections(params, batch_stats, cfg, images,
                                  act_scales=scales, **kw)

    return detect, cfg


def make_quantized_serving_fn(saved_model_filepath: str,
                              calib_images: Array,
                              icfg: Optional[InferenceConfig] = None,
                              min_box_size: Optional[int] = None,
                              calib_percentile: Optional[float] = None,
                              kernels: Optional[Dict[str, bool]] = None,
                              raw_pixels: bool = False):
    """int8 twin of `inference.make_serving_fn`: ONE jitted program from
    z-scored images to (boxes, scores, keep) — int8 backbone/neck convs,
    bf16 heads, f32 decode, device NMS.

    `calib_images`: a representative (z-scored, NHWC f32) batch for
    activation-scale calibration. `kernels`: Pallas-kernel flag overrides
    (default: the measured winners, `default_serving_kernels`).
    `raw_pixels`: serve() takes RAW integer pixels and folds the
    per-image z-score into the same program — the whole reference
    pipeline (normalize + forward + decode + clip + filter + NMS,
    reference/inference.py:44-79) as one device program.
    """
    from yolov3_tpu.ops.nms import batched_nms_device
    from yolov3_tpu.utils import checkpoint as ckpt

    icfg = icfg or InferenceConfig()
    if min_box_size is None:
        min_box_size = icfg.min_box_size
    params, batch_stats, cfg = ckpt.load_model(saved_model_filepath)
    scales = calibrate(params, batch_stats, cfg, calib_images,
                       percentile=calib_percentile)
    kw = default_serving_kernels() if kernels is None else dict(kernels)

    @jax.jit
    def serve(images: Array):
        # clip to the ACTUAL image bounds (static per compile), not
        # cfg.img_size: the network is fully convolutional and serves
        # image sizes other than the export size (matches the bf16 CLI's
        # host-side clip, reference/inference.py:62-65 fixed)
        img_h, img_w = images.shape[1], images.shape[2]
        if raw_pixels:
            from yolov3_tpu.data.device_pipeline import zscore_images
            # emit the model's compute dtype straight out of the z-score
            # fusion: the model casts images to cfg.dtype for the stem
            # anyway (zscore-then-round is identical either way), and
            # skipping the separate convert + relayout at the stem
            # boundary measured +0.11 ms b64 (scripts/bench_raw_serving.py,
            # DESIGN.md round-4 input-boundary note). MUST honor
            # cfg.dtype — an unconditional bf16 cast silently truncates
            # f32-compute models (round-4 raw-pixels gate failure).
            images = zscore_images(images).astype(cfg.dtype)
        det = forward_detections(params, batch_stats, cfg, images,
                                 act_scales=scales, **kw)
        clipped = jnp.concatenate([
            jnp.clip(det[..., 0:1], 0, img_w),
            jnp.clip(det[..., 1:2], 0, img_h),
            jnp.clip(det[..., 2:3], 0, img_w),
            jnp.clip(det[..., 3:4], 0, img_h),
            det[..., 4:],
        ], axis=-1)
        return batched_nms_device(clipped, cfg.number_classes,
                                  iou_threshold=icfg.iou_threshold,
                                  score_threshold=icfg.score_threshold,
                                  max_boxes=icfg.max_boxes_per_class,
                                  min_box_size=float(min_box_size))

    return serve, cfg, scales


def decode_iou_fidelity(det_a: np.ndarray, det_b: np.ndarray,
                        top_k: int = 20) -> float:
    """Mean IoU between the two paths' top-K objectness-ranked boxes —
    the quantized path's quality guard (BASELINE.md decode fidelity)."""
    from yolov3_tpu.ops.boxes import compute_iou

    ious = []
    for a, b in zip(det_a, det_b):
        idx = np.argsort(-a[:, 4])[:top_k]
        for i in idx:
            ious.append(float(compute_iou(a[i, 0:4], b[i:i + 1, 0:4])[0]))
    return float(np.mean(ious))
