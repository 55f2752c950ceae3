"""YOLOv3 in Flax: Darknet-53 backbone + 3-scale FPN heads.

TPU-native design choices vs. the reference (reference/model.py:19-464):
- NHWC layout throughout (TPU conv layout; the reference is NCHW for cuDNN).
  The public apply-functions accept NCHW and transpose at the edge.
- bfloat16 compute / float32 params by default; float32 available for parity.
- The fixed ones-kernel 2x Conv2DTranspose upsample (reference/model.py:93-105)
  is mathematically nearest-neighbor 2x replication, implemented here as a
  reshape-broadcast (free on the VPU, no fake weights to carry).

Reference quirks preserved for output parity (SURVEY.md §7 "hard parts"):
- conv block order is Conv -> LeakyReLU -> BatchNorm, i.e. activation INSIDE
  the conv and BN after (reference/model.py:28-39), a deviation from
  canonical Darknet (Conv -> BN -> LeakyReLU).
- the residual block adds the UNCHANGED block input at every repetition
  (reference/model.py:41-48), not the previous repetition's output.
- the same anchor list is used at all three scales (reference/model.py:364-378).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
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

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
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


def upsample_2x(x: Array) -> Array:
    """Nearest-neighbor 2x spatial upsample (NHWC).

    Exactly the reference's non-trainable ones-kernel stride-2
    Conv2DTranspose (reference/model.py:93-105): with a 2x2 all-ones kernel
    and stride 2, every input pixel maps to a 2x2 output block of its own
    value — i.e. nearest-neighbor replication.
    """
    n, h, w, c = x.shape
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
    """Backbone producing routes at strides 8/16/32 (reference/model.py:382-421)."""

    conv_kwargs: dict
    block_count: int = BLOCK_COUNT
    filter_count: int = FILTER_COUNT
    kernel: int = KERNEL_SIZE

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Tuple[Array, Array, Array]:
        fc, k, ck = self.filter_count, self.kernel, self.conv_kwargs
        x = ConvBlock(fc // 32, k, **ck)(x, train)
        x = ConvBlock(fc // 16, k, stride=2, **ck)(x, train)
        x = FeatureBlock(1, k, fc // 16, ck)(x, train)
        x = ConvBlock(fc // 8, k, stride=2, **ck)(x, train)
        x = FeatureBlock(2, k, fc // 8, ck)(x, train)
        x = ConvBlock(fc // 4, k, stride=2, **ck)(x, train)
        x = FeatureBlock(self.block_count, k, fc // 4, ck)(x, train)
        route1 = x  # stride 8
        x = ConvBlock(fc // 2, k, stride=2, **ck)(x, train)
        x = FeatureBlock(self.block_count, k, fc // 2, ck)(x, train)
        route2 = x  # stride 16
        x = ConvBlock(fc, k, stride=2, **ck)(x, train)
        x = FeatureBlock(self.block_count // 2, k, fc, ck)(x, train)
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
                  bn_epsilon=cfg.bn_epsilon, dtype=cfg.dtype)
        k = cfg.kernel_size
        x = x.astype(cfg.dtype)

        route_s8, route_s16, route_s32 = Darknet53(
            conv_kwargs=ck, block_count=cfg.block_count,
            filter_count=cfg.filter_count, kernel=k)(x, train)
        f8 = route_s8.shape[-1]
        f16 = route_s16.shape[-1]
        f32 = route_s32.shape[-1]

        head = lambda: DetectionHead(cfg.number_anchors, cfg.number_classes,
                                     dtype=cfg.dtype)

        route, y = YoloBlock(k, f32, ck)(route_s32, train)
        fm1 = head()(y)

        y = ConvBlock(f16, 1, **ck)(route, train)
        y = jnp.concatenate([upsample_2x(y), route_s16], axis=-1)
        route, y = YoloBlock(k, f16, ck)(y, train)
        fm2 = head()(y)

        y = ConvBlock(f8, 1, **ck)(route, train)
        y = jnp.concatenate([upsample_2x(y), route_s8], axis=-1)
        route, y = YoloBlock(k, f8, ck)(y, train)
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
