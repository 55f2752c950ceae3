"""Pure-numpy transcription of the reference's inference walk, used to
build golden-output fixtures without TensorFlow in the environment.

This is deliberately an INDEPENDENT second reading of the reference graph
(reference/model.py:28-39 conv->leaky->BN, :41-48 original-input residual,
:93-105 ones-kernel Conv2DTranspose channel-sum upsample, :356-421 FPN
assembly, TF SAME padding) that avoids models/yolo.py and jax entirely:
float64 accumulation, explicit tap loops, keras auto-numbered variable
names. `utils/tf_import.py` + `YoloV3(upsample_channel_sum=True)` must
reproduce its outputs (tests/test_tf_import.py golden parity gates), which
converts importer parity from "shapes match" to "numbers match".

Weight generation (`make_weights`) is deterministic in (seed, topology), so
full-depth fixtures commit only the input + outputs + seed — the ~250 MB of
random full-depth weights are regenerated at test time.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

from yolov3_tpu.utils.tf_import import _kname, reference_keras_shapes

ALPHA = 0.2    # tf.nn.leaky_relu default (reference/model.py:34)
BN_EPS = 1e-3  # Keras BatchNormalization default (reference/model.py:38)


def tf_same_pad(size: int, k: int, s: int) -> Tuple[int, int]:
    """TF 'SAME' asymmetric padding (pad_end gets the extra pixel)."""
    out = -(-size // s)
    total = max((out - 1) * s + k - size, 0)
    return total // 2, total - total // 2


def conv2d(x, kernel, bias, stride=1):
    """NHWC conv, TF SAME padding, float64 accumulation."""
    kh, kw, _, co = kernel.shape
    n, h, w, _ = x.shape
    ph = tf_same_pad(h, kh, stride)
    pw = tf_same_pad(w, kw, stride)
    xp = np.pad(x, ((0, 0), ph, pw, (0, 0)))
    oh, ow = -(-h // stride), -(-w // stride)
    out = np.zeros((n, oh, ow, co), np.float64)
    for u in range(kh):
        for v in range(kw):
            tap = xp[:, u:u + oh * stride:stride, v:v + ow * stride:stride, :]
            out += np.einsum("nhwc,co->nhwo", tap, kernel[u, v],
                             optimize=True)
    return out + bias


def conv_block(x, w, name):
    """conv -> LeakyReLU -> BatchNorm(inference) (reference/model.py:28-39).

    `name` indexes the keras auto-named conv2d_N / batch_normalization_N
    pair; stride is recovered from the spatial shapes at the call site.
    """
    idx, stride = name
    kc, kb = _kname("conv2d", idx), _kname("batch_normalization", idx)
    y = conv2d(x, w[f"{kc}/kernel"], w[f"{kc}/bias"], stride)
    y = np.where(y >= 0, y, ALPHA * y)
    g, b = w[f"{kb}/gamma"], w[f"{kb}/beta"]
    m, v = w[f"{kb}/moving_mean"], w[f"{kb}/moving_variance"]
    return g * (y - m) / np.sqrt(v + BN_EPS) + b


def upsample_channel_sum(x):
    """Ones-kernel k=2 s=2 Conv2DTranspose (reference/model.py:93-105):
    every output pixel of the 2x2 block = the SUM over input channels."""
    n, h, w, c = x.shape
    s = x.sum(axis=-1, keepdims=True)
    out = np.zeros((n, 2 * h, 2 * w, c), x.dtype)
    for di in range(2):
        for dj in range(2):
            out[:, di::2, dj::2, :] = s
    return out


def forward(weights, x, block_count: int):
    """reference/model.py:356-421 inference walk, NHWC. Feature-block reps
    are (1, 2, bc, bc, bc//2) — block_count=8 is the shipping topology."""
    w = weights
    counter = iter(range(999))

    def cb(x, stride=1):
        return conv_block(x, w, (next(counter), stride))

    def feature_block(x, reps):
        inputs = x
        for _ in range(reps):
            y = cb(cb(x))
            x = inputs + y
        return x

    def yolo_block(x):
        x = cb(cb(cb(cb(cb(x)))))
        return x, cb(x)

    def head(x, idx):
        return conv2d(x, w[f"feature_map_{idx}/kernel"],
                      w[f"feature_map_{idx}/bias"])

    c = cb(x)
    c = cb(c, 2)
    c = feature_block(c, 1)
    c = cb(c, 2)
    c = feature_block(c, 2)
    c = cb(c, 2)
    route1 = feature_block(c, block_count)
    c = cb(route1, 2)
    route2 = feature_block(c, block_count)
    c = cb(route2, 2)
    route3 = feature_block(c, block_count // 2)

    route, out = yolo_block(route3)
    fm1 = head(out, 1)
    c = upsample_channel_sum(cb(route))
    route, out = yolo_block(np.concatenate([c, route2], axis=-1))
    fm2 = head(out, 2)
    c = upsample_channel_sum(cb(route))
    route, out = yolo_block(np.concatenate([c, route1], axis=-1))
    fm3 = head(out, 3)
    return fm1, fm2, fm3


def make_weights(seed: int, number_classes: int,
                 anchors: Sequence[Tuple[float, float]], block_count: int,
                 filter_count: int, kernel: int = 3,
                 ) -> Dict[str, np.ndarray]:
    """Deterministic keras-layout random weights for the given topology.
    The generation order follows `reference_keras_shapes`' construction
    walk, so (seed, topology) fully determines every value — full-depth
    fixtures ship only this seed, not the weights."""
    shapes = reference_keras_shapes(number_classes, len(anchors),
                                    block_count=block_count,
                                    filter_count=filter_count, kernel=kernel)
    rng = np.random.RandomState(seed)
    w = {}
    for name, shape in shapes.items():
        if name.startswith("conv2d_transpose"):
            # frozen upsample: ones kernel, zero bias (reference/model.py:102)
            w[name] = (np.ones(shape, np.float32) if name.endswith("kernel")
                       else np.zeros(shape, np.float32))
        elif name.endswith("/kernel"):
            fan_in = int(np.prod(shape[:-1]))
            w[name] = rng.randn(*shape).astype(np.float32) / np.sqrt(fan_in)
        elif name.endswith("/bias") or name.endswith("/beta"):
            w[name] = 0.1 * rng.randn(*shape).astype(np.float32)
        elif name.endswith("/gamma"):
            w[name] = rng.uniform(0.8, 1.2, shape).astype(np.float32)
        elif name.endswith("/moving_mean"):
            w[name] = 0.1 * rng.randn(*shape).astype(np.float32)
        elif name.endswith("/moving_variance"):
            w[name] = rng.uniform(0.5, 1.5, shape).astype(np.float32)
        else:
            raise ValueError(name)
    return w
