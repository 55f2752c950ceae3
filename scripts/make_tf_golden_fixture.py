#!/usr/bin/env python
"""Generate the TF-reference golden-output fixture (pure numpy, no TF).

Builds fixed-seed keras-layout weights for a shrunk reference network
(block_count=1, filter_count=64) and computes its three feature maps with
an INDEPENDENT numpy transcription of the reference's inference semantics
(reference/model.py:28-39 conv->leaky->BN, :41-48 original-input residual,
:93-105 ones-kernel Conv2DTranspose channel-sum upsample, :356-380 FPN
assembly, TF SAME padding). The result is committed as
tests/fixtures/tf_golden_bc1.npz and consumed by tests/test_tf_import.py:
`utils/tf_import.py` + `YoloV3(upsample_channel_sum=True)` must reproduce
these numbers — converting importer parity from "shapes match" to
"numbers match" without TensorFlow in the environment.

This transcription deliberately avoids models/yolo.py and jax: it is a
second, literal reading of the reference graph.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolov3_tpu.utils.tf_import import (  # noqa: E402
    _kname, reference_keras_shapes)

BLOCK_COUNT = 1
FILTER_COUNT = 64
KERNEL = 3
IMG = 64
CLASSES = 2
ANCHORS = ((16.0, 16.0), (32.0, 32.0))
ALPHA = 0.2          # tf.nn.leaky_relu default (reference/model.py:34)
BN_EPS = 1e-3        # Keras BatchNormalization default (reference/model.py:38)


def tf_same_pad(size: int, k: int, s: int):
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


def forward(weights, x):
    """reference/model.py:356-421 inference walk, NHWC."""
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
    route1 = feature_block(c, BLOCK_COUNT)
    c = cb(route1, 2)
    route2 = feature_block(c, BLOCK_COUNT)
    c = cb(route2, 2)
    route3 = feature_block(c, BLOCK_COUNT // 2)

    route, out = yolo_block(route3)
    fm1 = head(out, 1)
    c = upsample_channel_sum(cb(route))
    route, out = yolo_block(np.concatenate([c, route2], axis=-1))
    fm2 = head(out, 2)
    c = upsample_channel_sum(cb(route))
    route, out = yolo_block(np.concatenate([c, route1], axis=-1))
    fm3 = head(out, 3)
    return fm1, fm2, fm3


def make_weights(seed=0):
    shapes = reference_keras_shapes(CLASSES, len(ANCHORS),
                                    block_count=BLOCK_COUNT,
                                    filter_count=FILTER_COUNT, kernel=KERNEL)
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


def main():
    w = make_weights()
    rng = np.random.RandomState(42)
    x = rng.randn(2, IMG, IMG, 3).astype(np.float32)
    fm1, fm2, fm3 = forward({k: v.astype(np.float64) for k, v in w.items()},
                            x.astype(np.float64))
    out = dict(w)
    out["__input__"] = x
    out["__fm1__"] = fm1.astype(np.float32)
    out["__fm2__"] = fm2.astype(np.float32)
    out["__fm3__"] = fm3.astype(np.float32)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures",
        "tf_golden_bc1.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.2f} MB)")
    print("fm shapes:", fm1.shape, fm2.shape, fm3.shape)
    print("fm1 mean/std:", fm1.mean(), fm1.std())


if __name__ == "__main__":
    main()
