"""yolov3_tpu — a TPU-native object-detection framework.

A ground-up JAX / Flax / Pallas / shard_map re-design with the same
capabilities as NIST's usnistgov/object-detection-yolov3 (TF2/Keras, GPU):

- record schema + embedded key-value record store (replaces LMDB+protobuf)
- parallel prefetching data pipeline with class balancing + augmentation
- YOLOv3 (Darknet-53 backbone, 3-scale FPN heads) in Flax, NHWC, bf16-capable
- exact 4-component YOLO loss (xy / wh / objectness / class)
- multi-chip data-parallel training over a `jax.sharding.Mesh` (ICI psum)
- on-device box decode + fixed-shape greedy NMS (host numpy oracle included)
- whole-image and ghost-zone tiled inference CLIs
- anchor-selection (k-means) tooling

Reference parity citations appear in docstrings as `reference/<file>:<lines>`.
"""

__version__ = "0.1.0"

from yolov3_tpu.config import (  # noqa: F401
    AugmentConfig,
    InferenceConfig,
    ModelConfig,
    TrainConfig,
)
