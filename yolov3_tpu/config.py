"""Configuration dataclasses.

The reference hardcodes most of these in source (anchors `reference/train.py:33`,
augmentation severities `reference/imagereader.py:370-378`, NMS thresholds
`reference/bbox_utils.py:240`, reader count `reference/train.py:16`, warmup
`reference/train.py:107-110`, convergence tolerance `reference/train.py:185`,
edge-effect range `reference/inference_tiled.py:26`). We lift every one of them
into explicit config with the reference's defaults.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, List, Tuple

# NOTE: no jax import at module level — reader worker processes (spawn
# context) import this module and must stay JAX-free for fast startup and
# to avoid touching the TPU plugin from data-loading processes.

# Network constants (reference/model.py:22-26)
BLOCK_COUNT = 8
FILTER_COUNT = 1024
KERNEL_SIZE = 3
NETWORK_DOWNSAMPLE_FACTOR = 32
WEIGHT_DECAY = 5e-4

# Default anchors used when none are provided (reference/model.py:432-433)
DEFAULT_ANCHORS: Tuple[Tuple[int, int], ...] = ((32, 32), (128, 128), (256, 256))
# Anchors hardcoded by the reference trainer (reference/train.py:33)
TRAIN_DEFAULT_ANCHORS: Tuple[Tuple[int, int], ...] = ((64, 384), (384, 64))

# Tiled inference (reference/inference_tiled.py:25-26)
EDGE_EFFECT_RANGE = 96

# Readers per device (reference/train.py:16)
READER_COUNT_PER_DEVICE = 3

# Early-stopping convergence tolerance (reference/train.py:185)
CONVERGENCE_TOLERANCE = 1e-4


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static model hyperparameters.

    Mirrors the ctor surface of `reference/model.py:423-451`.
    """

    img_size: Tuple[int, int, int]  # (H, W, C)
    number_classes: int
    anchors: Tuple[Tuple[float, float], ...] = DEFAULT_ANCHORS
    # bfloat16 conv/matmul compute with float32 params is the TPU-native
    # operating point; float32 available for parity testing.
    compute_dtype: str = "bfloat16"
    # LeakyReLU slope: tf.nn.leaky_relu default (reference/model.py:34)
    leaky_relu_alpha: float = 0.2
    # Keras BatchNormalization defaults (reference/model.py:38)
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    # Network-size constants (reference/model.py:22-24), lifted into config
    # so tests and small deployments can shrink the network.
    block_count: int = BLOCK_COUNT
    filter_count: int = FILTER_COUNT
    kernel_size: int = KERNEL_SIZE
    # Run the first two conv blocks in the space-to-depth domain (exact
    # math, identical checkpoint tree, much better MXU/lane utilization for
    # the low-channel high-resolution stem). Requires kernel_size == 3.
    stem_space_to_depth: bool = True
    # Inference-path 1x1 conv blocks as one fused Pallas kernel
    # (matmul + bias + LeakyReLU + affine BN). Same checkpoint tree.
    use_pallas_pointwise: bool = False
    # The reference's FPN "upsample" is a frozen all-ones Conv2DTranspose
    # (reference/model.py:93-105) whose output channels are each the SUM
    # over all input channels — not nearest-neighbor replication. Default
    # False = our intentional fix (per-channel nearest-neighbor); True =
    # bug-compatible channel-sum mode, required when loading weights
    # trained by the TF2 reference (utils/tf_import.py sets this).
    upsample_channel_sum: bool = False
    # Compute the S2D region's weight-grads in base-kernel space via a
    # custom VJP (models/yolo.py::_s2d_conv) instead of autodiff through
    # the lifted kernels (which pays 4x FLOPs / 16x output inflation on
    # structural zeros). True = all five lifted convs; a tuple of kind
    # names (see yolo.py::_S2D_CONV_KINDS) selects a subset; False = plain
    # autodiff. Measured on v5e (DESIGN.md round 3): the base-domain
    # weight-grad convs are lane-starved at the original low-channel
    # shapes and REGRESS the 512px b16 train step (67.4 vs 47.0 ms), so
    # the default stays off.
    s2d_base_grads: Any = False
    # stem1-direct weight-grad via im2row patches + one [48,N]@[N,128]
    # matmul (models/yolo.py::_stem1_conv_im2row_grads) instead of
    # autodiff's f01b_i01o conv, which strands the MXU on 3 input
    # channels (~50x its flop floor, 3.45 ms of the 47 ms bf16 b16 train
    # step — DESIGN.md round-3 train profile). Forward is identical.
    # MEASURED NEGATIVE: +2.3 ms/step at bf16 b16 512px — materializing
    # the [B,ho,wo,16C] patch tensor costs more than the lane-starved
    # conv it replaces (DESIGN.md round-3 ledger). Default stays off.
    stem1_im2row_grads: bool = False
    # int8-forward training: ConvBlock forwards run on the int8 MXU path
    # (v5e doubles the bf16 rate) with dynamic per-batch quantization;
    # backward is the plain bf16 conv VJP at the saved full-precision
    # operands (straight-through estimator, the standard QAT gradient).
    # stem1 and the detection heads stay bf16, mirroring the PTQ serving
    # skip. Eval/inference paths are unaffected.
    int8_train: bool = False
    # Static-scale QAT (requires int8_train): quantize activations with
    # FROZEN calibration scales (a `quant_scales` flax collection, seeded
    # from `models/quantized.py::calibrate` and refreshed periodically by
    # the trainer) instead of per-batch absmax — removes the per-layer
    # activation absmax reduction from the forward, the serializing cost
    # the round-3 int8-STE post-mortem measured (~2 ms/step, DESIGN.md).
    # Out-of-range activations saturate at +-127 (standard static QAT).
    int8_train_static: bool = False
    # Rematerialize residual/neck blocks in the backward pass
    # (jax.checkpoint): trades ~1/3 more FLOPs for activation memory,
    # enabling larger per-chip train batches at 512px+.
    remat_blocks: bool = False

    def __post_init__(self):
        h, w, _ = self.img_size
        if h % NETWORK_DOWNSAMPLE_FACTOR or w % NETWORK_DOWNSAMPLE_FACTOR:
            raise ValueError(
                f"img size {self.img_size} must be a multiple of "
                f"{NETWORK_DOWNSAMPLE_FACTOR}"
            )

    @property
    def number_anchors(self) -> int:
        return len(self.anchors)

    @property
    def dtype(self):
        import jax.numpy as jnp
        return jnp.dtype(self.compute_dtype)

    @property
    def grid_sizes(self) -> List[Tuple[int, int]]:
        """Grid (gh, gw) per scale at strides 32/16/8.

        Matches `reference/imagereader.py:258-267`.
        """
        h, w, _ = self.img_size
        return [
            (h // NETWORK_DOWNSAMPLE_FACTOR, w // NETWORK_DOWNSAMPLE_FACTOR),
            (h // (NETWORK_DOWNSAMPLE_FACTOR // 2), w // (NETWORK_DOWNSAMPLE_FACTOR // 2)),
            (h // (NETWORK_DOWNSAMPLE_FACTOR // 4), w // (NETWORK_DOWNSAMPLE_FACTOR // 4)),
        ]

    @property
    def strides(self) -> List[int]:
        return [32, 16, 8]

    @property
    def number_output_boxes(self) -> int:
        """Total decoded boxes across scales (reference/model.py:442-447)."""
        return self.number_anchors * sum(gh * gw for gh, gw in self.grid_sizes)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @staticmethod
    def from_json(s: str) -> "ModelConfig":
        d = json.loads(s)
        d["img_size"] = tuple(d["img_size"])
        d["anchors"] = tuple(tuple(a) for a in d["anchors"])
        return ModelConfig(**d)


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Augmentation severities, hardcoded at `reference/imagereader.py:370-378`."""

    rotation_flag: bool = False
    reflection_flag: bool = True
    noise_augmentation_severity: float = 0.03
    scale_augmentation_severity: float = 0.1
    blur_augmentation_max_sigma: float = 2.0
    box_size_augmentation_severity: float = 0.03
    box_location_jitter_severity: float = 0.03


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training loop configuration (CLI defaults from `reference/train.py:229-242`)."""

    batch_size: int = 8  # per device
    learning_rate: float = 1e-4
    test_every_n_steps: int = 1000
    early_stopping_count: int = 10
    use_augmentation: bool = True
    balance_classes: bool = True
    reader_count_per_device: int = READER_COUNT_PER_DEVICE
    warmup_steps: int = 1000  # epoch 0 runs min(1000, epoch_size) (reference/train.py:107-110)
    warmup_lr_divisor: float = 10.0
    convergence_tolerance: float = CONVERGENCE_TOLERANCE
    # The reference defines Keras L2(5e-4) kernel regularizers
    # (reference/model.py:37,117) but its custom GradientTape loop never adds
    # `model.losses` to the training loss (reference/model.py:485-492), so
    # weight decay has no effect there. Default preserves that behavior;
    # setting True enables the documented-but-inert decay.
    apply_weight_decay: bool = False
    weight_decay: float = WEIGHT_DECAY
    # Adam to match Keras defaults (reference/model.py:451): b1=0.9, b2=0.999,
    # eps=1e-7 (Keras default epsilon differs from optax's 1e-8).
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-7
    # Lane-domain loss (ops/loss.py::loss_layer_packed): same math on the
    # feature maps' native [B,gh,gw,A*(5+C)] layout. Motivated by the
    # round-3 train profile (~7-8 ms/step in 5D 7-lane loss fusions) but
    # MEASURED NEGATIVE at the full-step operating point: 49.8 ms/step
    # vs 46.9 for the 5D formulation (bf16 b16 512px) — the lane-axis
    # rolls and full-lane per-anchor IoU intermediates cost more than
    # the 5D slicing they replace (DESIGN.md round-3 ledger). Kept as a
    # tested alternative formulation; default off.
    packed_loss: bool = False
    # ZeRO-1 optimizer-state sharding: each chip holds and updates only a
    # 1/n_devices slice of the Adam moments and parameters, then
    # all_gathers the updated params over ICI (parallel/train_step.py::
    # ZeroAdamState). Numerically identical to the replicated optimizer
    # (psum'd grads are replica-identical). The reference replicates Adam
    # state on every GPU (Keras optimizer under MirroredStrategy,
    # reference/train.py:38 + reference/model.py:451); sharding it cuts
    # per-chip optimizer HBM traffic ~n_devices-fold (the round-3 train
    # profile attributed ~4 ms of the 47 ms b16 step to Adam m/v/p reads/
    # writes). Checkpoints taken with this on are tied to the mesh size.
    shard_optimizer: bool = False


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    """Inference / NMS configuration.

    Score rule and thresholds from `reference/bbox_utils.py:240-247`; min box
    size default from `reference/inference.py:114`; tile defaults from
    `reference/inference_tiled.py:359-360`.
    """

    iou_threshold: float = 0.3
    score_threshold: float = 0.1
    min_box_size: int = 32
    tile_height: int = 512
    tile_width: int = 512
    edge_effect_range: int = EDGE_EFFECT_RANGE
    # Fixed candidate cap per class for the on-device NMS kernel.
    max_boxes_per_class: int = 512
