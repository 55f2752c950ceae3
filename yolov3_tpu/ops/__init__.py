from yolov3_tpu.ops import boxes  # noqa: F401
from yolov3_tpu.ops.decode import decode_detections, reorg_feature_map  # noqa: F401
from yolov3_tpu.ops.loss import compute_loss, l2_regularization, loss_layer  # noqa: F401
from yolov3_tpu.ops.nms import (  # noqa: F401
    batched_nms_device,
    nms_to_host,
    pairwise_iou,
    per_class_nms_device,
)
