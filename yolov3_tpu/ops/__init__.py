from yolov3_tpu.ops import boxes  # noqa: F401
