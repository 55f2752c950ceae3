from yolov3_tpu.utils.metrics import MeanMetric, SummaryLogger  # noqa: F401
