from yolov3_tpu.models.yolo import Darknet53, YoloV3, YoloV3Detector  # noqa: F401
