from yolov3_tpu.data.store import RecordReader, RecordWriter, open_reader  # noqa: F401
from yolov3_tpu.data.records import (  # noqa: F401
    decode_record,
    encode_record,
    make_record_key,
    parse_key_classes,
)
