"""YDB record store + record codec + builder round-trip tests."""

import os

import numpy as np
import pytest

from yolov3_tpu.data import builder, records
from yolov3_tpu.data.store import RecordReader, RecordWriter, open_reader
from yolov3_tpu.ops import boxes as bbox


class TestStore:
    def test_roundtrip_and_order(self, tmp_path):
        db = str(tmp_path / "t.ydb")
        with RecordWriter(db) as w:
            w.put(b"b_key", b"valueB")
            w.put(b"a_key", b"valueA")
            w.put(b"c_key", b"\x00" * 1000)
        with RecordReader(db) as r:
            assert len(r) == 3
            # insertion order, NOT sorted
            assert r.keys() == [b"b_key", b"a_key", b"c_key"]
            assert bytes(r.get(b"a_key")) == b"valueA"
            assert bytes(r.get(b"c_key")) == b"\x00" * 1000
            assert r.get(b"missing") is None
            assert b"b_key" in r

    def test_index_recovery_from_truncated_log(self, tmp_path):
        db = str(tmp_path / "t.ydb")
        with RecordWriter(db) as w:
            w.put(b"k1:0", b"v1")
            w.put(b"k2:1", b"v2")
        # delete the index -> reader must rescan the log
        os.remove(os.path.join(db, "index.ydb"))
        with RecordReader(db) as r:
            assert r.keys() == [b"k1:0", b"k2:1"]
            assert bytes(r.get(b"k2:1")) == b"v2"

    def test_missing_db_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            RecordReader(str(tmp_path / "nope.ydb"))

    def test_open_reader_factory(self, tmp_path):
        db = str(tmp_path / "t.ydb")
        with RecordWriter(db) as w:
            w.put(b"k:0", b"v")
        r = open_reader(db)
        assert bytes(r.get(b"k:0")) == b"v"
        r.close()


class TestRecordCodec:
    def test_image_boxes_roundtrip(self, rng):
        img = rng.randint(0, 255, (32, 48, 3)).astype(np.uint8)
        boxes = np.array([[1, 2, 10, 12, 0], [5, 6, 7, 8, 2]], dtype=np.int32)
        blob = records.encode_record(img, boxes)
        img2, boxes2 = records.decode_record(blob)
        np.testing.assert_array_equal(img2, img)
        np.testing.assert_array_equal(boxes2, boxes)

    def test_preserves_uint16(self, rng):
        img = rng.randint(0, 65535, (8, 8)).astype(np.uint16)
        img2, _ = records.decode_record(
            records.encode_record(img, np.zeros((0, 5))))
        assert img2.dtype == np.uint16
        assert img2.shape == (8, 8, 1)
        np.testing.assert_array_equal(img2[:, :, 0], img)

    def test_uint8_cast_compat_mode(self, rng):
        img = (rng.rand(8, 8, 1) * 300).astype(np.float32)
        img2, _ = records.decode_record(
            records.encode_record(img, np.zeros((0, 5)), preserve_dtype=False))
        assert img2.dtype == np.uint8

    def test_empty_boxes(self):
        img = np.zeros((4, 4, 1), dtype=np.uint8)
        _, boxes = records.decode_record(records.encode_record(img, np.zeros((0, 5))))
        assert boxes.shape == (0, 5)

    def test_key_format(self):
        boxes = np.array([[0, 0, 5, 5, 2], [0, 0, 5, 5, 0], [1, 1, 2, 2, 2]])
        key = records.make_record_key(7, "img_041", boxes)
        assert key == "7_img_041:0,2"
        assert records.parse_key_classes(key.encode()) == ["0", "2"]

    def test_key_format_no_boxes(self):
        key = records.make_record_key(0, "empty", np.zeros((0, 5)))
        assert key == "0_empty:"
        assert records.parse_key_classes(key.encode()) == [""]


class TestBuilder:
    def test_build_database_end_to_end(self, tmp_path, rng):
        img_dir = tmp_path / "imgs"
        csv_dir = tmp_path / "csvs"
        out_dir = tmp_path / "out"
        img_dir.mkdir()
        csv_dir.mkdir()
        from yolov3_tpu.data import imaging
        for i in range(10):
            img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
            imaging.imwrite(img, str(img_dir / f"img{i}.png"))
            bbox.write_boxes_from_xywhc(
                np.array([[4, 4, 16, 16, i % 2]]), str(csv_dir / f"img{i}.csv"))

        builder.build_database(str(img_dir), str(csv_dir), str(out_dir),
                               "toy", train_fraction=0.8, image_format="png")

        train = RecordReader(str(out_dir / "train-toy.ydb"))
        test = RecordReader(str(out_dir / "test-toy.ydb"))
        assert len(train) == 8
        assert len(test) == 2
        img, boxes = records.decode_record(train.get(train.keys()[0]))
        assert img.shape == (64, 64, 3)
        assert boxes.shape == (1, 5)
        # manifest exists
        assert (out_dir / "train-toy.ydb" / "annotation_list.csv").exists()
        train.close()
        test.close()

    def test_close_with_live_views(self, tmp_path):
        """Zero-copy views may outlive the reader; close must not raise."""
        db = str(tmp_path / "t.ydb")
        with RecordWriter(db) as w:
            w.put(b"k:0", b"payload")
        r = RecordReader(db)
        view = r.get(b"k:0")
        r.close()  # BufferError would mean crash-on-teardown
        assert bytes(view) == b"payload"
