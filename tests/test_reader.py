"""DatasetReader tests: class census, sampling, worker pool lifecycle."""

import numpy as np
import pytest

from yolov3_tpu.data import records
from yolov3_tpu.data.reader import DatasetReader
from yolov3_tpu.data.store import RecordWriter

ANCHORS = [(16, 16), (32, 32)]


def build_toy_db(path, rng, n=12, img_hw=(64, 64), channels=1,
                 classes_per_img=None):
    """Write a small database; returns per-image class lists."""
    assignments = []
    with RecordWriter(str(path)) as w:
        for i in range(n):
            img = rng.randint(0, 255, (*img_hw, channels)).astype(np.uint8)
            if classes_per_img is None:
                cls = [i % 2]
            else:
                cls = classes_per_img[i]
            boxes = np.array([[4, 4, 20, 20, c] for c in cls], dtype=np.int32)
            key = records.make_record_key(i, f"img{i}", boxes)
            w.put(key.encode(), records.encode_record(img, boxes))
            assignments.append(cls)
    return assignments


class TestClassCensus:
    def test_number_classes_no_empty(self, tmp_path, rng):
        build_toy_db(tmp_path / "db", rng,
                     classes_per_img=[[0], [1], [2], [0, 2]] * 3)
        r = DatasetReader(str(tmp_path / "db"), ANCHORS, num_workers=1)
        assert r.get_number_classes() == 3
        assert len(r.keys) == 3
        assert r.get_image_count() == 12
        assert r.get_image_size() == [64, 64, 1]

    def test_empty_image_pseudo_class(self, tmp_path, rng):
        # images with no boxes get bucket 0; real classes shift by one;
        # number_classes excludes the pseudo-class
        # (reference/imagereader.py:110-156)
        build_toy_db(tmp_path / "db", rng,
                     classes_per_img=[[], [0], [1], [0, 1]] * 3)
        r = DatasetReader(str(tmp_path / "db"), ANCHORS, num_workers=1)
        assert r.empty_images_flag
        assert r.get_number_classes() == 2
        assert len(r.keys) == 3  # empty bucket + 2 classes
        assert len(r.keys[0]) == 3   # empty images
        assert len(r.keys[1]) == 6   # class 0
        assert len(r.keys[2]) == 6   # class 1

    def test_sparse_class_ids(self, tmp_path, rng):
        # highest class 3 with ids {0, 3} present -> 4 buckets, two empty
        build_toy_db(tmp_path / "db", rng, classes_per_img=[[0], [3]] * 6)
        r = DatasetReader(str(tmp_path / "db"), ANCHORS, num_workers=1)
        assert r.get_number_classes() == 4
        assert r.class_counts() == [6, 0, 0, 6]

    def test_missing_db(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            DatasetReader(str(tmp_path / "nope"), ANCHORS)


class TestSampling:
    def test_balanced_sampling_redraws_empty_buckets(self, tmp_path, rng):
        import random
        build_toy_db(tmp_path / "db", rng, classes_per_img=[[0], [3]] * 6)
        r = DatasetReader(str(tmp_path / "db"), ANCHORS, shuffle=True,
                          balance_classes=True, num_workers=1)
        picks = [r._next_key(random.Random(s)) for s in range(50)]
        assert all(p in r.keys[0] or p in r.keys[3] for p in picks)

    def test_strided_iteration(self, tmp_path, rng):
        build_toy_db(tmp_path / "db", rng, n=8)
        r = DatasetReader(str(tmp_path / "db"), ANCHORS, shuffle=False,
                          num_workers=2)
        r._key_idx = 0  # emulate worker 0
        seq = [r._next_key(None) for _ in range(4)]
        assert seq == [r.keys_flat[0], r.keys_flat[2], r.keys_flat[4],
                       r.keys_flat[6]]


class TestPipeline:
    def test_examples_end_to_end(self, tmp_path, rng):
        build_toy_db(tmp_path / "db", rng, n=6)
        r = DatasetReader(str(tmp_path / "db"), ANCHORS,
                          use_augmentation=True, shuffle=True,
                          balance_classes=True, num_workers=2)
        with r:
            ex = r.get_example()
            assert ex is not None
            img, l32, l16, l8 = ex
            assert img.shape == (64, 64, 1)
            assert img.dtype == np.float32
            # z-scored
            assert abs(float(img.mean())) < 0.2
            a, c = len(ANCHORS), r.get_number_classes()
            assert l32.shape == (2, 2, a, 5 + c)
            assert l16.shape == (4, 4, a, 5 + c)
            assert l8.shape == (8, 8, a, 5 + c)

    def test_batches(self, tmp_path, rng):
        build_toy_db(tmp_path / "db", rng, n=6)
        r = DatasetReader(str(tmp_path / "db"), ANCHORS,
                          use_augmentation=False, shuffle=True, num_workers=2)
        with r:
            batch = next(r.batches(4))
            assert batch[0].shape == (4, 64, 64, 1)
            assert batch[1].shape[0] == 4

    def test_shutdown_idempotent(self, tmp_path, rng):
        build_toy_db(tmp_path / "db", rng, n=4)
        r = DatasetReader(str(tmp_path / "db"), ANCHORS, num_workers=2)
        r.startup()
        r.shutdown()
        r.shutdown()  # no-op

    def test_no_augmentation_deterministic_content(self, tmp_path, rng):
        build_toy_db(tmp_path / "db", rng, n=2)
        r = DatasetReader(str(tmp_path / "db"), ANCHORS,
                          use_augmentation=False, shuffle=False, num_workers=1)
        with r:
            imgs = [r.get_example()[0] for _ in range(4)]
        # strided non-shuffle iteration with 1 worker wraps over 2 images
        np.testing.assert_array_equal(imgs[0], imgs[2])
        np.testing.assert_array_equal(imgs[1], imgs[3])
        assert not np.array_equal(imgs[0], imgs[1])


class TestDtypes:
    def test_uint16_images_end_to_end(self, tmp_path, rng):
        """README dtype contract: uint16 survives the store and the reader."""
        with RecordWriter(str(tmp_path / "db")) as w:
            for i in range(4):
                img = rng.randint(0, 65535, (64, 64, 1)).astype(np.uint16)
                boxes = np.array([[4, 4, 20, 20, 0]], dtype=np.int32)
                key = records.make_record_key(i, f"im{i}", boxes)
                w.put(key.encode(), records.encode_record(img, boxes))
        r = DatasetReader(str(tmp_path / "db"), ANCHORS,
                          use_augmentation=True, shuffle=True,
                          balance_classes=True, num_workers=1)
        with r:
            img, l32, _, _ = r.get_example()
        assert img.dtype == np.float32
        assert np.isfinite(img).all()
        assert l32.sum() >= 0


class TestMultiHostShard:
    """shard=(rank, world): equal disjoint slices, full-database census."""

    def test_disjoint_equal_cover(self, tmp_path, rng):
        build_toy_db(tmp_path / "db", rng, n=10)
        readers = [DatasetReader(str(tmp_path / "db"), ANCHORS,
                                 num_workers=1, shard=(r, 3))
                   for r in range(3)]
        counts = [r.get_image_count() for r in readers]
        assert counts == [3, 3, 3]  # 10 truncated to 9, split 3-way
        seen = [set(r.keys_flat) for r in readers]
        assert not (seen[0] & seen[1]) and not (seen[1] & seen[2])
        assert len(seen[0] | seen[1] | seen[2]) == 9

    def test_census_spans_full_database(self, tmp_path, rng):
        # class 3 only appears in images rank 0 never reads: number_classes
        # must still match the unsharded reader (hosts must agree on the
        # model's label shapes)
        build_toy_db(tmp_path / "db", rng, classes_per_img=[[0]] * 11 + [[3]])
        full = DatasetReader(str(tmp_path / "db"), ANCHORS, num_workers=1)
        r0 = DatasetReader(str(tmp_path / "db"), ANCHORS, num_workers=1,
                           shard=(0, 2))
        assert r0.get_number_classes() == full.get_number_classes()
        assert r0.label_shapes() == full.label_shapes()

    def test_world_one_is_noop(self, tmp_path, rng):
        build_toy_db(tmp_path / "db", rng, n=5)
        r = DatasetReader(str(tmp_path / "db"), ANCHORS, num_workers=1,
                          shard=(0, 1))
        assert r.get_image_count() == 5

    def test_too_many_hosts_raises(self, tmp_path, rng):
        build_toy_db(tmp_path / "db", rng, n=2)
        with pytest.raises(ValueError, match="fewer than"):
            DatasetReader(str(tmp_path / "db"), ANCHORS, num_workers=1,
                          shard=(0, 4))

    def test_bad_rank_raises(self, tmp_path, rng):
        build_toy_db(tmp_path / "db", rng, n=4)
        with pytest.raises(ValueError, match="rank"):
            DatasetReader(str(tmp_path / "db"), ANCHORS, num_workers=1,
                          shard=(2, 2))

    def test_sharded_examples_flow(self, tmp_path, rng):
        build_toy_db(tmp_path / "db", rng, n=8)
        r = DatasetReader(str(tmp_path / "db"), ANCHORS, shuffle=True,
                          num_workers=1, shard=(1, 2))
        with r:
            img, l32, _, _ = r.get_example()
        assert np.isfinite(img).all()


class TestBatchRing:
    def test_round_trip_and_slot_isolation(self):
        from yolov3_tpu.data.shm_ring import BatchRing
        ring = BatchRing(batch=3, image_shape=(8, 8, 1),
                         image_dtype=np.uint8, max_boxes=4, num_slots=2)
        try:
            a_img, a_box, a_val = ring.views(0)
            b_img, b_box, b_val = ring.views(1)
            a_img[:] = 7
            a_box[:] = 1.5
            a_val[:] = True
            b_img[:] = 9
            assert (a_img == 7).all() and (b_img == 9).all()
            # a second attach (what a worker does) sees the same bytes
            other = BatchRing.attach(ring.spec())
            try:
                o_img, o_box, o_val = other.views(0)
                assert (o_img == 7).all()
                assert (o_box == 1.5).all() and o_val.all()
                o_img[0, 0, 0, 0] = 42
                assert a_img[0, 0, 0, 0] == 42
            finally:
                other.close()
        finally:
            ring.close(unlink=True)

    def test_unlink_removes_file(self):
        import os

        from yolov3_tpu.data.shm_ring import BatchRing
        ring = BatchRing(batch=1, image_shape=(4, 4, 1),
                         image_dtype=np.uint8, max_boxes=2, num_slots=1)
        path = ring.path
        assert os.path.exists(path)
        ring.close(unlink=True)
        assert not os.path.exists(path)
        ring.close(unlink=True)  # idempotent

    def test_bad_slot_raises(self):
        from yolov3_tpu.data.shm_ring import BatchRing
        ring = BatchRing(batch=1, image_shape=(4, 4, 1),
                         image_dtype=np.uint8, max_boxes=2, num_slots=1)
        try:
            with pytest.raises(IndexError):
                ring.views(1)
        finally:
            ring.close(unlink=True)


class TestShmBatchReader:
    def test_batches_match_database_records(self, tmp_path, rng):
        """Every image in a shm batch must be byte-identical to a database
        record, with its boxes/valid mask padded the same way the queue
        transport pads them."""
        from yolov3_tpu.data.encoder import pad_boxes
        from yolov3_tpu.data.reader import ShmBatchReader
        from yolov3_tpu.data.store import open_reader
        build_toy_db(tmp_path / "db", rng, n=6, img_hw=(16, 16))

        store = open_reader(str(tmp_path / "db"))
        by_bytes = {}
        for k in store.keys():
            img, boxes = records.decode_record(store.get(k))
            padded, val = pad_boxes(boxes.astype(np.float32))
            by_bytes[img.tobytes()] = (padded, val)
        store.close()

        r = ShmBatchReader(str(tmp_path / "db"), ANCHORS, batch_size=4,
                           num_workers=2)
        with r:
            it = r.batches()
            for _ in range(3):  # > num_slots batches proves recycling
                imgs, boxes, valid = next(it)
                assert imgs.shape == (4, 16, 16, 1)
                assert imgs.dtype == np.uint8
                assert boxes.shape[0] == 4 and valid.shape[0] == 4
                for i in range(4):
                    key = imgs[i].tobytes()
                    assert key in by_bytes, "image not from the database"
                    want_boxes, want_valid = by_bytes[key]
                    np.testing.assert_array_equal(boxes[i], want_boxes)
                    np.testing.assert_array_equal(valid[i], want_valid)

    def test_shutdown_unlinks_ring(self, tmp_path, rng):
        import os

        from yolov3_tpu.data.reader import ShmBatchReader
        build_toy_db(tmp_path / "db", rng, n=4, img_hw=(16, 16))
        r = ShmBatchReader(str(tmp_path / "db"), ANCHORS, batch_size=2,
                           num_workers=1)
        path = r._ring.path
        r.startup()
        next(r.batches())
        r.shutdown()
        assert not os.path.exists(path)
        r.shutdown()  # idempotent

    def test_wrong_batch_size_raises(self, tmp_path, rng):
        from yolov3_tpu.data.reader import ShmBatchReader
        build_toy_db(tmp_path / "db", rng, n=4, img_hw=(16, 16))
        r = ShmBatchReader(str(tmp_path / "db"), ANCHORS, batch_size=2,
                           num_workers=1)
        with pytest.raises(ValueError, match="sized for batch"):
            next(r.batches(3))
        r._ring.close(unlink=True)
