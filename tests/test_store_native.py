"""Native (C++) YDB engine: format interop with the Python implementation."""

import os
import subprocess

import numpy as np
import pytest

from yolov3_tpu.data.store import RecordReader, RecordWriter

native = pytest.importorskip("yolov3_tpu.data.store_native")


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        subprocess.run([os.path.join(root, "native", "build.sh")], check=True)
        native._LIB_TRIED = False
    if not native.available():
        pytest.skip("native library not built")


class TestNativeReader:
    def test_reads_python_written_db(self, tmp_path):
        db = str(tmp_path / "t.ydb")
        with RecordWriter(db) as w:
            w.put(b"k1:0", b"hello")
            w.put(b"k2:1", b"\x00\x01" * 500)
        with native.NativeRecordReader(db) as r:
            assert len(r) == 2
            assert r.keys() == [b"k1:0", b"k2:1"]
            assert bytes(r.get(b"k1:0")) == b"hello"
            assert bytes(r.get(b"k2:1")) == b"\x00\x01" * 500
            assert r.get(b"missing") is None

    def test_rescan_without_index(self, tmp_path):
        db = str(tmp_path / "t.ydb")
        with RecordWriter(db) as w:
            w.put(b"a:0", b"va")
            w.put(b"b:1", b"vb")
        os.remove(os.path.join(db, "index.ydb"))
        with native.NativeRecordReader(db) as r:
            assert r.keys() == [b"a:0", b"b:1"]
            assert bytes(r.get(b"b:1")) == b"vb"

    def test_missing_db(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            native.NativeRecordReader(str(tmp_path / "nope"))


class TestNativeWriter:
    def test_python_reads_native_written_db(self, tmp_path):
        db = str(tmp_path / "n.ydb")
        with native.NativeRecordWriter(db) as w:
            w.put(b"x:0", b"data-x")
            w.put(b"y:2", os.urandom(4096))
        with RecordReader(db) as r:
            assert r.keys() == [b"x:0", b"y:2"]
            assert bytes(r.get(b"x:0")) == b"data-x"

    def test_native_roundtrip(self, tmp_path):
        db = str(tmp_path / "n.ydb")
        payload = np.random.RandomState(0).bytes(100_000)
        with native.NativeRecordWriter(db) as w:
            for i in range(50):
                w.put(f"k{i}:0".encode(), payload[i * 100:(i + 1) * 100])
            w.flush()
        with native.NativeRecordReader(db) as r:
            assert len(r) == 50
            assert bytes(r.get(b"k7:0")) == payload[700:800]


class TestOpenReaderPrefersNative:
    def test_factory(self, tmp_path):
        from yolov3_tpu.data.store import open_reader
        db = str(tmp_path / "t.ydb")
        with RecordWriter(db) as w:
            w.put(b"k:0", b"v")
        r = open_reader(db)
        assert isinstance(r, native.NativeRecordReader)
        r.close()


class TestGetBatch:
    def _make_db(self, tmp_path, n=32):
        db = str(tmp_path / "b.ydb")
        rng = np.random.RandomState(1)
        payloads = {f"k{i}:0".encode(): rng.bytes(1000 + i) for i in range(n)}
        with RecordWriter(db) as w:
            for k, v in payloads.items():
                w.put(k, v)
        return db, payloads

    def test_native_matches_python(self, tmp_path):
        db, payloads = self._make_db(tmp_path)
        keys = list(payloads)[::3] + [b"missing:9"]
        with native.NativeRecordReader(db) as rn, RecordReader(db) as rp:
            got_n = rn.get_batch(keys)
            got_p = rp.get_batch(keys)
            for k, a, b in zip(keys, got_n, got_p):
                if k == b"missing:9":
                    assert a is None and b is None
                else:
                    assert bytes(a) == bytes(b) == payloads[k]

    def test_empty_batch(self, tmp_path):
        db, _ = self._make_db(tmp_path, n=2)
        with native.NativeRecordReader(db) as r:
            assert r.get_batch([]) == []

    def test_str_keys_accepted(self, tmp_path):
        db, payloads = self._make_db(tmp_path, n=4)
        with native.NativeRecordReader(db) as r:
            out = r.get_batch(["k1:0", "k3:0"])
            assert bytes(out[0]) == payloads[b"k1:0"]
            assert bytes(out[1]) == payloads[b"k3:0"]
